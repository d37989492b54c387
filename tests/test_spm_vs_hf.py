"""Validate the in-framework subword TRAINER against an independent
implementation (VERDICT r2 item 10).

The real SentencePiece C++ lib is not in the image; HuggingFace
`tokenizers` ships an independent SentencePiece-style BPE trainer
(SentencePieceBPETokenizer: ▁ word-boundary marker, same merge objective).
Training both on the same English corpus must produce largely the same
vocabulary and near-identical segmentations — vocab drift here would
silently change every WER downstream (data/spm_train.py replaces
the reference's utils/spm_train wrapper around the C++ lib).
"""

import os
import re

import pytest

tokenizers = pytest.importorskip("tokenizers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _corpus():
    """Genuine English text available in the image: this repo's own docs."""
    text = []
    for name in ("README.md", "SURVEY.md", "PARITY.md", "BASELINE.md"):
        path = os.path.join(REPO, name)
        if os.path.exists(path):
            with open(path) as f:
                text.append(f.read())
    words = re.findall(r"[a-z]+", " ".join(text).lower())
    assert len(words) > 5000, "corpus too small"
    lines = [" ".join(words[i:i + 12]) for i in range(0, len(words), 12)]
    return lines[: int(len(lines) * 0.9)], lines[int(len(lines) * 0.9):]


def test_bpe_trainer_agrees_with_hf_sentencepiece_bpe(tmp_path):
    from cassnat_asr_public_tpu.data.spm_train import spm_train
    from cassnat_asr_public_tpu.data.tokenizer import SPModelTokenizer

    train, held = _corpus()
    corpus_path = tmp_path / "corpus.txt"
    corpus_path.write_text("\n".join(train) + "\n")
    vocab_size = 300

    # ours
    prefix = str(tmp_path / "ours")
    spm_train(str(corpus_path), prefix, vocab_size=vocab_size,
              model_type="bpe")
    ours = SPModelTokenizer(str(prefix) + ".model")

    # independent: HF tokenizers' SentencePiece-style BPE
    from tokenizers.implementations import SentencePieceBPETokenizer
    hf = SentencePieceBPETokenizer(add_prefix_space=True)
    hf.train([str(corpus_path)], vocab_size=vocab_size, min_frequency=2,
             special_tokens=["<unk>"])

    ours_vocab = set(ours.pieces) - {"<unk>", "<s>", "</s>"}
    hf_vocab = set(hf.get_vocab().keys()) - {"<unk>"}
    inter = ours_vocab & hf_vocab
    overlap = len(inter) / max(min(len(ours_vocab), len(hf_vocab)), 1)
    assert overlap > 0.80, \
        f"vocab overlap {overlap:.2%} ({len(ours_vocab)} vs {len(hf_vocab)})"

    # segmentation agreement on held-out text: fraction of words split at
    # identical boundaries
    same = total = 0
    for line in held:
        for w in line.split():
            total += 1
            a = tuple(ours.encode_as_pieces(w))
            b = tuple(hf.encode(" " + w).tokens)
            if a == b:
                same += 1
    agree = same / max(total, 1)
    assert agree > 0.75, f"segmentation agreement {agree:.2%}"
    print(f"vocab overlap {overlap:.2%}, segmentation agreement {agree:.2%}")
