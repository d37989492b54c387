"""Data layer tests: kaldi I/O roundtrip, vocab, tokenizer, batching."""

import os

import numpy as np

from cassnat_asr_public_tpu.data.datasets import (
    DynamicDataset,
    SpeechDataLoader,
    SpeechDataset,
)
from cassnat_asr_public_tpu.data.kaldi_io import (
    compute_cmvn_stats,
    load_cmvn_stats,
    read_matrix,
    read_scp,
    write_ark_scp,
)
from cassnat_asr_public_tpu.data.tokenizer import (
    CharTokenizer,
    WordpieceTokenizer,
)
from cassnat_asr_public_tpu.data.vocab import Vocab
from cassnat_asr_public_tpu.utils.config import Config


def make_toy_corpus(tmp_path, n_utts=12, feat_dim=8, rng=None):
    rng = rng or np.random.default_rng(0)
    ark = os.path.join(tmp_path, "feats.ark")
    scp = os.path.join(tmp_path, "feats.scp")
    text = os.path.join(tmp_path, "text")
    nframes = os.path.join(tmp_path, "utt2num_frames")
    words = ["▁a", "▁b", "▁c", "▁d"]
    entries, texts, frames = [], [], []
    for i in range(n_utts):
        t = int(rng.integers(20, 60))
        entries.append((f"utt{i}", rng.normal(size=(t, feat_dim))
                        .astype(np.float32)))
        n_words = int(rng.integers(1, 5))
        texts.append((f"utt{i}",
                      " ".join(rng.choice(words) for _ in range(n_words))))
        frames.append((f"utt{i}", t))
    write_ark_scp(iter(entries), ark, scp)
    with open(text, "w") as f:
        for u, s in texts:
            f.write(f"{u} {s}\n")
    with open(nframes, "w") as f:
        for u, n in frames:
            f.write(f"{u} {n}\n")
    vocab_file = os.path.join(tmp_path, "vocab.txt")
    with open(vocab_file, "w") as f:
        for w in words:
            f.write(w + "\n")
    return {"name": "toy", "scp_path": scp, "text_label": text,
            "utt2num_frames": nframes}, vocab_file, entries


def test_ark_roundtrip(tmp_path, rng):
    dp, _, entries = make_toy_corpus(str(tmp_path), rng=rng)
    scp = read_scp(dp["scp_path"])
    for utt, mat in entries:
        path, off = scp[utt]
        got = read_matrix(path, off)
        np.testing.assert_allclose(got, mat, rtol=1e-6)


def test_cmvn_roundtrip(tmp_path, rng):
    dp, _, entries = make_toy_corpus(str(tmp_path), rng=rng)
    stats = compute_cmvn_stats(m for _, m in entries)
    cmvn_path = os.path.join(str(tmp_path), "cmvn.ark")
    write_ark_scp(iter([("global", stats)]), cmvn_path)
    mean, std = load_cmvn_stats(cmvn_path)
    allfeats = np.concatenate([m for _, m in entries], 0)
    np.testing.assert_allclose(mean, allfeats.mean(0), atol=1e-4)
    np.testing.assert_allclose(std, allfeats.std(0), atol=1e-3)


def test_vocab_reserved_ids(tmp_path):
    _, vocab_file, _ = make_toy_corpus(str(tmp_path))
    v = Vocab(vocab_file)
    assert v.word2index["blank"] == 0
    assert v.word2index["sos"] == 1
    assert v.word2index["eos"] == 2
    assert v.word2index["unk"] == 3
    assert v.word2index["▁a"] == 4


def test_wordpiece_tokenizer(tmp_path):
    units = ["▁he", "llo", "▁wor", "ld", "▁a"]
    v = Vocab(units=units)
    tok = WordpieceTokenizer(v)
    pieces = tok.encode_as_pieces("hello world")
    assert pieces == ["▁he", "llo", "▁wor", "ld"]
    assert tok.tokens2text(pieces) == "hello world"


def test_char_tokenizer():
    v = Vocab(units=["你", "好"])
    tok = CharTokenizer(v)
    assert tok.encode_as_pieces("你 好") == ["你", "好"]


def test_pieces_to_text_both_delimiters():
    """Shared detok handles SentencePiece '▁' AND the char-unit '<space>'
    marker (aishell/synth vocab_char) — regression for decode_asr writing
    raw '<space>' tokens into hyp.txt."""
    from cassnat_asr_public_tpu.data.vocab import pieces_to_text
    assert pieces_to_text(["▁he", "llo", "▁wor", "ld"]) == "hello world"
    assert pieces_to_text(["a", "<space>", "b", "c"]) == "a bc"
    assert pieces_to_text(iter(["▁a"])) == "a"
    assert pieces_to_text([]) == ""


def _args(extra=None):
    base = dict(left_ctx=0, right_ctx=2, skip_frame=1, use_specaug=False,
                specaug_conf=None, filter_max=10000, filter_min=0,
                batch_size=4, batch_type="utterance", max_frmlen=50,
                max_lablen=10, max_len=5000, seed=0, padding_idx=0)
    if extra:
        base.update(extra)
    return Config(**base)


def test_dynamic_dataset_batching(tmp_path, rng):
    dp, vocab_file, _ = make_toy_corpus(str(tmp_path), rng=rng)
    v = Vocab(vocab_file)
    ds = DynamicDataset(v, [dp], _args())
    assert len(ds.batches) >= 2
    # long utterances got smaller batches
    all_items = [it for b in ds.batches for it in b]
    assert len(all_items) == 12
    loader = SpeechDataLoader(ds, 1, shuffle=True)
    batches = list(loader)
    total = sum(len(b["utts"]) for b in batches)
    assert total == 12
    b0 = batches[0]
    # splice: 8-dim * 3 context frames = 24
    assert b0["feats"].shape[2] == 24
    assert b0["feats"].shape[1] % 64 == 0  # frame bucket
    n_real = len(b0["utts"])  # batch dim may be padded to the nominal size
    assert (b0["labels"][:n_real, 0] == 1).all()  # sos
    # label_sizes excludes sos/eos
    for i in range(len(b0["utts"])):
        row = b0["labels"][i]
        assert row[1 + b0["label_sizes"][i]] == 2  # eos after tokens


def test_loader_sharding(tmp_path, rng):
    dp, vocab_file, _ = make_toy_corpus(str(tmp_path), rng=rng)
    v = Vocab(vocab_file)
    ds = DynamicDataset(v, [dp], _args())
    l0 = SpeechDataLoader(ds, 1, shard=(0, 2))
    l1 = SpeechDataLoader(ds, 1, shard=(1, 2))
    u0 = {u for b in l0 for u in b["utts"]}
    u1 = {u for b in l1 for u in b["utts"]}
    assert not (u0 & u1)
    # equal per-process batch counts (lockstep-safe): the trailing odd batch
    # is dropped rather than creating a rank imbalance
    assert len(l0) == len(l1) == len(l0.dataset.batches) // 2
    assert len(u0) + len(u1) >= 12 - max(
        len(b) for b in l0.dataset.batches)


def test_specaug_applies(tmp_path, rng):
    dp, vocab_file, _ = make_toy_corpus(str(tmp_path), rng=rng)
    v = Vocab(vocab_file)
    conf = Config(n_freq_mask=2, max_freq_width=3, n_time_mask=2,
                  max_time_width=0.2, use_time_warp=False,
                  replace_with_zero=True)
    ds = SpeechDataset(v, [dp], _args(dict(use_specaug=True,
                                           specaug_conf=conf)))
    utt, feat_aug, _ = ds.load_item(ds.items[0])
    ds.use_specaug = False
    _, feat_raw, _ = ds.load_item(ds.items[0])
    assert feat_aug.shape == feat_raw.shape
    assert not np.allclose(feat_aug, feat_raw)
