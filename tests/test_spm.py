"""Subword trainer/tokenizer roundtrip tests."""

import os

from cassnat_asr_public_tpu.data.spm_train import spm_train
from cassnat_asr_public_tpu.data.tokenizer import (
    SPModelTokenizer,
    load_sentencepiece_model,
)

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat and the dog sat",
] * 10


def test_bpe_train_and_encode(tmp_path):
    inp = os.path.join(str(tmp_path), "text.txt")
    with open(inp, "w") as f:
        f.write("\n".join(CORPUS))
    prefix = os.path.join(str(tmp_path), "bpe")
    spm_train(inp, prefix, vocab_size=40, model_type="bpe")
    pieces, scores, mtype = load_sentencepiece_model(prefix + ".model")
    assert mtype == "bpe"
    assert pieces[0] == "<unk>"
    tok = SPModelTokenizer(prefix + ".model")
    p = tok.encode_as_pieces("the cat sat")
    assert tok.tokens2text(p) == "the cat sat"
    # frequent words should be single pieces
    assert "▁the" in tok.piece2id


def test_unigram_train_and_roundtrip(tmp_path):
    inp = os.path.join(str(tmp_path), "text.txt")
    with open(inp, "w") as f:
        f.write("\n".join(CORPUS))
    prefix = os.path.join(str(tmp_path), "uni")
    spm_train(inp, prefix, vocab_size=40, model_type="unigram")
    tok = SPModelTokenizer(prefix + ".model")
    for line in ["the dog sat on the mat", "a cat"]:
        p = tok.encode_as_pieces(line)
        assert tok.tokens2text(p) == line


def test_unseen_chars_fall_back(tmp_path):
    inp = os.path.join(str(tmp_path), "text.txt")
    with open(inp, "w") as f:
        f.write("\n".join(CORPUS))
    prefix = os.path.join(str(tmp_path), "uni")
    spm_train(inp, prefix, vocab_size=30, model_type="unigram")
    tok = SPModelTokenizer(prefix + ".model")
    p = tok.encode_as_pieces("zzz qqq")
    assert tok.tokens2text(p) == "zzz qqq"
