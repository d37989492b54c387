"""Subword model training: BPE merges + unigram scoring, spm-compatible output.

In-framework replacement for the SentencePiece trainer the reference shells
out to (reference: utils/spm_train, egs/librispeech/run_prepare.sh:35-66 —
unigram/bpe, nbpe 1024/5000). Produces a .model file in SentencePiece's
ModelProto wire format (pieces + scores + model_type) that our own
SPModelTokenizer parses back, plus a plain vocab listing for Vocab().

BPE: classic merge learning over ▁-prefixed words.
Unigram: BPE-seeded piece inventory with EM-style score re-estimation via
Viterbi segmentation counts (a practical approximation of the spm unigram
trainer documented here for transparency).
"""

import collections
import struct
from typing import Dict, List, Tuple

from cassnat_asr_public_tpu.data.tokenizer import (
    SPModelTokenizer,
    WORD_BOUNDARY,
)


def _word_counts(lines) -> Dict[str, int]:
    counts = collections.Counter()
    for line in lines:
        for w in line.strip().split():
            counts[WORD_BOUNDARY + w] += 1
    return counts


def learn_bpe(lines, vocab_size: int, coverage_chars: bool = True
              ) -> List[Tuple[str, float]]:
    """Learn BPE pieces; returns [(piece, score)] with merge-rank scores."""
    counts = _word_counts(lines)
    words = {w: list(w) for w in counts}
    pieces = collections.Counter()
    for w, cnt in counts.items():
        for ch in w:
            pieces[ch] += cnt
    vocab = {p for p in pieces}
    merges = []
    # vocab already contains every merged piece (vocab.add below), so the
    # budget check is on len(vocab) alone — counting merges separately
    # double-counted and produced half-size vocabularies (caught by
    # tests/test_spm_vs_hf.py's cross-validation against HF tokenizers)
    while len(vocab) < vocab_size:
        pair_counts = collections.Counter()
        for w, sym in words.items():
            cnt = counts[w]
            for i in range(len(sym) - 1):
                pair_counts[(sym[i], sym[i + 1])] += cnt
        if not pair_counts:
            break
        (a, b), c = pair_counts.most_common(1)[0]
        if c < 2:
            break
        merged = a + b
        merges.append(merged)
        vocab.add(merged)
        for w, sym in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    # spm convention: earlier merges get higher (less negative) scores
    out = []
    chars = sorted(vocab - set(merges))
    for i, m in enumerate(merges):
        out.append((m, -float(i)))
    base = -float(len(merges))
    for j, ch in enumerate(chars):
        out.append((ch, base - j))
    return out


def estimate_unigram_scores(lines, pieces: List[str], n_iter: int = 2
                            ) -> List[Tuple[str, float]]:
    """Viterbi-EM score estimation over a fixed piece inventory."""
    import math

    scores = {p: -len(p) * 1.0 for p in pieces}  # init: favor long pieces
    maxlen = max(len(p) for p in pieces)
    word_counts = _word_counts(lines)

    for _ in range(n_iter):
        piece_counts = collections.Counter()
        for w, cnt in word_counts.items():
            n = len(w)
            best = [-1e18] * (n + 1)
            back = [0] * (n + 1)
            best[0] = 0.0
            for i in range(n):
                if best[i] <= -1e17:
                    continue
                for j in range(i + 1, min(n, i + maxlen) + 1):
                    sc = scores.get(w[i:j])
                    if sc is None:
                        if j - i == 1:
                            sc = -20.0
                        else:
                            continue
                    if best[i] + sc > best[j]:
                        best[j] = best[i] + sc
                        back[j] = i
            j = n
            while j > 0:
                i = back[j]
                if i >= j:
                    i = j - 1
                piece_counts[w[i:j]] += cnt
                j = i
        total = sum(piece_counts.values()) or 1
        for p in pieces:
            c = piece_counts.get(p, 0)
            scores[p] = math.log((c + 0.1) / (total + 0.1 * len(pieces)))
    return [(p, scores[p]) for p in pieces]


def _encode_varint(x: int) -> bytes:
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _field(num: int, wire: int) -> bytes:
    return _encode_varint((num << 3) | wire)


def write_spm_model(path: str, pieces: List[Tuple[str, float]],
                    model_type: str = "unigram"):
    """Serialize a minimal SentencePiece ModelProto (pieces + trainer_spec)."""
    type_enum = {"unigram": 1, "bpe": 2, "word": 3, "char": 4}[model_type]
    blob = b""
    # control pieces first like spm (<unk>=0 type UNKNOWN(2), <s>, </s>)
    specials = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    for piece, score, ptype in specials + [(p, s, 1) for p, s in pieces]:
        sp = b""
        pb = piece.encode("utf-8")
        sp += _field(1, 2) + _encode_varint(len(pb)) + pb
        sp += _field(2, 5) + struct.pack("<f", score)
        if ptype != 1:
            sp += _field(3, 0) + _encode_varint(ptype)
        blob += _field(1, 2) + _encode_varint(len(sp)) + sp
    trainer = _field(7, 0) + _encode_varint(type_enum)
    blob += _field(2, 2) + _encode_varint(len(trainer)) + trainer
    with open(path, "wb") as f:
        f.write(blob)


def spm_train(input_path: str, model_prefix: str, vocab_size: int = 1024,
              model_type: str = "unigram", character_coverage: float = 1.0):
    """Train and write {model_prefix}.model + .vocab.

    (reference surface: utils/spm_train --input --model_prefix --vocab_size
    --model_type --character_coverage)
    """
    with open(input_path) as f:
        lines = f.readlines()
    bpe_pieces = learn_bpe(lines, vocab_size - 3)  # minus specials
    if model_type == "unigram":
        pieces = estimate_unigram_scores(lines, [p for p, _ in bpe_pieces])
    else:
        pieces = bpe_pieces
    write_spm_model(model_prefix + ".model", pieces, model_type)
    with open(model_prefix + ".vocab", "w") as f:
        f.write("<unk>\t0\n<s>\t0\n</s>\t0\n")
        for p, s in pieces:
            f.write(f"{p}\t{s:.4f}\n")
    return pieces
