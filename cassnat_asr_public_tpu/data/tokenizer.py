"""Tokenizers: SentencePiece-compatible subword encoding without the C++ lib.

The reference wraps the sentencepiece Python bindings
(reference: src/data/tokenizer.py:6-32 SPTokenizer, utils/spm_{train,encode,
decode}). sentencepiece isn't in this image, so we provide:

  * SPModelTokenizer — reads a real SentencePiece .model protobuf (unigram or
    BPE) with a minimal varint/proto parser and implements Viterbi unigram
    encoding / greedy BPE merging. Byte-compatible with spm for the common
    case (whitespace pretokenized into U+2581-prefixed words).
  * WordpieceTokenizer — greedy longest-match over a plain vocab file with
    the same "▁" word-boundary convention; used when only vocab_wp.txt is
    available.
  * CharTokenizer — character units for Aishell-style recipes
    (reference: egs/librispeech/local/prepare_dict_char.py).

API surface preserved: text2tokens / tokens2text.
"""

import struct
from typing import Dict, List, Optional, Tuple

WORD_BOUNDARY = "▁"  # ▁


def _parse_protobuf_fields(data: bytes):
    """Yield (field_number, wire_type, value) from a protobuf message."""
    i, n = 0, len(data)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = data[i]
            i += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                val |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wire, val
        elif wire == 1:  # 64-bit
            yield field, wire, data[i:i + 8]
            i += 8
        elif wire == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wire, data[i:i + ln]
            i += ln
        elif wire == 5:  # 32-bit
            yield field, wire, data[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def load_sentencepiece_model(path: str) -> Tuple[List[str], List[float], str]:
    """Parse a SentencePiece ModelProto: pieces, scores, model_type.

    ModelProto field 1 = repeated SentencePiece {1: piece, 2: score, 3: type};
    field 2 = TrainerSpec {3: model_prefix..., 7: model_type enum}.
    """
    with open(path, "rb") as f:
        data = f.read()
    pieces, scores = [], []
    model_type = "unigram"
    for field, wire, val in _parse_protobuf_fields(data):
        if field == 1 and wire == 2:  # SentencePiece
            piece, score = "", 0.0
            for f2, w2, v2 in _parse_protobuf_fields(val):
                if f2 == 1 and w2 == 2:
                    piece = v2.decode("utf-8")
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", v2)[0]
            pieces.append(piece)
            scores.append(score)
        elif field == 2 and wire == 2:  # TrainerSpec
            for f2, w2, v2 in _parse_protobuf_fields(val):
                if f2 == 7 and w2 == 0:
                    model_type = {1: "unigram", 2: "bpe", 3: "word",
                                  4: "char"}.get(v2, "unigram")
    return pieces, scores, model_type


class SPModelTokenizer:
    """Unigram-Viterbi / BPE-merge encoder over a parsed spm model."""

    def __init__(self, model_path: str, vocab=None, add_sos: bool = False):
        self.pieces, self.scores, self.model_type = \
            load_sentencepiece_model(model_path)
        self.piece2id = {p: i for i, p in enumerate(self.pieces)}
        self.piece2score = dict(zip(self.pieces, self.scores))
        self.max_piece_len = max((len(p) for p in self.pieces), default=1)
        self.vocab = vocab
        self.add_sos = add_sos

    # -- spm-compatible text -> pieces --
    def encode_as_pieces(self, text: str) -> List[str]:
        text = " ".join(text.strip().split())
        if not text:
            return []
        normalized = WORD_BOUNDARY + text.replace(" ", WORD_BOUNDARY)
        if self.model_type == "bpe":
            return self._encode_bpe(normalized)
        return self._encode_unigram(normalized)

    def _encode_unigram(self, s: str) -> List[str]:
        n = len(s)
        NEG = -1e18
        best = [NEG] * (n + 1)
        back: List[Optional[int]] = [None] * (n + 1)
        best[0] = 0.0
        unk_score = min(self.scores, default=0.0) - 10.0
        for i in range(n):
            if best[i] == NEG:
                continue
            for j in range(i + 1, min(n, i + self.max_piece_len) + 1):
                sub = s[i:j]
                sc = self.piece2score.get(sub)
                if sc is None:
                    if j - i == 1:
                        sc = unk_score  # single-char fallback
                    else:
                        continue
                if best[i] + sc > best[j]:
                    best[j] = best[i] + sc
                    back[j] = i
        # backtrace
        out = []
        j = n
        while j > 0:
            i = back[j]
            if i is None:  # unreachable char; emit it raw
                i = j - 1
            out.append(s[i:j])
            j = i
        return out[::-1]

    def _encode_bpe(self, s: str) -> List[str]:
        symbols = list(s)
        # iteratively merge the best-scoring adjacent pair present in vocab
        while True:
            best_score, best_i = None, None
            for i in range(len(symbols) - 1):
                cand = symbols[i] + symbols[i + 1]
                sc = self.piece2score.get(cand)
                if sc is not None and (best_score is None or sc > best_score):
                    best_score, best_i = sc, i
            if best_i is None:
                break
            symbols[best_i:best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
        return symbols

    # -- reference SPTokenizer surface (reference: tokenizer.py:6-32) --
    def text2tokens(self, text: str) -> List[int]:
        pieces = self.encode_as_pieces(text)
        if self.vocab is not None:
            ids = self.vocab.encode(pieces)
        else:
            ids = [self.piece2id.get(p, 0) for p in pieces]
        if self.add_sos:
            sos = self.vocab.word2index["sos"] if self.vocab else 1
            ids = [sos] + ids
        return ids

    def tokens2text(self, tokens: List[str]) -> str:
        return "".join(tokens).replace(WORD_BOUNDARY, " ").strip()


class WordpieceTokenizer:
    """Greedy longest-match subword tokenizer over a vocab file (no .model)."""

    def __init__(self, vocab, add_sos: bool = False):
        self.vocab = vocab
        self.add_sos = add_sos
        self.max_len = max((len(w) for w in vocab.word2index), default=1)

    def encode_as_pieces(self, text: str) -> List[str]:
        text = " ".join(text.strip().split())
        if not text:
            return []
        s = WORD_BOUNDARY + text.replace(" ", WORD_BOUNDARY)
        out = []
        i = 0
        while i < len(s):
            for j in range(min(len(s), i + self.max_len), i, -1):
                if s[i:j] in self.vocab.word2index:
                    out.append(s[i:j])
                    i = j
                    break
            else:
                out.append(s[i])  # maps to unk downstream
                i += 1
        return out

    def text2tokens(self, text: str) -> List[int]:
        ids = self.vocab.encode(self.encode_as_pieces(text))
        if self.add_sos:
            ids = [self.vocab.word2index["sos"]] + ids
        return ids

    def tokens2text(self, tokens: List[str]) -> str:
        return "".join(tokens).replace(WORD_BOUNDARY, " ").strip()


class CharTokenizer:
    """Character units (Mandarin/Aishell style); spaces dropped."""

    def __init__(self, vocab, add_sos: bool = False, space_char: str = ""):
        self.vocab = vocab
        self.add_sos = add_sos
        self.space_char = space_char

    def encode_as_pieces(self, text: str) -> List[str]:
        out = []
        for ch in text.strip():
            if ch.isspace():
                if self.space_char:
                    out.append(self.space_char)
                continue
            out.append(ch)
        return out

    def text2tokens(self, text: str) -> List[int]:
        ids = self.vocab.encode(self.encode_as_pieces(text))
        if self.add_sos:
            ids = [self.vocab.word2index["sos"]] + ids
        return ids

    def tokens2text(self, tokens: List[str]) -> str:
        if self.space_char:
            return "".join(t if t != self.space_char else " "
                           for t in tokens).strip()
        return "".join(tokens)
