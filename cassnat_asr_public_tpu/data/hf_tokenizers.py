"""GPT-2 byte-level BPE and BERT WordPiece tokenizers (dependency-free).

The reference vendors a GPT-2 byte-pair encoder (src/models/gpt2/encoder.py)
and a BERT WordPiece tokenizer (src/models/bert/tokenization.py) for the
LMNAT text-encoder paths. These are clean-room equivalents operating on the
standard local artifact files (encoder.json + vocab.bpe for GPT-2, vocab.txt
for BERT); no network access is required or attempted.
"""

import json
from typing import Dict, List, Tuple


def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte<->unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class GPT2BPETokenizer:
    def __init__(self, encoder_json: str, vocab_bpe: str):
        with open(encoder_json) as f:
            self.encoder = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(vocab_bpe, encoding="utf-8") as f:
            merges = f.read().split("\n")[1:]
        pairs = [tuple(m.split()) for m in merges if m and len(m.split()) == 2]
        self.bpe_ranks = {p: i for i, p in enumerate(pairs)}
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.cache: Dict[str, str] = {}

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            a, b = best
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        result = " ".join(word)
        self.cache[token] = result
        return result

    def _words(self, text: str) -> List[str]:
        # simplified GPT-2 pretokenization: split keeping leading spaces
        out, cur = [], ""
        for ch in text:
            if ch == " ":
                if cur:
                    out.append(cur)
                cur = " "
            elif ch.isalnum() != (cur.lstrip(" ").isalnum() and
                                  bool(cur.lstrip(" "))) and cur.strip(" "):
                out.append(cur)
                cur = ch
            else:
                cur += ch
        if cur:
            out.append(cur)
        return out

    def text2tokens(self, text: str) -> List[int]:
        ids = []
        for word in self._words(text):
            encoded = "".join(self.byte_encoder[b]
                              for b in word.encode("utf-8"))
            for piece in self._bpe(encoded).split(" "):
                if piece in self.encoder:
                    ids.append(self.encoder[piece])
        return ids

    def tokens2text(self, ids: List[int]) -> str:
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        raw = bytearray(self.byte_decoder.get(c, ord(" ")) for c in text)
        return raw.decode("utf-8", errors="replace")


class BertWordPieceTokenizer:
    """Lower-cased WordPiece with ## continuation (bert-base-uncased)."""

    def __init__(self, vocab_txt: str, lowercase: bool = True):
        self.vocab: Dict[str, int] = {}
        with open(vocab_txt, encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        self.inv = {v: k for k, v in self.vocab.items()}
        self.lowercase = lowercase
        self.unk = self.vocab.get("[UNK]", 100)
        self.cls = self.vocab.get("[CLS]", 101)
        self.sep = self.vocab.get("[SEP]", 102)

    def _wordpiece(self, word: str) -> List[int]:
        out = []
        i = 0
        while i < len(word):
            j = len(word)
            piece = None
            while j > i:
                sub = word[i:j]
                if i > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = self.vocab[sub]
                    break
                j -= 1
            if piece is None:
                return [self.unk]
            out.append(piece)
            i = j
        return out

    def text2tokens(self, text: str, add_special: bool = True) -> List[int]:
        if self.lowercase:
            text = text.lower()
        ids = []
        for word in text.split():
            ids.extend(self._wordpiece(word))
        return [self.cls] + ids + [self.sep] if add_special else ids

    def tokens2text(self, ids: List[int]) -> str:
        pieces = [self.inv.get(int(i), "[UNK]") for i in ids]
        out = []
        for p in pieces:
            if p in ("[CLS]", "[SEP]", "[PAD]"):
                continue
            if p.startswith("##") and out:
                out[-1] = out[-1] + p[2:]
            else:
                out.append(p)
        return " ".join(out)
