"""Vocabulary with the reference's reserved ids.

{blank: 0, sos: 1, eos: 2, unk: 3} then file-order units
(reference: src/data/vocab.py:4-43). The vocab file has one unit per line
("piece [index]" — index column optional and ignored; order defines ids).
"""

RESERVED = ("blank", "sos", "eos", "unk")


def pieces_to_text(pieces):
    """Join subword pieces into a plain sentence.

    Both word-delimiter conventions are handled: SentencePiece '▁'
    (wordpiece recipes) and '<space>' (char-unit recipes, e.g. aishell /
    egs/synth vocab_char). Mirrors the reference's spm_decode + char detok
    (run_art.sh:139, local/prepare_dict_char.py)."""
    return "".join(pieces).replace("▁", " ").replace("<space>", " ").strip()


class Vocab:
    def __init__(self, vocab_file=None, units=None):
        self.word2index = {}
        self.index2word = {}
        for i, w in enumerate(RESERVED):
            self._add(w, i)
        if vocab_file is not None:
            units = []
            with open(vocab_file) as f:
                for line in f:
                    parts = line.strip().split()
                    if not parts:
                        continue
                    units.append(parts[0])
        if units:
            for w in units:
                if w not in self.word2index:
                    self._add(w, len(self.word2index))

    def _add(self, w, i):
        self.word2index[w] = i
        self.index2word[i] = w

    def __len__(self):
        return len(self.word2index)

    @property
    def n_words(self):
        return len(self.word2index)

    def encode(self, tokens):
        unk = self.word2index["unk"]
        return [self.word2index.get(t, unk) for t in tokens]

    def decode(self, ids, strip_special=True):
        out = []
        for i in ids:
            w = self.index2word.get(int(i), "unk")
            if strip_special and w in RESERVED:
                continue
            out.append(w)
        return out
