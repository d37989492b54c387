"""ARPA-format n-gram language model with Katz backoff scoring.

A kenlm replacement for the reference's ESA `rank_model: n-gram` path
(reference: src/tasks/cassnat_task.py:87-90 `kenlm.Model(args.rnnlm)` and
src/models/cassnat.py:521-533 — candidates are detokenized to word strings
and scored with a full-sentence word n-gram score). kenlm is not in this
image, so this implements the standard ARPA text format directly:

  * `\\data\\` ngram counts, `\\n-grams:` sections with
    `log10prob<TAB>w1 ... wn[<TAB>log10backoff]` rows, `\\end\\`,
  * backoff scoring: P(w | c) = p(c, w) if the full n-gram is listed, else
    backoff(c) + P(w | c[1:]) (absent backoff weights are 0),
  * OOV words map to `<unk>` when the model has it, else a fixed floor,
  * `score(sentence)` matches kenlm.Model.score semantics: sum of
    conditional log10 probs of each word given its history, starting from
    `<s>` (bos=True) and including the `</s>` transition (eos=True).

Host-side by design, like the reference: ranking a handful of detokenized
ESA candidates per utterance is string work, not accelerator work.
"""

import gzip
import math
from typing import Dict, Sequence, Tuple

UNK, BOS, EOS = "<unk>", "<s>", "</s>"
_OOV_FLOOR = -100.0  # kenlm-style floor when the model lacks <unk>


class ArpaLM:
    """N-gram LM loaded from an ARPA file (plain text or .gz)."""

    def __init__(self, path: str):
        self.probs: Dict[Tuple[str, ...], float] = {}
        self.backoffs: Dict[Tuple[str, ...], float] = {}
        self.order = 0
        self._load(path)
        self.vocab = {ng[0] for ng in self.probs if len(ng) == 1}

    def _load(self, path: str):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as f:
            section = 0  # current n-gram order being read
            for raw in f:
                line = raw.strip()
                if not line or line.startswith("\\data\\"):
                    continue
                if line.startswith("\\end\\"):
                    break
                if line.endswith("-grams:") and line.startswith("\\"):
                    section = int(line[1:line.index("-")])
                    self.order = max(self.order, section)
                    continue
                if section == 0:
                    continue  # ngram count headers
                parts = line.split("\t")
                if len(parts) < 2:
                    parts = line.split()
                    if len(parts) < section + 1:
                        continue
                    parts = [parts[0], " ".join(parts[1:section + 1])] + \
                        parts[section + 1:]
                ngram = tuple(parts[1].split())
                if len(ngram) != section:
                    continue
                self.probs[ngram] = float(parts[0])
                if len(parts) > 2 and parts[2]:
                    self.backoffs[ngram] = float(parts[2])
        if not self.probs:
            raise ValueError(f"no n-grams parsed from ARPA file {path}")

    # ---- scoring ----
    def _map(self, w: str) -> str:
        if w in self.vocab:
            return w
        return UNK if UNK in self.vocab else w

    def word_score(self, context: Sequence[str], word: str) -> float:
        """log10 P(word | context) with backoff; context already mapped."""
        word = self._map(word)
        if word not in self.vocab:
            return _OOV_FLOOR
        ctx = tuple(context[-(self.order - 1):]) if self.order > 1 else ()
        backoff_sum = 0.0
        while True:
            ng = ctx + (word,)
            if ng in self.probs:
                return backoff_sum + self.probs[ng]
            if not ctx:
                return backoff_sum + _OOV_FLOOR  # unreachable w/ <unk>
            backoff_sum += self.backoffs.get(ctx, 0.0)
            ctx = ctx[1:]

    def score(self, sentence: str, bos: bool = True,
              eos: bool = True) -> float:
        """Total log10 probability of the sentence (kenlm.Model.score)."""
        words = [self._map(w) for w in sentence.split()]
        context = [BOS] if bos and BOS in self.vocab else []
        total = 0.0
        for w in words + ([EOS] if eos and EOS in self.vocab else []):
            total += self.word_score(context, w)
            context.append(w)
        return total

    def perplexity(self, sentence: str) -> float:
        words = sentence.split()
        n = len(words) + 1  # + </s>
        return math.pow(10.0, -self.score(sentence) / max(n, 1))


def arpa_slot_score(lm: "ArpaLM", vocab, ids, n_slots: int) -> float:
    """Shared ESA/CTC n-best reranking term: detokenize ASR ids and return
    the ARPA full-sentence log10 score normalized by the slot count
    (reference cassnat.py:521-533 — tgt_len counts slots incl. the eos
    slot, hence the +1)."""
    from cassnat_asr_public_tpu.data.vocab import pieces_to_text
    pieces = vocab.decode([t for t in ids if t > 2])
    return lm.score(pieces_to_text(pieces)) / max(int(n_slots) + 1, 1)
