"""ARPA n-gram LM scorer (kenlm replacement for ESA n-gram ranking).

Hand-computed backoff oracle on a tiny bigram model, OOV/<unk> handling,
and the host-side candidate-ranking hook of CassNATTask.
"""

import numpy as np
import pytest

ARPA = """\
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-1.0\t<unk>
-0.30103\t<s>\t-0.30103
-0.69897\t</s>
-0.52\ta\t-0.30103
-0.82\tb\t-0.15

\\2-grams:
-0.26\t<s> a
-0.52\ta b
-0.3\tb </s>
-0.9\ta a

\\end\\
"""


@pytest.fixture()
def lm(tmp_path):
    from cassnat_asr_public_tpu.utils.ngram_lm import ArpaLM
    p = tmp_path / "tiny.arpa"
    p.write_text(ARPA)
    return ArpaLM(str(p))


def test_loaded_counts(lm):
    assert lm.order == 2
    assert len([g for g in lm.probs if len(g) == 1]) == 5
    assert len([g for g in lm.probs if len(g) == 2]) == 4


def test_direct_bigram_path(lm):
    # all transitions present as bigrams: -0.26 + -0.52 + -0.3
    np.testing.assert_allclose(lm.score("a b"), -1.08, atol=1e-6)


def test_backoff_path(lm):
    # P(b|<s>) = bo(<s>) + P(b); P(a|b) = bo(b) + P(a);
    # P(</s>|a) = bo(a) + P(</s>)
    want = (-0.30103 - 0.82) + (-0.15 - 0.52) + (-0.30103 - 0.69897)
    np.testing.assert_allclose(lm.score("b a"), want, atol=1e-6)


def test_oov_maps_to_unk(lm):
    # c -> <unk>: P(a|<s>) + [bo(a) + P(<unk>)] + [bo(<unk>)=0 + P(</s>)]
    want = -0.26 + (-0.30103 - 1.0) + (0.0 - 0.69897)
    np.testing.assert_allclose(lm.score("a c"), want, atol=1e-6)


def test_bos_eos_flags(lm):
    # no bos: P(a) unigram; no eos: stop after last word
    np.testing.assert_allclose(lm.score("a", bos=False, eos=False), -0.52,
                               atol=1e-6)


def test_perplexity_positive(lm):
    assert lm.perplexity("a b") > 1.0


def test_task_rank_ngram_hook(lm):
    """_rank_ngram picks the candidate the word LM prefers."""
    from cassnat_asr_public_tpu.tasks.cassnat_task import CassNATTask

    class _Vocab:
        index2word = {3: "▁a", 4: "▁b", 5: "▁zzz"}

        def decode(self, ids, strip_special=True):
            return [self.index2word[int(i)] for i in ids]

    task = CassNATTask.__new__(CassNATTask)
    task.vocab = _Vocab()
    task.lm_model = lm
    # utt0: cand0 = "a b" (in-domain), cand1 = "zzz zzz" (OOV) -> pick 0
    # utt1: cand0 = "b" vs cand1 = "a" -> "a" scores higher -> pick 1
    cand_tokens = np.array([
        [[3, 4, 0], [5, 5, 0]],
        [[4, 0, 0], [3, 0, 0]],
    ], np.int32)
    cand_lengths = np.array([[2, 2], [1, 1]], np.int32)
    out = task._rank_ngram({"cand_tokens": cand_tokens,
                            "cand_lengths": cand_lengths})
    assert out["tokens"].shape == (2, 3)
    np.testing.assert_array_equal(out["tokens"][0], [3, 4, 0])
    np.testing.assert_array_equal(out["tokens"][1], [3, 0, 0])
    np.testing.assert_array_equal(out["lengths"], [2, 1])


def test_ctc_task_nbest_ngram_rerank(lm):
    """CTCTask._rerank_nbest_ngram combines beam scores with the
    normalized ARPA sentence score over the device n-best."""
    from cassnat_asr_public_tpu.tasks.ctc_task import CTCTask

    class _Vocab:
        index2word = {3: "▁a", 4: "▁b", 5: "▁zzz"}

        def decode(self, ids, strip_special=True):
            return [self.index2word[int(i)] for i in ids]

    task = CTCTask.__new__(CTCTask)
    task.vocab = _Vocab()
    task.lm_model = lm
    # utt0: beam scores tie -> LM decides between "a b" and "zzz zzz"
    # utt1: LM prefers "a" but a big beam-score gap keeps "b"
    toks = np.array([
        [[3, 4, 0], [5, 5, 0]],
        [[4, 0, 0], [3, 0, 0]],
    ], np.int32)
    lens = np.array([[2, 2], [1, 1]], np.int32)
    scores = np.array([[0.0, 0.0], [0.0, -100.0]], np.float32)
    hyps = task._rerank_nbest_ngram(toks, lens, scores, lm_w=1.0)
    assert hyps[0] == [3, 4]
    assert hyps[1] == [4]
    # with the gap removed the LM flips utt1 to "a"
    scores2 = np.array([[0.0, 0.0], [0.0, 0.0]], np.float32)
    hyps2 = task._rerank_nbest_ngram(toks, lens, scores2, lm_w=1.0)
    assert hyps2[1] == [3]
