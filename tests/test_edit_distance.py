"""Device-side edit distance + greedy WER counts vs the host oracles.

The jitted metric path (ops/edit_distance.py) replaces the per-step
(B, T', V) logits pull the reference's train loop does for greedy WER
(reference: src/tasks/art_task.py:196-202 -> src/utils/wer.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from cassnat_asr_public_tpu.ops.edit_distance import (
    att_greedy_errors,
    ctc_greedy_errors,
    edit_distance,
)
from cassnat_asr_public_tpu.utils import metrics as M


def test_edit_distance_matches_python_dp():
    rng = np.random.default_rng(0)
    bs, n, m = 16, 21, 17
    hyp = rng.integers(1, 6, size=(bs, n)).astype(np.int32)
    ref = rng.integers(1, 6, size=(bs, m)).astype(np.int32)
    hyp_lens = rng.integers(0, n + 1, size=(bs,)).astype(np.int32)
    ref_lens = rng.integers(0, m + 1, size=(bs,)).astype(np.int32)
    got = np.asarray(jax.jit(edit_distance)(
        jnp.asarray(hyp), jnp.asarray(hyp_lens),
        jnp.asarray(ref), jnp.asarray(ref_lens)))
    for b in range(bs):
        want = M._py_edit_distance(list(hyp[b, :hyp_lens[b]]),
                                   list(ref[b, :ref_lens[b]]))
        assert got[b] == want, (b, got[b], want)


def _random_labels(rng, bs, lmax, vmax):
    """Padded label rows: tokens in [3, vmax), then eos(2), then pads."""
    lens = rng.integers(1, lmax - 1, size=(bs,))
    lab = np.zeros((bs, lmax), np.int32)
    for b in range(bs):
        lab[b, :lens[b]] = rng.integers(3, vmax, size=(lens[b],))
        lab[b, lens[b]] = 2
    return lab, lens.astype(np.int32)


def test_ctc_greedy_errors_matches_host():
    rng = np.random.default_rng(1)
    bs, t, v, lmax = 6, 25, 12, 10
    logits = rng.normal(size=(bs, t, v)).astype(np.float32)
    feat_sizes = rng.integers(5, t + 1, size=(bs,)).astype(np.int32)
    lab, lens = _random_labels(rng, bs, lmax, v)
    # one batch-padding row
    lab[-1] = 0
    lens[-1] = 0
    fmask = np.arange(t)[None, :] < feat_sizes[:, None]
    errs, toks = jax.jit(ctc_greedy_errors)(
        jnp.asarray(logits), jnp.asarray(fmask), jnp.asarray(lab),
        jnp.asarray(lens))
    w_errs, w_toks = M.ctc_greedy_wer(logits, lab, feat_sizes)
    assert int(toks) == w_toks
    assert int(errs) == w_errs


def test_att_greedy_errors_matches_host():
    rng = np.random.default_rng(2)
    bs, u, v, lmax = 6, 12, 12, 12
    logits = rng.normal(size=(bs, u, v)).astype(np.float32)
    # force some eos hits
    logits[1, 4, 2] += 10
    logits[3, 0, 2] += 10
    lab, lens = _random_labels(rng, bs, lmax, v)
    lab[-1] = 0
    lens[-1] = 0
    errs, toks = jax.jit(att_greedy_errors)(
        jnp.asarray(logits), jnp.asarray(lab), jnp.asarray(lens))
    w_errs, w_toks = M.att_greedy_wer(logits, lab)
    assert int(toks) == w_toks
    assert int(errs) == w_errs
