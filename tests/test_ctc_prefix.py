"""CTC prefix scorer vs brute-force CTC forward over explicit prefixes."""

import numpy as np
import jax
import jax.numpy as jnp

from cassnat_asr_public_tpu.ops.ctc import ctc_forward_score, LOG_ZERO
from cassnat_asr_public_tpu.ops.ctc_prefix import (
    initial_state,
    mask_ctc_out,
    prefix_score_step,
)


def _brute_prefix_prob(log_probs, prefix, T, blank=0):
    """log P(prefix is a prefix of the output | X) = sum over paths whose
    collapse starts with `prefix` -> via CTC forward restricted to emitting
    exactly `prefix` then anything. Equivalent: psi from the DP. We compute it
    directly: r_n/r_b recursion per Watanabe."""
    NEG = LOG_ZERO
    L = len(prefix)
    # forward over prefix labels with the standard r recursion
    rn = np.full((L + 1, T), NEG)
    rb = np.full((L + 1, T), NEG)
    # empty prefix: rb = cumsum blank
    acc = 0.0
    for t in range(T):
        acc += log_probs[t, blank]
        rb[0, t] = acc
    for l in range(1, L + 1):
        c = prefix[l - 1]
        prev_last = prefix[l - 2] if l >= 2 else None
        for t in range(T):
            if t == 0:
                rn[l, 0] = log_probs[0, c] if l == 1 else NEG
                rb[l, 0] = NEG
                continue
            phi = np.logaddexp(rn[l - 1, t - 1], rb[l - 1, t - 1]) \
                if c != prev_last else rb[l - 1, t - 1]
            rn[l, t] = np.logaddexp(rn[l, t - 1], phi) + log_probs[t, c]
            rb[l, t] = np.logaddexp(rb[l, t - 1], rn[l, t - 1]) \
                + log_probs[t, blank]
    # psi = rn[L, T-1] summed over "ended by T": prefix prob is
    # logaddexp over t of phi(t-1)+x_t(c) which equals ... simplest check:
    return np.logaddexp(rn[L, T - 1], rb[L, T - 1])


def test_prefix_step_matches_bruteforce(rng):
    bs, tmax, vocab = 2, 12, 6
    logits = rng.normal(size=(bs, tmax, vocab)).astype(np.float32)
    x = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    frame_mask = np.ones((bs, tmax), bool)
    xm = mask_ctc_out(jnp.asarray(x), jnp.asarray(frame_mask))
    r0 = initial_state(xm)

    cs = jnp.asarray(rng.integers(3, vocab, size=(bs, 3)))
    y_last = jnp.asarray([1, 1])  # sos
    psi, r_new = prefix_score_step(xm, cs, y_last, r0, jnp.asarray([True, True]))

    # r_new total prob for candidate c must equal brute-force r for prefix [c]
    for b in range(bs):
        for wi in range(3):
            c = int(cs[b, wi])
            got = np.logaddexp(np.asarray(r_new)[b, wi, -1, 0],
                               np.asarray(r_new)[b, wi, -1, 1])
            expect = _brute_prefix_prob(x[b], [c], tmax)
            np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)

    # second step: extend prefix [c0] by c1
    c0 = int(cs[0, 0])
    r_prev = r_new[:, 0]  # pick candidate 0 for every row
    y_last2 = jnp.asarray([c0, int(cs[1, 0])])
    cs2 = jnp.asarray(rng.integers(3, vocab, size=(bs, 2)))
    psi2, r_new2 = prefix_score_step(xm, cs2, y_last2, r_prev,
                                     jnp.asarray([False, False]))
    for wi in range(2):
        c1 = int(cs2[0, wi])
        got = np.logaddexp(np.asarray(r_new2)[0, wi, -1, 0],
                           np.asarray(r_new2)[0, wi, -1, 1])
        expect = _brute_prefix_prob(x[0], [c0, c1], tmax)
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_prefix_psi_full_sequence_consistency(rng):
    """psi for the full label sequence ~ CTC forward score of that sequence."""
    tmax, vocab = 10, 5
    logits = rng.normal(size=(1, tmax, vocab)).astype(np.float32)
    x = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    frame_mask = jnp.ones((1, tmax), bool)
    xm = mask_ctc_out(x, frame_mask)
    labels = [3, 4, 3]

    r = initial_state(xm)
    y_last = jnp.asarray([1])
    for i, c in enumerate(labels):
        cs = jnp.asarray([[c]])
        psi, r_new = prefix_score_step(xm, cs, y_last, r,
                                       jnp.asarray([i == 0]))
        r = r_new[:, 0]
        y_last = jnp.asarray([c])
    total = np.logaddexp(np.asarray(r)[0, -1, 0], np.asarray(r)[0, -1, 1])
    ref = float(ctc_forward_score(
        x, jnp.asarray([labels]), jnp.asarray([tmax]), jnp.asarray([3]))[0])
    np.testing.assert_allclose(total, ref, rtol=1e-4, atol=1e-4)


def test_prefix_step_associative_matches_sequential(rng):
    """The O(log T) associative-scan formulation == the textbook sequential
    recurrence, at realistic T with masked pad frames and repeated labels."""
    n, tmax, vocab, w = 4, 200, 12, 6
    logits = rng.normal(size=(n, tmax, vocab)).astype(np.float32) * 2.0
    x = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lengths = np.array([200, 157, 93, 10])
    frame_mask = jnp.asarray(np.arange(tmax)[None, :] < lengths[:, None])
    xm = mask_ctc_out(x, frame_mask)

    cs = jnp.asarray(rng.integers(3, vocab, size=(n, w)))
    cs = cs.at[:, 0].set(5)  # force a same-as-last candidate
    y_last = jnp.asarray([5, 5, 1, 1])
    r_prev = initial_state(xm)
    # advance one real step so r_prev is a non-trivial state
    _, r1 = prefix_score_step(xm, cs, y_last, r_prev,
                              jnp.asarray([False, False, True, True]))
    r_prev = r1[:, 1]
    y_last = cs[:, 1]

    psi, r_new = prefix_score_step(xm, cs, y_last, r_prev,
                                   jnp.asarray([False] * n))

    # sequential oracle (the pre-associative formulation)
    xs = np.asarray(jnp.take_along_axis(
        xm.astype(jnp.float32), cs[:, None, :], axis=2))
    xb = np.asarray(xm[:, :, 0], np.float32)
    r_sum = np.logaddexp(np.asarray(r_prev)[:, :, 0],
                         np.asarray(r_prev)[:, :, 1])
    same = np.asarray(cs == y_last[:, None])
    phi = np.where(same[:, None, :], np.asarray(r_prev)[:, :, 1:2],
                   r_sum[:, :, None])
    phi_shift = np.concatenate(
        [np.full((n, 1, w), LOG_ZERO), phi[:, :-1]], axis=1)
    rn = np.full((n, w), LOG_ZERO)
    rb = np.full((n, w), LOG_ZERO)
    psi_seq = np.full((n, w), LOG_ZERO)
    rn_seq = np.zeros((n, tmax, w))
    rb_seq = np.zeros((n, tmax, w))
    for t in range(tmax):
        rn_new = np.logaddexp(rn, phi_shift[:, t]) + xs[:, t]
        rb_new = np.logaddexp(rb, rn) + xb[:, t:t + 1]
        psi_seq = np.logaddexp(psi_seq, phi_shift[:, t] + xs[:, t])
        rn, rb = rn_new, rb_new
        rn_seq[:, t], rb_seq[:, t] = rn, rb

    got_rn = np.asarray(r_new)[..., 0]  # (N, W, T)
    got_rb = np.asarray(r_new)[..., 1]
    np.testing.assert_allclose(got_rn, np.moveaxis(rn_seq, 1, 2),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(got_rb, np.moveaxis(rb_seq, 1, 2),
                               rtol=1e-4, atol=1e-3)
    keep = ~np.asarray((cs == 2) | (cs == 0))
    np.testing.assert_allclose(np.asarray(psi)[keep], psi_seq[keep],
                               rtol=1e-4, atol=1e-3)
