"""CTC op parity tests.

- ctc_loss vs torch.nn.CTCLoss (CPU torch is available as an oracle).
- ctc_viterbi_align vs a brute-force NumPy Viterbi on tiny inputs.
- trigger mask semantics vs hand-worked examples mirroring the reference's
  shift/cumsum construction (reference: src/models/cassnat.py:344-365).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from cassnat_asr_public_tpu.ops import (
    align_to_trigger_mask,
    ctc_best_path_align,
    ctc_greedy_collapse,
    ctc_loss,
    ctc_forward_score,
    ctc_viterbi_align,
    expand_trigger_mask,
)


def _random_batch(rng, bs=4, tmax=27, umax=9, vocab=11):
    logits = rng.normal(size=(bs, tmax, vocab)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lengths = rng.integers(umax * 2 + 2, tmax + 1, size=(bs,))
    input_lengths[0] = tmax
    label_lengths = rng.integers(1, umax + 1, size=(bs,))
    labels = rng.integers(1, vocab, size=(bs, umax))
    labels = labels * (np.arange(umax)[None, :] < label_lengths[:, None])
    return log_probs, labels, input_lengths, label_lengths


def test_ctc_loss_matches_torch(rng):
    log_probs, labels, in_lens, lab_lens = _random_batch(rng)
    got = ctc_loss(log_probs, jnp.asarray(labels), jnp.asarray(in_lens),
                   jnp.asarray(lab_lens), reduction="none")
    ref = torch.nn.CTCLoss(reduction="none", zero_infinity=True)(
        torch.tensor(np.asarray(log_probs)).transpose(0, 1),
        torch.tensor(labels),
        torch.tensor(in_lens),
        torch.tensor(lab_lens),
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_loss_mean_matches_torch(rng):
    log_probs, labels, in_lens, lab_lens = _random_batch(rng)
    got = ctc_loss(log_probs, jnp.asarray(labels), jnp.asarray(in_lens),
                   jnp.asarray(lab_lens), reduction="mean")
    ref = torch.nn.CTCLoss(reduction="mean", zero_infinity=True)(
        torch.tensor(np.asarray(log_probs)).transpose(0, 1),
        torch.tensor(labels), torch.tensor(in_lens), torch.tensor(lab_lens))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4, atol=1e-5)


def test_ctc_loss_grad_finite(rng):
    log_probs, labels, in_lens, lab_lens = _random_batch(rng, bs=2, tmax=15, umax=4)

    def f(lp):
        return ctc_loss(lp, jnp.asarray(labels), jnp.asarray(in_lens),
                        jnp.asarray(lab_lens))

    g = jax.grad(f)(log_probs)
    assert np.isfinite(np.asarray(g)).all()


def _brute_force_viterbi(log_probs, labels, T, U, blank=0):
    """Exhaustive max-prob CTC path for one sample (tiny sizes only)."""
    path = [blank]
    for y in labels[:U]:
        path += [int(y), blank]
    S = len(path)
    NEG = -1e10
    alpha = np.full((T + 1, S), NEG)
    alpha[0, 0] = 0.0
    bp = np.zeros((T + 1, S), np.int64)
    for t in range(T):
        for s in range(S):
            cands = [alpha[t, s]]
            idxs = [s]
            if s >= 1:
                cands.append(alpha[t, s - 1]); idxs.append(s - 1)
            if s >= 2 and path[s] != path[s - 2]:
                cands.append(alpha[t, s - 2]); idxs.append(s - 2)
            k = int(np.argmax(cands))
            alpha[t + 1, s] = cands[k] + log_probs[t, path[s]]
            bp[t + 1, s] = idxs[k]
    s = S - 1 if alpha[T, S - 1] > alpha[T, S - 2] else S - 2
    states = [0] * T
    for t in range(T, 0, -1):
        states[t - 1] = s
        s = bp[t, s]
    return np.array([path[s] for s in states]), alpha


def test_viterbi_align_matches_bruteforce(rng):
    bs, tmax, umax, vocab = 5, 14, 4, 7
    logits = rng.normal(size=(bs, tmax, vocab)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    in_lens = rng.integers(2 * umax + 1, tmax + 1, size=(bs,))
    lab_lens = rng.integers(1, umax + 1, size=(bs,))
    labels = rng.integers(1, vocab, size=(bs, umax))
    labels = labels * (np.arange(umax)[None] < lab_lens[:, None])

    shift, states = ctc_viterbi_align(
        jnp.asarray(log_probs), jnp.asarray(labels), jnp.asarray(in_lens),
        jnp.asarray(lab_lens))
    shift = np.asarray(shift)

    for b in range(bs):
        T, U = int(in_lens[b]), int(lab_lens[b])
        fw, _ = _brute_force_viterbi(log_probs[b], labels[b], T, U)
        # Reconstruct aligned_seq_shift from brute-force framewise tokens.
        full = np.zeros(tmax, np.int64)
        full[:T] = fw
        prev = np.concatenate([[0], full[:-1]])
        firsts = np.where(full == prev, 0, full)
        expect = np.concatenate([[0], firsts[:-1]])
        np.testing.assert_array_equal(shift[b], expect)


def test_viterbi_recovers_clean_alignment():
    # A peaked distribution: the alignment must match the obvious segmentation.
    vocab, blank = 5, 0
    frames = [0, 3, 3, 0, 2, 2, 2, 4]  # _, C, C, _, A, A, A, B
    T = len(frames)
    lp = np.full((1, T, vocab), -20.0, np.float32)
    for t, v in enumerate(frames):
        lp[0, t, v] = 0.0
    labels = np.array([[3, 2, 4]])
    shift, _ = ctc_viterbi_align(jnp.asarray(lp), jnp.asarray(labels),
                                 jnp.asarray([T]), jnp.asarray([3]))
    # firsts = [0,3,0,0,2,0,0,4] -> shift right by one
    np.testing.assert_array_equal(
        np.asarray(shift)[0], [0, 0, 3, 0, 0, 2, 0, 0])


def test_trigger_mask_semantics():
    # aligned_seq_shift (0,0,C,0,0,A,0,0) with 8 frames, 2 tokens:
    # token 0 attends frames [0,1] plus... cumsum = 0,0,1,1,1,2,2,2
    shift = jnp.asarray([[0, 0, 3, 0, 0, 2, 0, 0]])
    frame_mask = jnp.ones((1, 8), bool)
    ylen = jnp.asarray([2])
    trig = align_to_trigger_mask(shift, 4, frame_mask, jnp.asarray([8]), ylen)
    expect = np.zeros((4, 8), bool)
    expect[0, 0:2] = True   # cumsum == 0
    expect[1, 2:5] = True   # cumsum == 1
    expect[2, 5:8] = True   # cumsum == 2
    expect[2, 7] = True     # eos slot index ylen=2 gets last frame
    np.testing.assert_array_equal(np.asarray(trig)[0], expect)


def test_expand_trigger_mask():
    trig = jnp.zeros((1, 2, 6), bool).at[0, 0, 2:4].set(True)
    right = expand_trigger_mask(trig, 0, 1)
    assert np.asarray(right)[0, 0].tolist() == [False, False, True, True, True, False]
    left = expand_trigger_mask(trig, 1, 0)
    assert np.asarray(left)[0, 0].tolist() == [False, True, True, True, False, False]


def test_best_path_align_and_greedy():
    vocab = 5
    frames = [0, 3, 3, 0, 2, 2, 4, 0]
    T = len(frames)
    lp = np.full((1, T, vocab), -20.0, np.float32)
    for t, v in enumerate(frames):
        lp[0, t, v] = 0.0
    mask = jnp.ones((1, T), bool)
    shift, ylen = ctc_best_path_align(jnp.asarray(lp), mask)
    np.testing.assert_array_equal(np.asarray(shift)[0], [0, 0, 3, 0, 0, 2, 0, 4])
    assert int(ylen[0]) == 3

    toks, lens = ctc_greedy_collapse(jnp.asarray(lp), mask)
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(toks)[0, :3], [3, 2, 4])


def test_best_path_align_sampled_keeps_best_rows(rng):
    bs, tmax, vocab, sample_num = 6, 10, 8, 3
    logits = rng.normal(size=(bs, tmax, vocab)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    mask = jnp.ones((bs, tmax), bool)
    key = jax.random.PRNGKey(0)
    shift_s, _ = ctc_best_path_align(lp, mask, sample_num=sample_num,
                                     threshold=2.0, rng=key)
    shift_b, _ = ctc_best_path_align(lp, mask)
    # Rows 0 and 3 are "include_best" rows: identical to pure argmax.
    np.testing.assert_array_equal(np.asarray(shift_s)[0], np.asarray(shift_b)[0])
    np.testing.assert_array_equal(np.asarray(shift_s)[3], np.asarray(shift_b)[3])


def test_ctc_sampled_align_matches_expanded_path(rng):
    """ctc_sampled_align (top-2 before expansion) == the pre-expanded
    ctc_best_path_align semantics."""
    from cassnat_asr_public_tpu.ops.ctc import ctc_sampled_align
    bs, tmax, vocab, s = 2, 12, 9, 4
    logits = rng.normal(size=(bs, tmax, vocab)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    mask = jnp.asarray(np.array([[True] * 12, [True] * 9 + [False] * 3]))
    key = jax.random.PRNGKey(3)

    # threshold=0: no frame is low-confidence -> every row is the pure
    # argmax path of its utterance.
    shift, ylen = ctc_sampled_align(lp, mask, s, threshold=0.0, rng=key)
    shift_b, ylen_b = ctc_best_path_align(lp, mask)
    assert shift.shape == (bs * s, tmax)
    for i in range(bs):
        for j in range(s):
            np.testing.assert_array_equal(np.asarray(shift)[i * s + j],
                                          np.asarray(shift_b)[i])
    np.testing.assert_array_equal(np.asarray(ylen).reshape(bs, s)[:, 0],
                                  np.asarray(ylen_b))

    # threshold=2 (every frame low-confidence): include_best rows stay the
    # argmax path; sampled rows only ever use per-frame top-2 symbols.
    shift_s, _ = ctc_sampled_align(lp, mask, s, threshold=2.0, rng=key)
    for i in range(bs):
        np.testing.assert_array_equal(np.asarray(shift_s)[i * s],
                                      np.asarray(shift_b)[i])
    # every emitted token id must come from that utterance's per-frame
    # top-2 set (the sampling universe).
    top2 = np.asarray(jax.lax.top_k(lp, 2)[1])
    for i in range(bs):
        allowed = set(top2[i].ravel().tolist()) | {0}
        emitted = set(np.asarray(shift_s)[i * s:(i + 1) * s].ravel().tolist())
        assert emitted <= allowed


def test_viterbi_sample_topk_runs(rng):
    log_probs, labels, in_lens, lab_lens = _random_batch(rng, bs=3, tmax=20, umax=5)
    shift, _ = ctc_viterbi_align(
        log_probs, jnp.asarray(labels), jnp.asarray(in_lens),
        jnp.asarray(lab_lens), sample_topk=4, rng=jax.random.PRNGKey(1))
    assert np.asarray(shift).shape == (3, 20)
    # Sampled alignment still has exactly lab_lens tokens per row.
    np.testing.assert_array_equal(
        np.asarray((shift != 0).sum(1)), lab_lens)
