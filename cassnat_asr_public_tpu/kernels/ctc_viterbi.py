"""Pallas TPU kernel for the CTC Viterbi forward DP.

The alignment DP (reference: src/models/cassnat.py:314-331 — a Python loop
over frames with 3-way transition maxima) runs here as a single Pallas kernel:
the alpha vector lives in VMEM for the whole T loop, per-frame path log-probs
stream from the blocked input, and backpointer offsets are written to the
(B, T, S) output. The backtrace stays the existing jittable reverse scan
(ops/ctc.py) — it is O(T) scalar-ish work.

Adoption is benchmark-gated like the flash-attention kernel: the lax.scan
formulation in ops/ctc.py remains the default; this kernel is the drop-in
`ctc_viterbi_align_pallas` with identical outputs (parity-tested).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cassnat_asr_public_tpu.ops.ctc import (
    LOG_ZERO,
    _collapse_and_shift,
    _interleave_blanks,
    _path_log_probs,
    _same_transition,
)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _viterbi_kernel(lp_ref, same_ref, outside_ref, len_ref, off_ref,
                    alpha_ref, *, tmax: int):
    """One batch-block: lp (BB, T, S) f32; same/outside (BB, S) f32 masks
    (1.0 = blocked); len (BB, S) broadcast frame counts; outputs
    off (BB, T, S) int32 and alpha (BB, S)."""
    bb, _, s = lp_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, s), 1)
    alpha0 = jnp.where(col == 0, 0.0, LOG_ZERO)

    same_blk = same_ref[:] > 0.5
    outside_blk = outside_ref[:] > 0.5
    lens = len_ref[:]  # (BB, S) broadcast copies of the frame count

    def body(t, alpha):
        lp_t = lp_ref[:, t, :].astype(jnp.float32)
        # shift right by 1 / 2 along the path axis
        s1 = jnp.where(col >= 1,
                       jnp.roll(alpha, 1, axis=1), LOG_ZERO)
        s2 = jnp.where(col >= 2,
                       jnp.roll(alpha, 2, axis=1), LOG_ZERO)
        s2 = jnp.where(same_blk, LOG_ZERO, s2)
        # 3-way max with first-max tie-breaking (argmax semantics)
        m01 = jnp.maximum(alpha, s1)
        o01 = jnp.where(s1 > alpha, 1, 0)
        best_val = jnp.maximum(m01, s2)
        off = jnp.where(s2 > m01, 2, o01)
        best_val = jnp.where(outside_blk, LOG_ZERO, best_val)
        new = best_val + lp_t
        active = t < lens
        off_ref[:, t, :] = jnp.where(active, off, 0).astype(jnp.int32)
        return jnp.where(active, new, alpha)

    alpha_ref[:] = jax.lax.fori_loop(0, tmax, body, alpha0)


@functools.partial(jax.jit, static_argnames=("blank", "block_b", "interpret"))
def ctc_viterbi_align_pallas(log_probs, labels, input_lengths, label_lengths,
                             blank: int = 0, block_b: int = 8,
                             interpret: bool = False):
    """Drop-in Pallas variant of ops.ctc.ctc_viterbi_align (no sample_topk).

    Returns (aligned_seq_shift (B, T) int32, states (B, T) int32).
    """
    log_probs = log_probs.astype(jnp.float32)
    bs, tmax, _ = log_probs.shape
    path = _interleave_blanks(labels, blank)
    smax = path.shape[1]
    path_lens = 2 * label_lengths + 1
    lp_path = _path_log_probs(log_probs, path)           # (B, T, S)
    same = _same_transition(path)
    outside = jnp.arange(smax)[None, :] >= path_lens[:, None]

    # pad to hardware-friendly sizes
    s_pad = _round_up(max(smax, 128), 128)
    b_pad = _round_up(bs, block_b)
    lp = jnp.full((b_pad, tmax, s_pad), LOG_ZERO, jnp.float32)
    lp = lp.at[:bs, :, :smax].set(lp_path)
    same_f = jnp.zeros((b_pad, s_pad), jnp.float32)
    same_f = same_f.at[:bs, :smax].set(same.astype(jnp.float32))
    outside_f = jnp.ones((b_pad, s_pad), jnp.float32)
    outside_f = outside_f.at[:bs, :smax].set(outside.astype(jnp.float32))
    lens = jnp.zeros((b_pad,), jnp.int32).at[:bs].set(
        input_lengths.astype(jnp.int32))
    lens_b = jnp.broadcast_to(lens[:, None], (b_pad, s_pad))

    grid = (b_pad // block_b,)
    offs, alpha = pl.pallas_call(
        functools.partial(_viterbi_kernel, tmax=tmax),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, tmax, s_pad), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, tmax, s_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((block_b, tmax, s_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(lp, same_f, outside_f, lens_b.astype(jnp.int32))

    offs = offs[:bs, :, :smax]
    alpha = alpha[:bs, :smax]

    # final state + reverse backtrace (same as ops/ctc.py)
    last = jnp.take_along_axis(alpha, (path_lens - 1)[:, None], axis=1)[:, 0]
    prev = jnp.take_along_axis(
        alpha, jnp.maximum(path_lens - 2, 0)[:, None], axis=1)[:, 0]
    s_final = jnp.where(last > prev, path_lens - 1,
                        jnp.maximum(path_lens - 2, 0))

    ts = jnp.arange(tmax)
    offs_t = jnp.moveaxis(offs, 1, 0)  # (T, B, S)

    def back(carry, xs):
        off_t, t = xs
        cur = jnp.where(t == input_lengths - 1, s_final, carry)
        prev_state = cur - jnp.take_along_axis(off_t, cur[:, None],
                                               axis=1)[:, 0]
        prev_state = jnp.clip(prev_state, 0, smax - 1)
        return prev_state, cur

    _, states_rev = jax.lax.scan(back, s_final, (offs_t[::-1], ts[::-1]))
    states = states_rev[::-1].T

    aligned_seq = jnp.take_along_axis(path, states, axis=1)
    frame_valid = jnp.arange(tmax)[None, :] < input_lengths[:, None]
    aligned_seq = jnp.where(frame_valid, aligned_seq, blank)
    return _collapse_and_shift(aligned_seq, blank), states
