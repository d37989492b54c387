"""Pallas TPU kernels for the CTC loss forward/backward DPs.

The CTC negative log-likelihood (reference: src/models/cassnat.py:126,232 —
torch.nn.CTCLoss) was a lax.scan over frames in ops/ctc.py: T sequential
dispatches of tiny (B, S) updates, latency-bound on TPU exactly like the
Viterbi alignment DP was (kernels/ctc_viterbi.py). Here both the alpha
(forward) and beta/posterior (backward) recursions run as single Pallas
kernels: the DP state lives in VMEM for the whole T loop and the full alpha
trellis is written once so the backward kernel can emit the CTC posterior
gradient directly.

Wired into ops/ctc.py:ctc_forward_score via jax.custom_vjp, gated like the
Viterbi kernel (auto on TPU, scan elsewhere; enable_pallas_ctc_loss forces).
Gradient identity: d logZ / d lp_path[t,s] = exp(alpha[t,s] + beta[t,s]
- lp_path[t,s] - logZ) with alpha and beta both including the emission at t,
then scattered from path states to vocab ids with a one-hot matmul
(MXU-friendly; no take_along_axis scatter on the hot path).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from cassnat_asr_public_tpu.ops.ctc import (
    LOG_ZERO,
    _interleave_blanks,
    _path_log_probs,
    _same_transition,
)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))
    # keep the blocked-everywhere case at LOG_ZERO (log 3 jitter is harmless
    # but this keeps the trellis bit-clean for masking)
    return jnp.where(m <= LOG_ZERO / 2, LOG_ZERO, out)


def _alpha_kernel(lp_ref, same_ref, outside_ref, len_ref,
                  alpha_all_ref, alpha_fin_ref, *, tmax: int):
    """Forward (alpha) DP for one batch block.

    lp (BB, T, S) f32 path log-probs; same/outside (BB, S) f32 masks
    (1.0 = blocked); len (BB, S) broadcast frame counts. Writes the full
    alpha trellis (BB, T, S) (frozen rows past each sample's length, same
    semantics as the lax.scan) and the final alpha (BB, S).
    """
    bb, _, s = lp_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, s), 1)
    alpha0 = jnp.where(col == 0, 0.0, LOG_ZERO)
    same_blk = same_ref[:] > 0.5
    outside_blk = outside_ref[:] > 0.5
    lens = len_ref[:]

    def body(t, alpha):
        lp_t = lp_ref[:, t, :].astype(jnp.float32)
        s1 = jnp.where(col >= 1, jnp.roll(alpha, 1, axis=1), LOG_ZERO)
        s2 = jnp.where(col >= 2, jnp.roll(alpha, 2, axis=1), LOG_ZERO)
        s2 = jnp.where(same_blk, LOG_ZERO, s2)
        new = _logaddexp3(alpha, s1, s2) + lp_t
        new = jnp.where(outside_blk, LOG_ZERO, new)
        alpha = jnp.where(t < lens, new, alpha)
        alpha_all_ref[:, t, :] = alpha
        return alpha

    alpha_fin_ref[:] = jax.lax.fori_loop(0, tmax, body, alpha0)


def _beta_grad_kernel(lp_ref, alpha_ref, same_ref, outside_ref, len_ref,
                      plen_ref, logz_ref, grad_ref, *, tmax: int):
    """Backward (beta) DP + posterior gradient for one batch block.

    beta[t,s] includes the emission at t: init at each sample's last frame
    with lp over the two terminal states, recurrence
    beta[t,s] = lp[t,s] + logsumexp(beta[t+1, s], beta[t+1, s+1],
    beta[t+1, s+2 if path allows]). Emits
    grad[t,s] = exp(alpha[t,s] + beta[t,s] - lp[t,s] - logZ)
    = d logZ / d lp_path[t,s], zero outside valid frames/states.
    """
    bb, _, s = lp_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, s), 1)
    same_blk = same_ref[:] > 0.5
    outside_blk = outside_ref[:] > 0.5
    lens = len_ref[:]
    plens = plen_ref[:]
    logz = logz_ref[:]
    # s -> s+2 is allowed iff path[s+2] != path[s], i.e. NOT same[s+2].
    # Roll the f32 mask, not the bool: Mosaic cannot bitcast i1 vregs.
    same_next2 = jnp.roll(same_ref[:], -2, axis=1) > 0.5
    bad_z = logz <= LOG_ZERO / 2  # impossible sequence: emit zero grads

    beta0 = jnp.full((bb, s), LOG_ZERO, jnp.float32)

    def body(i, beta):
        t = tmax - 1 - i
        lp_t = lp_ref[:, t, :].astype(jnp.float32)
        l1 = jnp.where(col < s - 1, jnp.roll(beta, -1, axis=1), LOG_ZERO)
        l2 = jnp.where((col < s - 2) & (~same_next2),
                       jnp.roll(beta, -2, axis=1), LOG_ZERO)
        new = lp_t + _logaddexp3(beta, l1, l2)
        new = jnp.where(outside_blk, LOG_ZERO, new)
        # terminal frame: only the last blank / last label state emit
        terminal = (col == plens - 1) | ((col == plens - 2) & (plens >= 2))
        init_row = jnp.where(terminal & (~outside_blk), lp_t, LOG_ZERO)
        beta = jnp.where(t == lens - 1, init_row,
                         jnp.where(t < lens, new, beta))
        gamma = alpha_ref[:, t, :].astype(jnp.float32) + beta - lp_t - logz
        p = jnp.exp(jnp.minimum(gamma, 1.0))
        p = jnp.where((t < lens) & (~outside_blk) & (~bad_z), p, 0.0)
        grad_ref[:, t, :] = p
        return beta

    jax.lax.fori_loop(0, tmax, body, beta0)


def _pad_inputs(log_probs, labels, input_lengths, label_lengths, blank,
                block_b):
    log_probs = log_probs.astype(jnp.float32)
    bs, tmax, _ = log_probs.shape
    path = _interleave_blanks(labels, blank)
    smax = path.shape[1]
    path_lens = 2 * label_lengths + 1
    lp_path = _path_log_probs(log_probs, path)  # (B, T, S)
    same = _same_transition(path)
    outside = jnp.arange(smax)[None, :] >= path_lens[:, None]

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
    lens_b = jnp.broadcast_to(lens[:, None], (b_pad, s_pad)).astype(jnp.int32)
    plens = jnp.ones((b_pad,), jnp.int32).at[:bs].set(
        path_lens.astype(jnp.int32))
    plens_b = jnp.broadcast_to(plens[:, None],
                               (b_pad, s_pad)).astype(jnp.int32)
    return (lp, same_f, outside_f, lens_b, plens_b, path, path_lens,
            bs, tmax, smax, s_pad, b_pad)


def _run_alpha(lp, same_f, outside_f, lens_b, tmax, s_pad, b_pad, block_b,
               interpret):
    grid = (b_pad // block_b,)
    return pl.pallas_call(
        functools.partial(_alpha_kernel, tmax=tmax),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, tmax, s_pad), jnp.float32),
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
    )(lp, same_f, outside_f, lens_b)


def _run_beta_grad(lp, alpha_all, same_f, outside_f, lens_b, plens_b, logz_b,
                   tmax, s_pad, b_pad, block_b, interpret):
    grid = (b_pad // block_b,)
    return pl.pallas_call(
        functools.partial(_beta_grad_kernel, tmax=tmax),
        out_shape=jax.ShapeDtypeStruct((b_pad, tmax, s_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, tmax, s_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, tmax, s_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, tmax, s_pad), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(lp, alpha_all, same_f, outside_f, lens_b, plens_b, logz_b)


def _score_from_alpha(alpha_fin, path_lens):
    last = jnp.take_along_axis(alpha_fin, (path_lens - 1)[:, None],
                               axis=1)[:, 0]
    prev = jnp.take_along_axis(
        alpha_fin, jnp.maximum(path_lens - 2, 0)[:, None], axis=1)[:, 0]
    prev = jnp.where(path_lens >= 2, prev, LOG_ZERO)
    return jnp.logaddexp(last, prev)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def ctc_forward_score_pallas(log_probs, labels, input_lengths, label_lengths,
                             blank: int = 0, block_b: int = 8,
                             interpret: bool = False):
    """Drop-in Pallas variant of ops.ctc.ctc_forward_score (custom VJP)."""
    score, _ = _fwd(log_probs, labels, input_lengths, label_lengths,
                    blank, block_b, interpret)
    return score


def _fwd(log_probs, labels, input_lengths, label_lengths, blank, block_b,
         interpret):
    (lp, same_f, outside_f, lens_b, plens_b, path, path_lens,
     bs, tmax, smax, s_pad, b_pad) = _pad_inputs(
        log_probs, labels, input_lengths, label_lengths, blank, block_b)
    alpha_all, alpha_fin = _run_alpha(lp, same_f, outside_f, lens_b, tmax,
                                      s_pad, b_pad, block_b, interpret)
    score = _score_from_alpha(alpha_fin[:bs, :smax], path_lens)
    res = (lp, alpha_all, same_f, outside_f, lens_b, plens_b, path,
           score, log_probs.shape, jnp.zeros((), log_probs.dtype), smax)
    return score, res


def _bwd(blank, block_b, interpret, res, g):
    (lp, alpha_all, same_f, outside_f, lens_b, plens_b, path,
     score, lp_shape, dtype_token, smax) = res
    bs, tmax, vocab = lp_shape
    b_pad, _, s_pad = lp.shape
    logz = jnp.full((b_pad,), LOG_ZERO, jnp.float32).at[:bs].set(score)
    logz_b = jnp.broadcast_to(logz[:, None], (b_pad, s_pad))
    grad_lp = _run_beta_grad(lp, alpha_all, same_f, outside_f, lens_b,
                             plens_b, logz_b, tmax, s_pad, b_pad, block_b,
                             interpret)[:bs, :, :smax]
    # scatter path-state grads to vocab ids: one-hot matmul (MXU) instead of
    # a take_along_axis scatter (CLAUDE.md: broadcast gathers are slow here)
    onehot = jax.nn.one_hot(path, vocab, dtype=jnp.float32)  # (B, S, V)
    grad_logp = jnp.einsum("bts,bsv->btv", grad_lp, onehot)
    grad_logp = grad_logp * g[:, None, None].astype(jnp.float32)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (grad_logp.astype(dtype_token.dtype), f0(path[:, 1::2]),
            f0(jnp.zeros((bs,), jnp.int32)), f0(jnp.zeros((bs,), jnp.int32)))


ctc_forward_score_pallas.defvjp(_fwd, _bwd)
