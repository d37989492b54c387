"""Blockwise (flash-style) fused attention kernel for TPU via Pallas.

Computes softmax(QK^T * scale + mask_bias) V without materializing the
(Tq, Tk) score matrix in HBM: the kernel streams K/V blocks through VMEM with
a running-max/running-sum online softmax. This is the TPU-native replacement
for the reference's eager attention (reference:
src/models/modules/attention.py:13-24, which materializes scores and the
full attention matrix).

Layout: q (B, H, Tq, D), k/v (B, H, Tk, D), mask (B, Tq, Tk) bool
(True = attend; broadcast over heads like the reference). Grid is
(B*H, Tq/BLOCK_Q); the inner loop walks Tk/BLOCK_K blocks.

Falls back to the XLA path under `interpret=True` on CPU for tests.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu
    _MEMORY_SPACE = pltpu.ANY
except Exception:  # pragma: no cover
    pltpu = None
    _MEMORY_SPACE = None

NEG_INF = -1e30


def default_interpret() -> bool:
    """Interpret-mode fallback on CPU (Mosaic compiles only for TPU)."""
    return jax.default_backend() == "cpu"


def _attn_kernel_bias(q_ref, k_ref, v_ref, mask_ref, bias_ref, o_ref, *,
                      block_k: int, scale: float):
    _attn_body(q_ref, k_ref, v_ref, mask_ref, bias_ref, o_ref,
               block_k=block_k, scale=scale)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int,
                 scale: float):
    _attn_body(q_ref, k_ref, v_ref, mask_ref, None, o_ref,
               block_k=block_k, scale=scale)


def _attn_body(q_ref, k_ref, v_ref, mask_ref, bias_ref, o_ref, *,
               block_k: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale          # (BQ, D)
    tk = k_ref.shape[1]
    bq, d = q.shape
    num_kb = tk // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(i * block_k, block_k)] \
                .astype(jnp.float32)
        m_blk = mask_ref[0, :, pl.ds(i * block_k, block_k)]
        s = jnp.where(m_blk, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, s.max(-1))        # (BQ,)
        correction = jnp.exp(m_prev - m_cur)
        # explicit zeroing: exp(NEG_INF - NEG_INF) would be 1 for rows whose
        # every key so far is masked
        p = jnp.where(m_blk, jnp.exp(s - m_cur[:, None]), 0.0)
        l_cur = l_prev * correction + p.sum(-1)
        acc = acc * correction[:, None] + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    # fully-masked rows: l == 0 -> emit zeros (the reference zeroes masked
    # rows post-softmax, attention.py:138)
    safe_l = jnp.where(l_fin > 0, l_fin, 1.0)
    out = acc / safe_l[:, None]
    out = jnp.where((l_fin > 0)[:, None], out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _pad_to(x, axis, mult, value=0.0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_attention(q, k, v, mask=None, bias=None, block_q: int = 128,
                    block_k: int = 128, interpret: bool = False):
    """softmax(QK^T/sqrt(D) + bias + mask) V with online softmax.

    q: (B, H, Tq, D); k, v: (B, H, Tk, D); mask: (B, Tq, Tk) bool or None;
    bias: (B, H, Tq, Tk) additive scores (already scaled), e.g. the
    Transformer-XL relative-position term. Returns (B, H, Tq, D) in q.dtype.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    if mask is None:
        mask = jnp.ones((b, tq, tk), bool)
    mask = jnp.broadcast_to(mask, (b, tq, tk))

    q_p = _pad_to(q, 2, block_q)
    k_p = _pad_to(k, 2, block_k)
    v_p = _pad_to(v, 2, block_k)
    mask_p = _pad_to(_pad_to(mask, 1, block_q, False), 2, block_k, False)
    tq_p, tk_p = q_p.shape[2], k_p.shape[2]

    qf = q_p.reshape(b * h, tq_p, d)
    kf = k_p.reshape(b * h, tk_p, d)
    vf = v_p.reshape(b * h, tk_p, d)
    # replicate mask over heads lazily via index_map (no H-fold materialize)
    grid = (b * h, tq_p // block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        pl.BlockSpec((1, tk_p, d), lambda bh, i: (bh, 0, 0)),
        pl.BlockSpec((1, tk_p, d), lambda bh, i: (bh, 0, 0)),
        pl.BlockSpec((1, block_q, tk_p), lambda bh, i: (bh // h, i, 0)),
    ]
    args = [qf, kf, vf, mask_p]
    if bias is not None:
        bias_p = _pad_to(_pad_to(bias, 2, block_q), 3, block_k)
        args.append(bias_p.reshape(b * h, tq_p, tk_p))
        in_specs.append(
            pl.BlockSpec((1, block_q, tk_p), lambda bh, i: (bh, i, 0)))
        kern = functools.partial(_attn_kernel_bias, block_k=block_k,
                                 scale=scale)
    else:
        kern = functools.partial(_attn_kernel, block_k=block_k, scale=scale)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        interpret=interpret,
    )(*args)

    return out.reshape(b, h, tq_p, d)[:, :, :tq]


def flash_attention_reference(q, k, v, mask=None):
    """XLA reference implementation (for parity tests)."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(d)
    if mask is not None:
        s = jnp.where(mask[:, None], s, NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        w = jnp.where(mask[:, None], w, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", w,
                      v.astype(jnp.float32)).astype(q.dtype)
