"""Fused conformer encoder layer as two Pallas kernels (the "megakernel").

Motivation (PARITY.md r2 roadmap / VERDICT r2 item 4): at decode shapes
(B=32, T'=184, d=512) every encoder submodule measures ~0.5 ms standalone
vs ~0.06 ms FLOP roofline — the layer is small-tensor/HBM-bound. These
kernels keep the residual stream and every intermediate in VMEM across
ffn½ → rel-attention (half A) and conv-module → ffn½ (half B) — one grid
step per batch row; weights are constant blocks fetched once per layer —
so HBM traffic per layer drops to x-in + x-out + weights, plus one
residual round-trip between the halves (a single full-layer kernel trips
a Mosaic-internal "Invalid input layout" at production shapes; see
conformer_layer_fused).

Numerics mirror nn/blocks.ConEncoderLayer exactly (same sublayer
pre-norms with Bessel-variance LayerNorm, compact clamped-table relative
attention with pos_bias_u/v, GLU + depthwise conv + GroupNorm(1) + swish,
0.5-scaled FFN halves; reference: src/models/blocks/conformer_blocks.py +
src/models/modules/*), with bf16 matmuls / f32 statistics like the XLA
path. The position projection p = pos_table @ W_pos is input-independent
and precomputed per layer outside the kernel.

Used by `fused_encode` (decode-time, inference only — no custom VJP);
gated by `enable_conformer_megakernel` with the XLA encoder as default
until the end-to-end A/B on-chip says otherwise (CLAUDE.md: trust
bench.py end-to-end, not standalone microbenches).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_MIN = -1e9

_MEGAKERNEL = False


def enable_conformer_megakernel(on: bool):
    global _MEGAKERNEL
    _MEGAKERNEL = on


def megakernel_enabled() -> bool:
    return _MEGAKERNEL


def _layernorm(x32, scale, bias):
    """LayerNorm with the reference numerics (Bessel std, eps outside):
    scale * (x - mean) / (sqrt(var_bessel + 1e-12) + 1e-6) + bias.

    scale/bias may be (D,) or (1, D) — Mosaic prefers 2D operands, so
    in-kernel callers pass (1, D) rows."""
    d = x32.shape[-1]
    scale = scale.reshape(1, d)
    bias = bias.reshape(1, d)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True) \
        * (d / max(d - 1, 1))
    std = jnp.sqrt(var + 1e-12)
    return scale * (x32 - mean) / (std + 1e-6) + bias


def _mm(a32, w_ref, b, cdtype):
    """bf16 matmul with f32 accumulation (+ optional (1, F) bias row), like
    nn.Dense(dtype=bf16) followed by the XLA f32 upcast."""
    out = jax.lax.dot_general(
        a32.astype(cdtype), w_ref[:, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32).reshape(1, -1)
    return out


def _layer_half_a_kernel(
        # per-batch-row blocks
        x_ref, mask_ref,
        # packed norms (10, D) f32: ff1 s/b, attn s/b, conv s/b, ff2 s/b,
        # groupnorm s/b
        norms_ref,
        # ffn1
        w1a_ref, b1a_ref, w2a_ref, b2a_ref,
        # attention
        wq_ref, wk_ref, wv_ref, wo_ref, battn_ref,  # battn (4, D): q/k/v/o
        p_ref, ubias_ref,                            # p (2R+1, D); u/v (2, D)
        # output
        out_ref,
        *, n_head: int, r_eff: int):
    t, d = x_ref.shape[1], x_ref.shape[2]
    h = n_head
    dk = d // h
    cdtype = x_ref.dtype

    def mm(a32, w_ref, b=None):
        return _mm(a32, w_ref, b, cdtype)

    x = x_ref[0].astype(jnp.float32)                     # (T, D)
    maskf = mask_ref[0].astype(jnp.float32)              # (1, T)

    # ---- ff1 (scale 0.5) ----
    hln = _layernorm(x, norms_ref[0:1, :], norms_ref[1:2, :])
    hmid = mm(hln, w1a_ref, b1a_ref[0:1, :])
    hmid = hmid * jax.nn.sigmoid(hmid)                   # swish
    hout = mm(hmid.astype(jnp.float32), w2a_ref, b2a_ref[0:1, :])
    x = x + 0.5 * hout

    # ---- relative-position self-attention ----
    hln = _layernorm(x, norms_ref[2:3, :], norms_ref[3:4, :])
    q = mm(hln, wq_ref, battn_ref[0:1, :])               # (T, D)
    k = mm(hln, wk_ref, battn_ref[1:2, :])
    v = mm(hln, wv_ref, battn_ref[2:3, :])
    u_bias = ubias_ref[0:1, :].astype(jnp.float32)       # (1, D)
    v_bias = ubias_ref[1:2, :].astype(jnp.float32)
    inv_sqrt_dk = 1.0 / math.sqrt(dk)
    # relative-offset map, clipped: off[qi, ki] in [0, 2r_eff]
    qi = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    ki = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    off = jnp.clip(ki - qi, -r_eff, r_eff) + r_eff
    kmask = maskf > 0.5                                  # (1, T) key mask

    # add u/v biases at full width BEFORE the per-head lane slicing:
    # adding two 64-lane-offset slices trips a Mosaic layout conflict
    # ("Invalid input layout" on the add) while full-width adds are fine
    qu_full = (q + u_bias).astype(cdtype)                # (T, D)
    qv_full = (q + v_bias).astype(cdtype)
    ctx_heads = []
    for hd in range(h):
        sl = slice(hd * dk, (hd + 1) * dk)
        k_h = k[:, sl]
        v_h = v[:, sl]
        p_h = p_ref[:, sl].astype(cdtype)                # (2R+1, dk)
        qu = qu_full[:, sl]
        qv = qv_full[:, sl]
        scores = jax.lax.dot_general(
            qu, k_h.astype(cdtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_dk   # (T, T)
        small = jax.lax.dot_general(
            qv, p_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_dk   # (T, 2R+1)
        # Toeplitz expansion: scores[qi, ki] += small[qi, off[qi, ki]]
        for o in range(2 * r_eff + 1):
            scores = scores + jnp.where(off == o, small[:, o:o + 1], 0.0)
        scores = jnp.where(kmask, scores, MASK_MIN)
        smax = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - smax)
        e = jnp.where(kmask, e, 0.0)
        # fully-masked rows (all-pad utterances in a partial batch) must
        # yield zero weights, not 0/0=NaN — mirror nn/modules.py post-zero
        w = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        ctx_h = jax.lax.dot_general(
            w.astype(cdtype), v_h.astype(cdtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ctx_heads.append(ctx_h)
    ctx = jnp.concatenate(ctx_heads, axis=1)             # (T, D)
    x = x + mm(ctx, wo_ref, battn_ref[3:4, :])

    out_ref[0] = x.astype(out_ref.dtype)


def _layer_half_b_kernel(
        x_ref, norms_ref,
        # ffn2
        w1b_ref, b1b_ref, w2b_ref, b2b_ref,
        # conv module
        pw1_ref, pw1b_ref, dw_ref, dwb_ref, pw2_ref, pw2b_ref,
        out_ref):
    t, d = x_ref.shape[1], x_ref.shape[2]
    cdtype = x_ref.dtype

    def mm(a32, w_ref, b=None):
        return _mm(a32, w_ref, b, cdtype)

    x = x_ref[0].astype(jnp.float32)                     # (T, D)

    # ---- conv module: pw1 -> GLU -> depthwise -> GroupNorm -> swish -> pw2
    hln = _layernorm(x, norms_ref[4:5, :], norms_ref[5:6, :])
    pw = mm(hln, pw1_ref, pw1b_ref[0:1, :])              # (T, 2D)
    g = pw[:, :d] * jax.nn.sigmoid(pw[:, d:])            # GLU
    # SAME depthwise conv, kernel K: out[t] = sum_j g[t + j - (K-1)//2] * w[j]
    # (XLA SAME pads (K-1)//2 low / K//2 high — identical for odd K, and
    # the asymmetric split keeps even K aligned with the XLA encoder)
    kk = dw_ref.shape[0]
    # zero-pad once, then accumulate static shifted slices: scatter-style
    # .at[].add does not lower in Mosaic (gather/scatter is 2D-only)
    gpad = jnp.concatenate([jnp.zeros(((kk - 1) // 2, d), jnp.float32), g,
                            jnp.zeros((kk // 2, d), jnp.float32)], axis=0)
    acc = jnp.zeros((t, d), jnp.float32)
    for j in range(kk):
        wj = dw_ref[j:j + 1, :].astype(jnp.float32)
        acc = acc + gpad[j:j + t, :] * wj
    acc = acc + dwb_ref[0:1, :].astype(jnp.float32)
    # GroupNorm(1): flax numerics — (x-mean)*rsqrt(var+1e-5), stats over
    # the whole (T, C) block
    gmean = jnp.mean(acc)
    gvar = jnp.mean((acc - gmean) ** 2)
    gn = (acc - gmean) * jax.lax.rsqrt(gvar + 1e-5)
    gn = gn * norms_ref[8:9, :] + norms_ref[9:10, :]
    gn = gn * jax.nn.sigmoid(gn)                         # swish
    x = x + mm(gn, pw2_ref, pw2b_ref[0:1, :])

    # ---- ff2 (scale 0.5) ----
    hln = _layernorm(x, norms_ref[6:7, :], norms_ref[7:8, :])
    hmid = mm(hln, w1b_ref, b1b_ref[0:1, :])
    hmid = hmid * jax.nn.sigmoid(hmid)
    hout = mm(hmid.astype(jnp.float32), w2b_ref, b2b_ref[0:1, :])
    x = x + 0.5 * hout

    out_ref[0] = x.astype(out_ref.dtype)


def _pack_norms(lp):
    rows = []
    for name in ("sub_ff1", "sub_attn", "sub_conv", "sub_ff2"):
        rows.append(lp[name]["norm"]["scale"])
        rows.append(lp[name]["norm"]["bias"])
    rows.append(lp["conv"]["norm"]["scale"])
    rows.append(lp["conv"]["norm"]["bias"])
    return jnp.stack([r.astype(jnp.float32) for r in rows])


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def conformer_layer_fused(lp, x, maskf, pos_table, n_head: int = 8,
                          interpret: bool = False):
    """Apply one fused conformer layer as TWO Pallas kernels.

    Half A = ffn½ + relative-position attention, half B = conv-module +
    ffn½. A single full-layer kernel trips a Mosaic-internal "Invalid
    input layout" at production shapes even though every stage compiles
    in isolation (all inputs/ops verified individually on v5e) — the
    two-half split keeps ~all of the fusion win (intermediates stay in
    VMEM within each half; the residual stream makes one extra HBM
    round-trip between halves) while staying inside what Mosaic compiles.

    lp: the layer's param subtree (params['encoder']['layer{i}']);
    x: (B, T, D) compute-dtype activations; maskf: (B, T) float 1/0;
    pos_table: the (2R+1, D) clamped rel-PE table already sliced to
    r_eff = min(R, T-1) rows (as RelativePositionalEncoding emits).
    """
    b, t, d = x.shape
    cdtype = x.dtype
    if not interpret and jax.default_backend() == "cpu":
        interpret = True      # Pallas CPU backend is interpret-only
    r_eff = (pos_table.shape[0] - 1) // 2
    att = lp["self_attn"]
    # input-independent position projection (no bias)
    p = jnp.dot(pos_table.astype(cdtype), att["pos"]["kernel"].astype(cdtype),
                preferred_element_type=jnp.float32).astype(cdtype)
    battn = jnp.stack([att[k]["bias"].astype(jnp.float32)
                       for k in ("q", "k", "v", "out")])
    ubias = jnp.stack([att["pos_bias_u"].reshape(-1).astype(jnp.float32),
                       att["pos_bias_v"].reshape(-1).astype(jnp.float32)])
    cv = lp["conv"]
    norms = _pack_norms(lp)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i, _nd=None: (0,) * a.ndim)

    def row3_spec(shape):
        return pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0))

    cparams = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)

    args_a = (
        # mask as (B, 1, T): TPU block specs need the last two block dims
        # divisible by (8, 128) or equal to the array dims — a (1, T) block
        # over (B, T) is neither; (1, 1, T) over (B, 1, T) is.
        x, maskf.astype(jnp.float32)[:, None, :],
        norms,
        lp["ff1"]["Dense_0"]["kernel"].astype(cdtype),
        lp["ff1"]["Dense_0"]["bias"].astype(jnp.float32)[None],
        lp["ff1"]["Dense_1"]["kernel"].astype(cdtype),
        lp["ff1"]["Dense_1"]["bias"].astype(jnp.float32)[None],
        att["q"]["kernel"].astype(cdtype),
        att["k"]["kernel"].astype(cdtype),
        att["v"]["kernel"].astype(cdtype),
        att["out"]["kernel"].astype(cdtype),
        battn, p, ubias,
    )
    in_specs_a = [row3_spec(x.shape),
                  pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0))]         + [const_spec(a) for a in args_a[2:]]
    kern_a = functools.partial(_layer_half_a_kernel, n_head=n_head,
                               r_eff=r_eff)
    x = pl.pallas_call(
        kern_a,
        grid=(b,),
        in_specs=in_specs_a,
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), cdtype),
        interpret=interpret,
        compiler_params=cparams,
    )(*args_a)

    args_b = (
        x, norms,
        lp["ff2"]["Dense_0"]["kernel"].astype(cdtype),
        lp["ff2"]["Dense_0"]["bias"].astype(jnp.float32)[None],
        lp["ff2"]["Dense_1"]["kernel"].astype(cdtype),
        lp["ff2"]["Dense_1"]["bias"].astype(jnp.float32)[None],
        cv["pointwise1"]["kernel"][0].astype(cdtype),     # (D, 2D)
        cv["pointwise1"]["bias"].astype(jnp.float32)[None],
        cv["depthwise"]["kernel"][:, 0, :].astype(jnp.float32),  # (K, D)
        cv["depthwise"]["bias"].astype(jnp.float32)[None],
        cv["pointwise2"]["kernel"][0].astype(cdtype),
        cv["pointwise2"]["bias"].astype(jnp.float32)[None],
    )
    in_specs_b = [row3_spec(x.shape)] + [const_spec(a) for a in args_b[1:]]
    return pl.pallas_call(
        _layer_half_b_kernel,
        grid=(b,),
        in_specs=in_specs_b,
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), cdtype),
        interpret=interpret,
        compiler_params=cparams,
    )(*args_b)


def _half_a_kv_kernel(
        x_ref, norms_ref,
        w1a_ref, b1a_ref, w2a_ref, b2a_ref,
        wk_ref, wv_ref, battn_ref,
        x1_ref, ln_ref, k_ref, v_ref):
    """Blocked half-A stage 1 (grid b): ffn1 residual + attention pre-norm
    + K/V projections for the whole row, written back to HBM so stage 2
    can attend q-blocks against the full key row."""
    cdtype = x_ref.dtype

    def mm(a32, w_ref, b=None):
        return _mm(a32, w_ref, b, cdtype)

    x = x_ref[0].astype(jnp.float32)
    hln = _layernorm(x, norms_ref[0:1, :], norms_ref[1:2, :])
    hmid = mm(hln, w1a_ref, b1a_ref[0:1, :])
    hmid = hmid * jax.nn.sigmoid(hmid)
    hout = mm(hmid.astype(jnp.float32), w2a_ref, b2a_ref[0:1, :])
    x = x + 0.5 * hout
    ln = _layernorm(x, norms_ref[2:3, :], norms_ref[3:4, :])
    x1_ref[0] = x.astype(x1_ref.dtype)
    ln_ref[0] = ln.astype(ln_ref.dtype)
    k_ref[0] = mm(ln, wk_ref, battn_ref[1:2, :]).astype(k_ref.dtype)
    v_ref[0] = mm(ln, wv_ref, battn_ref[2:3, :]).astype(v_ref.dtype)


def _half_a_qblock_kernel(
        x1_ref, ln_ref, k_ref, v_ref, mask_ref,
        wq_ref, wo_ref, battn_ref, p_ref, ubias_ref,
        out_ref,
        *, n_head: int, r_eff: int, tq: int):
    """Blocked half-A stage 2 (grid (b, nq)): one (TQ, D) query block
    attends over the row's full K/V (flash-style — whole-T score rows
    never materialize for more than TQ queries at once)."""
    j = pl.program_id(1)
    t, d = k_ref.shape[1], k_ref.shape[2]
    h = n_head
    dk = d // h
    cdtype = x1_ref.dtype

    def mm(a32, w_ref, b=None):
        return _mm(a32, w_ref, b, cdtype)

    x1 = x1_ref[0].astype(jnp.float32)                    # (TQ, D)
    ln = ln_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)                      # (T, D)
    v = v_ref[0]
    maskf = mask_ref[0].astype(jnp.float32)               # (1, T)
    q = mm(ln, wq_ref, battn_ref[0:1, :])                 # (TQ, D)
    u_bias = ubias_ref[0:1, :].astype(jnp.float32)
    v_bias = ubias_ref[1:2, :].astype(jnp.float32)
    inv_sqrt_dk = 1.0 / math.sqrt(dk)
    qi = jax.lax.broadcasted_iota(jnp.int32, (tq, t), 0) + j * tq
    ki = jax.lax.broadcasted_iota(jnp.int32, (tq, t), 1)
    off = jnp.clip(ki - qi, -r_eff, r_eff) + r_eff
    kmask = maskf > 0.5

    qu_full = (q + u_bias).astype(cdtype)
    qv_full = (q + v_bias).astype(cdtype)
    ctx_heads = []
    for hd in range(h):
        sl = slice(hd * dk, (hd + 1) * dk)
        k_h = k[:, sl]
        v_h = v[:, sl]
        p_h = p_ref[:, sl].astype(cdtype)
        scores = jax.lax.dot_general(
            qu_full[:, sl], k_h.astype(cdtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_dk  # (TQ, T)
        small = jax.lax.dot_general(
            qv_full[:, sl], p_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_dk  # (TQ, 2R+1)
        for o in range(2 * r_eff + 1):
            scores = scores + jnp.where(off == o, small[:, o:o + 1], 0.0)
        scores = jnp.where(kmask, scores, MASK_MIN)
        smax = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - smax)
        e = jnp.where(kmask, e, 0.0)
        w = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        ctx_h = jax.lax.dot_general(
            w.astype(cdtype), v_h.astype(cdtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ctx_heads.append(ctx_h)
    ctx = jnp.concatenate(ctx_heads, axis=1)
    out_ref[0] = (x1 + mm(ctx, wo_ref, battn_ref[3:4, :])) \
        .astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_head", "tq", "interpret"))
def conformer_layer_fused_qblocked(lp, x, maskf, pos_table,
                                   n_head: int = 8, tq: int = 64,
                                   interpret: bool = False):
    """Half A with T-blocked (flash-style) attention + the standard half
    B — VERDICT r4 item 7's decisive attempt at the one untried megakernel
    decomposition.

    Stage 1 (grid b) computes ffn1 + pre-norm + K/V for the full row;
    stage 2 (grid (b, ceil(T/tq))) attends one query block at a time over
    the full K/V. Vs the whole-T half A this trades VMEM residency for
    extra HBM traffic (x1/ln/k/v round-trip ≈ +4 T×D per layer), which at
    (B=32, T'=184, d=512) — where a whole row already fits comfortably in
    VMEM — is expected to LOSE; measured end-to-end by bench.py
    (`greedy_qblocked_vs_xla`) to close the item either way."""
    b, t, d = x.shape
    cdtype = x.dtype
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    r_eff = (pos_table.shape[0] - 1) // 2
    att = lp["self_attn"]
    p = jnp.dot(pos_table.astype(cdtype),
                att["pos"]["kernel"].astype(cdtype),
                preferred_element_type=jnp.float32).astype(cdtype)
    battn = jnp.stack([att[k]["bias"].astype(jnp.float32)
                       for k in ("q", "k", "v", "out")])
    ubias = jnp.stack([att["pos_bias_u"].reshape(-1).astype(jnp.float32),
                       att["pos_bias_v"].reshape(-1).astype(jnp.float32)])
    norms = _pack_norms(lp)
    cparams = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim)

    row3 = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))
    args1 = (
        x, norms,
        lp["ff1"]["Dense_0"]["kernel"].astype(cdtype),
        lp["ff1"]["Dense_0"]["bias"].astype(jnp.float32)[None],
        lp["ff1"]["Dense_1"]["kernel"].astype(cdtype),
        lp["ff1"]["Dense_1"]["bias"].astype(jnp.float32)[None],
        att["k"]["kernel"].astype(cdtype),
        att["v"]["kernel"].astype(cdtype),
        battn,
    )
    x1, ln, kk, vv = pl.pallas_call(
        _half_a_kv_kernel,
        grid=(b,),
        in_specs=[row3] + [const_spec(a) for a in args1[1:]],
        out_specs=[row3] * 4,
        out_shape=[jax.ShapeDtypeStruct((b, t, d), cdtype)] * 4,
        interpret=interpret,
        compiler_params=cparams,
    )(*args1)

    nq = -(-t // tq)
    args2 = (
        x1, ln, kk, vv, maskf.astype(jnp.float32)[:, None, :],
        att["q"]["kernel"].astype(cdtype),
        att["out"]["kernel"].astype(cdtype),
        battn, p, ubias,
    )
    qrow = pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0))
    krow = pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0))
    in_specs2 = [qrow, qrow, krow, krow,
                 pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0))] + \
        [const_spec(a) for a in args2[5:]]
    kern2 = functools.partial(_half_a_qblock_kernel, n_head=n_head,
                              r_eff=r_eff, tq=tq)
    x = pl.pallas_call(
        kern2,
        grid=(b, nq),
        in_specs=in_specs2,
        out_specs=pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), cdtype),
        interpret=interpret,
        compiler_params=cparams,
    )(*args2)

    args_b = (
        x, norms,
        lp["ff2"]["Dense_0"]["kernel"].astype(cdtype),
        lp["ff2"]["Dense_0"]["bias"].astype(jnp.float32)[None],
        lp["ff2"]["Dense_1"]["kernel"].astype(cdtype),
        lp["ff2"]["Dense_1"]["bias"].astype(jnp.float32)[None],
        lp["conv"]["pointwise1"]["kernel"][0].astype(cdtype),
        lp["conv"]["pointwise1"]["bias"].astype(jnp.float32)[None],
        lp["conv"]["depthwise"]["kernel"][:, 0, :].astype(jnp.float32),
        lp["conv"]["depthwise"]["bias"].astype(jnp.float32)[None],
        lp["conv"]["pointwise2"]["kernel"][0].astype(cdtype),
        lp["conv"]["pointwise2"]["bias"].astype(jnp.float32)[None],
    )
    in_specs_b = [row3] + [const_spec(a) for a in args_b[1:]]
    return pl.pallas_call(
        _layer_half_b_kernel,
        grid=(b,),
        in_specs=in_specs_b,
        out_specs=row3,
        out_shape=jax.ShapeDtypeStruct((b, t, d), cdtype),
        interpret=interpret,
        compiler_params=cparams,
    )(*args_b)


def fused_encode_ctc(model, params, feats, src_mask, interpret: bool = False,
                     qblocked: bool = False, tq: int = 64):
    """Full encode_ctc with the fused-layer encoder: frontend and CTC head
    via the model's own submodules, encoder layers via the megakernel,
    final encoder LayerNorm inline. Drop-in producer for nat_decode_jit's
    `pre_enc` (conformer/relative encoders only). qblocked selects the
    T-blocked flash-style half A (conformer_layer_fused_qblocked)."""
    (x, pos_embed), enc_mask = model.apply(
        params, feats, src_mask,
        method=lambda m, f, msk: m.src_embed(f, msk, deterministic=True))
    maskf = enc_mask.astype(jnp.float32)
    enc_p = params["params"]["encoder"]
    n_layers = sum(1 for k in enc_p if k.startswith("layer"))
    layer_fn = (functools.partial(conformer_layer_fused_qblocked, tq=tq)
                if qblocked else conformer_layer_fused)
    for i in range(n_layers):
        x = layer_fn(enc_p[f"layer{i}"], x, maskf, pos_embed,
                     n_head=model.n_head, interpret=interpret)
    nrm = enc_p["norm"]
    x32 = x.astype(jnp.float32)
    enc_h = _layernorm(
        x32.reshape(-1, x32.shape[-1]), nrm["scale"], nrm["bias"]) \
        .reshape(x32.shape).astype(x.dtype)
    ctc_out = model.apply(params, enc_h,
                          method=lambda m, h: m.ctc_generator(h))
    return enc_h, enc_mask, ctc_out
