"""Primitive flax.linen modules.

TPU-native re-designs of the reference primitives
(reference: src/models/modules/*.py). Functional, statically shaped,
bfloat16-friendly: every matmul/conv takes a `compute_dtype` so the MXU runs
in bf16 while params and softmax/layernorm statistics stay in f32.

Parity notes (for checkpoint-level comparison against the reference):
 - LayerNorm uses the *sample* std with Bessel correction and eps added to the
   std (not the variance), matching reference src/models/modules/norm.py:6-18.
 - ConvEmbedding is 2x Conv(3x3, stride 2, pad 1) + ReLU, then a linear over
   flattened (channel, freq), then x*sqrt(d) + positional encoding; the frame
   mask is subsampled [::2][::2] (reference: src/models/modules/embedding.py:89-124).
 - Relative attention is Transformer-XL style with pos_bias_u/v and the
   pad-reshape rel-shift (reference: src/models/modules/attention.py:68-147).
"""

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

MASK_MIN = -1e9  # large-negative for masked attention scores

# Global switch for the Pallas blockwise attention kernel
# (kernels/flash_attention.py). Enabled by tasks/bench on TPU; the XLA path
# is used while training with attention dropout (the kernel does not expose
# attention weights).
_FLASH_ATTENTION = False


def enable_flash_attention(on: bool = True):
    global _FLASH_ATTENTION
    _FLASH_ATTENTION = on


# Fused Pallas conv frontend (kernels/fused_frontend.py): keeps the conv1
# intermediate out of HBM. Benchmark-gated OPT-IN, not a default: measured
# 33 ms vs 12 ms for XLA's conv lowering at the production decode shape
# (B=32 T=736 F=240 d=512 bf16, benchmarks/frontend_bench.py) — XLA's convs
# already run near the MXU roofline there and the kernel's per-tile im2col
# relayouts dominate. Forward-only (dispatches on deterministic calls).
_FUSED_FRONTEND = False


def enable_fused_frontend(on: bool = True):
    """Force the fused Pallas conv frontend on/off (default off)."""
    global _FUSED_FRONTEND
    _FUSED_FRONTEND = on


def _fused_frontend_enabled() -> bool:
    return bool(_FUSED_FRONTEND)


def flash_attention_enabled() -> bool:
    return _FLASH_ATTENTION


def sinusoidal_position_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Vaswani-style sinusoidal table (max_len, d_model), host-computed once.

    (reference: src/models/modules/embedding.py:19-26)
    """
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class PositionalEncoding(nn.Module):
    """Add absolute sinusoidal PE, then dropout."""
    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pe = jnp.asarray(sinusoidal_position_encoding(self.max_len, self.d_model))
        x = x + pe[None, :x.shape[1], :].astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class RelativePositionalEncoding(nn.Module):
    """Clamped-window relative PE: returns (dropout(x), pos_embed).

    The reference materializes a (2T-1, d) tensor whose row k encodes
    relative offset k-(T-1) CLAMPED to +-max_relative_len
    (reference: src/models/modules/embedding.py:33-60) — i.e. at most
    2R+1 distinct rows. Here pos_embed is that distinct-row table only,
    (2R'+1, d) with R' = min(R, T-1) (row r <-> offset r-R'), and
    RelMultiHeadedAttention scores the compact table and expands to (Tq, Tk)
    afterwards — mathematically identical to scoring the wide tensor and
    rel-shifting, but ~2x faster at ASR lengths (benchmarks/
    rel_attn_variants.py: 0.63 vs 1.37 ms/layer at B32 T184 d512).

    The (2R+1, d) table is held as a FROZEN parameter (stop_gradient), not
    recomputed on the fly: the reference's make_model xavier-reinitializes
    every dim>1 parameter including this nominally-frozen embedding table
    (reference: src/models/cassnat.py "for p in model.parameters" loop), so
    reference checkpoints carry an arbitrary table that must be
    transplantable for logit parity. Fresh inits here use the sinusoidal
    values (the paper's intent).
    """
    d_model: int
    dropout: float = 0.1
    max_relative_len: int = 10

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        t = x.shape[1]
        table = self.param(
            "table",
            lambda rng, shape: jnp.asarray(
                sinusoidal_position_encoding(shape[0], shape[1])),
            (2 * self.max_relative_len + 1, self.d_model))
        table = jax.lax.stop_gradient(table)
        r = self.max_relative_len
        r_eff = min(r, t - 1)
        pos_embed = table[r - r_eff:r + r_eff + 1].astype(x.dtype)
        drop = nn.Dropout(self.dropout)
        return (drop(x, deterministic=deterministic),
                drop(pos_embed, deterministic=deterministic))


class TextEmbedding(nn.Module):
    """Token embedding scaled by sqrt(d_model) (reference: embedding.py:71-78)."""
    vocab_size: int
    d_model: int

    @nn.compact
    def __call__(self, tokens):
        emb = nn.Embed(self.vocab_size, self.d_model,
                       embedding_init=nn.initializers.xavier_uniform())(tokens)
        return emb * math.sqrt(self.d_model)


class LayerNorm(nn.Module):
    """LayerNorm with reference numerics: (x-mean)/(std+eps), Bessel std.

    (reference: src/models/modules/norm.py:6-18)
    """
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True) * (d / max(d - 1, 1))
        # +1e-12 inside the sqrt keeps d(sqrt)/dvar finite on exactly-zero
        # rows (fully-masked trigger slots) without changing the numerics.
        std = jnp.sqrt(var + 1e-12)
        out = scale * (xf - mean) / (std + self.eps) + bias
        return out.astype(x.dtype)


class PositionwiseFeedForward(nn.Module):
    """d_model -> d_ff -> d_model with activation+dropout in the middle.

    (reference: src/models/modules/positionff.py:6-16)
    """
    d_model: int
    d_ff: int
    dropout: float = 0.1
    activation: Callable = nn.relu
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.d_ff, dtype=self.compute_dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.compute_dtype,
                        kernel_init=nn.initializers.xavier_uniform())(h)


def swish(x):
    return x * jax.nn.sigmoid(x)


def _split_heads(x, h):
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h)


def _merge_heads(x):
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


def dot_attention_weights(q, k, mask, scale, dropout_mod=None,
                          deterministic=True):
    """softmax(QK^T * scale) with boolean mask (True = attend).

    q: (B, H, Tq, Dk), k: (B, H, Tk, Dk), mask broadcastable to (B, H, Tq, Tk).
    Softmax in f32 for stability regardless of compute dtype.
    """
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, MASK_MIN)
    w = jax.nn.softmax(scores, axis=-1)
    # NOTE: no post-softmax zeroing here — the reference's plain MHA
    # (attention.py:13-24) leaves fully-masked query rows as a UNIFORM
    # softmax (mean over all keys), and that garbage leaks into valid slots
    # through the decoder conv modules; only the relative variant zeroes
    # masked weights (attention.py:138). Checkpoint-level parity requires
    # matching both behaviors exactly (tests/test_torch_parity.py).
    if dropout_mod is not None:
        w = dropout_mod(w, deterministic=deterministic)
    return w


class MultiHeadedAttention(nn.Module):
    """Standard scaled-dot MHA (reference: attention.py:26-66).

    setup-style so decode-time KV caching can reuse the projections
    (kv() / q_heads() / attend_step()); the param tree is unchanged.
    """
    n_head: int
    d_model: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        mk = lambda name: nn.Dense(
            self.d_model, dtype=self.compute_dtype, name=name,
            kernel_init=nn.initializers.xavier_uniform())
        self.q_proj, self.k_proj, self.v_proj, self.o_proj = (
            mk("q"), mk("k"), mk("v"), mk("out"))
        self.attn_drop = nn.Dropout(self.dropout)

    def kv(self, x):
        """Projected key/value heads (B, T, H, Dk) for caching."""
        h = self.n_head
        return _split_heads(self.k_proj(x), h), _split_heads(self.v_proj(x), h)

    def q_heads(self, x):
        return _split_heads(self.q_proj(x), self.n_head)

    def attend_step(self, q_t, k_all, v_all, mask=None):
        """Single-query attention against cached keys.

        q_t: (B, 1, H, Dk); k_all/v_all: (B, L, H, Dk);
        mask: (B, L) bool valid-key mask. Returns (B, 1, D).
        """
        dk = self.d_model // self.n_head
        s = jnp.einsum("bqhd,bkhd->bhqk", q_t, k_all,
                       preferred_element_type=jnp.float32) / math.sqrt(dk)
        if mask is not None:
            s = jnp.where(mask[:, None, None, :], s, MASK_MIN)
        w = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v_all.dtype), v_all,
                         preferred_element_type=jnp.float32)
        b = q_t.shape[0]
        return self.o_proj(out.reshape(b, 1, self.d_model)
                           .astype(self.compute_dtype))

    def __call__(self, query, key, value, mask=None, pos_embed=None,
                 deterministic: bool = True):
        del pos_embed
        h, dk = self.n_head, self.d_model // self.n_head
        q = _split_heads(self.q_proj(query), h).transpose(0, 2, 1, 3)
        k = _split_heads(self.k_proj(key), h).transpose(0, 2, 1, 3)
        v = _split_heads(self.v_proj(value), h).transpose(0, 2, 1, 3)
        if _FLASH_ATTENTION and (deterministic or self.dropout == 0.0):
            from cassnat_asr_public_tpu.kernels.flash_attention import \
                default_interpret, flash_attention
            b, tq, tk = q.shape[0], q.shape[2], k.shape[2]
            m3 = None if mask is None else jnp.broadcast_to(mask, (b, tq, tk))
            out = flash_attention(q, k, v, m3,
                                  interpret=default_interpret())
        else:
            if mask is not None:
                mask = mask[:, None, :, :]  # same mask on every head
            w = dot_attention_weights(q, k, mask, 1.0 / math.sqrt(dk),
                                      self.attn_drop, deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        return self.o_proj(_merge_heads(out).astype(self.compute_dtype))


def rel_shift(scores_bd):
    """Transformer-XL relative shift.

    scores_bd: (B, H, T, 2T-1) where column j scores relative offset
    j-(T-1). Returns (B, H, T, T) where column j scores key position j.
    Implemented with the pad-reshape trick
    (reference: src/models/modules/attention.py:128-132).
    """
    b, h, t, l = scores_bd.shape
    pad = jnp.zeros((b, h, t, 1), scores_bd.dtype)
    padded = jnp.concatenate([pad, scores_bd], axis=-1)  # (B,H,T,2T)
    padded = padded.reshape(b, h, l + 1, t)
    return padded[:, :, 1:].reshape(b, h, t, l)[:, :, :, :t]


class RelMultiHeadedAttention(nn.Module):
    """Transformer-XL relative-position MHA with pos_bias_u/v.

    (reference: src/models/modules/attention.py:68-147)
    """
    n_head: int
    d_model: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, mask=None, pos_embed=None,
                 deterministic: bool = True):
        assert pos_embed is not None, "relative attention needs pos_embed"
        h, dk = self.n_head, self.d_model // self.n_head
        dense = lambda name, bias=True: nn.Dense(
            self.d_model, use_bias=bias, dtype=self.compute_dtype, name=name,
            kernel_init=nn.initializers.xavier_uniform())
        q = _split_heads(dense("q")(query), h)          # (B, Tq, H, Dk)
        k = _split_heads(dense("k")(key), h)            # (B, Tk, H, Dk)
        v = _split_heads(dense("v")(value), h)
        # pos_embed is the compact clamped table (2R'+1, d), row r <->
        # relative offset r-R' (see RelativePositionalEncoding).
        p = dense("pos", bias=False)(pos_embed)
        p = p.reshape(1, -1, h, dk)

        bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, dk))
        bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, dk))

        q_u = (q + bias_u.astype(q.dtype)).transpose(0, 2, 1, 3)  # (B,H,Tq,Dk)
        q_v = (q + bias_v.astype(q.dtype)).transpose(0, 2, 1, 3)
        # Compact-table scoring: (B,H,Tq,2R'+1) scores, then a one-hot
        # Toeplitz expansion to (Tq,Tk) — same math as scoring the wide
        # (2T-1) tensor and rel-shifting, but skips the O(T^2) shift copies
        # and the 9x-redundant wide GEMM (benchmarks/rel_attn_variants.py:
        # 0.63 vs 1.37 ms/layer; exact in f32, <3e-5 rel err in bf16).
        # A bias-input flash variant also exists (kernels/flash_attention.py)
        # but streaming the materialized (B,H,T,T) bias from HBM measured
        # slower than XLA's fused attention at ASR lengths.
        t_q, t_k = query.shape[1], key.shape[1]
        r_eff = (pos_embed.shape[0] - 1) // 2
        small = jnp.einsum("bhqd,bkhd->bhqk", q_v, p,
                           preferred_element_type=jnp.float32) / math.sqrt(dk)
        off = jnp.clip(jnp.arange(t_k)[None, :] - jnp.arange(t_q)[:, None],
                       -r_eff, r_eff) + r_eff
        expand = jax.nn.one_hot(off, 2 * r_eff + 1, dtype=self.compute_dtype)
        rel_bias = jnp.einsum("bhqo,qko->bhqk",
                              small.astype(self.compute_dtype), expand,
                              preferred_element_type=jnp.float32)

        scores_ac = jnp.einsum("bhqd,bkhd->bhqk", q_u, k,
                               preferred_element_type=jnp.float32)
        scores = scores_ac / math.sqrt(dk) + rel_bias

        if mask is not None:
            m = mask[:, None, :, :]
            scores = jnp.where(m, scores, MASK_MIN)
        w = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            w = jnp.where(m, w, 0.0)
        w = nn.Dropout(self.dropout)(w, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bhqd", w.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return dense("out")(_merge_heads(out).astype(self.compute_dtype))


class ConvModule(nn.Module):
    """Conformer conv block: pointwise->GLU->depthwise->GroupNorm->Swish->pointwise.

    (reference: src/models/modules/conformer_related.py:15-44)
    """
    channels: int
    kernel_size: int
    activation: Callable = swish
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        h = nn.Conv(2 * self.channels, (1,), dtype=self.compute_dtype,
                    name="pointwise1")(x)
        h = jax.nn.glu(h, axis=-1)
        h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    feature_group_count=self.channels,
                    dtype=self.compute_dtype, name="depthwise")(h)
        # GroupNorm(1, C): normalize over (T, C) jointly per sample.
        # epsilon matches torch.nn.GroupNorm (reference numerics).
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm")(h)
        h = self.activation(h)
        return nn.Conv(self.channels, (1,), dtype=self.compute_dtype,
                       name="pointwise2")(h)


def conv3x3_s2_taps(x, kernel, bias):
    """3x3 stride-2 SAME conv as 9 accumulated GEMM taps.

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Cout). Equivalent to
    nn.Conv(Cout, (3,3), strides=2, padding=1) but lowered as nine clean
    (B*H'*W', Cin)x(Cin, Cout) matmuls, which map onto the MXU far better
    than XLA's general conv for the channel-heavy second frontend layer.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    ho, wo = (h + 1) // 2, (w + 1) // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b, ho, wo, cout), jnp.float32)
    for dt in range(3):
        for df in range(3):
            tap = jax.lax.slice(
                xp, (0, dt, df, 0),
                (b, min(dt + 2 * ho, h + 2), min(df + 2 * wo, w + 2), cin),
                (1, 2, 2, 1))
            tap = tap[:, :ho, :wo, :]
            out = out + jnp.einsum(
                "bhwc,cd->bhwd", tap, kernel[dt, df],
                preferred_element_type=jnp.float32)
    return (out + bias).astype(x.dtype)


class _Conv2dParams(nn.Module):
    """Bare conv kernel+bias params, laid out exactly as `nn.Conv` would
    create them (HWIO kernel, lecun_normal init) so checkpoints and the
    torch-import name maps are unaffected by the fused-kernel dispatch."""
    kshape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.kshape)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.kshape[-1],))
        return k, b


class _DenseParams(nn.Module):
    """Bare dense kernel+bias params laid out as `nn.Dense` creates them
    ((in, out) kernel, xavier_uniform init) — lets ConvEmbedding apply the
    projection with a permuted weight view while keeping the param tree
    checkpoint-identical."""
    kshape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.xavier_uniform(),
                       self.kshape)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.kshape[-1],))
        return k, b


class ConvEmbedding(nn.Module):
    """2-layer strided Conv2d frontend: 4x time (and freq) downsample.

    Input (B, T, F) features -> (B, T//4, d_model) embeddings + subsampled
    mask; output is scaled by sqrt(d) and passed through `pos_enc`
    (reference: src/models/modules/embedding.py:89-124). `causal` uses
    asymmetric time padding so no future frames leak (embedding.py:96-100).
    """
    input_size: int
    d_model: int
    dropout: float = 0.1
    pos_type: str = "absolute"  # "absolute" | "relative"
    max_relative_len: int = 10
    causal: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        # x: (B, T, F); mask: (B, T) bool
        h = x[..., None].astype(self.compute_dtype)  # (B, T, F, 1) NHWC
        if self.causal:
            # kernel (2,3), stride (2,2), time pad 1 before only, freq pad 1.
            pad = [(1, 0), (1, 1)]
            h = nn.Conv(self.d_model, (2, 3), strides=(2, 2), padding=pad,
                        dtype=self.compute_dtype, name="conv1")(h)
            h = nn.relu(h)
            h = nn.Conv(self.d_model, (2, 3), strides=(2, 2), padding=pad,
                        dtype=self.compute_dtype, name="conv2")(h)
            h = nn.relu(h)
        else:
            w1, b1 = _Conv2dParams((3, 3, 1, self.d_model), name="conv1")()
            w2, b2 = _Conv2dParams((3, 3, self.d_model, self.d_model),
                                   name="conv2")()
            cd = self.compute_dtype
            if (deterministic and _fused_frontend_enabled()
                    and x.shape[2] % 4 == 0):
                from cassnat_asr_public_tpu.kernels.fused_frontend import \
                    fused_conv_frontend
                from cassnat_asr_public_tpu.kernels.flash_attention import \
                    default_interpret
                h = fused_conv_frontend(
                    x.astype(cd), w1, b1.astype(jnp.float32),
                    w2, b2.astype(jnp.float32),
                    interpret=default_interpret())
            else:
                h = jax.lax.conv_general_dilated(
                    h, w1.astype(cd), (2, 2), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = nn.relu(h + b1.astype(cd))
                h = jax.lax.conv_general_dilated(
                    h, w2.astype(cd), (2, 2), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = nn.relu(h + b2.astype(cd))
        b, t, f, c = h.shape
        # The reference flattens channel-major (transpose(0,1,3,2) then
        # reshape; embedding.py:118-121). Moving that transpose onto the
        # (c*f, d) WEIGHT instead of the (B,T,c,f) activations is free —
        # XLA folds the static weight permute into the GEMM — while the
        # activation-side transpose moves hundreds of MB at decode shapes.
        # Param layout stays exactly nn.Dense's (c*f, d) c-major kernel for
        # checkpoint/torch-import parity.
        wk, wb = _DenseParams((c * f, self.d_model), name="linear_out")()
        wp = wk.reshape(c, f, self.d_model).transpose(1, 0, 2) \
            .reshape(f * c, self.d_model)
        h = h.reshape(b, t, f * c) @ wp.astype(h.dtype) + wb.astype(h.dtype)
        h = h * math.sqrt(self.d_model)

        new_mask = mask[:, ::2][:, ::2]
        if self.pos_type == "relative":
            h, pos_embed = RelativePositionalEncoding(
                self.d_model, self.dropout, self.max_relative_len,
                name="pos_enc")(h, deterministic=deterministic)
            return (h, pos_embed), new_mask
        h = PositionalEncoding(self.d_model, self.dropout,
                               name="pos_enc")(h, deterministic=deterministic)
        return h, new_mask


class Generator(nn.Module):
    """Linear + log-softmax head, optional pre-norm.

    setup-style so decode paths can fetch raw `logits` without
    materializing the f32 log-softmax over the full vocab — at ESA decode
    shapes the (N, U, V) f32 normalize measured 8.4 ms of the NAT stage
    (benchmarks/nat_microbench.py); argmax and per-token log-probs
    (logit - logsumexp) need only the bf16 logits.
    (reference: src/models/transformer.py:40-52)
    """
    vocab_size: int
    add_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.add_norm:
            self.norm = LayerNorm()
        self.proj = nn.Dense(self.vocab_size, dtype=self.compute_dtype,
                             kernel_init=nn.initializers.xavier_uniform())

    def __call__(self, x, temperature: float = 1.0):
        return jax.nn.log_softmax(
            self.logits(x).astype(jnp.float32) / temperature, axis=-1)

    def logits(self, x):
        if self.add_norm:
            x = self.norm(x)
        return self.proj(x)


class StatsPooling(nn.Module):
    """Masked mean+std pooling over time (reference: modules/utils.py:34-49)."""

    @nn.compact
    def __call__(self, x, lengths):
        t = x.shape[1]
        valid = (jnp.arange(t)[None, :] < lengths[:, None])[..., None]
        n = jnp.maximum(lengths, 1).astype(x.dtype)[:, None]
        mean = jnp.where(valid, x, 0).sum(1) / n
        var = jnp.where(valid, (x - mean[:, None, :]) ** 2, 0).sum(1) \
            / jnp.maximum(n - 1, 1)
        return jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)
