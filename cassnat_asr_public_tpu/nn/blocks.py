"""Layer stacks: transformer/conformer encoders, decoders, CASS-NAT blocks.

TPU-native re-design of the reference block layer
(reference: src/models/blocks/{transformer,conformer,fanat}_blocks.py and
fanat_conformer_blocks.py). Pre-norm residual sublayers throughout
(reference: src/models/modules/utils.py:13-32). interCTC / interCE taps return
the intermediate hidden state alongside the final one.

Differences from the reference by design:
 - Stacks optionally run under `nn.remat` (jax.checkpoint) to trade FLOPs for
   HBM, the TPU equivalent of gradient checkpointing.
 - Incremental decoding uses explicit KV caches threaded functionally (see
   models/lm.py) instead of mutable per-layer cache lists.
"""

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cassnat_asr_public_tpu.parallel.mesh import (constrain_activation,
                                                  pipe_config)
from cassnat_asr_public_tpu.nn.modules import (
    ConvModule,
    LayerNorm,
    MultiHeadedAttention,
    PositionwiseFeedForward,
    RelMultiHeadedAttention,
    swish,
)


class _Sublayer(nn.Module):
    """Pre-norm residual wrapper: x + scale * dropout(f(norm(x)))."""
    dropout: float = 0.1
    scale: float = 1.0

    @nn.compact
    def __call__(self, x, fn, deterministic=True):
        h = fn(LayerNorm(name="norm")(x))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + self.scale * h


def _attn(pos_type, n_head, d_model, dropout, dtype, name):
    if pos_type == "relative":
        return RelMultiHeadedAttention(n_head, d_model, dropout,
                                       compute_dtype=dtype, name=name)
    return MultiHeadedAttention(n_head, d_model, dropout,
                                compute_dtype=dtype, name=name)


class TrfEncoderLayer(nn.Module):
    """Self-attention + FFN (reference: transformer_blocks.py:9-32)."""
    d_model: int
    n_head: int
    d_ff: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        attn = MultiHeadedAttention(self.n_head, self.d_model, self.dropout,
                                    compute_dtype=self.compute_dtype,
                                    name="self_attn")
        x = _Sublayer(self.dropout, name="sub0")(
            x, lambda h: attn(h, h, h, mask, deterministic=deterministic),
            deterministic)
        ff = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout,
                                     compute_dtype=self.compute_dtype,
                                     name="ff")
        return _Sublayer(self.dropout, name="sub1")(
            x, lambda h: ff(h, deterministic=deterministic), deterministic)


class TrfEncoder(nn.Module):
    """N-layer pre-norm transformer encoder with optional interCTC tap.

    (reference: transformer_blocks.py:51-82)
    """
    d_model: int
    n_head: int
    d_ff: int
    n_layers: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask, interctc_layer: int = 0, deterministic=True):
        pp = self._pipelined(x, mask, interctc_layer, deterministic)
        if pp is not None:
            return LayerNorm(name="norm")(pp), None
        layer_cls = TrfEncoderLayer
        if self.remat:
            layer_cls = nn.remat(TrfEncoderLayer, static_argnums=(3,))
        inter = None
        for i in range(self.n_layers):
            x = layer_cls(self.d_model, self.n_head, self.d_ff, self.dropout,
                          self.compute_dtype, name=f"layer{i}")(
                x, mask, deterministic)
            x = constrain_activation(x)
            if interctc_layer > 0 and i == interctc_layer - 1:
                inter = x
        x = LayerNorm(name="norm")(x)
        return (x, inter) if interctc_layer > 0 else (x, None)

    def _pipelined(self, x, mask, interctc_layer, deterministic):
        """Layer stack over the global mesh's 'pipe' axis (GPipe schedule,
        parallel/pipeline.py) — config `pipeline_parallel`, activated
        through set_global_mesh by the task driver. Falls back to the
        sequential loop during init, with interCTC taps, with dropout
        active (per-stage rng plumbing isn't worth the complexity), or
        when the batch doesn't tile (n_mb x data)."""
        mesh, n_stage, n_mb = pipe_config()
        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        if (mesh is None or self.is_initializing() or interctc_layer > 0
                or self.n_layers % n_stage != 0
                or x.shape[0] % (n_mb * n_data) != 0
                or (self.dropout > 0 and not deterministic)):
            return None
        print(f"[pp] encoder layer stack pipelined: {self.n_layers} layers "
              f"over {n_stage} stages x {n_mb} microbatches", flush=True)
        lp = [self.variables["params"][f"layer{i}"]
              for i in range(self.n_layers)]
        tpl = TrfEncoderLayer(self.d_model, self.n_head, self.d_ff,
                              self.dropout, self.compute_dtype)
        consts = () if mask is None else (mask,)

        def apply_one(p, h, *cs):
            return tpl.apply({"params": p}, h, cs[0] if cs else None, True)

        from cassnat_asr_public_tpu.parallel.pipeline import \
            pipeline_layer_stack
        return pipeline_layer_stack(lp, apply_one, x, consts, mesh, n_mb)


class ConEncoderLayer(nn.Module):
    """Conformer layer: ff/2 -> [attn -> conv] (relative) -> ff/2.

    With absolute positions conv precedes attention
    (reference: conformer_blocks.py:9-49).
    """
    d_model: int
    n_head: int
    d_ff: int
    kernel_size: int
    dropout: float = 0.1
    pos_type: str = "relative"
    share_ff: bool = False
    ff_scale: float = 0.5
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, pos_embed, deterministic=True):
        ff1 = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout,
                                      activation=swish,
                                      compute_dtype=self.compute_dtype,
                                      name="ff1")
        ff2 = ff1 if self.share_ff else PositionwiseFeedForward(
            self.d_model, self.d_ff, self.dropout, activation=swish,
            compute_dtype=self.compute_dtype, name="ff2")
        attn = _attn(self.pos_type, self.n_head, self.d_model, self.dropout,
                     self.compute_dtype, "self_attn")
        conv = ConvModule(self.d_model, self.kernel_size,
                          compute_dtype=self.compute_dtype, name="conv")

        x = _Sublayer(self.dropout, self.ff_scale, name="sub_ff1")(
            x, lambda h: ff1(h, deterministic=deterministic), deterministic)
        do_attn = lambda h: attn(h, h, h, mask, pos_embed,
                                 deterministic=deterministic)
        if self.pos_type == "absolute":
            x = _Sublayer(self.dropout, name="sub_conv")(x, conv, deterministic)
            x = _Sublayer(self.dropout, name="sub_attn")(x, do_attn, deterministic)
        else:
            x = _Sublayer(self.dropout, name="sub_attn")(x, do_attn, deterministic)
            x = _Sublayer(self.dropout, name="sub_conv")(x, conv, deterministic)
        return _Sublayer(self.dropout, self.ff_scale, name="sub_ff2")(
            x, lambda h: ff2(h, deterministic=deterministic), deterministic)


class ConEncoder(nn.Module):
    """N-layer conformer encoder (reference: conformer_blocks.py:68-111)."""
    d_model: int
    n_head: int
    d_ff: int
    kernel_size: int
    n_layers: int
    dropout: float = 0.1
    pos_type: str = "relative"
    share_ff: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask, interctc_layer: int = 0, deterministic=True):
        if self.pos_type == "relative":
            x, pos_embed = x
        else:
            pos_embed = None
        pp = self._pipelined(x, mask, pos_embed, interctc_layer,
                             deterministic)
        if pp is not None:
            return LayerNorm(name="norm")(pp), None
        layer_cls = ConEncoderLayer
        if self.remat:
            layer_cls = nn.remat(ConEncoderLayer, static_argnums=(4,))
        inter = None
        for i in range(self.n_layers):
            x = layer_cls(self.d_model, self.n_head, self.d_ff,
                          self.kernel_size, self.dropout, self.pos_type,
                          self.share_ff,
                          compute_dtype=self.compute_dtype,
                          name=f"layer{i}")(x, mask, pos_embed, deterministic)
            x = constrain_activation(x)
            if interctc_layer > 0 and i == interctc_layer - 1:
                inter = x
        x = LayerNorm(name="norm")(x)
        return (x, inter) if interctc_layer > 0 else (x, None)

    def _pipelined(self, x, mask, pos_embed, interctc_layer, deterministic):
        """Conformer layer stack over the global mesh's 'pipe' axis — see
        TrfEncoder._pipelined. The compact relative-PE table (2R+1, d) is
        broadcast to batch so it can ride the microbatched pipeline; each
        stage reads row 0 back out (all rows identical)."""
        mesh, n_stage, n_mb = pipe_config()
        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        if (mesh is None or self.is_initializing() or interctc_layer > 0
                or self.n_layers % n_stage != 0
                or x.shape[0] % (n_mb * n_data) != 0
                or (self.dropout > 0 and not deterministic)):
            return None
        print(f"[pp] encoder layer stack pipelined: {self.n_layers} layers "
              f"over {n_stage} stages x {n_mb} microbatches", flush=True)
        lp = [self.variables["params"][f"layer{i}"]
              for i in range(self.n_layers)]
        tpl = ConEncoderLayer(self.d_model, self.n_head, self.d_ff,
                              self.kernel_size, self.dropout, self.pos_type,
                              self.share_ff,
                              compute_dtype=self.compute_dtype)
        consts = [] if mask is None else [mask]
        pe_idx = None
        if pos_embed is not None:
            pe_idx = len(consts)
            consts.append(jnp.broadcast_to(
                pos_embed[None], (x.shape[0],) + pos_embed.shape))

        def apply_one(p, h, *cs):
            m = cs[0] if mask is not None else None
            pe = cs[pe_idx][0] if pe_idx is not None else None
            return tpl.apply({"params": p}, h, m, pe, True)

        from cassnat_asr_public_tpu.parallel.pipeline import \
            pipeline_layer_stack
        return pipeline_layer_stack(lp, apply_one, x, tuple(consts), mesh,
                                    n_mb)


class TrfDecoderLayer(nn.Module):
    """Self-attn + cross-attn + FFN (reference: transformer_blocks.py:34-48).

    setup-style with explicit pre-norms so incremental decoding can reuse the
    parameters through `step()` with per-layer KV caches — the TPU
    replacement for the reference's cache-less per-step decoder re-run
    (transformer.py:188).
    """
    d_model: int
    n_head: int
    d_ff: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    activation: Callable = nn.relu

    def setup(self):
        self.self_attn = MultiHeadedAttention(self.n_head, self.d_model,
                                              self.dropout,
                                              compute_dtype=self.compute_dtype,
                                              name="self_attn")
        self.src_attn = MultiHeadedAttention(self.n_head, self.d_model,
                                             self.dropout,
                                             compute_dtype=self.compute_dtype,
                                             name="src_attn")
        self.ff = PositionwiseFeedForward(self.d_model, self.d_ff,
                                          self.dropout,
                                          activation=self.activation,
                                          compute_dtype=self.compute_dtype,
                                          name="ff")
        self.norm0 = LayerNorm(name="norm0")
        self.norm1 = LayerNorm(name="norm1")
        self.norm2 = LayerNorm(name="norm2")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, memory, src_mask, tgt_mask, deterministic=True):
        y = self.norm0(x)
        h = self.self_attn(y, y, y, tgt_mask, deterministic=deterministic)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.src_attn(self.norm1(x), memory, memory, src_mask,
                          deterministic=deterministic)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.ff(self.norm2(x), deterministic=deterministic)
        return x + self.drop(h, deterministic=deterministic)

    def cross_kv(self, memory):
        """Precompute cross-attention K/V from encoder states (once)."""
        return self.src_attn.kv(memory)

    def step(self, x_t, self_k, self_v, pos, cross_k, cross_v, enc_mask):
        """One-token decode step.

        x_t: (B, 1, D); self_k/self_v: (B, L, H, Dk) caches updated at `pos`;
        cross_k/cross_v: precomputed (B, T, H, Dk); enc_mask: (B, T).
        Returns (y_t, new_self_k, new_self_v).
        """
        y = self.norm0(x_t)
        q = self.self_attn.q_heads(y)
        k_t, v_t = self.self_attn.kv(y)
        self_k = jax.lax.dynamic_update_slice_in_dim(self_k, k_t, pos, axis=1)
        self_v = jax.lax.dynamic_update_slice_in_dim(self_v, v_t, pos, axis=1)
        lmax = self_k.shape[1]
        causal = jnp.arange(lmax)[None, :] <= pos
        h = self.self_attn.attend_step(q, self_k, self_v,
                                       jnp.broadcast_to(causal,
                                                        (x_t.shape[0], lmax)))
        x_t = x_t + h
        q2 = self.src_attn.q_heads(self.norm1(x_t))
        h = self.src_attn.attend_step(q2, cross_k, cross_v, enc_mask)
        x_t = x_t + h
        h = self.ff(self.norm2(x_t), deterministic=True)
        return x_t + h, self_k, self_v


class TrfDecoder(nn.Module):
    """N-layer decoder + final norm (reference: transformer_blocks.py:85-96).

    Exposes `init_cache` / `precompute_cross` / `step` for KV-cached
    incremental decoding.
    """
    d_model: int
    n_head: int
    d_ff: int
    n_layers: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    activation: Callable = nn.relu

    def setup(self):
        layer_cls = TrfDecoderLayer
        if self.remat:
            layer_cls = nn.remat(TrfDecoderLayer, static_argnums=(4,))
        self.layers = [layer_cls(self.d_model, self.n_head, self.d_ff,
                                 self.dropout, self.compute_dtype,
                                 activation=self.activation,
                                 name=f"layer{i}")
                       for i in range(self.n_layers)]
        self.norm = LayerNorm(name="norm")

    def __call__(self, x, memory, src_mask, tgt_mask, deterministic=True):
        for layer in self.layers:
            x = layer(x, memory, src_mask, tgt_mask, deterministic)
        return self.norm(x)

    def precompute_cross(self, memory):
        """Per-layer cross-attention K/V from the encoder output."""
        return [layer.cross_kv(memory) for layer in self.layers]

    def init_cache(self, batch: int, max_len: int):
        dk = self.d_model // self.n_head
        shape = (batch, max_len, self.n_head, dk)
        return [(jnp.zeros(shape, self.compute_dtype),
                 jnp.zeros(shape, self.compute_dtype))
                for _ in range(self.n_layers)]

    def step(self, x_t, cache, pos, cross_kvs, enc_mask):
        """One-token step through all layers; returns (hidden, new cache)."""
        new_cache = []
        for layer, (sk, sv), (ck, cv) in zip(self.layers, cache, cross_kvs):
            x_t, sk, sv = layer.step(x_t, sk, sv, pos, ck, cv, enc_mask)
            new_cache.append((sk, sv))
        return self.norm(x_t), new_cache


# ---------------------------------------------------------------------------
# CASS-NAT decoder stacks (reference: fanat_blocks.py, fanat_conformer_blocks.py)
# ---------------------------------------------------------------------------


class TrfAcExtra(nn.Module):
    """Token acoustic-embedding extractor, transformer flavor: PE queries
    cross-attend to the encoder output under the trigger mask through
    residual sublayers (reference: fanat_blocks.py:26-40, 101-113).
    """
    d_model: int
    n_head: int
    d_ff: int
    n_layers: int = 1
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, memory, trigger_mask, deterministic=True):
        x = queries
        for i in range(self.n_layers):
            attn = MultiHeadedAttention(self.n_head, self.d_model,
                                        self.dropout,
                                        compute_dtype=self.compute_dtype,
                                        name=f"src_attn{i}")
            ff = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout,
                                         compute_dtype=self.compute_dtype,
                                         name=f"ff{i}")
            x = _Sublayer(self.dropout, name=f"sub_attn{i}")(
                x, lambda h: attn(h, memory, memory, trigger_mask,
                                  deterministic=deterministic), deterministic)
            x = _Sublayer(self.dropout, name=f"sub_ff{i}")(
                x, lambda h: ff(h, deterministic=deterministic), deterministic)
        return x


class ConAcExtra(nn.Module):
    """Conformer-flavor extractor: a *direct* (non-residual) cross-attention
    replaces the PE queries with pooled acoustic content, then the result is
    rescaled by sqrt(d), run through the decoder's relative positional
    encoding, and refined by one residual Swish FFN. Returns
    (x, pos_embed) so downstream ConSAD/ConMAD reuse the same relative table
    (reference: fanat_conformer_blocks.py:40-61, 171-183; single layer only).
    """
    d_model: int
    n_head: int
    d_ff: int
    dropout: float = 0.1
    max_relative_len: int = 8
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, memory, trigger_mask, deterministic=True):
        from cassnat_asr_public_tpu.nn.modules import RelativePositionalEncoding
        attn = MultiHeadedAttention(self.n_head, self.d_model, self.dropout,
                                    compute_dtype=self.compute_dtype,
                                    name="src_attn")
        x = attn(queries, memory, memory, trigger_mask,
                 deterministic=deterministic)
        x, pos_embed = RelativePositionalEncoding(
            self.d_model, self.dropout, self.max_relative_len,
            name="pos_enc")(x * math.sqrt(self.d_model),
                            deterministic=deterministic)
        ff = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout,
                                     activation=swish,
                                     compute_dtype=self.compute_dtype,
                                     name="ff")
        x = _Sublayer(self.dropout, name="sub_ff")(
            x, lambda h: ff(h, deterministic=deterministic), deterministic)
        return x, pos_embed


class TrfSAD(nn.Module):
    """Self-attention decoder (embedding mapper): transformer flavor.

    (reference: fanat_blocks.py:115-136); interCE tap returns intermediate.
    """
    d_model: int
    n_head: int
    d_ff: int
    n_layers: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, interce_layer: int = 0, deterministic=True):
        inter = None
        for i in range(self.n_layers):
            x = TrfEncoderLayer(self.d_model, self.n_head, self.d_ff,
                                self.dropout, self.compute_dtype,
                                name=f"layer{i}")(x, mask, deterministic)
            x = constrain_activation(x)
            if interce_layer > 0 and i == interce_layer - 1:
                inter = x
        return (x, inter) if interce_layer > 0 else (x, None)


class ConSAD(nn.Module):
    """Self-attention decoder, conformer flavor with relative positions.

    (reference: fanat_conformer_blocks.py ConSAD/SelfAttLayer)
    """
    d_model: int
    n_head: int
    d_ff: int
    kernel_size: int
    n_layers: int
    dropout: float = 0.1
    pos_type: str = "relative"
    share_ff: bool = False
    max_relative_len: int = 8
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, pos_embed, interce_layer: int = 0,
                 deterministic=True):
        inter = None
        for i in range(self.n_layers):
            x = ConEncoderLayer(self.d_model, self.n_head, self.d_ff,
                                self.kernel_size, self.dropout, self.pos_type,
                                self.share_ff,
                                compute_dtype=self.compute_dtype,
                                name=f"layer{i}")(x, mask, pos_embed,
                                                  deterministic)
            x = constrain_activation(x)
            if interce_layer > 0 and i == interce_layer - 1:
                inter = x
        return (x, inter) if interce_layer > 0 else (x, None)


class TrfMAD(nn.Module):
    """Mixed-attention decoder: self + source attention, transformer flavor.

    (reference: fanat_blocks.py:138-159)
    """
    d_model: int
    n_head: int
    d_ff: int
    n_layers: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, src_mask, tgt_mask, interce_layer: int = 0,
                 deterministic=True):
        inter = None
        for i in range(self.n_layers):
            x = TrfDecoderLayer(self.d_model, self.n_head, self.d_ff,
                                self.dropout, self.compute_dtype,
                                name=f"layer{i}")(x, memory, src_mask,
                                                  tgt_mask, deterministic)
            x = constrain_activation(x)
            if interce_layer > 0 and i == interce_layer - 1:
                inter = x
        x = LayerNorm(name="norm")(x)
        return (x, inter) if interce_layer > 0 else (x, None)


class ConMADLayer(nn.Module):
    """Conformer mixed-attention layer: ff/2 -> rel self-attn -> conv ->
    cross-attn -> ff/2 (reference: fanat_conformer_blocks.py ConMAD layers).
    """
    d_model: int
    n_head: int
    d_ff: int
    kernel_size: int
    dropout: float = 0.1
    share_ff: bool = False
    ff_scale: float = 0.5
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, src_mask, tgt_mask, pos_embed,
                 deterministic=True):
        ff1 = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout,
                                      activation=swish,
                                      compute_dtype=self.compute_dtype,
                                      name="ff1")
        ff2 = ff1 if self.share_ff else PositionwiseFeedForward(
            self.d_model, self.d_ff, self.dropout, activation=swish,
            compute_dtype=self.compute_dtype, name="ff2")
        self_attn = RelMultiHeadedAttention(self.n_head, self.d_model,
                                            self.dropout,
                                            compute_dtype=self.compute_dtype,
                                            name="self_attn")
        src_attn = MultiHeadedAttention(self.n_head, self.d_model,
                                        self.dropout,
                                        compute_dtype=self.compute_dtype,
                                        name="src_attn")
        conv = ConvModule(self.d_model, self.kernel_size,
                          compute_dtype=self.compute_dtype, name="conv")
        x = _Sublayer(self.dropout, self.ff_scale, name="sub_ff1")(
            x, lambda h: ff1(h, deterministic=deterministic), deterministic)
        x = _Sublayer(self.dropout, name="sub_self")(
            x, lambda h: self_attn(h, h, h, tgt_mask, pos_embed,
                                   deterministic=deterministic), deterministic)
        x = _Sublayer(self.dropout, name="sub_conv")(x, conv, deterministic)
        x = _Sublayer(self.dropout, name="sub_src")(
            x, lambda h: src_attn(h, memory, memory, src_mask,
                                  deterministic=deterministic), deterministic)
        return _Sublayer(self.dropout, self.ff_scale, name="sub_ff2")(
            x, lambda h: ff2(h, deterministic=deterministic), deterministic)


class ConMAD(nn.Module):
    """Conformer mixed-attention decoder stack + final norm."""
    d_model: int
    n_head: int
    d_ff: int
    kernel_size: int
    n_layers: int
    dropout: float = 0.1
    share_ff: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, src_mask, tgt_mask, pos_embed,
                 interce_layer: int = 0, deterministic=True):
        inter = None
        for i in range(self.n_layers):
            x = ConMADLayer(self.d_model, self.n_head, self.d_ff,
                            self.kernel_size, self.dropout, self.share_ff,
                            compute_dtype=self.compute_dtype,
                            name=f"layer{i}")(x, memory, src_mask, tgt_mask,
                                              pos_embed, deterministic)
            x = constrain_activation(x)
            if interce_layer > 0 and i == interce_layer - 1:
                inter = x
        x = LayerNorm(name="norm")(x)
        return (x, inter) if interce_layer > 0 else (x, None)


class Mix3AttDecoderLayer(nn.Module):
    """Self + audio-cross + text-cross attention layer for LMNAT.

    (reference: fanat_blocks.py:57-75 — note the reference has a latent typo
    `src_atn_text`; behavior here is the intended three-way attention.)
    """
    d_model: int
    n_head: int
    d_ff: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    audio_first: bool = True

    @nn.compact
    def __call__(self, x, memory_audio, memory_text, src_mask_audio,
                 src_mask_text, tgt_mask, deterministic=True):
        mk_attn = lambda name: MultiHeadedAttention(
            self.n_head, self.d_model, self.dropout,
            compute_dtype=self.compute_dtype, name=name)
        self_attn, a_attn, t_attn = mk_attn("self_attn"), mk_attn("src_attn_audio"), mk_attn("src_attn_text")
        ff = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout,
                                     compute_dtype=self.compute_dtype, name="ff")
        x = _Sublayer(self.dropout, name="sub0")(
            x, lambda h: self_attn(h, h, h, tgt_mask,
                                   deterministic=deterministic), deterministic)
        # audio_first swaps the audio/text cross-attention order
        # (reference: fanat_conformer_blocks.py:131-137, lmnat.py:52,58)
        audio = lambda h: _Sublayer(self.dropout, name="sub1")(
            h, lambda y: a_attn(y, memory_audio, memory_audio, src_mask_audio,
                                deterministic=deterministic), deterministic)
        text = lambda h: _Sublayer(self.dropout, name="sub2")(
            h, lambda y: t_attn(y, memory_text, memory_text, src_mask_text,
                                deterministic=deterministic), deterministic)
        x = text(audio(x)) if self.audio_first else audio(text(x))
        return _Sublayer(self.dropout, name="sub3")(
            x, lambda h: ff(h, deterministic=deterministic), deterministic)


class Mix3AttDecoder(nn.Module):
    """Stack of Mix3AttDecoderLayer + final norm (reference: fanat_blocks.py:161-185)."""
    d_model: int
    n_head: int
    d_ff: int
    n_layers: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    audio_first: bool = True

    @nn.compact
    def __call__(self, x, memory_audio, memory_text, src_mask_audio,
                 src_mask_text, tgt_mask, interce_layer: int = 0,
                 deterministic=True):
        inter = None
        for i in range(self.n_layers):
            x = Mix3AttDecoderLayer(self.d_model, self.n_head, self.d_ff,
                                    self.dropout, self.compute_dtype,
                                    audio_first=self.audio_first,
                                    name=f"layer{i}")(
                x, memory_audio, memory_text, src_mask_audio, src_mask_text,
                tgt_mask, deterministic)
            x = constrain_activation(x)
            if interce_layer > 0 and i == interce_layer - 1:
                inter = x
        x = LayerNorm(name="norm")(x)
        return (x, inter) if interce_layer > 0 else (x, None)
