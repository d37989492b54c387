"""Transformer language model with a true KV cache for incremental scoring.

(reference: src/models/lm.py — TextEmbedding+PE -> causal Encoder ->
log-softmax head; incremental scoring via per-layer caches
lm.py:77-89 / transformer_blocks.py:73-81. The reference cache re-appends
full layer outputs; here we keep per-layer K/V tensors updated in place at a
static write index — the TPU-friendly formulation.)

Supports uni-directional (causal) LM and masked (BERT-style) LM training
targets; the masking itself happens in the data layer
(reference: src/bin/lm_train.py:208-215, src/data/text_loader.py:84-110).
"""

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cassnat_asr_public_tpu.nn.modules import (
    Generator,
    LayerNorm,
    PositionalEncoding,
    PositionwiseFeedForward,
    TextEmbedding,
    sinusoidal_position_encoding,
)
from cassnat_asr_public_tpu.nn.blocks import _Sublayer


class CachedSelfAttention(nn.Module):
    """Self-attention whose K/V can be cached for single-token steps."""
    n_head: int
    d_model: int
    dropout: float = 0.1
    compute_dtype: Any = jnp.float32

    def setup(self):
        mk = lambda name, bias=True: nn.Dense(
            self.d_model, use_bias=bias, dtype=self.compute_dtype, name=name,
            kernel_init=nn.initializers.xavier_uniform())
        self.q_proj, self.k_proj, self.v_proj, self.o_proj = (
            mk("q"), mk("k"), mk("v"), mk("out"))
        self.attn_drop = nn.Dropout(self.dropout)

    def _heads(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_head, self.d_model // self.n_head)

    def _attend(self, q, k, v, mask, deterministic):
        dk = self.d_model // self.n_head
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dk)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e9)
        w = jax.nn.softmax(scores, axis=-1)
        w = self.attn_drop(w, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        b, t = q.shape[0], q.shape[1]
        return self.o_proj(out.reshape(b, t, self.d_model)
                           .astype(self.compute_dtype))

    def __call__(self, x, mask, deterministic=True):
        q, k, v = self._heads(self.q_proj(x)), self._heads(self.k_proj(x)), \
            self._heads(self.v_proj(x))
        return self._attend(q, k, v, mask, deterministic)

    def step(self, x_t, cache_k, cache_v, pos):
        """One-token step. x_t: (B, 1, D); caches: (B, L, H, Dk); pos: scalar.

        Returns (out (B,1,D), new_cache_k, new_cache_v).
        """
        q = self._heads(self.q_proj(x_t))
        k_t = self._heads(self.k_proj(x_t))
        v_t = self._heads(self.v_proj(x_t))
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_t, pos, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_t, pos, axis=1)
        lmax = cache_k.shape[1]
        mask = (jnp.arange(lmax)[None, None, None, :] <= pos)
        out = self._attend(q, cache_k, cache_v, mask, True)
        return out, cache_k, cache_v

    def step_at(self, x_t, cache_k, cache_v, pos):
        """One-token step with PER-ROW write positions. pos: (B,).

        Used by the frame-synchronous CTC beam, whose hypotheses grow at
        different rates (unlike the label-synchronous AR beam where every
        live beam has the same length)."""
        q = self._heads(self.q_proj(x_t))
        k_t = self._heads(self.k_proj(x_t))
        v_t = self._heads(self.v_proj(x_t))
        lmax = cache_k.shape[1]
        at = (jnp.arange(lmax)[None, :] == pos[:, None])[..., None, None]
        cache_k = jnp.where(at, k_t, cache_k)
        cache_v = jnp.where(at, v_t, cache_v)
        mask = (jnp.arange(lmax)[None, None, None, :] <= pos[:, None, None,
                                                            None])
        out = self._attend(q, cache_k, cache_v, mask, True)
        return out, cache_k, cache_v


class LMLayer(nn.Module):
    d_model: int
    n_head: int
    d_ff: int
    dropout: float = 0.1
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.self_attn = CachedSelfAttention(self.n_head, self.d_model,
                                             self.dropout, self.compute_dtype,
                                             name="self_attn")
        self.ff = PositionwiseFeedForward(self.d_model, self.d_ff,
                                          self.dropout,
                                          compute_dtype=self.compute_dtype,
                                          name="ff")
        self.norm1 = LayerNorm(name="norm1")
        self.norm2 = LayerNorm(name="norm2")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, mask, deterministic=True):
        h = self.self_attn(self.norm1(x), mask, deterministic)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.ff(self.norm2(x), deterministic=deterministic)
        return x + self.drop(h, deterministic=deterministic)

    def step(self, x_t, cache_k, cache_v, pos):
        h, ck, cv = self.self_attn.step(self.norm1(x_t), cache_k, cache_v, pos)
        x_t = x_t + h
        x_t = x_t + self.ff(self.norm2(x_t), deterministic=True)
        return x_t, ck, cv

    def step_at(self, x_t, cache_k, cache_v, pos):
        h, ck, cv = self.self_attn.step_at(self.norm1(x_t), cache_k,
                                           cache_v, pos)
        x_t = x_t + h
        x_t = x_t + self.ff(self.norm2(x_t), deterministic=True)
        return x_t, ck, cv


class TransformerLM(nn.Module):
    """(reference: src/models/lm.py:16-97)"""
    vocab_size: int
    n_layers: int = 16
    d_model: int = 512
    d_ff: int = 2048
    n_head: int = 8
    dropout: float = 0.1
    padding_idx: int = 0
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.embed = TextEmbedding(self.vocab_size, self.d_model, name="embed")
        self.pos = PositionalEncoding(self.d_model, self.dropout, name="pos")
        self.layers = [LMLayer(self.d_model, self.n_head, self.d_ff,
                               self.dropout, self.compute_dtype,
                               name=f"layer{i}")
                       for i in range(self.n_layers)]
        self.norm = LayerNorm(name="norm")
        self.generator = Generator(self.vocab_size,
                                   compute_dtype=self.compute_dtype,
                                   name="generator")

    def backbone(self, tokens, causal: bool = True, deterministic=True):
        """Hidden states; causal=False gives the MLM (bidirectional) mode.

        (reference: lm.py:58-66 forward_backbone/extract_features)
        """
        t = tokens.shape[1]
        mask = (tokens != self.padding_idx)[:, None, None, :]
        if causal:
            mask = mask & jnp.tril(jnp.ones((t, t), bool))[None, None]
        # keep the residual stream in compute_dtype (norm statistics are
        # f32 inside LayerNorm either way); an f32 stream doubles the HBM
        # traffic of every residual add / norm across 16 layers
        x = self.pos(self.embed(tokens).astype(self.compute_dtype),
                     deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, mask, deterministic)
        return self.norm(x)

    def __call__(self, tokens, causal: bool = True, deterministic=True):
        """(B, L) -> (B, L, V) log-probs."""
        return self.generator(self.backbone(tokens, causal, deterministic))

    def forward_logits(self, tokens, causal: bool = True,
                       deterministic=True):
        """(B, L) -> (B, L, V) raw logits — rankers that only gather
        per-token scores use logit - logsumexp and skip the f32
        log-softmax materialization over the vocab."""
        return self.generator.logits(
            self.backbone(tokens, causal, deterministic))

    def extract_features(self, tokens, deterministic=True):
        return self.backbone(tokens, causal=True, deterministic=deterministic)

    def init_cache(self, batch: int, max_len: int):
        dk = self.d_model // self.n_head
        shape = (batch, max_len, self.n_head, dk)
        return {f"layer{i}": (jnp.zeros(shape, self.compute_dtype),
                              jnp.zeros(shape, self.compute_dtype))
                for i in range(self.n_layers)}

    def score_step(self, token, cache, pos):
        """Incremental next-token log-probs (reference: lm.py:77-89).

        token: (B,) current input token; cache: pytree from init_cache;
        pos: scalar write index. Returns ((B, V) log-probs, new cache).
        """
        x = self.embed(token[:, None]).astype(self.compute_dtype)
        pe = jnp.asarray(sinusoidal_position_encoding(5000, self.d_model))
        x = x + jax.lax.dynamic_slice_in_dim(pe, pos, 1, axis=0)[None] \
            .astype(self.compute_dtype)
        new_cache = {}
        for i, layer in enumerate(self.layers):
            ck, cv = cache[f"layer{i}"]
            x, ck, cv = layer.step(x, ck, cv, pos)
            new_cache[f"layer{i}"] = (ck, cv)
        logp = self.generator(self.norm(x))[:, 0]
        return logp, new_cache

    def score_step_at(self, token, cache, pos):
        """`score_step` with PER-ROW write positions (pos: (B,)).

        Feeds token[b] at position pos[b] of row b's cache and returns the
        next-token log-probs given each row's own prefix — the primitive
        the frame-synchronous CTC beam needs, since its hypotheses have
        ragged lengths (reference: src/utils/beam_decode.py:31-55 queries
        the LM per frame on ragged prefixes)."""
        x = self.embed(token[:, None]).astype(self.compute_dtype)
        pe = jnp.asarray(sinusoidal_position_encoding(5000, self.d_model))
        x = x + pe[pos][:, None, :].astype(self.compute_dtype)
        new_cache = {}
        for i, layer in enumerate(self.layers):
            ck, cv = cache[f"layer{i}"]
            x, ck, cv = layer.step_at(x, ck, cv, pos)
            new_cache[f"layer{i}"] = (ck, cv)
        logp = self.generator(self.norm(x))[:, 0]
        return logp, new_cache


def make_model(args) -> TransformerLM:
    """(reference: src/models/lm.py:16-32)"""
    return TransformerLM(
        vocab_size=args.vocab_size,
        n_layers=getattr(args, "N", getattr(args, "N_enc", 16)),
        d_model=args.d_model,
        d_ff=args.d_ff,
        n_head=args.n_head,
        dropout=args.dropout,
        padding_idx=getattr(args, "padding_idx", 0),
        compute_dtype=getattr(args, "compute_dtype", jnp.float32),
    )
