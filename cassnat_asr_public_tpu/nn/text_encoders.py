"""Text-encoder backbones for LMNAT fusion: GPT-2 style and BERT style.

The reference vendors torch ports of GPT-2 (src/models/gpt2/gpt2_model.py)
and BERT (src/models/bert/bert_model.py) purely to call
`extract_features` — contextual embeddings of a token sequence — inside the
LMNAT decoders. These are clean-room flax implementations of the same
architectures with `extract_features` surface; HF-format checkpoint import
lives in models/lmnat.py (torch deserialization + key map).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class GPT2Backbone(nn.Module):
    """Pre-LN causal transformer with learned positions (GPT-2 family)."""
    vocab_size: int = 50257
    n_layers: int = 12
    d_model: int = 768
    n_head: int = 12
    max_positions: int = 1024
    dropout: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def extract_features(self, tokens, deterministic: bool = True):
        """(B, L) -> (B, L, D) final hidden states (post final LN)."""
        b, l = tokens.shape
        wte = nn.Embed(self.vocab_size, self.d_model, name="wte")
        wpe = nn.Embed(self.max_positions, self.d_model, name="wpe")
        x = wte(tokens) + wpe(jnp.arange(l))[None]
        causal = jnp.tril(jnp.ones((l, l), bool))[None, None]
        h, dk = self.n_head, self.d_model // self.n_head
        for i in range(self.n_layers):
            y = nn.LayerNorm(name=f"ln1_{i}")(x)
            qkv = nn.Dense(3 * self.d_model, dtype=self.compute_dtype,
                           name=f"attn_qkv{i}")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, l, h, dk)
            k = k.reshape(b, l, h, dk)
            v = v.reshape(b, l, h, dk)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32) / jnp.sqrt(dk)
            s = jnp.where(causal, s, -1e9)
            w = jax.nn.softmax(s, axis=-1)
            att = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            att = nn.Dense(self.d_model, dtype=self.compute_dtype,
                           name=f"attn_out{i}")(att.reshape(b, l, -1))
            x = x + att
            y = nn.LayerNorm(name=f"ln2_{i}")(x)
            m = nn.Dense(4 * self.d_model, dtype=self.compute_dtype,
                         name=f"mlp_up{i}")(y)
            m = nn.gelu(m)
            m = nn.Dense(self.d_model, dtype=self.compute_dtype,
                         name=f"mlp_down{i}")(m)
            x = x + m
        return nn.LayerNorm(name="ln_f")(x)

    def __call__(self, tokens, deterministic: bool = True):
        return self.extract_features(tokens, deterministic)


class BertBackbone(nn.Module):
    """Post-LN bidirectional transformer with learned positions (BERT)."""
    vocab_size: int = 30522
    n_layers: int = 12
    d_model: int = 768
    n_head: int = 12
    d_ff: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    dropout: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def extract_features(self, tokens, attention_mask=None,
                         deterministic: bool = True):
        b, l = tokens.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, l), bool)
        x = nn.Embed(self.vocab_size, self.d_model, name="wte")(tokens) \
            + nn.Embed(self.max_positions, self.d_model, name="wpe")(
                jnp.arange(l))[None] \
            + nn.Embed(self.type_vocab, self.d_model, name="tte")(
                jnp.zeros((b, l), jnp.int32))
        x = nn.LayerNorm(name="emb_ln")(x)
        h, dk = self.n_head, self.d_model // self.n_head
        key_mask = attention_mask[:, None, None, :]
        for i in range(self.n_layers):
            q = nn.Dense(self.d_model, name=f"q{i}")(x).reshape(b, l, h, dk)
            k = nn.Dense(self.d_model, name=f"k{i}")(x).reshape(b, l, h, dk)
            v = nn.Dense(self.d_model, name=f"v{i}")(x).reshape(b, l, h, dk)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32) / jnp.sqrt(dk)
            s = jnp.where(key_mask, s, -1e9)
            w = jax.nn.softmax(s, axis=-1)
            att = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            att = nn.Dense(self.d_model, name=f"attn_out{i}")(
                att.reshape(b, l, -1))
            x = nn.LayerNorm(name=f"attn_ln{i}")(x + att)
            m = nn.gelu(nn.Dense(self.d_ff, name=f"fc1_{i}")(x))
            m = nn.Dense(self.d_model, name=f"fc2_{i}")(m)
            x = nn.LayerNorm(name=f"out_ln{i}")(x + m)
        return x

    def __call__(self, tokens, attention_mask=None, deterministic=True):
        return self.extract_features(tokens, attention_mask, deterministic)
