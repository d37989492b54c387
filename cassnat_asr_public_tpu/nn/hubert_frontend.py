"""HuBERT/wav2vec2 raw-waveform frontend + fairseq-style transformer encoder.

(reference: src/models/hubert/hubert_blocks.py — ConvFeatureExtractionModel
(7-layer strided 1-D conv over waveform, group-norm on the first layer,
GELU), conv positional embedding (kernel 128, 16 groups, weight-norm), and a
post-norm transformer encoder with layerdrop.)
"""

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# fairseq hubert-base conv spec: (dim, kernel, stride)
DEFAULT_CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 2, 2), (512, 2, 2))


def conv_out_length(n: int, layers=DEFAULT_CONV_LAYERS) -> int:
    for _, k, s in layers:
        n = (n - k) // s + 1
    return n


def parse_conv_layers(spec) -> Tuple[Tuple[int, int, int], ...]:
    """Parse the fairseq-style conv_feature_layers config string, e.g.
    '[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2'
    (reference: hubert_config.py conv_feature_layers, evaluated by
    fairseq with eval()). Restricted AST walk: only int/list/tuple
    literals combined with + and * are accepted."""
    if not isinstance(spec, str):
        return tuple(tuple(t) for t in spec)
    import ast

    def ev(n):
        if isinstance(n, ast.BinOp) and isinstance(n.op, (ast.Add, ast.Mult)):
            left, right = ev(n.left), ev(n.right)
            return left + right if isinstance(n.op, ast.Add) \
                else left * right
        if isinstance(n, ast.List):
            return [ev(e) for e in n.elts]
        if isinstance(n, ast.Tuple):
            return tuple(ev(e) for e in n.elts)
        if isinstance(n, ast.Constant) and isinstance(n.value, int):
            return n.value
        raise ValueError(f"unsupported conv_feature_layers: {spec!r}")

    return tuple(tuple(t) for t in ev(ast.parse(spec, mode="eval").body))


class ConvFeatureExtractor(nn.Module):
    """Strided 1-D conv stack over raw waveform (B, S) -> (B, T, C)."""
    conv_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    mode: str = "default"  # "default": group-norm on layer 0; "layer_norm"
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):
        x = wav[:, :, None].astype(self.compute_dtype)  # (B, S, 1)
        for i, (dim, k, s) in enumerate(self.conv_layers):
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=(self.mode == "layer_norm"),
                        dtype=self.compute_dtype, name=f"conv{i}")(x)
            if self.mode == "default" and i == 0:
                x = nn.GroupNorm(num_groups=dim, name="gn0")(x)
            elif self.mode == "layer_norm":
                x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.gelu(x)
        return x


class ConvPositionalEmbedding(nn.Module):
    """Grouped conv positional embedding (kernel 128, groups 16) + GELU."""
    d_model: int = 768
    kernel: int = 128
    groups: int = 16
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # fairseq pads (k//2) both sides then trims one element if k even.
        h = nn.Conv(self.d_model, (self.kernel,), padding=self.kernel // 2,
                    feature_group_count=self.groups,
                    dtype=self.compute_dtype, name="conv")(x)
        if self.kernel % 2 == 0:
            h = h[:, :-1]
        return nn.gelu(h)


class FairseqEncoderLayer(nn.Module):
    """Post-norm transformer layer (fairseq layer_norm_first=False)."""
    d_model: int = 768
    n_head: int = 12
    d_ff: int = 3072
    dropout: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        h, dk = self.n_head, self.d_model // self.n_head
        dense = lambda name: nn.Dense(self.d_model, dtype=self.compute_dtype,
                                      name=name)
        q = dense("q")(x).reshape(*x.shape[:2], h, dk)
        k = dense("k")(x).reshape(*x.shape[:2], h, dk)
        v = dense("v")(x).reshape(*x.shape[:2], h, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(dk)
        if pad_mask is not None:
            scores = jnp.where(pad_mask[:, None, None, :], scores, -1e9)
        w = jax.nn.softmax(scores, axis=-1)
        w = nn.Dropout(self.dropout)(w, deterministic=deterministic)
        att = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        att = dense("out")(att.reshape(*x.shape))
        x = nn.LayerNorm(name="attn_ln")(
            x + nn.Dropout(self.dropout)(att, deterministic=deterministic))
        hmid = nn.gelu(nn.Dense(self.d_ff, dtype=self.compute_dtype,
                                name="fc1")(x))
        hmid = nn.Dropout(self.dropout)(hmid, deterministic=deterministic)
        hout = nn.Dense(self.d_model, dtype=self.compute_dtype,
                        name="fc2")(hmid)
        return nn.LayerNorm(name="final_ln")(
            x + nn.Dropout(self.dropout)(hout, deterministic=deterministic))


class HubertTransformerEncoder(nn.Module):
    """Conv-pos-embedding + N post-norm layers with layerdrop.

    (reference: hubert_blocks.py:146-311)
    """
    n_layers: int = 12
    d_model: int = 768
    n_head: int = 12
    d_ff: int = 3072
    dropout: float = 0.1
    layerdrop: float = 0.05
    conv_pos: int = 128
    conv_pos_groups: int = 16
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        x = x + ConvPositionalEmbedding(self.d_model, self.conv_pos,
                                        self.conv_pos_groups,
                                        compute_dtype=self.compute_dtype,
                                        name="pos_conv")(x)
        x = nn.LayerNorm(name="ln")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.n_layers):
            y = FairseqEncoderLayer(self.d_model, self.n_head, self.d_ff,
                                    self.dropout, self.compute_dtype,
                                    name=f"layer{i}")(x, pad_mask,
                                                      deterministic)
            if not deterministic and self.layerdrop > 0:
                keep = jax.random.bernoulli(
                    self.make_rng("layerdrop"), 1.0 - self.layerdrop)
                x = jnp.where(keep, y, x)
            else:
                x = y
        return x
