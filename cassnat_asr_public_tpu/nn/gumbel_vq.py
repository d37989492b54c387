"""Gumbel-softmax vector quantizer (wav2vec2 targets).

(reference: src/models/modules/gumbel_vector_quantizer.py — grouped codebook,
straight-through gumbel softmax in training, argmax one-hot in eval,
temperature annealed max*decay^step, code/prob perplexities.)
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class GumbelVectorQuantizer(nn.Module):
    dim: int
    num_vars: int = 320
    groups: int = 2
    vq_dim: int = 256
    temp_max: float = 2.0
    temp_min: float = 0.5
    temp_decay: float = 0.999995
    weight_proj_depth: int = 1
    weight_proj_factor: int = 1

    def setup(self):
        var_dim = self.vq_dim // self.groups
        self.codebook = self.param(
            "vars", nn.initializers.uniform(scale=1.0),
            (1, self.groups * self.num_vars, var_dim))
        if self.weight_proj_depth > 1:
            inner = self.dim * self.weight_proj_factor
            self.projs = [nn.Dense(inner, name=f"proj{i}")
                          for i in range(self.weight_proj_depth - 1)]
            self.proj_out = nn.Dense(self.groups * self.num_vars,
                                     name="proj_out")
        else:
            self.projs = []
            self.proj_out = nn.Dense(
                self.num_vars * self.groups,
                kernel_init=nn.initializers.normal(1.0),
                bias_init=nn.initializers.zeros, name="proj_out")

    def __call__(self, x, num_updates, train: bool = True):
        """x: (B, T, C) -> dict(x=(B,T,vq_dim) quantized, prob_perplexity,
        code_perplexity, num_vars, temp)."""
        b, t, _ = x.shape
        var_dim = self.vq_dim // self.groups
        codebook = self.codebook

        h = x
        for proj in self.projs:
            h = nn.gelu(proj(h))
        logits = self.proj_out(h)
        logits = logits.reshape(b * t * self.groups, self.num_vars)
        logits = logits.astype(jnp.float32)

        temp = jnp.maximum(self.temp_max * self.temp_decay ** num_updates,
                           self.temp_min)

        hard = jax.nn.one_hot(logits.argmax(-1), self.num_vars)
        if train:
            g = jax.random.gumbel(self.make_rng("gumbel"), logits.shape)
            soft = jax.nn.softmax((logits + g) / temp, axis=-1)
            hard_st = jax.nn.one_hot(soft.argmax(-1), self.num_vars)
            onehot = soft + jax.lax.stop_gradient(hard_st - soft)
        else:
            onehot = hard

        # perplexities (diversity diagnostics / loss)
        avg_probs = jax.nn.softmax(
            logits.reshape(b * t, self.groups, self.num_vars), axis=-1
        ).mean(0)  # (G, V)
        prob_ppl = jnp.exp(
            -(avg_probs * jnp.log(avg_probs + 1e-7)).sum(-1)).sum()
        hard_probs = hard.reshape(b * t, self.groups, self.num_vars).mean(0)
        code_ppl = jnp.exp(
            -(hard_probs * jnp.log(hard_probs + 1e-7)).sum(-1)).sum()

        cb = codebook.reshape(self.groups, self.num_vars, var_dim)
        sel = onehot.reshape(b, t, self.groups, self.num_vars)
        q = jnp.einsum("btgv,gvd->btgd", sel, cb).reshape(b, t, self.vq_dim)
        return {"x": q, "prob_perplexity": prob_ppl,
                "code_perplexity": code_ppl,
                "num_vars": self.num_vars * self.groups, "temp": temp}

    def sample_from_codebook(self, rng, b: int, n: int):
        """b*n uniformly random codebook combinations, (b, n, vq_dim).

        The reference enumerates all num_vars^groups combinations and
        samples combo indices (gumbel_vector_quantizer.py:118-129); sampling
        each group's codeword index independently is the same distribution
        without materializing the V^G table.
        """
        var_dim = self.vq_dim // self.groups
        idx = jax.random.randint(rng, (b * n, self.groups), 0, self.num_vars)
        cb = self.codebook.reshape(self.groups, self.num_vars, var_dim)
        z = jnp.take_along_axis(
            cb, idx.T[:, :, None], axis=1)          # (G, b*n, var_dim)
        return z.transpose(1, 0, 2).reshape(b, n, self.vq_dim)
