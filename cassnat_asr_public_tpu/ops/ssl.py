"""SSL utilities: jittable span masking, negative sampling, InfoNCE logits.

Static-shape re-designs of the fairseq-style numpy helpers the reference uses
(reference: src/models/modules/ssl_util.py compute_mask_indices;
src/models/wav2vec_model.py:240-334 apply_mask/sample_negatives/compute_pred).
JAX requires every sample to mask the SAME number of positions (the reference
gets this via require_same_masks=True), so the span count is computed
statically from (mask_prob, mask_length, seq_len).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def num_mask_spans(seq_len: int, mask_prob: float, mask_length: int,
                   min_masks: int = 2) -> int:
    """Static span count: E[masked frames] = mask_prob * seq_len."""
    return max(min_masks, int(mask_prob * seq_len / float(mask_length) + 0.5))


@partial(jax.jit, static_argnames=("tmax", "n_spans", "mask_length"))
def compute_span_mask(rng, lengths: jnp.ndarray, tmax: int, n_spans: int,
                      mask_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, tmax) bool span mask; same span count per row.

    Span starts are uniform in [0, len - mask_length]; overlaps allowed
    (fairseq 'static' selection with overlap, the default config).
    """
    b = lengths.shape[0]
    hi = jnp.maximum(lengths - mask_length, 1)
    starts = jax.random.randint(rng, (b, n_spans), 0, 2 ** 30) % hi[:, None]
    pos = jnp.arange(tmax)[None, None, :]
    spans = (pos >= starts[..., None]) & (pos < starts[..., None] + mask_length)
    mask = spans.any(axis=1)
    valid = jnp.arange(tmax)[None, :] < lengths[:, None]
    return mask & valid


def gather_fixed_count(x: jnp.ndarray, mask: jnp.ndarray, count: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather up to `count` True positions per row (left-aligned), padding by
    repeating the first masked position. Returns (gathered (B,count,C),
    valid (B,count))."""
    b, t = mask.shape
    order = jnp.argsort(~mask, axis=1, stable=True)  # masked positions first
    idx = order[:, :count]
    n = mask.sum(1)
    valid = jnp.arange(count)[None, :] < n[:, None]
    idx = jnp.where(valid, idx, idx[:, :1])
    return jnp.take_along_axis(x, idx[..., None], axis=1), valid


@partial(jax.jit, static_argnames=("n_negatives",))
def sample_negatives(rng, y: jnp.ndarray, n_negatives: int,
                     pool: jnp.ndarray = None) -> jnp.ndarray:
    """Sample N negatives per target from the same utterance, excluding self.

    y: (B, M, C) target features. `pool` (B, P, C) optionally provides the
    sampling source (`negatives_from_everywhere`: all frames, not just the
    masked ones); defaults to y itself. The reference excludes the
    same-index pool entry in both modes. Returns (N, B, M, C)
    (reference: wav2vec_model.py:277-334, from-everywhere at 141-152).
    """
    pool = y if pool is None else pool
    b, m, c = y.shape
    p = pool.shape[1]
    tszs = jnp.repeat(jnp.arange(m), n_negatives).reshape(1, -1)  # (1, M*N)
    neg = jax.random.randint(rng, (b, m * n_negatives), 0,
                             max(p - 1, 1))
    neg = jnp.where(neg >= tszs, neg + 1, neg)  # skip self index
    neg = jnp.clip(neg, 0, p - 1)
    negs = jnp.take_along_axis(pool, neg[..., None], axis=1)  # (B, M*N, C)
    return negs.reshape(b, m, n_negatives, c).transpose(2, 0, 1, 3)


def infonce_logits(x: jnp.ndarray, y: jnp.ndarray, negs: jnp.ndarray,
                   logit_temp: float = 0.1) -> jnp.ndarray:
    """Cosine-similarity contrastive logits (target first).

    x: (B, M, C) predictions; y: (B, M, C) positives; negs: (N, B, M, C).
    Returns (1+N, B, M) logits; negatives identical to the positive are
    forced to -inf (reference: wav2vec_model.py:203-217).
    """
    targets = jnp.concatenate([y[None], negs], axis=0)  # (1+N, B, M, C)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    tn = targets / jnp.maximum(
        jnp.linalg.norm(targets, axis=-1, keepdims=True), 1e-8)
    logits = jnp.einsum("bmc,nbmc->nbm", xn, tn) / logit_temp
    neg_is_pos = (targets[1:] == y[None]).all(-1)  # (N, B, M)
    logits = logits.at[1:].set(
        jnp.where(neg_is_pos, -jnp.inf, logits[1:]))
    return logits
