"""Compact clamped-table relative attention must equal the wide rel-shift."""

import numpy as np
import jax
import jax.numpy as jnp

from cassnat_asr_public_tpu.nn.modules import (
    RelMultiHeadedAttention,
    RelativePositionalEncoding,
    rel_shift,
    sinusoidal_position_encoding,
)


def _wide_reference(params, x, mask, max_rel, n_head, d_model):
    """Reference computation with the full (2T-1, d) clamped table."""
    import math
    t = x.shape[1]
    table = jnp.asarray(sinusoidal_position_encoding(2 * max_rel + 1, d_model))
    rel = jnp.arange(-(t - 1), t)
    idx = jnp.clip(rel, -max_rel, max_rel) + max_rel
    pos_wide = table[idx]

    attn = RelMultiHeadedAttention(n_head, d_model, 0.0)
    return attn.apply(params, x, x, x, mask, pos_wide)


def test_compact_rel_equals_wide(rng):
    d_model, n_head, max_rel, t = 32, 4, 4, 24
    x = jnp.asarray(rng.normal(size=(2, t, d_model)).astype(np.float32))
    mask = jnp.asarray(rng.random((2, t, t)) > 0.2)

    pe = RelativePositionalEncoding(d_model, 0.0, max_rel)
    (xd, pos_compact), _ = pe.init_with_output(jax.random.PRNGKey(0), x)
    assert pos_compact.shape[0] == 2 * max_rel + 1  # compact path active

    attn = RelMultiHeadedAttention(n_head, d_model, 0.0)
    params = attn.init(jax.random.PRNGKey(1), xd, xd, xd, mask, pos_compact)
    got = attn.apply(params, xd, xd, xd, mask, pos_compact)
    want = _wide_reference(params, xd, mask, max_rel, n_head, d_model)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_wide_path_when_window_covers_sequence(rng):
    # short sequence: window covers everything -> wide path, still correct
    d_model, n_head, max_rel, t = 32, 4, 10, 6
    x = jnp.asarray(rng.normal(size=(1, t, d_model)).astype(np.float32))
    mask = jnp.ones((1, t, t), bool)
    pe = RelativePositionalEncoding(d_model, 0.0, max_rel)
    (xd, pos), _ = pe.init_with_output(jax.random.PRNGKey(0), x)
    assert pos.shape[0] == 2 * t - 1
    attn = RelMultiHeadedAttention(n_head, d_model, 0.0)
    params = attn.init(jax.random.PRNGKey(1), xd, xd, xd, mask, pos)
    out = attn.apply(params, xd, xd, xd, mask, pos)
    assert np.isfinite(np.asarray(out)).all()
