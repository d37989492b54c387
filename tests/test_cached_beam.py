"""KV-cached beam search must match the cache-less beam search exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from cassnat_asr_public_tpu.models import make_transformer
from cassnat_asr_public_tpu.utils.decoding import (
    ar_beam_decode_cached_jit,
    ar_beam_decode_jit,
)
from tests.test_models import batch, tiny_args


def test_cached_beam_matches_uncached(rng):
    args = tiny_args()
    model = make_transformer(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt, tgt_label = labels[:, :-1], labels[:, 1:]
    params = model.init(jax.random.PRNGKey(0), feats, src_mask, tgt,
                        tgt_label, label_sizes)
    kw = dict(beam_width=3, ctc_beam=5, ctc_weight=0.4, max_steps=6)
    ref = ar_beam_decode_jit(model, params, feats, src_mask, **kw)
    got = ar_beam_decode_cached_jit(model, params, feats, src_mask, **kw)
    np.testing.assert_array_equal(np.asarray(got["tokens"]),
                                  np.asarray(ref["tokens"]))
    np.testing.assert_allclose(np.asarray(got["scores"]),
                               np.asarray(ref["scores"]), rtol=1e-3,
                               atol=1e-3)


def test_cached_beam_no_ctc(rng):
    args = tiny_args()
    model = make_transformer(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt, tgt_label = labels[:, :-1], labels[:, 1:]
    params = model.init(jax.random.PRNGKey(0), feats, src_mask, tgt,
                        tgt_label, label_sizes)
    kw = dict(beam_width=2, ctc_beam=4, ctc_weight=0.0, max_steps=5)
    ref = ar_beam_decode_jit(model, params, feats, src_mask, **kw)
    got = ar_beam_decode_cached_jit(model, params, feats, src_mask, **kw)
    np.testing.assert_array_equal(np.asarray(got["tokens"]),
                                  np.asarray(ref["tokens"]))
