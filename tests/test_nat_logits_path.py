"""Logits-only NAT decode fast path == log-softmax path.

`nat_decode(..., return_logits=True)` must yield exactly
log_softmax(logits) == the default return, and the confidence ranking in
nat_decode_jit (logit - logsumexp) must equal gathering from log-probs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_models import batch, tiny_args, VOCAB


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def test_esa_topk_preselection(rng):
    """esa_topk: full-K selection == no-topk; K<S stays well-formed and
    reduces to the argmax path when sampling is disabled (threshold=0)."""
    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.utils.decoding import nat_decode_jit

    args = tiny_args(use_conv_enc=False, use_conv_dec=False,
                     pos_type="absolute")
    model = make_cassnat(VOCAB, args)
    feats, src_mask, labels, label_sizes = batch(rng, bs=2)
    tgt = labels[:, 1:]
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,
                        tgt, label_sizes)
    key = jax.random.PRNGKey(7)
    base = nat_decode_jit(model, params, feats, src_mask, key, umax=8,
                          sample_num=6)
    full = nat_decode_jit(model, params, feats, src_mask, key, umax=8,
                          sample_num=6, esa_topk=6)
    np.testing.assert_array_equal(np.asarray(base["tokens"]),
                                  np.asarray(full["tokens"]))
    np.testing.assert_array_equal(np.asarray(base["lengths"]),
                                  np.asarray(full["lengths"]))
    # threshold=0: every candidate is the argmax path, so any K gives the
    # single-pass greedy NAT result
    greedy = nat_decode_jit(model, params, feats, src_mask, key, umax=8,
                            sample_num=1)
    pruned = nat_decode_jit(model, params, feats, src_mask, key, umax=8,
                            sample_num=6, esa_topk=2, threshold=0.0)
    np.testing.assert_array_equal(np.asarray(pruned["tokens"]),
                                  np.asarray(greedy["tokens"]))
    np.testing.assert_array_equal(np.asarray(pruned["lengths"]),
                                  np.asarray(greedy["lengths"]))


def test_lm_rank_logits_flavor_equivalent(rng):
    """nat_decode_jit rank_model='lm': logits-returning lm_apply (the task's
    fast path) selects the same candidates as the log-prob one."""
    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.models.lm import TransformerLM
    from cassnat_asr_public_tpu.utils.decoding import nat_decode_jit

    args = tiny_args(use_conv_enc=False, use_conv_dec=False,
                     pos_type="absolute")
    model = make_cassnat(VOCAB, args)
    feats, src_mask, labels, label_sizes = batch(rng, bs=2)
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,
                        labels[:, 1:], label_sizes)
    lm = TransformerLM(VOCAB, n_layers=2, d_model=16, d_ff=32, n_head=2,
                       dropout=0.0)
    lm_params = lm.init(jax.random.PRNGKey(1), jnp.ones((1, 4), jnp.int32))
    key = jax.random.PRNGKey(5)

    def lp_apply(p, ys, f, m):
        return lm.apply(p, ys)

    def lg_apply(p, ys, f, m):
        return lm.apply(p, ys, method="forward_logits")

    a = nat_decode_jit(model, params, feats, src_mask, key, umax=8,
                       sample_num=4, rank_model="lm", lm_apply=lp_apply,
                       lm_params=lm_params)
    b = nat_decode_jit(model, params, feats, src_mask, key, umax=8,
                       sample_num=4, rank_model="lm", lm_apply=lg_apply,
                       lm_params=lm_params, lm_apply_logits=True)
    np.testing.assert_array_equal(np.asarray(a["tokens"]),
                                  np.asarray(b["tokens"]))
    np.testing.assert_array_equal(np.asarray(a["lengths"]),
                                  np.asarray(b["lengths"]))


def test_lm_forward_logits_consistent(rng):
    from cassnat_asr_public_tpu.models.lm import TransformerLM
    lm = TransformerLM(17, n_layers=2, d_model=16, d_ff=32, n_head=2,
                       dropout=0.0)
    toks = jnp.asarray(rng.integers(3, 17, size=(2, 6)), jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), toks)
    logp = lm.apply(params, toks)
    logits = lm.apply(params, toks, method="forward_logits")
    recon = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(logp),
                               rtol=1e-5, atol=1e-5)
    # ranking formula equivalence
    g1 = jnp.take_along_axis(logp, toks[..., None], -1)[..., 0]
    g2 = (jnp.take_along_axis(logits, toks[..., None], -1)[..., 0]
          .astype(jnp.float32)
          - jax.nn.logsumexp(logits.astype(jnp.float32), -1))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_nat_decode_logits_consistent(rng):
    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.ops.ctc import ctc_best_path_align

    args = tiny_args(use_conv_enc=False, use_conv_dec=False,
                     pos_type="absolute")
    model = make_cassnat(VOCAB, args)
    feats, src_mask, labels, label_sizes = batch(rng, bs=2)
    tgt = labels[:, 1:]
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,
                        tgt, label_sizes)
    enc_h, enc_mask, ctc_out = model.apply(params, feats, src_mask,
                                           method="encode_ctc")
    shift, ylen0 = ctc_best_path_align(ctc_out, enc_mask)
    umax = 8
    logp, yl1 = model.apply(params, enc_h, enc_mask, shift, ylen0, umax,
                            method="nat_decode")
    logits, yl2 = model.apply(params, enc_h, enc_mask, shift, ylen0, umax,
                              method="nat_decode", return_logits=True)
    np.testing.assert_array_equal(np.asarray(yl1), np.asarray(yl2))
    # same argmax and log-probs reconstructible from logits
    np.testing.assert_array_equal(np.asarray(logp.argmax(-1)),
                                  np.asarray(logits.argmax(-1)))
    recon = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(logp),
                               rtol=1e-5, atol=1e-5)
    # confidence of the argmax token: gather-from-logprobs vs
    # logit - logsumexp (the nat_decode_jit fast-path formula)
    pred = logits.argmax(-1)
    g1 = jnp.take_along_axis(logp, pred[..., None], -1)[..., 0]
    g2 = (jnp.take_along_axis(logits, pred[..., None], -1)[..., 0]
          .astype(jnp.float32)
          - jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)
