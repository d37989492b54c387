"""Model forward smoke + correctness tests on tiny configs (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cassnat_asr_public_tpu.models import (
    make_cassnat,
    make_conformer,
    make_ctc_model,
    make_lm,
    make_transformer,
)
from cassnat_asr_public_tpu.utils.config import Config

VOCAB = 40


def tiny_args(**over):
    base = dict(
        vocab_size=VOCAB, N_enc=2, N_dec=2, N_extra=1, N_self_dec=2,
        N_mix_dec=1, d_model=32, d_ff=64, d_encff=48, d_decff=48, n_head=4,
        dropout=0.0, ctc_alpha=1.0, interctc_alpha=0.0, interctc_layer=0,
        label_smooth=0.1, padding_idx=0, use_conv_enc=True, use_conv_dec=True,
        enc_kernel_size=7, dec_kernel_size=3, enc_max_relative_len=6,
        dec_max_relative_len=4, pos_type="relative", share_ff=False,
        use_trigger=True, src_trigger=True, use_unimask=False,
        use_best_path=False,
    )
    base.update(over)
    return Config(**base)


def batch(rng, bs=2, tmax=32, umax=6, feat=20):
    feats = rng.normal(size=(bs, tmax, feat)).astype(np.float32)
    frames = tmax - 9 * (np.arange(bs) % 2)
    src_mask = np.arange(tmax)[None] < frames[:, None]
    label_sizes = umax - 2 - 2 * (np.arange(bs) % 2)
    labels = rng.integers(3, VOCAB, size=(bs, umax + 2))  # sos y.. eos pad
    labels[:, 0] = 1
    for b in range(bs):
        labels[b, 1 + label_sizes[b]] = 2
        labels[b, 2 + label_sizes[b]:] = 0
    return (jnp.asarray(feats), jnp.asarray(src_mask), jnp.asarray(labels),
            jnp.asarray(label_sizes))


def test_ast_transformer_forward(rng):
    args = tiny_args()
    model = make_transformer(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt, tgt_label = labels[:, :-1], labels[:, 1:]
    params = model.init(jax.random.PRNGKey(0), feats, src_mask, tgt,
                        tgt_label, label_sizes)
    out = model.apply(params, feats, src_mask, tgt, tgt_label, label_sizes)
    assert np.isfinite(float(out["loss"]))
    assert out["att_out"].shape == (2, tgt.shape[1], VOCAB)
    assert out["ctc_out"].shape[0] == 2
    # log-softmax rows sum to one in prob space
    s = np.exp(np.asarray(out["att_out"][0, 0])).sum()
    assert abs(s - 1.0) < 1e-3


def test_ast_conformer_forward(rng):
    args = tiny_args()
    model = make_conformer(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt, tgt_label = labels[:, :-1], labels[:, 1:]
    params = model.init(jax.random.PRNGKey(0), feats, src_mask, tgt,
                        tgt_label, label_sizes)
    out = model.apply(params, feats, src_mask, tgt, tgt_label, label_sizes)
    assert np.isfinite(float(out["loss"]))


def test_ctc_model_forward_and_greedy(rng):
    args = tiny_args()
    model = make_ctc_model(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt_label = labels[:, 1:]
    params = model.init(jax.random.PRNGKey(0), feats, src_mask, tgt_label,
                        label_sizes)
    out = model.apply(params, feats, src_mask, tgt_label, label_sizes)
    assert np.isfinite(float(out["loss"]))
    toks, lens = model.apply(params, feats, src_mask, method="greedy_decode")
    assert toks.shape[0] == 2


@pytest.mark.parametrize("conv_dec", [True, False])
def test_cassnat_forward(rng, conv_dec):
    args = tiny_args(use_conv_dec=conv_dec, use_conv_enc=conv_dec)
    model = make_cassnat(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt_label = labels[:, 1:]
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        feats, src_mask, tgt_label, label_sizes)
    out = model.apply(params, feats, src_mask, tgt_label, label_sizes)
    assert np.isfinite(float(out["loss"]))
    assert out["att_out"].shape == (2, tgt_label.shape[1], VOCAB)
    # grads flow
    def loss_fn(p):
        return model.apply(p, feats, src_mask, tgt_label, label_sizes)["loss"]
    g = jax.grad(lambda p: loss_fn(p))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_cassnat_interlosses(rng):
    args = tiny_args(interctc_alpha=0.5, interctc_layer=1,
                     interce_alpha=0.5, interce_layer=1)
    model = make_cassnat(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt_label = labels[:, 1:]
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, feats, src_mask, tgt_label,
        label_sizes)
    out = model.apply(params, feats, src_mask, tgt_label, label_sizes)
    assert "interctc_loss" in out and "interce_loss" in out
    assert np.isfinite(float(out["loss"]))


def test_cassnat_best_path_and_unimask(rng):
    args = tiny_args(use_best_path=True, use_unimask=True)
    model = make_cassnat(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt_label = labels[:, 1:]
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,
                        tgt_label, label_sizes)
    out = model.apply(params, feats, src_mask, tgt_label, label_sizes)
    assert np.isfinite(float(out["loss"]))


def test_lm_forward_and_cache_consistency(rng):
    args = Config(vocab_size=VOCAB, N=2, d_model=32, d_ff=64, n_head=4,
                  dropout=0.0, padding_idx=0)
    model = make_lm(args)
    tokens = jnp.asarray(rng.integers(1, VOCAB, size=(2, 7)))
    params = model.init(jax.random.PRNGKey(0), tokens)
    full = model.apply(params, tokens)  # (B, L, V)
    # Incremental scoring must match the full causal forward.
    cache = model.apply(params, 2, 16, method="init_cache")
    for pos in range(5):
        logp, cache = model.apply(params, tokens[:, pos], cache, pos,
                                  method="score_step")
        np.testing.assert_allclose(np.asarray(logp), np.asarray(full[:, pos]),
                                   rtol=2e-2, atol=2e-2)


def test_cassnat_nat_decode(rng):
    args = tiny_args()
    model = make_cassnat(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt_label = labels[:, 1:]
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,
                        tgt_label, label_sizes)
    enc_h, enc_mask, ctc_out = model.apply(params, feats, src_mask,
                                           method="encode_ctc")
    from cassnat_asr_public_tpu.ops import ctc_best_path_align
    shift, ylen = ctc_best_path_align(ctc_out, enc_mask)
    att_out, ylen1 = model.apply(params, enc_h, enc_mask, shift, ylen, 8,
                                 method="nat_decode")
    assert att_out.shape == (2, 8, VOCAB)
    assert (np.asarray(ylen1) == np.asarray(ylen) + 1).all()
