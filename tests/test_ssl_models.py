"""SSL / HuBERT / LMNAT model forward tests (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cassnat_asr_public_tpu.models.wav2vec import make_model as make_wav2vec
from cassnat_asr_public_tpu.models.hubert import (
    HubertNAT,
    load_fairseq_hubert,
    make_model as make_hubert,
)
from cassnat_asr_public_tpu.models.lmnat import (
    make_lmnat,
    make_lmnat2,
    make_lmnat3,
)
from cassnat_asr_public_tpu.utils.config import Config
from tests.test_models import batch, tiny_args, VOCAB


def test_wav2vec_forward(rng):
    args = Config(model_type="transformer", N_enc=2, d_model=32, d_ff=64,
                  d_encff=48, n_head=4, dropout=0.0, enc_kernel_size=7,
                  enc_max_relative_len=4, pos_type="absolute", share_ff=False,
                  mask_prob=0.5, mask_length=3, num_negatives=8,
                  logit_temp=0.1, final_dim=16, quantize_targets=True,
                  latent_vars=12, latent_groups=2)
    model = make_wav2vec(20, args)
    feats = jnp.asarray(rng.normal(size=(2, 48, 20)).astype(np.float32))
    mask = jnp.ones((2, 48), bool)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "negatives": jax.random.PRNGKey(2), "gumbel": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4)}
    params = model.init(rngs, feats, mask, 0, deterministic=False)
    out = model.apply(params, feats, mask, 0, deterministic=False,
                      rngs={k: v for k, v in rngs.items() if k != "params"})
    assert np.isfinite(float(out["loss"]))
    assert 0.0 <= float(out["accuracy"]) <= 1.0
    assert "prob_perplexity" in out

    # grads finite
    def loss(p):
        return model.apply(p, feats, mask, 0, deterministic=False,
                           rngs={k: v for k, v in rngs.items()
                                 if k != "params"})["loss"]
    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def _w2v_out(rng, **over):
    cfg = dict(model_type="transformer", N_enc=2, d_model=32, d_ff=64,
               d_encff=48, n_head=4, dropout=0.0, enc_kernel_size=7,
               enc_max_relative_len=4, pos_type="absolute", share_ff=False,
               mask_prob=0.5, mask_length=3, num_negatives=8,
               logit_temp=0.1, final_dim=16, quantize_targets=True,
               latent_vars=12, latent_groups=2)
    cfg.update(over)
    model = make_wav2vec(20, Config(**cfg))
    feats = jnp.asarray(rng.normal(size=(2, 48, 20)).astype(np.float32))
    mask = jnp.ones((2, 48), bool)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "negatives": jax.random.PRNGKey(2),
            "gumbel": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4),
            "codebook": jax.random.PRNGKey(5)}
    params = model.init(rngs, feats, mask, 0, deterministic=False)
    out = model.apply(params, feats, mask, 0, deterministic=False,
                      rngs={k: v for k, v in rngs.items() if k != "params"})
    return out


def test_wav2vec_negatives_from_everywhere(rng):
    """The from-everywhere variant samples negatives from all frames and
    must change the contrastive loss (reference: wav2vec_model.py:141-152)."""
    base = _w2v_out(rng)
    few = _w2v_out(rng, negatives_from_everywhere=True)
    assert np.isfinite(float(few["loss"]))
    assert abs(float(few["contrastive_loss"])
               - float(base["contrastive_loss"])) > 1e-7


def test_wav2vec_codebook_negatives(rng):
    """codebook_negatives adds K uniformly-sampled codebook entries to the
    negative set (reference: wav2vec_model.py:163-168)."""
    base = _w2v_out(rng)
    cb = _w2v_out(rng, codebook_negatives=4)
    assert np.isfinite(float(cb["loss"]))
    assert abs(float(cb["contrastive_loss"])
               - float(base["contrastive_loss"])) > 1e-7


def test_codebook_sampler_shapes(rng):
    from cassnat_asr_public_tpu.nn.gumbel_vq import GumbelVectorQuantizer
    vq = GumbelVectorQuantizer(dim=32, num_vars=12, groups=2, vq_dim=16)
    x = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    params = vq.init({"params": jax.random.PRNGKey(0),
                      "gumbel": jax.random.PRNGKey(1)}, x, 0)
    z = vq.apply(params, jax.random.PRNGKey(2), 6, 4,
                 method="sample_from_codebook")
    assert z.shape == (6, 4, 16)
    # every sampled row is a concatenation of two codebook vectors
    cb = np.asarray(params["params"]["vars"]).reshape(2, 12, 8)
    z0 = np.asarray(z)[0, 0]
    assert any(np.allclose(z0[:8], cb[0, v]) for v in range(12))
    assert any(np.allclose(z0[8:], cb[1, v]) for v in range(12))


def hubert_tiny_args():
    return Config(vocab_size=VOCAB, encoder_embed_dim=32, encoder_layers=2,
                  encoder_attention_heads=4, encoder_ffn_embed_dim=64,
                  encoder_dropout=0.0, encoder_layerdrop=0.0,
                  use_conv_dec=False, N_extra=1, N_self_dec=1, N_mix_dec=1,
                  d_decff=48, n_head=4, dec_kernel_size=3,
                  dec_max_relative_len=4, dropout=0.0, src_trigger=True,
                  use_best_path=False, ctc_alpha=1.0, att_alpha=1.0,
                  label_smooth=0.1, padding_idx=0, freeze_encoder=False)


def test_hubert_nat_forward(rng):
    args = hubert_tiny_args()
    model = make_hubert(args)
    wav = jnp.asarray(rng.normal(size=(2, 3200)).astype(np.float32))
    wav_lens = jnp.asarray([3200, 2400])
    labels = np.zeros((2, 6), np.int32)
    labels[:, :4] = rng.integers(3, VOCAB, size=(2, 4))
    labels[0, 4] = 2
    labels[1, 2] = 2
    labels[1, 3:] = 0
    lab_sizes = jnp.asarray([4, 2])
    params = model.init({"params": jax.random.PRNGKey(0)}, wav, wav_lens,
                        jnp.asarray(labels), lab_sizes)
    out = model.apply(params, wav, wav_lens, jnp.asarray(labels), lab_sizes)
    assert np.isfinite(float(out["loss"]))


def test_hubert_finetune_mask_and_grad_mult(rng):
    """hubert_train.yaml fine-tune knobs: mask_prob span augmentation is
    applied in training only (reference: hubert_model.py:160 ->
    hubert_blocks.py apply_mask), feature_grad_mult scales the
    conv-frontend gradient (hubert_blocks.py forward_features), and
    conv_feature_layers config strings parse like fairseq's eval."""
    from cassnat_asr_public_tpu.nn.hubert_frontend import parse_conv_layers
    assert parse_conv_layers("[(24,10,5)] + [(24,3,2)] * 2") == \
        ((24, 10, 5), (24, 3, 2), (24, 3, 2))

    def build(gmult):
        args = hubert_tiny_args()
        args.mask_prob = 0.5
        args.mask_length = 3
        args.feature_grad_mult = gmult
        args.conv_feature_layers = "[(24,10,5)] + [(24,3,2)] * 2"
        return make_hubert(args)

    model = build(0.1)
    wav = jnp.asarray(rng.normal(size=(2, 3200)).astype(np.float32))
    wav_lens = jnp.asarray([3200, 2400])
    labels = np.zeros((2, 6), np.int32)
    labels[:, :4] = rng.integers(3, VOCAB, size=(2, 4))
    labels[0, 4] = 2
    labels[1, 2] = 2
    labels[1, 3:] = 0
    lab_sizes = jnp.asarray([4, 2])
    params = model.init({"params": jax.random.PRNGKey(0)}, wav, wav_lens,
                        jnp.asarray(labels), lab_sizes)

    ev = model.apply(params, wav, wav_lens, jnp.asarray(labels), lab_sizes,
                     deterministic=True)
    tr = model.apply(params, wav, wav_lens, jnp.asarray(labels), lab_sizes,
                     deterministic=False,
                     rngs={"mask": jax.random.PRNGKey(3)})
    # span masking replaced frames with mask_embed -> training loss differs
    assert abs(float(ev["loss"]) - float(tr["loss"])) > 1e-6

    def conv_grads(gmult):
        m = build(gmult)
        g = jax.grad(lambda p: m.apply(
            p, wav, wav_lens, jnp.asarray(labels), lab_sizes,
            deterministic=True)["loss"])(params)
        fe = g["params"]["hub_base"]["feature_extractor"]
        return np.asarray(fe["conv0"]["kernel"]), \
            np.asarray(g["params"]["hub_base"]["post_extract_proj"]["kernel"])

    g01, proj01 = conv_grads(0.1)
    g10, proj10 = conv_grads(1.0)
    # _grad_multiply's forward is x*g + x*(1-g): identity up to one f32
    # rounding, so downstream values (and grads) match to ~1e-6 relative
    np.testing.assert_allclose(g01, 0.1 * g10, rtol=2e-3, atol=1e-6)
    # grad scaling is frontend-only: everything above is untouched
    np.testing.assert_allclose(proj01, proj10, rtol=2e-3, atol=1e-6)


def test_fairseq_hubert_import(tmp_path, rng):
    """Construct a fairseq-shaped torch state dict and verify the key map
    loads it onto our tree (values land where expected)."""
    import torch
    args = hubert_tiny_args()
    model = make_hubert(args)
    wav = jnp.zeros((1, 3200))
    params = model.init({"params": jax.random.PRNGKey(0)}, wav,
                        jnp.asarray([3200]), jnp.ones((1, 4), jnp.int32),
                        jnp.asarray([2]))
    d = 32
    conv_specs = [(512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                  (512, 3, 2), (512, 2, 2), (512, 2, 2)]
    sd = {}
    in_ch = 1
    for i, (c, k, s) in enumerate(conv_specs):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = \
            torch.randn(c, in_ch, k)
        in_ch = c
    sd["feature_extractor.conv_layers.0.2.weight"] = torch.randn(512)
    sd["feature_extractor.conv_layers.0.2.bias"] = torch.randn(512)
    sd["post_extract_proj.weight"] = torch.randn(d, 512)
    sd["post_extract_proj.bias"] = torch.randn(d)
    sd["layer_norm.weight"] = torch.randn(512)
    sd["layer_norm.bias"] = torch.randn(512)
    sd["mask_emb"] = torch.randn(d)
    sd["encoder.layer_norm.weight"] = torch.randn(d)
    sd["encoder.layer_norm.bias"] = torch.randn(d)
    sd["encoder.pos_conv.0.bias"] = torch.randn(d)
    sd["encoder.pos_conv.0.weight_g"] = torch.ones(1, 1, 1)
    sd["encoder.pos_conv.0.weight_v"] = torch.randn(d, d // 16, 128)
    for i in range(2):
        for p in ["k_proj", "q_proj", "v_proj", "out_proj"]:
            sd[f"encoder.layers.{i}.self_attn.{p}.weight"] = torch.randn(d, d)
            sd[f"encoder.layers.{i}.self_attn.{p}.bias"] = torch.randn(d)
        sd[f"encoder.layers.{i}.self_attn_layer_norm.weight"] = torch.randn(d)
        sd[f"encoder.layers.{i}.self_attn_layer_norm.bias"] = torch.randn(d)
        sd[f"encoder.layers.{i}.fc1.weight"] = torch.randn(64, d)
        sd[f"encoder.layers.{i}.fc1.bias"] = torch.randn(64)
        sd[f"encoder.layers.{i}.fc2.weight"] = torch.randn(d, 64)
        sd[f"encoder.layers.{i}.fc2.bias"] = torch.randn(d)
        sd[f"encoder.layers.{i}.final_layer_norm.weight"] = torch.randn(d)
        sd[f"encoder.layers.{i}.final_layer_norm.bias"] = torch.randn(d)
    path = str(tmp_path / "hubert_tiny.pt")
    torch.save({"model": sd}, path)

    new_params = load_fairseq_hubert(path, params)
    from flax import serialization
    st = serialization.to_state_dict(new_params)
    hub = st["params"]["hub_base"]
    np.testing.assert_allclose(
        hub["post_extract_proj"]["kernel"],
        sd["post_extract_proj.weight"].numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        hub["encoder"]["layer0"]["q"]["kernel"],
        sd["encoder.layers.0.self_attn.q_proj.weight"].numpy().T, rtol=1e-6)


@pytest.mark.parametrize("maker", [make_lmnat, make_lmnat2, make_lmnat3])
def test_lmnat_forward(rng, maker):
    args = tiny_args(use_conv_enc=False, use_conv_dec=False,
                     pos_type="absolute")
    args.text_encoder_type = "lm"
    args.text_encoder_layers = 1
    args.d_text = 32
    args.freeze_text_encoder = True
    args.mix_type = "none"
    model = maker(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt_label = labels[:, 1:]
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "mix": jax.random.PRNGKey(2)}
    params = model.init(rngs, feats, src_mask, tgt_label, label_sizes)
    out = model.apply(params, feats, src_mask, tgt_label, label_sizes)
    assert np.isfinite(float(out["loss"]))
    assert out["att_out"].shape == (2, tgt_label.shape[1], VOCAB)
