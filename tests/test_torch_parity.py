"""Cross-framework logit parity: reference PyTorch models vs flax models.

The WER half of the north star (BASELINE.md: "WER within 0.2 absolute")
reduces to numerics: if the flax forward reproduces the reference forward on
identical weights to ~1e-4, any checkpoint-level WER must match too. These
tests instantiate the reference models on CPU (torch is in the image, the
source tree is mounted read-only at /root/reference), transplant their
state_dicts into the flax param trees, and assert forward outputs match.

Covered:
  * AST transformer (abs pos): ctc_out + att_out + losses
    (reference: src/models/transformer.py:74-104)
  * CASS-NAT conformer (rel pos, viterbi trigger): ctc_out + att_out
    (reference: src/models/cassnat.py:136-257)
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/src"


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference package (it uses bare 'models'/'utils' imports)."""
    saved_path = list(sys.path)
    saved_mods = {k: v for k, v in sys.modules.items()
                  if k == "models" or k.startswith("models.")
                  or k == "utils" or k.startswith("utils.")}
    for k in saved_mods:
        del sys.modules[k]
    sys.path.insert(0, REF)
    # the reference imports editdistance (not in this image) at module scope;
    # it is only used in its decode paths, which these tests never call
    if "editdistance" not in sys.modules:
        ed_stub = types.ModuleType("editdistance")
        ed_stub.eval = lambda a, b: 0
        sys.modules["editdistance"] = ed_stub
    # models/__init__ pulls in the hubert stack (which imports fairseq, not
    # in this image): pre-seed a namespace 'models' package that skips the
    # reference __init__ but still resolves submodules by path.
    pkg = types.ModuleType("models")
    pkg.__path__ = [REF + "/models"]
    sys.modules["models"] = pkg
    upkg = types.ModuleType("utils")
    upkg.__path__ = [REF + "/utils"]
    sys.modules["utils"] = upkg
    try:
        import models.transformer as ref_transformer
        import models.conformer as ref_conformer
        import models.cassnat as ref_cassnat
        yield types.SimpleNamespace(transformer=ref_transformer,
                                    conformer=ref_conformer,
                                    cassnat=ref_cassnat)
    finally:
        sys.path[:] = saved_path
        for k in [k for k in sys.modules
                  if k == "models" or k.startswith("models.")
                  or k == "utils" or k.startswith("utils.")]:
            del sys.modules[k]
        sys.modules.update(saved_mods)


def _t2n(t):
    return np.asarray(t.detach().numpy())


def _lin(sd, prefix):
    return {"kernel": _t2n(sd[f"{prefix}.weight"]).T,
            "bias": _t2n(sd[f"{prefix}.bias"])}


def _norm(sd, prefix):
    return {"scale": _t2n(sd[f"{prefix}.a_2"]),
            "bias": _t2n(sd[f"{prefix}.b_2"])}


def _mha(sd, prefix):
    return {"q": _lin(sd, f"{prefix}.linears.0"),
            "k": _lin(sd, f"{prefix}.linears.1"),
            "v": _lin(sd, f"{prefix}.linears.2"),
            "out": _lin(sd, f"{prefix}.linears.3")}


def _rel_mha(sd, prefix):
    d = _mha(sd, prefix)
    d["pos"] = {"kernel": _t2n(sd[f"{prefix}.linear_pos.weight"]).T}
    d["pos_bias_u"] = _t2n(sd[f"{prefix}.pos_bias_u"])
    d["pos_bias_v"] = _t2n(sd[f"{prefix}.pos_bias_v"])
    return d


def _ff(sd, prefix):
    return {"Dense_0": _lin(sd, f"{prefix}.w_1"),
            "Dense_1": _lin(sd, f"{prefix}.w_2")}


def _conv2d(sd, prefix):
    # torch (Cout, Cin, kh, kw) -> flax (kh, kw, Cin, Cout)
    return {"kernel": _t2n(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
            "bias": _t2n(sd[f"{prefix}.bias"])}


def _conv_embed(sd, prefix="src_embed", rel=False):
    d = {"conv1": _conv2d(sd, f"{prefix}.conv.0"),
         "conv2": _conv2d(sd, f"{prefix}.conv.2"),
         "linear_out": _lin(sd, f"{prefix}.linear_out")}
    if rel:
        # the reference's (xavier-clobbered) frozen rel-pos table
        d["pos_enc"] = {"table": _t2n(sd[f"{prefix}.pos_enc.embedding.weight"])}
    return d


def _generator(sd, prefix, add_norm=False):
    d = {"proj": _lin(sd, f"{prefix}.proj")}
    if add_norm:
        d["norm"] = _norm(sd, f"{prefix}.norm")
    return d


def _conv_module(sd, prefix):
    # torch Conv1d weight (Cout, Cin/groups, k) -> flax Conv (k, Cin/groups, Cout)
    def c1d(p):
        return {"kernel": _t2n(sd[f"{p}.weight"]).transpose(2, 1, 0),
                "bias": _t2n(sd[f"{p}.bias"])}
    return {"pointwise1": c1d(f"{prefix}.pointwise_conv1"),
            "depthwise": c1d(f"{prefix}.depthwise_conv"),
            "norm": {"scale": _t2n(sd[f"{prefix}.norm.weight"]),
                     "bias": _t2n(sd[f"{prefix}.norm.bias"])},
            "pointwise2": c1d(f"{prefix}.pointwise_conv2")}


def _sub(sd, prefix):
    return {"norm": _norm(sd, f"{prefix}.norm")}


def _trf_enc_layer(sd, prefix):
    return {"self_attn": _mha(sd, f"{prefix}.self_attn"),
            "ff": _ff(sd, f"{prefix}.feed_forward"),
            "sub0": _sub(sd, f"{prefix}.sublayer.0"),
            "sub1": _sub(sd, f"{prefix}.sublayer.1")}


def _trf_dec_layer(sd, prefix):
    return {"self_attn": _mha(sd, f"{prefix}.self_attn"),
            "src_attn": _mha(sd, f"{prefix}.src_attn"),
            "ff": _ff(sd, f"{prefix}.feed_forward"),
            "norm0": _norm(sd, f"{prefix}.sublayer.0.norm"),
            "norm1": _norm(sd, f"{prefix}.sublayer.1.norm"),
            "norm2": _norm(sd, f"{prefix}.sublayer.2.norm")}


def _con_layer(sd, prefix):
    """Conformer SelfAttLayer / EncoderLayer (rel pos):
    sublayer 0=ff1, 1=conv, 2=attn, 3=ff2."""
    return {"ff1": _ff(sd, f"{prefix}.feed_forward1"),
            "ff2": _ff(sd, f"{prefix}.feed_forward2"),
            "self_attn": _rel_mha(sd, f"{prefix}.self_attn"),
            "conv": _conv_module(sd, f"{prefix}.conv_module"),
            "sub_ff1": _sub(sd, f"{prefix}.sublayer.0"),
            "sub_conv": _sub(sd, f"{prefix}.sublayer.1"),
            "sub_attn": _sub(sd, f"{prefix}.sublayer.2"),
            "sub_ff2": _sub(sd, f"{prefix}.sublayer.3")}


def _con_mad_layer(sd, prefix):
    """MixAttLayer: sublayer 0=ff1, 1=conv, 2=self_attn, 3=src, 4=ff2."""
    return {"ff1": _ff(sd, f"{prefix}.feed_forward1"),
            "ff2": _ff(sd, f"{prefix}.feed_forward2"),
            "self_attn": _rel_mha(sd, f"{prefix}.self_attn"),
            "src_attn": _mha(sd, f"{prefix}.src_attn"),
            "conv": _conv_module(sd, f"{prefix}.conv_module"),
            "sub_ff1": _sub(sd, f"{prefix}.sublayer.0"),
            "sub_conv": _sub(sd, f"{prefix}.sublayer.1"),
            "sub_self": _sub(sd, f"{prefix}.sublayer.2"),
            "sub_src": _sub(sd, f"{prefix}.sublayer.3"),
            "sub_ff2": _sub(sd, f"{prefix}.sublayer.4")}


def _args_ns(**kw):
    ns = types.SimpleNamespace()
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


# ---------------------------------------------------------------------------
# AST transformer
# ---------------------------------------------------------------------------


def test_ast_transformer_logit_parity(ref_modules):
    torch.manual_seed(0)
    B, T, F, U, V = 3, 37, 25, 9, 40
    cfg = dict(n_head=4, d_model=32, d_ff=64, dropout=0.0, vocab_size=V,
               N_enc=3, N_dec=2, ctc_alpha=1.0, interctc_alpha=0.0,
               interctc_layer=0, label_smooth=0.0, padding_idx=0)
    ref = ref_modules.transformer.make_model(F, _args_ns(**cfg)).eval()
    sd = ref.state_dict()

    from cassnat_asr_public_tpu.models.transformer import Transformer
    model = Transformer(input_size=F, vocab_size=V, n_enc=3, n_dec=2,
                        d_model=32, d_ff=64, n_head=4, dropout=0.0,
                        ctc_alpha=1.0, label_smooth=0.0)

    params = {"params": {
        "src_embed": _conv_embed(sd),
        "encoder": {**{f"layer{i}": _trf_enc_layer(sd, f"encoder.layers.{i}")
                       for i in range(3)},
                    "norm": _norm(sd, "encoder.norm")},
        "tgt_embed": {"Embed_0": {
            "embedding": _t2n(sd["tgt_embed.0.lut.weight"])}},
        "decoder": {**{f"layer{i}": _trf_dec_layer(sd, f"decoder.layers.{i}")
                       for i in range(2)},
                    "norm": _norm(sd, "decoder.norm")},
        "ctc_generator": _generator(sd, "ctc_generator"),
        "att_generator": _generator(sd, "att_generator"),
    }}

    rng = np.random.default_rng(0)
    src = rng.normal(size=(B, T, F)).astype(np.float32)
    # full-length masks (padding parity is covered by length variation below)
    lengths = np.array([T, T - 6, T - 11])
    src_mask = (np.arange(T)[None, :] < lengths[:, None])
    label_sizes = np.array([U - 2, U - 3, U - 4])
    tgt = np.zeros((B, U), np.int64)
    tgt_label = np.zeros((B, U), np.int64)
    for b in range(B):
        n = label_sizes[b]
        toks = rng.integers(3, V, size=n)
        tgt[b, 0] = 1  # sos
        tgt[b, 1:1 + n] = toks
        tgt_label[b, :n] = toks
        tgt_label[b, n] = 2  # eos

    # reference forward
    t_src = torch.tensor(src)
    t_src_mask = torch.tensor(src_mask[:, None, :])
    t_tgt = torch.tensor(tgt)
    causal = np.tril(np.ones((U, U), bool))
    t_tgt_mask = torch.tensor((tgt != 0)[:, None, :] & causal[None])
    feat_frac = torch.tensor(lengths / T)
    with torch.no_grad():
        r_ctc, r_att, r_loss, r_att_loss, r_ctc_loss, _ = ref(
            t_src, t_tgt, t_src_mask, t_tgt_mask, feat_frac,
            torch.tensor(label_sizes), torch.tensor(tgt_label))

    out = model.apply(params, jnp.asarray(src), jnp.asarray(src_mask),
                      jnp.asarray(tgt), jnp.asarray(tgt_label),
                      jnp.asarray(label_sizes), deterministic=True)

    np.testing.assert_allclose(np.asarray(out["ctc_out"]), _t2n(r_ctc),
                               rtol=1e-4, atol=1e-4)
    # reference att_out includes rows for padded positions too; ours likewise
    np.testing.assert_allclose(np.asarray(out["att_out"]), _t2n(r_att),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(out["ctc_loss"]), float(r_ctc_loss),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out["att_loss"]), float(r_att_loss),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# AST conformer
# ---------------------------------------------------------------------------


def test_ast_conformer_logit_parity(ref_modules):
    """Conformer encoder (rel pos) + transformer decoder whose FFN the
    reference builds with Swish at width d_decff (conformer.py:32) —
    d_decff deliberately != d_ff here to pin the width plumbing."""
    torch.manual_seed(0)
    B, T, F, U, V = 3, 33, 25, 9, 40
    cfg = dict(n_head=4, d_model=32, d_ff=64, d_encff=48, d_decff=56,
               dropout=0.0, vocab_size=V, N_enc=2, N_dec=2, ctc_alpha=1.0,
               interctc_alpha=0.0, interctc_layer=0, label_smooth=0.0,
               padding_idx=0, pos_type="relative", enc_kernel_size=7,
               enc_max_relative_len=8, share_ff=False)
    ref = ref_modules.conformer.make_model(F, _args_ns(**cfg)).eval()
    sd = ref.state_dict()

    from cassnat_asr_public_tpu.models.conformer import Conformer
    model = Conformer(input_size=F, vocab_size=V, n_enc=2, n_dec=2,
                      d_model=32, d_ff=64, d_encff=48, d_decff=56,
                      kernel_size=7, max_relative_len=8, n_head=4,
                      dropout=0.0, ctc_alpha=1.0, label_smooth=0.0)

    params = {"params": {
        "src_embed": _conv_embed(sd, rel=True),
        "encoder": {**{f"layer{i}": _con_layer(sd, f"encoder.layers.{i}")
                       for i in range(2)},
                    "norm": _norm(sd, "encoder.norm")},
        "tgt_embed": {"Embed_0": {
            "embedding": _t2n(sd["tgt_embed.0.lut.weight"])}},
        "decoder": {**{f"layer{i}": _trf_dec_layer(sd, f"decoder.layers.{i}")
                       for i in range(2)},
                    "norm": _norm(sd, "decoder.norm")},
        "ctc_generator": _generator(sd, "ctc_generator"),
        "att_generator": _generator(sd, "att_generator"),
    }}

    rng = np.random.default_rng(1)
    src = rng.normal(size=(B, T, F)).astype(np.float32)
    lengths = np.array([T, T - 5, T - 9])
    src_mask = (np.arange(T)[None, :] < lengths[:, None])
    label_sizes = np.array([U - 2, U - 3, U - 4])
    tgt = np.zeros((B, U), np.int64)
    tgt_label = np.zeros((B, U), np.int64)
    for b in range(B):
        n = label_sizes[b]
        toks = rng.integers(3, V, size=n)
        tgt[b, 0] = 1
        tgt[b, 1:1 + n] = toks
        tgt_label[b, :n] = toks
        tgt_label[b, n] = 2

    t_src = torch.tensor(src)
    t_src_mask = torch.tensor(src_mask[:, None, :])
    t_tgt = torch.tensor(tgt)
    causal = np.tril(np.ones((U, U), bool))
    t_tgt_mask = torch.tensor((tgt != 0)[:, None, :] & causal[None])
    feat_frac = torch.tensor(lengths / T)
    with torch.no_grad():
        r_ctc, r_att, r_loss, r_att_loss, r_ctc_loss, _ = ref(
            t_src, t_tgt, t_src_mask, t_tgt_mask, feat_frac,
            torch.tensor(label_sizes), torch.tensor(tgt_label))

    out = model.apply(params, jnp.asarray(src), jnp.asarray(src_mask),
                      jnp.asarray(tgt), jnp.asarray(tgt_label),
                      jnp.asarray(label_sizes), deterministic=True)

    np.testing.assert_allclose(np.asarray(out["ctc_out"]), _t2n(r_ctc),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["att_out"]), _t2n(r_att),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(out["ctc_loss"]), float(r_ctc_loss),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out["att_loss"]), float(r_att_loss),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# CASS-NAT conformer
# ---------------------------------------------------------------------------


def test_cassnat_conformer_logit_parity(ref_modules):
    torch.manual_seed(0)
    # row 0 uses the full label width U so the reference's dynamic ymax
    # matches our static umax_plus1
    cfg = dict(_B=2, _T=33, _F=25, _V=40, _U=7,
               n_head=4, d_model=32, d_ff=64, d_encff=48, d_decff=48,
               dropout=0.0, vocab_size=40, N_enc=2, N_extra=1, N_self_dec=2,
               N_mix_dec=1, ctc_alpha=1.0, att_alpha=1.0, interctc_alpha=0.0,
               interctc_layer=0, interce_alpha=0.0, interce_layer=0,
               label_smooth=0.0, padding_idx=0, use_conv_enc=True,
               use_conv_dec=True, enc_kernel_size=7, dec_kernel_size=3,
               enc_max_relative_len=8, dec_max_relative_len=4,
               pos_type="relative", share_ff=False, model_type="conformer",
               use_trigger=True, src_trigger=True, use_unimask=False,
               left_trigger=0, right_trigger=0, use_best_path=False,
               sample_topk=0, save_embedding=False)
    # reference align_to_mask hard-codes .cuda() (cassnat.py:361); make it a
    # no-op so the reference runs on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        _run_cassnat_parity(ref_modules, cfg)
    finally:
        torch.Tensor.cuda = orig_cuda


def _run_cassnat_parity(ref_modules, cfg):
    B, T, F, V, U = cfg.pop("_B"), cfg.pop("_T"), cfg.pop("_F"), \
        cfg.pop("_V"), cfg.pop("_U")
    args = _args_ns(**cfg)
    ref = ref_modules.cassnat.make_model(F, args).eval()
    sd = ref.state_dict()

    from cassnat_asr_public_tpu.models.cassnat import CassNAT
    model = CassNAT(
        input_size=F, vocab_size=V, n_enc=2, n_extra=1, n_self_dec=2,
        n_mix_dec=1, d_model=32, d_ff=64, d_encff=48, d_decff=48, n_head=4,
        dropout=0.0, use_conv_enc=True, use_conv_dec=True, enc_kernel_size=7,
        dec_kernel_size=3, enc_max_relative_len=8, dec_max_relative_len=4,
        pos_type="relative", share_ff=False, use_trigger=True,
        src_trigger=True, use_unimask=False, use_best_path=False,
        ctc_alpha=1.0, att_alpha=1.0, label_smooth=0.0, padding_idx=0)

    params = {"params": {
        "src_embed": _conv_embed(sd, rel=True),
        "encoder": {**{f"layer{i}": _con_layer(sd, f"encoder.layers.{i}")
                       for i in range(2)},
                    "norm": _norm(sd, "encoder.norm")},
        "acembed_extractor": {
            "src_attn": _mha(sd, "acembed_extractor.layers.0.src_attn"),
            "ff": _ff(sd, "acembed_extractor.layers.0.feed_forward"),
            "sub_ff": _sub(sd, "acembed_extractor.layers.0.sublayer"),
            "pos_enc": {"table": _t2n(
                sd["acembed_extractor.layers.0.pos_enc.embedding.weight"])}},
        "embed_mapper": {
            f"layer{i}": _con_layer(sd, f"embed_mapper.layers.{i}")
            for i in range(2)},
        "decoder": {**{f"layer{i}": _con_mad_layer(sd, f"decoder.layers.{i}")
                       for i in range(1)},
                    "norm": _norm(sd, "decoder.norm")},
        "ctc_generator": _generator(sd, "ctc_generator"),
        "att_generator": _generator(sd, "att_generator"),
    }}

    rng = np.random.default_rng(1)
    src = rng.normal(size=(B, T, F)).astype(np.float32)
    lengths = np.array([T, T - 9])
    src_mask = (np.arange(T)[None, :] < lengths[:, None])
    # row 0 fills the label width so the reference's dynamic ymax == U+1
    label_sizes = np.array([U, U - 3])
    tgt_label = np.zeros((B, U + 1), np.int64)
    for b in range(B):
        n = label_sizes[b]
        toks = rng.integers(3, V, size=n)
        tgt_label[b, :n] = toks
        tgt_label[b, n] = 2  # eos

    with torch.no_grad():
        r_ctc, r_att, r_loss, r_ctc_loss, r_att_loss = ref(
            torch.tensor(src), torch.tensor(src_mask[:, None, :]),
            torch.tensor(lengths / T), torch.tensor(tgt_label),
            torch.tensor(label_sizes), args)

    out = model.apply(params, jnp.asarray(src), jnp.asarray(src_mask),
                      jnp.asarray(tgt_label), jnp.asarray(label_sizes),
                      deterministic=True)

    np.testing.assert_allclose(np.asarray(out["ctc_out"]), _t2n(r_ctc),
                               rtol=1e-4, atol=1e-4)
    assert np.asarray(out["att_out"]).shape == _t2n(r_att).shape
    np.testing.assert_allclose(np.asarray(out["att_out"]), _t2n(r_att),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(out["ctc_loss"]), float(r_ctc_loss),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out["att_loss"]), float(r_att_loss),
                               rtol=1e-4, atol=1e-5)
