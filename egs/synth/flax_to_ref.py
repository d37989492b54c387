"""Transplant TRAINED flax params into the reference PyTorch models and run
the REFERENCE decode on the same features.

Inverse of the torch->flax mapping proven exact in
tests/test_torch_parity.py (logits agree to ~1e-4); used by
run_wer_parity.py stage 8 to produce repo-vs-reference WER on identical
audio and identical weights (reference: src/models/cassnat.py:420-637
beam_decode, src/models/lm.py).
"""

import os
import sys
import types

import numpy as np

REF = "/root/reference/src"
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)


def _test_paths(data_dir):
    """Loader paths for the test split of a (possibly *_hard variant)
    synth data dir — data_dir is authoritative, not conf/data.yaml."""
    return [dict(
        name="test",
        scp_path=os.path.join(data_dir, "fbank", "test", "feats.scp"),
        text_label=os.path.join(data_dir, "test", "token_char.scp"),
        utt2num_frames=os.path.join(data_dir, "fbank", "test",
                                    "utt2num_frames"))]


def _import_ref():
    import torch  # noqa: F401
    for k in [k for k in sys.modules
              if k == "models" or k.startswith("models.")
              or k == "utils" or k.startswith("utils.")]:
        del sys.modules[k]
    if "editdistance" not in sys.modules:
        ed = types.ModuleType("editdistance")
        ed.eval = lambda a, b: 0
        sys.modules["editdistance"] = ed
    pkg = types.ModuleType("models")
    pkg.__path__ = [REF + "/models"]
    sys.modules["models"] = pkg
    upkg = types.ModuleType("utils")
    upkg.__path__ = [REF + "/utils"]
    sys.modules["utils"] = upkg
    sys.path.insert(0, REF)
    import models.cassnat as ref_cassnat
    import models.conformer as ref_conformer
    import models.lm as ref_lm
    return types.SimpleNamespace(cassnat=ref_cassnat,
                                 conformer=ref_conformer, lm=ref_lm)


# ---- flax -> torch state_dict builders (inverse of test_torch_parity) ----


def _put_lin(sd, prefix, p, bias=True):
    sd[f"{prefix}.weight"] = np.asarray(p["kernel"], np.float32).T
    if bias:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _put_norm(sd, prefix, p):
    sd[f"{prefix}.a_2"] = np.asarray(p["scale"], np.float32)
    sd[f"{prefix}.b_2"] = np.asarray(p["bias"], np.float32)


def _put_mha(sd, prefix, p):
    for i, k in enumerate(("q", "k", "v", "out")):
        _put_lin(sd, f"{prefix}.linears.{i}", p[k])


def _put_rel_mha(sd, prefix, p):
    _put_mha(sd, prefix, p)
    sd[f"{prefix}.linear_pos.weight"] = \
        np.asarray(p["pos"]["kernel"], np.float32).T
    sd[f"{prefix}.pos_bias_u"] = np.asarray(p["pos_bias_u"], np.float32)
    sd[f"{prefix}.pos_bias_v"] = np.asarray(p["pos_bias_v"], np.float32)


def _put_ff(sd, prefix, p):
    _put_lin(sd, f"{prefix}.w_1", p["Dense_0"])
    _put_lin(sd, f"{prefix}.w_2", p["Dense_1"])


def _put_conv2d(sd, prefix, p):
    sd[f"{prefix}.weight"] = \
        np.asarray(p["kernel"], np.float32).transpose(3, 2, 0, 1)
    sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _put_conv_embed(sd, p, prefix="src_embed", rel=True):
    _put_conv2d(sd, f"{prefix}.conv.0", p["conv1"])
    _put_conv2d(sd, f"{prefix}.conv.2", p["conv2"])
    _put_lin(sd, f"{prefix}.linear_out", p["linear_out"])
    if rel:
        sd[f"{prefix}.pos_enc.embedding.weight"] = \
            np.asarray(p["pos_enc"]["table"], np.float32)


def _put_conv_module(sd, prefix, p):
    def c1d(tp, fp):
        sd[f"{tp}.weight"] = \
            np.asarray(fp["kernel"], np.float32).transpose(2, 1, 0)
        sd[f"{tp}.bias"] = np.asarray(fp["bias"], np.float32)
    c1d(f"{prefix}.pointwise_conv1", p["pointwise1"])
    c1d(f"{prefix}.depthwise_conv", p["depthwise"])
    c1d(f"{prefix}.pointwise_conv2", p["pointwise2"])
    sd[f"{prefix}.norm.weight"] = np.asarray(p["norm"]["scale"], np.float32)
    sd[f"{prefix}.norm.bias"] = np.asarray(p["norm"]["bias"], np.float32)


def _put_con_layer(sd, prefix, p):
    _put_ff(sd, f"{prefix}.feed_forward1", p["ff1"])
    _put_ff(sd, f"{prefix}.feed_forward2", p["ff2"])
    _put_rel_mha(sd, f"{prefix}.self_attn", p["self_attn"])
    _put_conv_module(sd, f"{prefix}.conv_module", p["conv"])
    _put_norm(sd, f"{prefix}.sublayer.0.norm", p["sub_ff1"]["norm"])
    _put_norm(sd, f"{prefix}.sublayer.1.norm", p["sub_conv"]["norm"])
    _put_norm(sd, f"{prefix}.sublayer.2.norm", p["sub_attn"]["norm"])
    _put_norm(sd, f"{prefix}.sublayer.3.norm", p["sub_ff2"]["norm"])


def _put_con_mad_layer(sd, prefix, p):
    _put_ff(sd, f"{prefix}.feed_forward1", p["ff1"])
    _put_ff(sd, f"{prefix}.feed_forward2", p["ff2"])
    _put_rel_mha(sd, f"{prefix}.self_attn", p["self_attn"])
    _put_mha(sd, f"{prefix}.src_attn", p["src_attn"])
    _put_conv_module(sd, f"{prefix}.conv_module", p["conv"])
    _put_norm(sd, f"{prefix}.sublayer.0.norm", p["sub_ff1"]["norm"])
    _put_norm(sd, f"{prefix}.sublayer.1.norm", p["sub_conv"]["norm"])
    _put_norm(sd, f"{prefix}.sublayer.2.norm", p["sub_self"]["norm"])
    _put_norm(sd, f"{prefix}.sublayer.3.norm", p["sub_src"]["norm"])
    _put_norm(sd, f"{prefix}.sublayer.4.norm", p["sub_ff2"]["norm"])


def _put_generator(sd, prefix, p):
    _put_lin(sd, f"{prefix}.proj", p["proj"])


def cassnat_state_dict(params, n_enc, n_sad, n_mad):
    p = params["params"]
    sd = {}
    _put_conv_embed(sd, p["src_embed"], "src_embed", rel=True)
    for i in range(n_enc):
        _put_con_layer(sd, f"encoder.layers.{i}", p["encoder"][f"layer{i}"])
    _put_norm(sd, "encoder.norm", p["encoder"]["norm"])
    ae = p["acembed_extractor"]
    _put_mha(sd, "acembed_extractor.layers.0.src_attn", ae["src_attn"])
    _put_ff(sd, "acembed_extractor.layers.0.feed_forward", ae["ff"])
    _put_norm(sd, "acembed_extractor.layers.0.sublayer.norm",
              ae["sub_ff"]["norm"])
    sd["acembed_extractor.layers.0.pos_enc.embedding.weight"] = \
        np.asarray(ae["pos_enc"]["table"], np.float32)
    for i in range(n_sad):
        _put_con_layer(sd, f"embed_mapper.layers.{i}",
                       p["embed_mapper"][f"layer{i}"])
    for i in range(n_mad):
        _put_con_mad_layer(sd, f"decoder.layers.{i}",
                           p["decoder"][f"layer{i}"])
    _put_norm(sd, "decoder.norm", p["decoder"]["norm"])
    _put_generator(sd, "ctc_generator", p["ctc_generator"])
    _put_generator(sd, "att_generator", p["att_generator"])
    return sd


def ast_state_dict(params, n_enc, n_dec):
    """Our AST-Conformer -> reference models/conformer.py (conformer encoder
    + transformer decoder with Swish FFN; reference conformer.py:18-46)."""
    p = params["params"]
    sd = {}
    _put_conv_embed(sd, p["src_embed"], "src_embed", rel=True)
    for i in range(n_enc):
        _put_con_layer(sd, f"encoder.layers.{i}", p["encoder"][f"layer{i}"])
    _put_norm(sd, "encoder.norm", p["encoder"]["norm"])
    sd["tgt_embed.0.lut.weight"] = np.asarray(
        p["tgt_embed"]["Embed_0"]["embedding"], np.float32)
    for i in range(n_dec):
        lp = p["decoder"][f"layer{i}"]
        pre = f"decoder.layers.{i}"
        _put_mha(sd, f"{pre}.self_attn", lp["self_attn"])
        _put_mha(sd, f"{pre}.src_attn", lp["src_attn"])
        _put_ff(sd, f"{pre}.feed_forward", lp["ff"])
        _put_norm(sd, f"{pre}.sublayer.0.norm", lp["norm0"])
        _put_norm(sd, f"{pre}.sublayer.1.norm", lp["norm1"])
        _put_norm(sd, f"{pre}.sublayer.2.norm", lp["norm2"])
    _put_norm(sd, "decoder.norm", p["decoder"]["norm"])
    _put_generator(sd, "ctc_generator", p["ctc_generator"])
    _put_generator(sd, "att_generator", p["att_generator"])
    return sd


def lm_state_dict(params, n_layers):
    """Our TransformerLM -> reference models/lm.py TransformerLM."""
    p = params["params"]
    sd = {}
    sd["text_embed.0.lut.weight"] = np.asarray(
        p["embed"]["Embed_0"]["embedding"], np.float32)
    for i in range(n_layers):
        lp = p[f"layer{i}"]
        for j, k in enumerate(("q", "k", "v", "out")):
            _put_lin(sd, f"encoder.layers.{i}.self_attn.linears.{j}",
                     lp["self_attn"][k])
        _put_ff(sd, f"encoder.layers.{i}.feed_forward", lp["ff"])
        _put_norm(sd, f"encoder.layers.{i}.sublayer.0.norm", lp["norm1"])
        _put_norm(sd, f"encoder.layers.{i}.sublayer.1.norm", lp["norm2"])
    _put_norm(sd, "encoder.norm", p["norm"])
    _put_generator(sd, "out_generator", p["generator"])
    return sd


def _load_sd(model, sd_np, label):
    import torch
    sd = {k: torch.tensor(v) for k, v in sd_np.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # buffers (pe tables) and any reference-only leftovers must be the ONLY
    # missing keys; unexpected means the mapping is wrong.
    bad_missing = [k for k in missing
                   if not (k.endswith(".pe") or k == "pe"
                           or "pos_enc.embedding" in k)]
    assert not unexpected, f"{label}: unexpected keys {unexpected[:8]}"
    assert not bad_missing, f"{label}: missing keys {bad_missing[:8]}"
    return model


def reference_esa_decode(exp_dir, data_dir, here, rank_model="none",
                         sample_num=1, lm_exp=None, lm_layers=2,
                         lm_shape=None, at_exp=None, torch_seed=None):
    """Decode the synth test set with the REFERENCE CassNAT.beam_decode on
    transplanted trained weights. rank_model 'none' forces sample_num=1
    (the reference has no rank-free multi-sample path).

    lm_shape overrides the rank-LM architecture (dict with N/d_model/
    d_ff/n_head — the capacity-ladder LMs); at_exp points at a trained
    AST-Conformer exp dir for rank_model='at_baseline' (the reference
    scores candidates with the AT decoder, cassnat.py:509-515 +
    cassnat_task.py:109-115)."""
    import torch
    from cassnat_asr_public_tpu.utils import checkpoint as ckpt
    from cassnat_asr_public_tpu.utils.config import merge_configs
    from cassnat_asr_public_tpu.data.vocab import Vocab
    from cassnat_asr_public_tpu.data.kaldi_io import (load_cmvn_stats,
                                                      read_matrix, read_scp)

    ref_mods = _import_ref()
    ref_cassnat, ref_lm = ref_mods.cassnat, ref_mods.lm
    cfg = merge_configs(None, f"{here}/conf/cassnat_train.yaml")
    ns = types.SimpleNamespace(**{k: getattr(cfg, k) for k in vars(cfg)})
    ns.dropout = 0.0
    ns.att_alpha = 1.0
    ns.interce_alpha = 0.0
    ns.interce_layer = 0
    ns.model_type = "conformer"
    ns.sample_dist = 0
    ns.save_embedding = False
    ns.test_hitrate = False
    ns.use_gpu = False
    ns.beam_width = 1
    ns.lm_weight = 0.0
    ns.length_penalty = 0.0
    ns.decode_type = "esa_att"
    ns.sample_num = sample_num if rank_model != "none" else 1
    ns.threshold = 0.9
    ns.rank_model = rank_model

    model = ref_cassnat.make_model(cfg.input_size, ns).eval()
    state = ckpt.load_checkpoint(os.path.join(exp_dir, "best_model.ckpt"))
    sd = cassnat_state_dict(state["params"], cfg.N_enc, cfg.N_self_dec,
                            cfg.N_mix_dec)
    _load_sd(model, sd, "cassnat")

    lm_model = None
    if rank_model == "lm":
        shape = lm_shape or dict(N=lm_layers, d_model=128, d_ff=512,
                                 n_head=4)
        lm_ns = types.SimpleNamespace(
            vocab_size=cfg.vocab_size, dropout=0.0, **shape)
        lm_model = ref_lm.make_model(lm_ns).eval()
        lm_state = ckpt.load_checkpoint(
            os.path.join(lm_exp, "best_model.ckpt"))
        _load_sd(lm_model, lm_state_dict(lm_state["params"], shape["N"]),
                 "lm")
    elif rank_model == "at_baseline":
        # the reference loads the rank AT model through the same lm_model
        # slot (cassnat_task.py:109-115) and scores candidates with its
        # decoder (cassnat.py:509-515)
        at_cfg = merge_configs(None, f"{here}/conf/ast_train.yaml")
        at_ns = types.SimpleNamespace(
            **{k: getattr(at_cfg, k) for k in vars(at_cfg)})
        at_ns.dropout = 0.0
        at_ns.use_gpu = False
        at_ns.interctc_alpha = 0
        lm_model = ref_mods.conformer.make_model(at_cfg.input_size,
                                                 at_ns).eval()
        at_state = ckpt.load_checkpoint(
            os.path.join(at_exp, "best_model.ckpt"))
        _load_sd(lm_model,
                 ast_state_dict(at_state["params"], at_cfg.N_enc,
                                at_cfg.N_dec), "at_rank")

    vocab = Vocab(os.path.join(data_dir, "dict", "vocab_char.txt"))

    # batch with the REPO's own test loader so the reference model sees
    # byte-identical features and masks to the repo decode (stage 6)
    from cassnat_asr_public_tpu.data.datasets import (SpeechDataset,
                                                      SpeechDataLoader)
    dcfg = merge_configs(None, f"{here}/conf/cassnat_train.yaml",
                         f"{here}/conf/data.yaml")
    # data_dir is authoritative (it may be a *_hard variant twin); the
    # yaml only supplies loader/bucket knobs
    dcfg.test_paths = _test_paths(data_dir)
    test_ds = SpeechDataset(vocab, dcfg.test_paths, dcfg)
    test_ds.load_cmvn(os.path.join(data_dir, "fbank", "cmvn.ark"))
    loader = SpeechDataLoader(test_ds, 8, padding_idx=0, shuffle=False,
                              augment=False,
                              frame_bucket=getattr(dcfg, "frame_bucket", 64),
                              label_bucket=getattr(dcfg, "label_bucket", 8))

    # reference align_to_mask hard-codes .cuda(); neutralize on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    if torch_seed is not None:
        # seed-spread study (WER_PARITY_HARD.md): the reference samples
        # ESA alignments with torch's global RNG (cassnat.py:373
        # torch.randint); pinning it makes per-seed WER reproducible
        torch.manual_seed(torch_seed)
    hyps = {}
    try:
        for batch in loader:
            chunk = batch["utts"]
            src = np.asarray(batch["feats"], np.float32)
            x_mask = np.asarray(batch["src_mask"], bool)[:, None, :]
            sizes = (np.asarray(batch["feat_frames"], np.float32)
                     / src.shape[1])
            with torch.no_grad():
                seqs = model.beam_decode(
                    torch.tensor(src), torch.tensor(x_mask),
                    torch.tensor(sizes), vocab, ns, lm_model=lm_model)
                if isinstance(seqs, tuple):
                    seqs = seqs[0]
            for i, u in enumerate(chunk):
                # reference hyp handling: skip sos/pad, BREAK at first eos
                # (reference: src/tasks/cassnat_task.py:344-353)
                toks = []
                for t in seqs[i][0]["hyp"]:
                    if t in (0, 1):
                        continue
                    if t == 2:
                        break
                    toks.append(t)
                hyps[u] = vocab.decode(toks)
    finally:
        torch.Tensor.cuda = orig_cuda
    return hyps


def reference_ar_decode(exp_dir, data_dir, here, lm_weight=0.0,
                        beam_width=10, ctc_beam=15, ctc_weight=0.4,
                        length_penalty=0.0, lm_exp=None, lm_layers=2,
                        decode_type="ctc_att"):
    """Decode the synth test set with the REFERENCE AST-Conformer on
    transplanted trained weights, over byte-identical batches from the
    repo's own loader. decode_type 'ctc_att' runs beam_decode (joint
    CTC-prefix scoring + optional LM shallow fusion; reference
    src/models/transformer.py:122-241); 'ctc_correct' runs
    fast_decode_with_ctc (single corrective decoder pass + per-position
    beam; reference transformer.py:243-342)."""
    import torch
    from cassnat_asr_public_tpu.utils import checkpoint as ckpt
    from cassnat_asr_public_tpu.utils.config import merge_configs
    from cassnat_asr_public_tpu.data.vocab import Vocab

    ref_mods = _import_ref()
    cfg = merge_configs(None, f"{here}/conf/ast_train.yaml")
    ns = types.SimpleNamespace(**{k: getattr(cfg, k) for k in vars(cfg)})
    ns.dropout = 0.0
    ns.use_gpu = False
    ns.beam_width = beam_width
    ns.ctc_beam = ctc_beam
    ns.ctc_weight = ctc_weight
    ns.lm_weight = lm_weight
    ns.length_penalty = length_penalty
    ns.max_decode_ratio = 0
    ns.T = 1.0

    model = ref_mods.conformer.make_model(cfg.input_size, ns).eval()
    state = ckpt.load_checkpoint(os.path.join(exp_dir, "best_model.ckpt"))
    sd = ast_state_dict(state["params"], cfg.N_enc, cfg.N_dec)
    _load_sd(model, sd, "ast")

    lm_model = None
    if lm_weight > 0:
        lm_ns = types.SimpleNamespace(
            vocab_size=cfg.vocab_size, N=lm_layers, d_model=128, d_ff=512,
            n_head=4, dropout=0.0)
        lm_model = ref_mods.lm.make_model(lm_ns).eval()
        lm_state = ckpt.load_checkpoint(
            os.path.join(lm_exp, "best_model.ckpt"))
        _load_sd(lm_model, lm_state_dict(lm_state["params"], lm_layers),
                 "lm")

    vocab = Vocab(os.path.join(data_dir, "dict", "vocab_char.txt"))

    from cassnat_asr_public_tpu.data.datasets import (SpeechDataset,
                                                      SpeechDataLoader)
    dcfg = merge_configs(None, f"{here}/conf/ast_train.yaml",
                         f"{here}/conf/data.yaml")
    dcfg.test_paths = _test_paths(data_dir)
    test_ds = SpeechDataset(vocab, dcfg.test_paths, dcfg)
    test_ds.load_cmvn(os.path.join(data_dir, "fbank", "cmvn.ark"))
    loader = SpeechDataLoader(test_ds, 8, padding_idx=0, shuffle=False,
                              augment=False,
                              frame_bucket=getattr(dcfg, "frame_bucket", 64),
                              label_bucket=getattr(dcfg, "label_bucket", 8))

    hyps = {}
    for batch in loader:
        chunk = batch["utts"]
        src = np.asarray(batch["feats"], np.float32)
        x_mask = np.asarray(batch["src_mask"], bool)[:, None, :]
        with torch.no_grad():
            if decode_type == "ctc_correct":
                seqs = model.fast_decode_with_ctc(
                    torch.tensor(src), torch.tensor(x_mask), vocab, ns,
                    lm_model=lm_model)
            else:
                seqs = model.beam_decode(torch.tensor(src),
                                         torch.tensor(x_mask), vocab, ns,
                                         lm_model=lm_model)
        for i, u in enumerate(chunk):
            # reference hyp handling (src/tasks/art_task.py:261-269):
            # skip sos/pad, BREAK at first eos
            toks = []
            for t in seqs[i][0]["hyp"]:
                t = int(t)
                if t in (0, 1):
                    continue
                if t == 2:
                    break
                toks.append(t)
            hyps[u] = vocab.decode(toks)
    return hyps
