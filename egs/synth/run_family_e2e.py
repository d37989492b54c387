#!/usr/bin/env python3
"""End-to-end demos for the remaining model families on the synthetic
corpus: every family the reference ships is trained IN THIS REPO through
its public CLI and decoded to a WER, proving the full pipeline (not just
unit tests) for each.

Families covered here (the AST and CASS-NAT families are covered by
run_ar_parity.py / run_wer_parity.py):
  - wav2vec2 SSL pretraining (reference: src/models/wav2vec_model.py,
    src/bin/train_ssl.py) + encoder-init fine-tuning into CASS-NAT on a
    low-resource labeled subset, vs a from-scratch control at the same
    budget (the reference's intended SSL use).
  - LMNAT / LMNAT2 / LMNAT3 (reference: src/models/lmnat*.py) with the
    trained synth char-LM as the fused text encoder
    (text_encoder_path), decoded greedy + ESA+LM.
  - HubertNAT on RAW WAVEFORM from scratch (reference:
    src/models/hubert/hubert_model.py) — exercises wav_s.scp manifests
    (data_prep.py), the conv waveform frontend and HubertLoader batching.

Stages (resumable; artifacts under egs/synth/):
  1 subset   — 300-utt labeled subset for the SSL comparison
  2 ssl      — wav2vec2 pretraining on the full 1200-utt fbank corpus
  3 ft       — CASS-NAT fine-tune: ssl-init vs scratch on the subset; WER
  4 lmnat    — LMNAT/2/3 training + decode; WER
  5 hubert   — wav_s.scp prep + HubertNAT raw-wav training + decode; WER
  6 report   — write FAMILY_E2E.md at the repo root

Run from egs/synth:  python run_family_e2e.py [--stage N] [--end_stage M]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from run_wer_parity import (DATA, LM_EXP, LM_YAML, pieces_to_words,
                            read_text, sh, wer)

SUB = os.path.join(DATA, "train_sub")
SUB25 = os.path.join(DATA, "train_sub25")
UNLAB = os.path.join(DATA, "unlab")
SSL_EXP = os.path.join(HERE, "exp", "wav2vec")
RESULTS = os.path.join(HERE, "family_results.json")
REPORT = os.path.join(REPO, "FAMILY_E2E.md")
# 100 labeled utts: small enough that from-scratch training degrades and
# SSL-init sensitivity is measurable (at 300 utts scratch already reaches
# ~1.6% WER and the comparison saturates); the 25-utt subset is the
# genuinely low-resource regime where SSL init is expected to WIN
SUBSET_N = 100
SUBSET25_N = 25
# unlabeled pretrain corpus: 6,000 utts from the same synthesizer/lexicon
# (audio only — SSL never sees the transcripts), i.e. 5x the labeled
# train set, mirroring the reference's LibriSpeech-960-pretrain ->
# -100h-finetune regime (run_hubert.sh)
UNLAB_N = 6000
FT_EPOCHS = 30

# encoder shape must match conf/cassnat_train.yaml exactly so the SSL
# checkpoint transplants into the CASS-NAT (src_embed + encoder subtrees)
ENC = """model_type: "conformer"
input_size: 80
N_enc: 6
d_model: 144
d_ff: 576
d_encff: 288
n_head: 4
enc_kernel_size: 15
enc_max_relative_len: 16
pos_type: "relative"
share_ff: False
dropout: 0.1
"""


def _results():
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            return json.load(f)
    return {}


def _put(key, value):
    res = _results()
    res[key] = value
    with open(RESULTS, "w") as f:
        json.dump(res, f, indent=1)
    print(f"[{key}] {value}", flush=True)


def _write_yaml(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)
    return path


def _make_subset(sub_dir, n):
    os.makedirs(sub_dir, exist_ok=True)
    keep = None
    for src, dst in ((f"{DATA}/fbank/train/feats.scp",
                      f"{sub_dir}/feats.scp"),
                     (f"{DATA}/fbank/train/utt2num_frames",
                      f"{sub_dir}/utt2num_frames"),
                     (f"{DATA}/train/token_char.scp",
                      f"{sub_dir}/token_char.scp")):
        with open(src) as f:
            lines = f.readlines()
        if keep is None:
            keep = set(l.split()[0] for l in lines[:n])
        with open(dst, "w") as f:
            f.writelines(l for l in lines if l.split()[0] in keep)
    print(f"subset: {n} utts -> {sub_dir}")


def stage_subset():
    """Labeled subsets + the unlabeled pretrain corpus (audio only)."""
    _make_subset(SUB, SUBSET_N)
    _make_subset(SUB25, SUBSET25_N)
    if not os.path.exists(f"{UNLAB}/fbank/train/feats.scp"):
        # audio-only corpus from the same synthesizer (seed 0 ==> same
        # 40-word lexicon; transcripts are written but never consumed)
        sh([sys.executable, "local/prepare_synth_speech.py", "--out",
            UNLAB, "--n_train", str(UNLAB_N), "--n_eval", "0"])
        sh([sys.executable, "-m",
            "cassnat_asr_public_tpu.bin.prepare_features",
            "--wav_scp", f"{UNLAB}/train/wav.scp",
            "--out_dir", f"{UNLAB}/fbank/train"])
    print(f"unlab: {UNLAB_N} utts -> {UNLAB}")


def stage_ssl():
    # Pretrain data: the 6,000-utt unlabeled corpus (stage 1), normalized
    # with the SAME global CMVN as the labeled runs so the transplanted
    # encoder sees an identical input distribution at fine-tune time.
    # Valid split = the labeled dev audio (labels unused by the SSL task).
    data_cfg = _write_yaml(f"{HERE}/conf/data_unlab.yaml", """vocab_file: data/dict/vocab_char.txt
global_cmvn: data/fbank/cmvn.ark

train_paths:
  - name: unlab
    scp_path: data/unlab/fbank/train/feats.scp
    utt2num_frames: data/unlab/fbank/train/utt2num_frames

dev_paths:
  - name: dev
    scp_path: data/fbank/dev/feats.scp
    text_label: data/dev/token_char.scp
    utt2num_frames: data/fbank/dev/utt2num_frames

test_paths: []
""")
    # Anti-collapse tuning (round-3 lesson: at a 3k-step budget the
    # quantizer temp floored within 700 steps and the codebook collapsed
    # to ppl 2). This round pretrains 5x longer on 5x the audio
    # (~15k updates), so the anneal is stretched to keep the codebook
    # soft through ~mid-run (0.9997^15000 ~ 0.011 -> floors around step
    # 9k) and saving starts once the schedule has matured.
    cfg = _write_yaml(f"{HERE}/conf/wav2vec_train.yaml", ENC + """
mask_prob: 0.65
mask_length: 5
num_negatives: 50
logit_temp: 0.1
final_dim: 64
quantize_targets: True
latent_vars: 64
latent_groups: 2
latent_temp: [2.0, 0.5, 0.9997]
loss_weights: [1.0]
dropout_input: 0.1
dropout_features: 0.1

left_ctx: 0
right_ctx: 0
skip_frame: 1
use_specaug: False
use_cmvn: True
filter_max: 2000
filter_min: 32
batch_size: 16

optim_type: noam
warmup_type: "noam_warmup"
noam_factor: 0.0015
warmup_steps: 800
grad_clip: 5
accum_grad: 1
weight_decay: 0
eps: 1.0e-9
epochs: 40
start_saving_epoch: 30
end_patience: 40
print_freq: 50
seed: 0
compute_dtype: bfloat16
""")
    log_path = os.path.join(SSL_EXP, "train.log")
    os.makedirs(SSL_EXP, exist_ok=True)
    with open(log_path, "w") as lf:
        sh([sys.executable, "-m", "cassnat_asr_public_tpu.bin.train_ssl",
            "--exp_dir", SSL_EXP, "--train_config", cfg,
            "--data_config", data_cfg,
            "--optim_type", "noam", "--epochs", "40", "--task", "wav2vec"],
           stdout=lf, stderr=subprocess.STDOUT)
    # record codebook health from the final valid epoch line
    diag = {}
    for line in open(log_path):
        m = re.search(r"Valid acc: ([\d.]+).*Valid code_ppl: ([\d.]+)", line)
        if m:
            diag = {"valid_acc": float(m.group(1)),
                    "valid_code_ppl": float(m.group(2))}
    if diag:
        _put("ssl_pretrain", diag)


def _sub_data_yaml(sub_name="train_sub"):
    return _write_yaml(f"{HERE}/conf/data_{sub_name}.yaml", f"""vocab_file: data/dict/vocab_char.txt
global_cmvn: data/fbank/cmvn.ark

train_paths:
  - name: {sub_name}
    scp_path: data/{sub_name}/feats.scp
    text_label: data/{sub_name}/token_char.scp
    utt2num_frames: data/{sub_name}/utt2num_frames

dev_paths:
  - name: dev
    scp_path: data/fbank/dev/feats.scp
    text_label: data/dev/token_char.scp
    utt2num_frames: data/fbank/dev/utt2num_frames

test_paths:
  - name: test
    scp_path: data/fbank/test/feats.scp
    text_label: data/test/token_char.scp
    utt2num_frames: data/fbank/test/utt2num_frames
""")


def _train_cli(task, exp, train_yaml, data_yaml, epochs, resume=""):
    cmd = [sys.executable, "-m", "cassnat_asr_public_tpu.bin.train_asr",
           "--exp_dir", exp, "--train_config", train_yaml,
           "--data_config", data_yaml, "--optim_type", "noam",
           "--epochs", str(epochs), "--task", task]
    if resume:
        cmd += ["--resume_model", resume]
    sh(cmd)


def _decode(task_name, exp, train_yaml, data_yaml, overrides,
            ckpt="best_model.ckpt"):
    """Greedy/ESA decode through the task layer; returns {utt: words}."""
    from cassnat_asr_public_tpu.tasks import TASKS
    from cassnat_asr_public_tpu.utils.config import merge_configs
    cfg = merge_configs(None, train_yaml, data_yaml)
    for p in ("train_paths", "dev_paths", "test_paths"):
        for d in getattr(cfg, p, []) or []:
            for k in d:
                if k != "name":
                    d[k] = os.path.join(HERE, d[k])
    if getattr(cfg, "vocab_file", None):
        cfg.vocab_file = os.path.join(HERE, cfg.vocab_file)
    if getattr(cfg, "global_cmvn", None):
        cfg.global_cmvn = os.path.join(HERE, cfg.global_cmvn)
    cfg.exp_dir = exp
    cfg.resume_model = os.path.join(exp, ckpt)
    cfg.dropout = 0.0
    cfg.use_specaug = False
    cfg.test_batch_size = 16
    for k, v in overrides.items():
        setattr(cfg, k, v)
    task = TASKS[task_name]("test", cfg)
    if getattr(cfg, "rank_model", "") == "lm" or \
            getattr(cfg, "lm_weight", 0):
        task.load_lm_model(cfg)
    out = task.decode(cfg)
    hyps_raw = out[0] if isinstance(out, tuple) else out
    return {u: pieces_to_words(p) for u, p in hyps_raw.items()}


def _score(key, hyps):
    refs = read_text(f"{DATA}/test/text")
    rep = wer(refs, hyps)
    _put(key, {"wer": rep["wer"], "n_words": rep["n_words"]})
    return rep


def stage_ft():
    """SSL-init vs from-scratch at EQUAL fine-tune budgets (the
    reference's encoder-init workflow: run_hubert.sh +
    cassnat_task.py:62-83).

    Arm matrix (all through bin/train_asr):
      100 utts x 30 ep (~210 steps): ft_scratch / ft_ssl_init
      25 utts x 160 ep (~320 steps): ft_scratch_25 / ft_ssl_init_25
      25-utt FROZEN-encoder probes (fix_encoder, encoder+src_embed only;
        the CTC/decoder heads train): ft_probe_ssl_25 vs ft_probe_rand_25
        — the WER gap measures pretrained-feature quality directly,
        independent of fine-tune dynamics.
    Every arm shares one schedule, with warmup shortened to 100 steps
    (the stock 800 would span the entire budget at these sizes).
    """
    ssl_ckpt = os.path.join(SSL_EXP, "best_model.ckpt")
    base = open(f"{HERE}/conf/cassnat_train.yaml").read()

    def ft_yaml(tag, epochs, extra=""):
        return _write_yaml(
            f"{HERE}/conf/cassnat_{tag}.yaml",
            base + f"\n# low-resource fine-tune budget (duplicate keys:"
                   f" last wins)\nepochs: {epochs}\n"
                   f"start_saving_epoch: 0\nwarmup_steps: 100\n" + extra)

    probe = ("fix_encoder: True\n"
             "encoder_group_subtrees: [src_embed, encoder]\n")
    # 160-epoch arms: skip the per-epoch model.N.ckpt spam (last/best
    # still saved every epoch) — at 2 steps/epoch the ckpt host pulls
    # would dominate the run
    y100 = ft_yaml("sub", FT_EPOCHS)
    y25 = ft_yaml("sub25", 160,
                  "start_saving_epoch: 200\nvalid_freq: 10\n")
    y25_probe = ft_yaml("sub25_probe", 160,
                        probe + "start_saving_epoch: 200\nvalid_freq: 10\n")
    # the reference's multi-group fine-tune schedule for pretrained
    # encoders (MulNoam: encoder group briefly frozen then 0.3x LR, fresh
    # decoder at full LR — reference cassnat_task.py:133-154 /
    # hubert_train.yaml multi_optim); only meaningful with an SSL init
    mn = ("noam_factor: [0.00045, 0.0015]\n"
          "warmup_steps: [100, 100]\n"
          "freeze_steps: [60, 0]\n")
    y25_mn = ft_yaml("sub25_mn", 160,
                     mn + "start_saving_epoch: 200\nvalid_freq: 10\n")
    d100, d25 = _sub_data_yaml("train_sub"), _sub_data_yaml("train_sub25")
    runs = {
        "ft_scratch": ("", y100, d100),
        "ft_ssl_init": (ssl_ckpt, y100, d100),
        "ft_scratch_25": ("", y25, d25),
        "ft_ssl_init_25": (ssl_ckpt, y25, d25),
        "ft_ssl_init_25_mn": (ssl_ckpt, y25_mn, d25),
        "ft_probe_rand_25": ("", y25_probe, d25),
        "ft_probe_ssl_25": (ssl_ckpt, y25_probe, d25),
    }
    # Multi-seed robustness (VERDICT r4 item 8): FAMILY_FT_SEEDS=1,2 adds
    # re-trainings of every arm at extra seeds (seed affects init, data
    # order, specaug and decode sampling); results land as <arm>_seed<N>
    # and stage_report aggregates mean +/- spread per arm.
    seeds = [int(s) for s in
             os.environ.get("FAMILY_FT_SEEDS", "").split(",") if s]
    for name in list(runs):
        resume, yaml_path, data_yaml = runs[name]
        for s in seeds:
            base_yaml = open(yaml_path).read()
            y_s = _write_yaml(
                yaml_path.replace(".yaml", f"_seed{s}.yaml"),
                base_yaml + f"\nseed: {s}\n")
            runs[f"{name}_seed{s}"] = (resume, y_s, data_yaml)
    only = os.environ.get("FAMILY_FT_ONLY", "")
    wanted = set(only.split(",")) if only else None
    for name, (resume, yaml_path, data_yaml) in runs.items():
        if wanted is not None and name not in wanted:
            continue
        exp = os.path.join(HERE, "exp", name)
        if resume and not os.path.exists(resume) and \
                not os.path.exists(os.path.join(exp, "model.last.ckpt")):
            # stage 2 hasn't produced the SSL checkpoint yet; the
            # stage is resumable — rerun it once stage 2 finishes
            print(f"[{name}] SKIP (init ckpt missing: {resume})",
                  flush=True)
            continue
        # always invoke the trainer: it resumes from exp/model.last.ckpt
        # and exits immediately if the arm already reached its epoch
        # budget, so interrupted runs continue instead of being skipped
        # on a stale best_model.ckpt
        _train_cli("cassnat", exp, yaml_path, data_yaml, FT_EPOCHS,
                   resume=resume)
        hyps = _decode("cassnat", exp, yaml_path, data_yaml,
                       dict(decode_type="esa_att", sample_num=1,
                            rank_model="none"))
        _score(name, hyps)


def stage_lmnat():
    lm_ckpt = os.path.join(LM_EXP, "best_model.ckpt")
    base = open(f"{HERE}/conf/cassnat_train.yaml").read()
    text_keys = f"""
text_encoder_type: "lm"
text_encoder_layers: 2
d_text: 128
text_vocab_size: 19
text_encoder_path: {lm_ckpt}
freeze_text_encoder: True
mix_type: "none"
"""
    for variant, extra in (("lmnat", ""), ("lmnat2", ""),
                           ("lmnat3", "sad_type: \"lm\"\nfreeze_sad: True\n"
                            "plm_alpha: 0.3\nacoustic_mask_prob: 0.2\n"
                            "acoustic_mask_length: 3\n")):
        cfg = _write_yaml(f"{HERE}/conf/{variant}_train.yaml",
                          base + text_keys + extra +
                          "epochs: 25\nstart_saving_epoch: 20\n")
        exp = os.path.join(HERE, "exp", variant)
        if not os.path.exists(os.path.join(exp, "best_model.ckpt")):
            _train_cli(variant, exp, cfg, f"{HERE}/conf/data.yaml", 25)
        hyps = _decode(variant, exp, cfg, f"{HERE}/conf/data.yaml",
                       dict(decode_type="esa_att", sample_num=1,
                            rank_model="none"))
        _score(f"{variant}_bestpath_1", hyps)
        hyps = _decode(variant, exp, cfg, f"{HERE}/conf/data.yaml",
                       dict(decode_type="esa_att", sample_num=50,
                            threshold=0.9, rank_model="lm",
                            lm_config=LM_YAML, rnnlm=lm_ckpt))
        _score(f"{variant}_esa_lm_50", hyps)


def stage_hubert():
    for part in ("train", "dev", "test"):
        out = f"{DATA}/{part}/wav_s.scp"
        if not os.path.exists(out):
            sh([sys.executable, os.path.join(REPO, "data_prep.py"),
                "--wav_scp", f"{DATA}/{part}/wav.scp", "--output", out])
    data_yaml = _write_yaml(f"{HERE}/conf/hubert_data.yaml", f"""vocab_file: data/dict/vocab_char.txt

train_paths:
  - name: train
    scp_path: data/train/wav_s.scp
    text_label: data/train/token_char.scp

dev_paths:
  - name: dev
    scp_path: data/dev/wav_s.scp
    text_label: data/dev/token_char.scp

test_paths:
  - name: test
    scp_path: data/test/wav_s.scp
    text_label: data/test/token_char.scp
""")
    train_yaml = _write_yaml(f"{HERE}/conf/hubert_train.yaml", """# Tiny
# HubertNAT trained from scratch on raw synth waveforms (16 kHz); conv
# stride 160 -> 100 fps.
vocab_size: 19
d_model: 144          # noam schedule scale (reference hubert_train.yaml:7)
encoder_embed_dim: 144
encoder_layers: 4
encoder_attention_heads: 4
encoder_ffn_embed_dim: 576
encoder_dropout: 0.1
encoder_layerdrop: 0.0
freeze_encoder: False
conv_feature_layers: "[(144,10,5)] + [(144,3,2)] * 3 + [(144,2,2)] * 2"
conv_pos: 64
conv_pos_groups: 16
mask_prob: 0.0
feature_grad_mult: 1.0

use_conv_dec: True
N_extra: 1
N_self_dec: 2
N_mix_dec: 1
d_decff: 288
n_head: 4
dec_kernel_size: 3
dec_max_relative_len: 8
dropout: 0.1

use_trigger: True
src_trigger: False
use_best_path: False
sample_topk: 0
ctc_alpha: 1
att_alpha: 1
label_smooth: 0.1
padding_idx: 0

optim_type: noam
warmup_type: "noam_warmup"
noam_factor: 0.0015
warmup_steps: 800
grad_clip: 5
accum_grad: 1
weight_decay: 0
eps: 1.0e-9

batch_size: 16
batch_type: "utterance"
max_samplen: 400000
filter_max: 200000
filter_min: 1000
normalize: True
epochs: 40
start_saving_epoch: 30
end_patience: 40
print_freq: 50
seed: 0
compute_dtype: bfloat16
""")
    exp = os.path.join(HERE, "exp", "hubert")
    if not os.path.exists(os.path.join(exp, "best_model.ckpt")):
        _train_cli("hubert", exp, train_yaml, data_yaml, 40)
    hyps = _decode("hubert", exp, train_yaml, data_yaml, {})
    _score("hubert_greedy", hyps)
    # ESA decode, the reference's hubert decode config (run_hubert.sh
    # decode stage: decode_type esa_att, s_num 50, threshold 0.9 + rank
    # model — the LM-rank flavor, WER-validated in WER_PARITY*.md)
    hyps = _decode("hubert", exp, train_yaml, data_yaml,
                   dict(decode_type="esa_att", sample_num=50,
                        threshold=0.9, rank_model="lm",
                        lm_config=LM_YAML,
                        rnnlm=os.path.join(LM_EXP, "best_model.ckpt")))
    _score("hubert_esa_lm_50", hyps)


def stage_report():
    res = _results()
    lines = [
        "# Model-family end-to-end demos (synthetic corpus)",
        "",
        "Every model family the reference ships, trained in this repo",
        "through its public CLIs on the synthetic-speech corpus",
        "(egs/synth) and decoded to a WER on the held-out test split",
        "(825 ref words). Produced by `egs/synth/run_family_e2e.py`;",
        "the AST and CASS-NAT families are covered separately with",
        "reference-torch parity arms (WER_PARITY.md, WER_PARITY_HARD.md).",
        "",
        "## SSL: wav2vec2 pretrain -> CASS-NAT encoder init",
        "",
        f"wav2vec2 (conformer, d144) pretrained on {UNLAB_N:,} unlabeled",
        "utterances (audio only, bin/train_ssl; ~15k contrastive",
        "updates), then transplanted into a CASS-NAT",
        "(resume_model -> src_embed+encoder) and fine-tuned on labeled",
        "subsets against from-scratch controls at IDENTICAL budgets",
        "(reference workflow: run_hubert.sh encoder-init fine-tuning).",
        "The frozen-encoder probe pair trains only the CTC/decoder heads",
        "on top of a frozen encoder (fix_encoder), so its gap measures",
        "pretrained-feature quality directly.",
        "",
        "| labeled budget | arm | test WER % (per-seed) | mean |",
        "|---|---|---|---|",
    ]
    ft_rows = (
        (f"{SUBSET_N} utts x {FT_EPOCHS} ep", "ft_scratch"),
        (f"{SUBSET_N} utts x {FT_EPOCHS} ep", "ft_ssl_init"),
        (f"{SUBSET25_N} utts x 160 ep", "ft_scratch_25"),
        (f"{SUBSET25_N} utts x 160 ep", "ft_ssl_init_25"),
        (f"{SUBSET25_N} utts x 160 ep, MulNoam enc-group",
         "ft_ssl_init_25_mn"),
        (f"{SUBSET25_N} utts x 160 ep, frozen enc", "ft_probe_rand_25"),
        (f"{SUBSET25_N} utts x 160 ep, frozen enc", "ft_probe_ssl_25"),
    )

    def arm_wers(k):
        """Seed-0 + any <arm>_seed<N> results, in seed order."""
        wers = []
        if k in res:
            wers.append(res[k]["wer"])
        for rk in sorted(res):
            if rk.startswith(f"{k}_seed"):
                wers.append(res[rk]["wer"])
        return wers

    means = {}
    for budget, k in ft_rows:
        wers = arm_wers(k)
        if wers:
            means[k] = sum(wers) / len(wers)
            per = ", ".join(f"{w:.2f}" for w in wers)
            lines.append(f"| {budget} | {k} | {per} | {means[k]:.2f} |")
    pairs = [("ft_scratch", "ft_ssl_init"),
             ("ft_scratch_25", "ft_ssl_init_25"),
             ("ft_probe_rand_25", "ft_probe_ssl_25")]
    verdicts = []
    for a, b in pairs:
        if a in means and b in means:
            d = means[a] - means[b]
            verdicts.append(f"{b} vs {a}: "
                            f"{'+' if d >= 0 else ''}{d:.2f} abs mean "
                            f"({'SSL wins' if d > 0 else 'scratch wins'})")
    if verdicts:
        lines += ["", "Deltas (positive = SSL init better): "
                  + "; ".join(verdicts) + "."]
    if "ssl_pretrain" in res:
        d = res["ssl_pretrain"]
        lines += ["", f"SSL codebook health at the final epoch: valid "
                  f"InfoNCE accuracy {d['valid_acc']:.3f}, code perplexity "
                  f"{d['valid_code_ppl']:.1f} of 128 codewords (collapse "
                  "would read ~1.0 / ~2)."]
    lines += [
        "",
        "## LMNAT family (text-encoder fusion; synth char-LM as encoder)",
        "",
        "| model | bestpath WER % | ESA+LM 50 WER % |",
        "|---|---|---|",
    ]
    for v in ("lmnat", "lmnat2", "lmnat3"):
        a = res.get(f"{v}_bestpath_1", {}).get("wer")
        b = res.get(f"{v}_esa_lm_50", {}).get("wer")
        if a is not None:
            lines.append(f"| {v} | {a:.2f} | "
                         f"{'' if b is None else f'{b:.2f}'} |")
    lines += [
        "",
        "## HubertNAT on raw waveform (from scratch)",
        "",
        "Conv frontend (stride 160 @16 kHz) + 4-layer encoder + NAT",
        "decoder, trained on wav_s.scp manifests (data_prep.py) with",
        "HubertLoader sample-budget batching; greedy NAT decode.",
        "",
        "| run | test WER % |",
        "|---|---|",
    ]
    if "hubert_greedy" in res:
        lines.append(f"| hubert_greedy | {res['hubert_greedy']['wer']:.2f} |")
    if "hubert_esa_lm_50" in res:
        lines.append(f"| hubert_esa_lm_50 (s_num=50 thr=0.9, LM rank) | "
                     f"{res['hubert_esa_lm_50']['wer']:.2f} |")
    lines += ["",
              f"Generated {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}"
              " by egs/synth/run_family_e2e.py."]
    with open(REPORT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {REPORT}")


STAGES = [("subset", stage_subset), ("ssl", stage_ssl), ("ft", stage_ft),
          ("lmnat", stage_lmnat), ("hubert", stage_hubert),
          ("report", stage_report)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=1)
    p.add_argument("--end_stage", type=int, default=len(STAGES))
    a = p.parse_args()
    for i, (name, fn) in enumerate(STAGES, 1):
        if a.stage <= i <= a.end_stage:
            print(f"===== stage {i}: {name} =====", flush=True)
            fn()


if __name__ == "__main__":
    main()
