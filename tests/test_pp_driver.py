"""Tensor- and pipeline-parallel training through the PRODUCTION driver.

The reference scales training with DDP only (reference:
src/bin/train_asr.py:85-88); this repo's TP (parallel/mesh.py
param_sharding_rules) and PP (parallel/pipeline.py GPipe over a 'pipe'
mesh axis) are TPU-native extensions. Library-level parity is covered by
tests/test_parallel.py / tests/test_pipeline.py; THIS test drives both
through `bin/train_asr` itself (config keys model_parallel /
pipeline_parallel), asserting per-epoch training-loss parity against the
single-device run of the identical config (VERDICT r3 item 7).

Each arm runs in its own clean subprocess (the axon sitecustomize breaks
xla_force_host_platform_device_count in-process; see tests/conftest.py).
"""

import os
import re
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def clean_env(n_devices: int):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}").strip()
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + parts)
    return env


def run(cmd, cwd, env):
    res = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                         text=True, timeout=1500)
    assert res.returncode == 0, (cmd, res.stdout[-1500:], res.stderr[-2500:])
    return res


def epoch_losses(stdout: str):
    return [float(m.group(1)) for m in
            re.finditer(r"Epoch \d+ done, Train loss: ([\d.eE+-]+)", stdout)]


@pytest.mark.slow
def test_tp_pp_through_train_asr(tmp_path):
    work = str(tmp_path)
    env1 = clean_env(1)

    # tiny corpus + features + char tokens (recipe-CLI pattern)
    run([sys.executable,
         os.path.join(REPO, "egs/librispeech/local/prepare_example_data.py"),
         "--out", os.path.join(work, "data"), "--n", "8"], work, env1)
    for part in ("train", "dev"):
        run([sys.executable, "-m",
             "cassnat_asr_public_tpu.bin.prepare_features",
             "--wav_scp", os.path.join(work, f"data/{part}/wav.scp"),
             "--out_dir", os.path.join(work, f"data/fbank/{part}"),
             "--num_bins", "20"] + (["--cmvn"] if part == "train" else []),
            work, env1)
    units = set()
    for part in ("train", "dev"):
        with open(os.path.join(work, f"data/{part}/text")) as f, \
                open(os.path.join(work, f"data/{part}/tok.scp"), "w") as out:
            for line in f:
                utt, rest = line.split(None, 1)
                toks = []
                for i, w in enumerate(rest.split()):
                    if i:
                        toks.append("<space>")
                    toks.extend(list(w))
                if part == "train":
                    units.update(toks)
                out.write(f"{utt} {' '.join(toks)}\n")
    with open(os.path.join(work, "vocab.txt"), "w") as f:
        f.write("\n".join(sorted(units)) + "\n")
    n_vocab = len(units) + 4

    train_conf = {
        "model_type": "transformer", "input_size": 20, "N_enc": 2,
        "N_dec": 1, "d_model": 16, "d_ff": 32, "n_head": 2, "dropout": 0.0,
        "ctc_alpha": 1.0, "interctc_alpha": 0, "interctc_layer": 0,
        "label_smooth": 0.1, "use_conv_enc": False, "pos_type": "absolute",
        "vocab_size": n_vocab, "left_ctx": 0, "right_ctx": 0,
        "skip_frame": 1, "warmup_type": "noam_warmup", "noam_factor": 0.01,
        "warmup_steps": 5, "learning_rate": 0.001, "weight_decay": 0,
        "dataset_type": "DynamicDataset", "batch_size": 4,
        "batch_type": "utterance", "max_frmlen": 400, "max_lablen": 40,
        "filter_max": 100000, "filter_min": 0, "padding_idx": 0,
        "accum_grad": 1, "grad_clip": 5.0, "use_cmvn": True,
        "use_specaug": False, "seed": 0, "start_saving_epoch": 0,
    }
    data_conf = {
        "vocab_file": os.path.join(work, "vocab.txt"),
        "global_cmvn": os.path.join(work, "data/fbank/train/cmvn.ark"),
        "train_paths": [{
            "name": "train",
            "scp_path": os.path.join(work, "data/fbank/train/feats.scp"),
            "text_label": os.path.join(work, "data/train/tok.scp"),
            "utt2num_frames": os.path.join(
                work, "data/fbank/train/utt2num_frames")}],
        "dev_paths": [{
            "name": "dev",
            "scp_path": os.path.join(work, "data/fbank/dev/feats.scp"),
            "text_label": os.path.join(work, "data/dev/tok.scp"),
            "utt2num_frames": os.path.join(
                work, "data/fbank/dev/utt2num_frames")}],
        "test_paths": [],
    }
    with open(os.path.join(work, "train.yaml"), "w") as f:
        yaml.safe_dump(train_conf, f)
    with open(os.path.join(work, "data.yaml"), "w") as f:
        yaml.safe_dump(data_conf, f)

    def train(tag, extra, n_devices):
        res = run([sys.executable, "-m",
                   "cassnat_asr_public_tpu.bin.train_asr",
                   "--exp_dir", os.path.join(work, f"exp_{tag}"),
                   "--train_config", os.path.join(work, "train.yaml"),
                   "--data_config", os.path.join(work, "data.yaml"),
                   "--task", "art", "--epochs", "2",
                   "--optim_type", "noam"] + extra,
                  work, clean_env(n_devices))
        losses = epoch_losses(res.stdout)
        assert len(losses) == 2, res.stdout[-1500:]
        return losses, res.stdout

    base, _ = train("base", [], 1)

    tp, tp_out = train("tp", ["--model_parallel", "2"], 2)
    assert "[tp] train state sharded over model=2" in tp_out
    for a, b in zip(base, tp):
        # TP changes matmul reduction order; losses agree to float tol
        assert abs(a - b) / max(abs(a), 1e-9) < 1e-3, (base, tp)

    pp, pp_out = train("pp", ["--pipeline_parallel", "2"], 2)
    assert "[pp] encoder layer stack pipelined: 2 layers over 2 stages" \
        in pp_out
    for a, b in zip(base, pp):
        assert abs(a - b) / max(abs(a), 1e-9) < 1e-3, (base, pp)
