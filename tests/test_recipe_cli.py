"""Full-recipe CLI smoke test: synthetic wavs -> features -> subwords ->
training -> decoding -> WER scoring, through the actual bin/ entry points.

This is the end-to-end integration test the reference never had
(SURVEY.md §4: verification there was recipe-level and manual).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, cwd, env):
    res = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                         text=True, timeout=1500)
    assert res.returncode == 0, (cmd, res.stdout[-1500:], res.stderr[-2500:])
    return res


@pytest.mark.slow
def test_full_recipe_smoke(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    work = str(tmp_path)

    # 1. synthetic corpus
    run([sys.executable,
         os.path.join(REPO, "egs/librispeech/local/prepare_example_data.py"),
         "--out", os.path.join(work, "data"), "--n", "8"], work, env)

    # 2. fbank features + CMVN (in-framework Kaldi replacement)
    for part, cmvn in [("train", True), ("dev", False), ("test_clean", False)]:
        cmd = [sys.executable, "-m",
               "cassnat_asr_public_tpu.bin.prepare_features",
               "--wav_scp", os.path.join(work, f"data/{part}/wav.scp"),
               "--out_dir", os.path.join(work, f"data/fbank/{part}"),
               "--num_bins", "20"]
        if cmvn:
            cmd.append("--cmvn")
        run(cmd, work, env)
    assert os.path.exists(os.path.join(work, "data/fbank/train/cmvn.ark"))

    # 3. subword model + tokenized transcripts
    with open(os.path.join(work, "data/train/text")) as f, \
            open(os.path.join(work, "corpus.txt"), "w") as out:
        for line in f:
            out.write(line.split(None, 1)[1])
    run([sys.executable, os.path.join(REPO, "utils/spm_train.py"),
         "--input", os.path.join(work, "corpus.txt"),
         "--model_prefix", os.path.join(work, "bpe"),
         "--vocab_size", "40", "--model_type", "bpe"], work, env)
    for part in ["train", "dev", "test_clean"]:
        run([sys.executable, os.path.join(REPO, "utils/spm_encode.py"),
             "--model", os.path.join(work, "bpe.model"),
             "--input", os.path.join(work, f"data/{part}/text"),
             "--output", os.path.join(work, f"data/{part}/token_wp.scp")],
            work, env)
    # vocab file (skip the 3 specials)
    with open(os.path.join(work, "bpe.vocab")) as f, \
            open(os.path.join(work, "vocab_wp.txt"), "w") as out:
        for i, line in enumerate(f):
            if i >= 3:
                out.write(line.split("\t")[0] + "\n")

    # 4. tiny AST training via the CLI
    n_vocab = sum(1 for _ in open(os.path.join(work, "vocab_wp.txt"))) + 4
    train_conf = {
        "model_type": "transformer", "input_size": 20, "N_enc": 1, "N_dec": 1,
        "d_model": 16, "d_ff": 32, "n_head": 2, "dropout": 0.0,
        "ctc_alpha": 1.0, "interctc_alpha": 0, "interctc_layer": 0,
        "label_smooth": 0.1, "use_conv_enc": False, "pos_type": "absolute",
        "vocab_size": n_vocab, "left_ctx": 0, "right_ctx": 0, "skip_frame": 1,
        "warmup_type": "noam_warmup", "noam_factor": 0.01, "warmup_steps": 5,
        "total_steps": 100, "learning_rate": 0.001, "weight_decay": 0,
        "dataset_type": "DynamicDataset", "max_len": 5000, "batch_size": 4,
        "batch_type": "utterance", "max_frmlen": 400, "max_lablen": 40,
        "filter_max": 100000, "filter_min": 0, "padding_idx": 0,
        "accum_grad": 1, "grad_clip": 5.0, "use_cmvn": True,
        "use_specaug": False,
    }
    data_conf = {
        "vocab_file": os.path.join(work, "vocab_wp.txt"),
        "global_cmvn": os.path.join(work, "data/fbank/train/cmvn.ark"),
        "train_paths": [{"name": "train",
                         "scp_path": os.path.join(work, "data/fbank/train/feats.scp"),
                         "text_label": os.path.join(work, "data/train/token_wp.scp"),
                         "utt2num_frames": os.path.join(work, "data/fbank/train/utt2num_frames")}],
        "dev_paths": [{"name": "dev",
                       "scp_path": os.path.join(work, "data/fbank/dev/feats.scp"),
                       "text_label": os.path.join(work, "data/dev/token_wp.scp"),
                       "utt2num_frames": os.path.join(work, "data/fbank/dev/utt2num_frames")}],
        "test_paths": [{"name": "test",
                        "scp_path": os.path.join(work, "data/fbank/test_clean/feats.scp"),
                        "text_label": os.path.join(work, "data/test_clean/token_wp.scp"),
                        "utt2num_frames": os.path.join(work, "data/fbank/test_clean/utt2num_frames")}],
    }
    import yaml
    with open(os.path.join(work, "train.yaml"), "w") as f:
        yaml.safe_dump(train_conf, f)
    with open(os.path.join(work, "data.yaml"), "w") as f:
        yaml.safe_dump(data_conf, f)
    exp = os.path.join(work, "exp")
    run([sys.executable, "-m", "cassnat_asr_public_tpu.bin.train_asr",
         "--exp_dir", exp, "--train_config", os.path.join(work, "train.yaml"),
         "--data_config", os.path.join(work, "data.yaml"),
         "--task", "art", "--epochs", "2", "--optim_type", "noam",
         "--start_saving_epoch", "0"], work, env)
    assert os.path.exists(os.path.join(exp, "model.last.ckpt"))
    assert os.path.exists(os.path.join(exp, "config.yaml"))

    # 5. checkpoint averaging
    run([sys.executable, os.path.join(REPO, "utils/average_checkpoints.py"),
         "--exp_dir", exp, "--num", "2"], work, env)
    assert os.path.exists(os.path.join(exp, "averaged.ckpt"))

    # 6. decode (greedy CTC for speed) + score
    decode_conf = dict(train_conf)
    decode_conf["dropout"] = 0.0
    with open(os.path.join(work, "decode.yaml"), "w") as f:
        yaml.safe_dump(decode_conf, f)
    hyp = os.path.join(work, "hyp.txt")
    run([sys.executable, "-m", "cassnat_asr_public_tpu.bin.decode_asr",
         "--task", "art", "--test_config", os.path.join(work, "decode.yaml"),
         "--data_config", os.path.join(work, "data.yaml"),
         "--resume_model", os.path.join(exp, "averaged.ckpt"),
         "--decode_type", "ctc_only", "--batch_size", "4",
         "--result_file", hyp], work, env)
    assert os.path.exists(hyp)
    res = run([sys.executable, os.path.join(REPO, "utils/score_wer.py"),
               "--ref", os.path.join(work, "data/test_clean/text"),
               "--hyp", hyp], work, env)
    assert "WER" in res.stdout
