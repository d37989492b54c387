"""Aishell char-recipe smoke: the alternate vocab path end-to-end.

Drives `egs/aishell/run.sh` (SYNTH=1) in a tmp copy: synthetic corpus ->
fbank -> char units (no space token, Mandarin-style) -> char-vocab ->
tiny AST-conformer training -> checkpoint averaging -> ctc_att decode ->
CER scoring. This is the data-free counterpart of the reference's
Aishell-1 recipe surface (reference: egs/librispeech/local/
prepare_dict_char.py char units + SURVEY.md §6 Aishell CER table).
"""

import os
import shutil
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _shrink(conf_in, conf_out, extra):
    with open(conf_in) as f:
        cfg = yaml.safe_load(f)
    cfg.update({"N_enc": 2, "N_dec": 1, "d_model": 32, "d_ff": 64,
                "d_encff": 64, "d_decff": 64, "n_head": 2,
                "enc_kernel_size": 7, "frame_bucket": 448,
                "label_bucket": 48})
    cfg.update(extra)
    with open(conf_out, "w") as f:
        yaml.safe_dump(cfg, f)


@pytest.mark.slow
def test_aishell_synth_char_recipe(tmp_path):
    egs = tmp_path / "egs"
    shutil.copytree(os.path.join(REPO, "egs", "aishell"), egs / "aishell")
    # stub path.sh pointing E2EASR at the real repo (the recipe sources
    # ../librispeech/path.sh, which resolves relative to itself)
    (egs / "librispeech").mkdir()
    (egs / "librispeech" / "path.sh").write_text(
        f"export E2EASR={REPO}\n"
        "export PYTHONPATH=$E2EASR:$PYTHONPATH\n"
        "export PATH=$E2EASR/utils:$PATH\n")
    aishell = str(egs / "aishell")
    _shrink(os.path.join(aishell, "conf", "char_synth.yaml"),
            os.path.join(aishell, "conf", "smoke_train.yaml"),
            {"epochs": 3, "start_saving_epoch": 0, "use_specaug": False,
             "warmup_steps": 10, "noam_factor": 0.02})
    _shrink(os.path.join(aishell, "conf", "char_synth_decode.yaml"),
            os.path.join(aishell, "conf", "smoke_decode.yaml"),
            {"beam_width": 4, "ctc_beam": 6})
    nat_shrink = {"N_extra": 1, "N_self_dec": 1, "N_mix_dec": 1,
                  "dec_kernel_size": 3}
    _shrink(os.path.join(aishell, "conf", "cassnat_synth.yaml"),
            os.path.join(aishell, "conf", "smoke_nat.yaml"),
            dict(nat_shrink, epochs=3, start_saving_epoch=0,
                 use_specaug=False, warmup_steps=10, noam_factor=0.02))
    _shrink(os.path.join(aishell, "conf", "cassnat_synth_decode.yaml"),
            os.path.join(aishell, "conf", "smoke_nat_dec.yaml"),
            nat_shrink)
    _shrink(os.path.join(aishell, "conf", "cassnat_synth_decode_esa.yaml"),
            os.path.join(aishell, "conf", "smoke_nat_esa.yaml"),
            dict(nat_shrink, sample_num=8))

    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
                "SYNTH": "1", "SYNTH_N": "24", "SYNTH_EVAL": "6",
                "EPOCHS": "3", "AVG_NUM": "2",
                "TRAIN_CONF": "conf/smoke_train.yaml",
                "DECODE_CONF": "conf/smoke_decode.yaml",
                "NAT_CONF": "conf/smoke_nat.yaml",
                "NAT_DECODE_CONF": "conf/smoke_nat_dec.yaml",
                "NAT_DECODE_ESA_CONF": "conf/smoke_nat_esa.yaml"})
    res = subprocess.run(["bash", "run.sh", "--stage", "0"], cwd=aishell,
                         env=env, capture_output=True, text=True,
                         timeout=2700)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-3000:])

    # char units really dropped word boundaries (no space token in vocab)
    vocab = open(os.path.join(aishell, "data/dict/vocab_char.txt")).read()
    assert " " not in vocab.replace("\n", "")
    with open(os.path.join(aishell, "data/train/token_char.scp")) as f:
        toks = f.readline().split()[1:]
    assert all(len(t) == 1 for t in toks)

    # CER files exist and parse for both eval parts, both model families
    for part in ("dev", "test"):
        cer_txt = open(os.path.join(
            aishell, "exp/aishell_art", f"cer_{part}.txt")).read()
        assert "CER" in cer_txt or "WER" in cer_txt, cer_txt
        for mode in ("bestpath", "esa_self50"):
            nat_txt = open(os.path.join(
                aishell, "exp/aishell_cassnat",
                f"cer_{mode}_{part}.txt")).read()
            assert "CER" in nat_txt or "WER" in nat_txt, nat_txt
    report = open(os.path.join(aishell, "RESULTS_synth.md")).read()
    assert "CASS-NAT" in report and "| test |" in report
