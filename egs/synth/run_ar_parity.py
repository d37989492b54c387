#!/usr/bin/env python3
"""AR-beam (AST) WER validation on the synthetic-speech corpus, repo vs
the PyTorch reference driving the SAME trained weights — the autoregressive
counterpart of run_wer_parity.py (which covers the CASS-NAT/ESA modes).

Requires run_wer_parity.py stages 1-4 to have produced data/features/
tokens/LM. Stages (resumable; artifacts under egs/synth/):
  1 train      — train the small AST-Conformer (tasks.ArtTask)
  2 decode     — greedy CTC / AR beam (joint CTC, no LM) / AR beam + LM
                 shallow fusion / ctc_correct; WER for each
  3 reference  — transplant the trained weights into the reference torch
                 Conformer (flax_to_ref.ast_state_dict) and run the
                 REFERENCE beam_decode (transformer.py:122-241) on the
                 same features, with and without LM fusion; WER
  4 report     — regenerate WER_PARITY.md (the AR section is added by
                 run_wer_parity.stage_report when ar_results.json exists)

Run from egs/synth:  python run_ar_parity.py [--stage N] [--end_stage M]
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from run_wer_parity import (DATA, DATA_YAML, LM_EXP, LM_YAML, S,
                            pieces_to_words, read_text, sh, wer)
import run_wer_parity

# variant-aware (CASSNAT_SYNTH_VARIANT=hard trains/decodes the *_hard
# twin — used both for AR parity and as the at_baseline ESA ranker)
AST_EXP = run_wer_parity.AST_EXP
AR_RESULTS = os.path.join(HERE, f"ar_results{S}.json")
AR_REF_RESULTS = os.path.join(HERE, f"ar_reference_results{S}.json")

BEAM = dict(beam_width=10, ctc_beam=15, ctc_weight=0.4, length_penalty=0.0)
LM_WEIGHT = 0.2


def stage_train():
    sh([sys.executable, "-m", "cassnat_asr_public_tpu.bin.train_asr",
        "--exp_dir", AST_EXP, "--train_config", f"{HERE}/conf/ast_train.yaml",
        "--data_config", DATA_YAML,
        "--optim_type", "noam", "--epochs", "40", "--task", "art"])


def _load_task(decode_overrides):
    from cassnat_asr_public_tpu.tasks import TASKS
    from cassnat_asr_public_tpu.utils.config import merge_configs
    cfg = merge_configs(None, f"{HERE}/conf/ast_train.yaml",
                        DATA_YAML)
    for p in ("train_paths", "dev_paths", "test_paths"):
        for d in getattr(cfg, p):
            for k in d:
                if k != "name":
                    d[k] = os.path.join(HERE, d[k])
    cfg.vocab_file = os.path.join(HERE, cfg.vocab_file)
    cfg.global_cmvn = os.path.join(HERE, cfg.global_cmvn)
    cfg.exp_dir = AST_EXP
    cfg.resume_model = os.path.join(AST_EXP, "best_model.ckpt")
    cfg.dropout = 0.0
    cfg.use_specaug = False
    cfg.test_batch_size = 8
    for k, v in decode_overrides.items():
        setattr(cfg, k, v)
    task = TASKS["art"]("test", cfg)
    task.load_lm_model(cfg)
    return task, cfg


DECODE_MODES = {
    "ast_greedy_ctc": dict(decode_type="ctc_only"),
    "ast_ar_beam": dict(decode_type="ctc_att", lm_weight=0.0, **BEAM),
    "ast_ar_beam_lm": dict(decode_type="ctc_att", lm_weight=LM_WEIGHT,
                           lm_config=LM_YAML,
                           rnnlm=os.path.join(LM_EXP, "best_model.ckpt"),
                           **BEAM),
    "ast_ctc_correct": dict(decode_type="ctc_correct", lm_weight=0.0,
                            beam_width=1),
    "ast_ctc_correct_beam": dict(decode_type="ctc_correct",
                                 lm_weight=LM_WEIGHT,
                                 lm_config=LM_YAML,
                                 rnnlm=os.path.join(LM_EXP,
                                                    "best_model.ckpt"),
                                 beam_width=10, length_penalty=0.0),
}


def stage_decode():
    refs = read_text(f"{DATA}/test/text")
    only = os.environ.get("CASSNAT_PARITY_MODES")
    only = set(only.split(",")) if only else None
    results = {}
    if os.path.exists(AR_RESULTS):
        with open(AR_RESULTS) as f:
            results = json.load(f)
    hyp_dir = run_wer_parity.HYP_DIR
    os.makedirs(hyp_dir, exist_ok=True)
    for mode, over in DECODE_MODES.items():
        if only and mode not in only:
            continue
        task, cfg = _load_task(over)
        t0 = time.time()
        hyps_raw, elapsed = task.decode(cfg)
        hyps = {u: pieces_to_words(p) for u, p in hyps_raw.items()}
        with open(f"{hyp_dir}/{mode}.json", "w") as f:
            json.dump({u: " ".join(w) for u, w in sorted(hyps.items())}, f,
                      indent=0)
        rep = wer(refs, hyps)
        rep["elapsed_s"] = round(time.time() - t0, 1)
        results[mode] = rep
        print(f"[{mode}] WER {rep['wer']:.2f}% "
              f"({rep['n_words']} words)", flush=True)
        del task
    with open(AR_RESULTS, "w") as f:
        json.dump(results, f, indent=1)


def stage_reference():
    from flax_to_ref import reference_ar_decode
    refs = read_text(f"{DATA}/test/text")
    out = {}
    if os.path.exists(AR_REF_RESULTS):
        with open(AR_REF_RESULTS) as f:
            out = json.load(f)
    only = os.environ.get("CASSNAT_PARITY_MODES")
    only = set(only.split(",")) if only else None
    for name, kw in (
            ("reference_ar_beam", dict(lm_weight=0.0, **BEAM)),
            ("reference_ar_beam_lm", dict(lm_weight=LM_WEIGHT, lm_exp=LM_EXP,
                                          **BEAM)),
            ("reference_ctc_correct", dict(decode_type="ctc_correct",
                                           lm_weight=0.0, beam_width=1)),
            ("reference_ctc_correct_beam",
             dict(decode_type="ctc_correct", lm_weight=LM_WEIGHT,
                  lm_exp=LM_EXP, beam_width=10, length_penalty=0.0))):
        if only and name not in only:
            continue
        hyps = reference_ar_decode(AST_EXP, DATA, HERE, **kw)
        rep = wer(refs, {u: pieces_to_words(p) for u, p in hyps.items()})
        out[name] = rep
        print(f"[{name}] WER {rep['wer']:.2f}%", flush=True)
    with open(AR_REF_RESULTS, "w") as f:
        json.dump(out, f, indent=1)


def stage_report():
    run_wer_parity.stage_report()


STAGES = [("train", stage_train), ("decode", stage_decode),
          ("reference", stage_reference), ("report", stage_report)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=1)
    p.add_argument("--end_stage", type=int, default=len(STAGES))
    args = p.parse_args()
    for i, (name, fn) in enumerate(STAGES, 1):
        if args.stage <= i <= args.end_stage:
            print(f"===== stage {i}: {name} =====", flush=True)
            fn()


if __name__ == "__main__":
    main()
