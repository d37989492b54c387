#!/usr/bin/env python3
"""ESA sampling-seed spread study (VERDICT r4 item 2a).

Question: the hard-variant full-50 small4-ranked ESA reads repo 0.97% vs
reference torch 0.85% (+0.12 abs, 4 extra substitutions on 3313 words).
The two decoders implement the SAME sampling rule (top-2 below-threshold
random pick, argmax row 0 kept — ops/ctc.py:ctc_sampled_align vs
reference src/models/cassnat.py:367-389) but draw from different RNG
streams, so per-seed WER wobble is expected. This harness decodes the
same weights + features under >=5 sampling seeds PER SIDE and reports
mean +/- spread, settling whether +0.12 is a real gap or seed noise.

  --side torch  reference torch decode, torch.manual_seed per seed (CPU)
  --side repo   repo nat_decode_jit, cfg.seed per seed (TPU)

Results accumulate in seed_spread{_hard}.json, resumable per (mode, seed).
Run from egs/synth with CASSNAT_SYNTH_VARIANT=hard (the variant whose
deltas are in question).
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

from run_wer_parity import (AST_EXP, DATA, EXP, RANK_LMS, S, lm_paths,
                            pieces_to_words, read_text, wer)

OUT = os.path.join(HERE, f"seed_spread{S}.json")


def _load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {}


def _put(key, rep):
    res = _load()
    res[key] = rep
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(f"[{key}] WER {rep['wer']:.3f}% (sub {rep['sub']} ins "
          f"{rep['ins']} del {rep['del']})", flush=True)


def torch_side(seeds):
    from flax_to_ref import reference_esa_decode
    refs = read_text(f"{DATA}/test/text")
    small4 = lm_paths("small4")[1]
    shape = {k: RANK_LMS["small4"][k]
             for k in ("N", "d_model", "d_ff", "n_head")}
    done = _load()
    for seed in seeds:
        key = f"torch_esa_small4_50_seed{seed}"
        if key in done:
            print(f"[{key}] cached, skipping", flush=True)
            continue
        t0 = time.time()
        hyps = reference_esa_decode(
            EXP, DATA, HERE, rank_model="lm", sample_num=50,
            lm_exp=small4, lm_shape=shape, torch_seed=seed)
        rep = wer(refs, {u: pieces_to_words(p) for u, p in hyps.items()})
        rep["elapsed_s"] = round(time.time() - t0, 1)
        _put(key, rep)


def repo_side(seeds, modes):
    from run_wer_parity import DECODE_MODES, _load_task
    refs = read_text(f"{DATA}/test/text")
    done = _load()
    for mode in modes:
        over0 = dict(DECODE_MODES[mode])
        if over0.get("rank_model") == "lm":
            lm_yaml, lm_exp = lm_paths(over0.pop("rank_lm", None))
            over0 = dict(over0, lm_config=lm_yaml,
                         rnnlm=os.path.join(lm_exp, "best_model.ckpt"))
        for seed in seeds:
            key = f"repo_{mode}_seed{seed}"
            if key in done:
                print(f"[{key}] cached, skipping", flush=True)
                continue
            task, cfg = _load_task(dict(over0, seed=seed))
            t0 = time.time()
            hyps_raw, _ = task.decode(cfg)
            hyps = {u: pieces_to_words(p) for u, p in hyps_raw.items()}
            rep = wer(refs, hyps)
            rep["elapsed_s"] = round(time.time() - t0, 1)
            _put(key, rep)
            del task


def summarize():
    import numpy as np
    res = _load()
    groups = {}
    for k, rep in res.items():
        base = k.rsplit("_seed", 1)[0]
        groups.setdefault(base, []).append(rep["wer"])
    print("\n== seed spread ==")
    for base, wers in sorted(groups.items()):
        a = np.asarray(sorted(wers))
        print(f"{base}: n={len(a)} mean={a.mean():.3f} sd={a.std():.3f} "
              f"min={a.min():.3f} max={a.max():.3f} wers={list(a.round(3))}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--side", choices=["torch", "repo", "summary"],
                   required=True)
    p.add_argument("--seeds", default="0,1,2,3,4")
    p.add_argument("--modes", default="esa_small4_50,esa_small4_topk8")
    a = p.parse_args()
    seeds = [int(s) for s in a.seeds.split(",") if s]
    if a.side == "torch":
        torch_side(seeds)
    elif a.side == "repo":
        repo_side(seeds, [m for m in a.modes.split(",") if m])
    summarize()


if __name__ == "__main__":
    main()
