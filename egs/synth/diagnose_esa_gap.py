#!/usr/bin/env python3
"""Root-cause the systematic repo-vs-torch full-50 ESA gap (VERDICT r4
item 2b).

run_seed_spread.py settled that BOTH decoders are sampling-seed-invariant
on the hard variant (torch 0.845% x5, repo 0.966% x5) — the +0.12 abs
(4 substitutions / 3313 words) is systematic, not RNG noise. The two
code paths implement the same sampling/ranking semantics (ops/ctc.py vs
reference cassnat.py:367-389, 499-573), so the remaining suspect is
numerics: the repo runs encoder/NAT/rank-LM matmuls in bfloat16
(f32 statistics), the transplanted torch reference in full f32.

Steps (each resumable, results in esa_gap_diag.json):
  --step torch   reference esa_small4_50 decode, SAVING per-utt hyps
                 (CPU, ~10-16 min)
  --step f32     repo esa_small4_50 decode with compute_dtype=float32
                 (TPU), saving hyps
  --step diff    utterance-level 3-way diff: repo-bf16 (committed hyps)
                 vs repo-f32 vs torch; prints the disagreeing utterances
Run from egs/synth with CASSNAT_SYNTH_VARIANT=hard.
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

from run_wer_parity import (DATA, DECODE_MODES, EXP, HYP_DIR, RANK_LMS, S,
                            _load_task, lm_paths, pieces_to_words,
                            read_text, wer)

OUT = os.path.join(HERE, f"esa_gap_diag{S}.json")
TORCH_HYPS = os.path.join(HYP_DIR, "reference_esa_small4_50.json")
F32_HYPS = os.path.join(HYP_DIR, "esa_small4_50_f32.json")


def _merge(key, rep):
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)
    res[key] = rep
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(f"[{key}] {rep}", flush=True)


def _save_hyps(path, hyps_words):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({u: " ".join(w) for u, w in sorted(hyps_words.items())},
                  f, indent=0)


def step_torch():
    from flax_to_ref import reference_esa_decode
    refs = read_text(f"{DATA}/test/text")
    small4 = lm_paths("small4")[1]
    shape = {k: RANK_LMS["small4"][k]
             for k in ("N", "d_model", "d_ff", "n_head")}
    t0 = time.time()
    hyps = reference_esa_decode(EXP, DATA, HERE, rank_model="lm",
                                sample_num=50, lm_exp=small4,
                                lm_shape=shape, torch_seed=0)
    words = {u: pieces_to_words(p) for u, p in hyps.items()}
    _save_hyps(TORCH_HYPS, words)
    rep = wer(refs, words)
    rep["elapsed_s"] = round(time.time() - t0, 1)
    _merge("torch_small4_50", rep)


def step_f32():
    import jax.numpy as jnp
    refs = read_text(f"{DATA}/test/text")
    over = dict(DECODE_MODES["esa_small4_50"])
    lm_yaml, lm_exp = lm_paths(over.pop("rank_lm"))
    over.update(lm_config=lm_yaml,
                rnnlm=os.path.join(lm_exp, "best_model.ckpt"),
                compute_dtype=jnp.float32)
    task, cfg = _load_task(over)
    t0 = time.time()
    hyps_raw, _ = task.decode(cfg)
    words = {u: pieces_to_words(p) for u, p in hyps_raw.items()}
    _save_hyps(F32_HYPS, words)
    rep = wer(refs, words)
    rep["elapsed_s"] = round(time.time() - t0, 1)
    _merge("repo_small4_50_f32", rep)


def step_diff():
    refs = read_text(f"{DATA}/test/text")
    sides = {}
    for name, path in (("bf16", f"{HYP_DIR}/esa_small4_50.json"),
                       ("f32", F32_HYPS), ("torch", TORCH_HYPS)):
        if os.path.exists(path):
            with open(path) as f:
                sides[name] = json.load(f)
    if len(sides) < 2:
        print("need at least two hyp files; run the other steps first")
        return
    utts = sorted(set().union(*[set(h) for h in sides.values()]))
    diff_counts = {}
    for a in sides:
        for b in sides:
            if a < b:
                n = sum(1 for u in utts
                        if sides[a].get(u) != sides[b].get(u))
                diff_counts[f"{a}_vs_{b}"] = n
    print("pairwise disagreeing utterances:", diff_counts)
    for u in utts:
        vals = {n: h.get(u) for n, h in sides.items()}
        if len(set(vals.values())) > 1:
            print(f"--- {u} (ref: {' '.join(refs[u])})")
            for n, v in vals.items():
                print(f"    {n:6s}: {v}")
    _merge("diff_counts", diff_counts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--step", choices=["torch", "f32", "diff"],
                   required=True)
    a = p.parse_args()
    {"torch": step_torch, "f32": step_f32, "diff": step_diff}[a.step]()


if __name__ == "__main__":
    main()
