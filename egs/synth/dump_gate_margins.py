#!/usr/bin/env python3
"""Gate-threshold analysis for the confidence-gated ESA escalation
(VERDICT r4 item 2c).

Decodes the (hard-variant) test set with the primary bench config
(esa_topk=8 + small-4L-LM rank) requesting `esa_margin` (top1-top2
rank-score gap over distinct candidate outputs, utils/decoding.py), then
cross-references the per-utterance margins with the committed hypothesis
files: the utterances where topk8 disagrees with the full-50 decode
(decode_hyps{_hard}/esa_small4_topk8.json vs esa_small4_50.json) are the
ones a good gate must escalate. Prints, per candidate threshold, the
escalation rate and how many disagreement utterances it captures.

Run from egs/synth on the TPU:
  CASSNAT_SYNTH_VARIANT=hard python dump_gate_margins.py
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from run_wer_parity import DECODE_MODES, HYP_DIR, S, _load_task, lm_paths

OUT = os.path.join(HERE, f"gate_margins{S}.json")


def main():
    over = dict(DECODE_MODES["esa_small4_topk8"])
    lm_yaml, lm_exp = lm_paths(over.pop("rank_lm"))
    over.update(lm_config=lm_yaml,
                rnnlm=os.path.join(lm_exp, "best_model.ckpt"),
                esa_gate_margin=1e-12)  # margins on, nothing escalates
    task, cfg = _load_task(over)
    import jax
    rng = jax.random.PRNGKey(getattr(cfg, "seed", 0))
    margins = {}
    for batch in task.test_loader:
        bd = task.shard_decode_batch(batch)
        out, rng = task.decode_batch(cfg, bd, rng)
        m = np.asarray(out["esa_margin"])
        for i, utt in enumerate(batch["utts"]):
            margins[utt] = float(m[i])
    with open(OUT, "w") as f:
        json.dump(margins, f, indent=0)
    print(f"wrote {OUT} ({len(margins)} utts)")

    with open(f"{HYP_DIR}/esa_small4_topk8.json") as f:
        h8 = json.load(f)
    with open(f"{HYP_DIR}/esa_small4_50.json") as f:
        h50 = json.load(f)
    diff = {u for u in h50 if h8.get(u) != h50[u]}
    vals = np.asarray(list(margins.values()))
    finite = vals[np.isfinite(vals)]
    print(f"utts={len(vals)} finite-margin={len(finite)} "
          f"median={np.median(finite):.4f} "
          f"p10={np.percentile(finite, 10):.4f} "
          f"topk8!=full50 on {len(diff)} utts")
    for thr in (0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.2, 0.5):
        esc = {u for u, m in margins.items() if m < thr}
        cap = len(diff & esc)
        print(f"thr={thr:<6} escalate {len(esc):4d}/{len(vals)} "
              f"({100 * len(esc) / len(vals):5.1f}%)  captures "
              f"{cap}/{len(diff)} disagreements")
    dm = sorted(margins.get(u, float('inf')) for u in diff)
    print("margins of the disagreement utts:",
          [round(x, 4) for x in dm[:20]])


if __name__ == "__main__":
    main()
