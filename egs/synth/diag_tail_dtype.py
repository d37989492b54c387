#!/usr/bin/env python3
"""CPU dtype probe for the 5 repo-vs-torch ESA disagreement utterances.

All 5 hard-variant disagreements (esa_gap_diag_hard.json) lose the
utterance-FINAL token in the repo bf16 decode. Hypothesis: bf16 encoder
numerics flip the CTC posterior at tail frames (argmax blank vs token, or
exp(max) across the 0.9 sampling threshold), so the final token never
appears in any sampled alignment. This probe runs ONLY the encoder+CTC
head (encode_ctc) on those utterances in bf16 and f32 and diffs the
per-frame argmax / top2 / confidence — no NAT decode, so it is CPU-cheap.

Run: cd egs/synth && CASSNAT_SYNTH_VARIANT=hard PYTHONPATH= \
     JAX_PLATFORMS=cpu python diag_tail_dtype.py
"""
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp
import numpy as np

from run_wer_parity import DECODE_MODES, _load_task, lm_paths

UTTS = ["test_0148", "test_0322", "test_0367", "test_0549", "test_0579"]


def encode_argmax(task, feats, mask):
    enc_h, enc_mask, ctc_out = task.model.apply(
        task.state.params, feats, mask, method="encode_ctc")
    lp = np.asarray(ctc_out, dtype=np.float64)  # (B, T', V) log-probs
    fm = np.asarray(enc_mask[:, 0, :] if enc_mask.ndim == 3 else enc_mask)
    return lp, fm


def main():
    over = dict(DECODE_MODES["esa_small4_50"])
    lm_yaml, lm_exp = lm_paths(over.pop("rank_lm"))
    over.update(lm_config=lm_yaml,
                rnnlm=os.path.join(lm_exp, "best_model.ckpt"))
    task_bf, cfg = _load_task(dict(over))
    over_f32 = dict(over, compute_dtype=jnp.float32)
    task_f32, _ = _load_task(over_f32)

    for batch in task_bf.test_loader:
        bd = task_bf.shard_decode_batch(batch)
        bd["utt_ids"] = batch["utts"]
        utts = [u for u in bd["utt_ids"] if u in UTTS]
        if not utts:
            continue
        lp_bf, fm = encode_argmax(task_bf, bd["feats"], bd["src_mask"])
        lp_f32, _ = encode_argmax(task_f32, bd["feats"], bd["src_mask"])
        for i, u in enumerate(bd["utt_ids"]):
            if u not in UTTS:
                continue
            n = int(fm[i].sum())
            a_bf = lp_bf[i, :n].argmax(-1)
            a_f32 = lp_f32[i, :n].argmax(-1)
            diff = np.nonzero(a_bf != a_f32)[0]
            print(f"== {u}  T'={n}  argmax diffs at frames {diff.tolist()}")
            # tail + any differing frames: show top2 and confidence
            show = sorted(set(range(max(0, n - 4), n)) | set(diff.tolist()))
            for t in show:
                for name, lp in (("bf16", lp_bf), ("f32 ", lp_f32)):
                    row = lp[i, t]
                    top2 = np.argsort(row)[::-1][:3]
                    p = np.exp(row[top2])
                    print(f"   t={t:3d} {name} top={top2.tolist()} "
                          f"p={np.round(p, 4).tolist()} "
                          f"lowconf={p[0] < 0.9}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
