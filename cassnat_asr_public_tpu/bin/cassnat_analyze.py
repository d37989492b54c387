"""Analysis tool: dump CASS-NAT token-level embeddings + alignment stats.

(reference: src/bin/cassnat_analyze.py — decodes with --save_embedding and
dumps token-level acoustic / mapped embeddings for visualization; plus the
hitrate and utt2diff diagnostics scattered through cassnat_task decode.)

Usage:
  python -m cassnat_asr_public_tpu.bin.cassnat_analyze \
      --test_config conf/cassnat_decode.yaml --data_config conf/data.yaml \
      --resume_model exp/cassnat/averaged.ckpt --out_dir analysis/
"""

import argparse
import os
from collections import Counter

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--test_config", required=True)
    p.add_argument("--data_config", required=True)
    p.add_argument("--resume_model", required=True)
    p.add_argument("--out_dir", default="analysis")
    p.add_argument("--max_batches", type=int, default=10)
    p.add_argument("--save_embedding", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cassnat_asr_public_tpu.ops.ctc import (
        ctc_best_path_align,
        ctc_viterbi_align,
    )
    from cassnat_asr_public_tpu.tasks import CassNATTask
    from cassnat_asr_public_tpu.utils.config import merge_configs
    from cassnat_asr_public_tpu.utils.diagnostics import (
        alignment_hitrate,
        format_hitrate,
        utt2diff,
    )

    cfg = merge_configs(args, args.test_config, args.data_config)
    cfg.test_batch_size = 8
    task = CassNATTask("test", cfg)
    os.makedirs(args.out_dir, exist_ok=True)

    stats = None
    hist = Counter()
    dumps = []
    for bi, batch in enumerate(task.test_loader):
        if bi >= args.max_batches:
            break
        feats = jnp.asarray(batch["feats"])
        mask = jnp.asarray(batch["src_mask"])
        tgt_label = jnp.asarray(batch["labels"][:, 1:])
        label_sizes = jnp.asarray(batch["label_sizes"])
        enc_h, enc_mask, ctc_out = task.model.apply(
            task.state.params, feats, mask, method="encode_ctc")
        feat_sizes = enc_mask.sum(-1)
        # oracle (viterbi vs labels) and predicted (best-path) alignments
        oracle_shift, _ = ctc_viterbi_align(
            ctc_out, tgt_label[:, :-1], feat_sizes, label_sizes)
        pred_shift, pred_len = ctc_best_path_align(ctc_out, enc_mask)
        stats = alignment_hitrate(pred_shift, oracle_shift, stats)
        hist = utt2diff(np.asarray(pred_len), np.asarray(label_sizes), hist)

        if args.save_embedding:
            out = task.model.apply(task.state.params, feats, mask, tgt_label,
                                   label_sizes)
            dumps.append({"utts": batch["utts"],
                          "ac_embed": np.asarray(out["ac_embed"]),
                          "pred_embed": np.asarray(out["pred_embed"])})

    print(format_hitrate(stats))
    with open(os.path.join(args.out_dir, "utt2diff.txt"), "w") as f:
        for diff in sorted(hist):
            f.write(f"{diff} {hist[diff]}\n")
    if args.save_embedding:
        np.savez(os.path.join(args.out_dir, "embeddings.npz"),
                 **{f"batch{i}_{k}": v for i, d in enumerate(dumps)
                    for k, v in d.items() if k != "utts"})
    print(f"Analysis written to {args.out_dir}")


if __name__ == "__main__":
    main()
