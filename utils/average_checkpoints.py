#!/usr/bin/env python3
"""Average the last K epoch checkpoints into averaged.ckpt.

(reference: utils/average_checkpoints.py:11-49 — the averaged model is the
standard eval artifact.)

Usage: python utils/average_checkpoints.py --exp_dir exp/ --num 12
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cassnat_asr_public_tpu.utils import checkpoint as ck


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--num", type=int, default=12)
    p.add_argument("--output", default=None)
    args = p.parse_args()
    paths = ck.find_epoch_checkpoints(args.exp_dir, last_n=args.num)
    if not paths:
        sys.exit("no model.N.ckpt files found")
    avg = ck.average_checkpoints(paths)
    out = args.output or os.path.join(args.exp_dir, "averaged.ckpt")
    ck.save_checkpoint(out, avg)
    print(f"Averaged {len(paths)} checkpoints -> {out}")


if __name__ == "__main__":
    main()
