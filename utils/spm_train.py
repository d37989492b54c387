#!/usr/bin/env python3
"""SentencePiece-compatible subword training CLI.

(reference surface: utils/spm_train)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cassnat_asr_public_tpu.data.spm_train import spm_train


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--model_prefix", required=True)
    p.add_argument("--vocab_size", type=int, default=1024)
    p.add_argument("--model_type", default="unigram",
                   choices=["unigram", "bpe"])
    p.add_argument("--character_coverage", type=float, default=1.0)
    args = p.parse_args()
    spm_train(args.input, args.model_prefix, args.vocab_size,
              args.model_type, args.character_coverage)
    print(f"Wrote {args.model_prefix}.model / .vocab")


if __name__ == "__main__":
    main()
