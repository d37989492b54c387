#!/usr/bin/env python3
"""Corpus WER/CER scoring: the in-framework sclite replacement.

(reference: sclite scoring in egs/librispeech/run_art.sh:144)

Usage: python utils/score_wer.py --ref ref.txt --hyp hyp.txt [--cer]
Both files: "utt text..." lines.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cassnat_asr_public_tpu.utils.metrics import corpus_wer


def read_trans(path):
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if not parts:
                continue
            out[parts[0]] = parts[1].split() if len(parts) > 1 else []
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref", required=True)
    p.add_argument("--hyp", required=True)
    p.add_argument("--cer", action="store_true",
                   help="score characters instead of words")
    args = p.parse_args()
    refs_d = read_trans(args.ref)
    hyps_d = read_trans(args.hyp)
    refs, hyps = [], []
    missing = 0
    for utt, r in refs_d.items():
        h = hyps_d.get(utt)
        if h is None:
            missing += 1
            h = []
        if args.cer:
            r = list("".join(r))
            h = list("".join(h))
        refs.append(r)
        hyps.append(h)
    rep = corpus_wer(refs, hyps)
    unit = "CER" if args.cer else "WER"
    print(f"{unit} {rep['wer']:.2f}%  "
          f"[sub {rep['sub']} ins {rep['ins']} del {rep['del']} "
          f"/ {rep['n_words']} words, {rep['n_utts']} utts, "
          f"{missing} missing hyps]")


if __name__ == "__main__":
    main()
