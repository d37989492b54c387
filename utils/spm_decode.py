#!/usr/bin/env python3
"""Decode subword pieces back to text (reference surface: utils/spm_decode)."""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="-")
    p.add_argument("--output", default="-")
    p.add_argument("--no_utt", action="store_true")
    args = p.parse_args()
    fin = sys.stdin if args.input == "-" else open(args.input)
    fout = sys.stdout if args.output == "-" else open(args.output, "w")
    for line in fin:
        line = line.strip()
        if not line:
            continue
        if args.no_utt:
            utt, pieces = None, line
        else:
            parts = line.split(None, 1)
            utt, pieces = parts[0], parts[1] if len(parts) > 1 else ""
        text = pieces.replace(" ", "").replace("▁", " ").strip()
        fout.write((f"{utt} {text}\n") if utt else text + "\n")


if __name__ == "__main__":
    main()
