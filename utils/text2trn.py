#!/usr/bin/env python3
"""Convert "utt text" transcripts to sclite .trn format: "text (utt)".

(reference surface: utils/text2trn.py)
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="-")
    p.add_argument("--output", default="-")
    args = p.parse_args()
    fin = sys.stdin if args.input == "-" else open(args.input)
    fout = sys.stdout if args.output == "-" else open(args.output, "w")
    for line in fin:
        parts = line.strip().split(None, 1)
        if not parts:
            continue
        utt = parts[0]
        text = parts[1] if len(parts) > 1 else ""
        fout.write(f"{text} ({utt})\n")


if __name__ == "__main__":
    main()
