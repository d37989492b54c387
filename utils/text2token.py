#!/usr/bin/env python3
"""Character-tokenize transcripts (Aishell-style char units).

(reference surface: utils/text2token.py)
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="-")
    p.add_argument("--output", default="-")
    p.add_argument("--space", default="", help="token to emit for spaces")
    args = p.parse_args()
    fin = sys.stdin if args.input == "-" else open(args.input)
    fout = sys.stdout if args.output == "-" else open(args.output, "w")
    for line in fin:
        parts = line.strip().split(None, 1)
        if not parts:
            continue
        utt = parts[0]
        text = parts[1] if len(parts) > 1 else ""
        toks = []
        for ch in text:
            if ch.isspace():
                if args.space:
                    toks.append(args.space)
                continue
            toks.append(ch)
        fout.write(f"{utt} {' '.join(toks)}\n")


if __name__ == "__main__":
    main()
