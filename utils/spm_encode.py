#!/usr/bin/env python3
"""Encode text to subword pieces (reference surface: utils/spm_encode).

Reads "utt text..." lines (or bare text with --no_utt), writes pieces.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cassnat_asr_public_tpu.data.tokenizer import SPModelTokenizer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--input", default="-")
    p.add_argument("--output", default="-")
    p.add_argument("--no_utt", action="store_true")
    args = p.parse_args()
    tok = SPModelTokenizer(args.model)
    fin = sys.stdin if args.input == "-" else open(args.input)
    fout = sys.stdout if args.output == "-" else open(args.output, "w")
    for line in fin:
        line = line.strip()
        if not line:
            continue
        if args.no_utt:
            utt, text = None, line
        else:
            parts = line.split(None, 1)
            utt, text = parts[0], parts[1] if len(parts) > 1 else ""
        pieces = " ".join(tok.encode_as_pieces(text))
        fout.write((f"{utt} {pieces}\n") if utt else pieces + "\n")


if __name__ == "__main__":
    main()
