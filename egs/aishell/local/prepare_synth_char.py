#!/usr/bin/env python3
"""Synthetic char-unit corpus for the Aishell recipe (data-free e2e).

The image has no Mandarin speech (zero egress), so the Aishell recipe's
alternate path — `text2token.py` char units with NO space token, char
vocab from train transcripts, CER scoring — is exercised end-to-end on
the same learnable synthetic speech the librispeech-style synth recipe
uses (egs/synth/local/prepare_synth_speech.py). Word boundaries are
dropped by the char tokenizer exactly as for Mandarin, so the model must
learn boundary-free character sequences (reference surface:
egs/librispeech/local/prepare_dict_char.py + utils/text2token).

Usage: python local/prepare_synth_char.py [--out data] [--n_train 600]
"""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SYNTH = os.path.abspath(os.path.join(HERE, "..", "..", "synth", "local",
                                     "prepare_synth_speech.py"))
if not os.path.exists(SYNTH) and os.environ.get("E2EASR"):
    # recipe copied out of the repo tree (e.g. the pytest smoke): resolve
    # the shared generator through the framework root set by path.sh
    SYNTH = os.path.join(os.environ["E2EASR"], "egs", "synth", "local",
                         "prepare_synth_speech.py")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data")
    p.add_argument("--n_train", type=int, default=600)
    p.add_argument("--n_eval", type=int, default=100)
    p.add_argument("--seed", type=int, default=17)
    args = p.parse_args()
    subprocess.run([sys.executable, SYNTH, "--out", args.out,
                    "--n_train", str(args.n_train),
                    "--n_eval", str(args.n_eval),
                    "--seed", str(args.seed)], check=True)
    print(f"synthetic char corpus -> {args.out}")


if __name__ == "__main__":
    main()
