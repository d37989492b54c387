#!/usr/bin/env python3
"""Append sample counts to wav.scp -> wav_s.scp for raw-audio training.

(reference: data_prep.py at the reference repo root — the HuBERT loaders
expect "<utt> <path> <num_samples>" lines.)

Usage: python data_prep.py --wav_scp data/train/wav.scp [--output ...]
"""

import argparse
import os
import sys

from cassnat_asr_public_tpu.data.audio_loader import read_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav_scp", required=True)
    p.add_argument("--output", default=None)
    args = p.parse_args()
    out_path = args.output or os.path.join(
        os.path.dirname(args.wav_scp), "wav_s.scp")
    n = 0
    with open(args.wav_scp) as fin, open(out_path, "w") as fout:
        for line in fin:
            parts = line.strip().split()
            if len(parts) < 2:
                continue
            utt, path = parts[0], parts[1]
            wav, _ = read_wav(path)
            fout.write(f"{utt} {path} {len(wav)}\n")
            n += 1
    print(f"Wrote {n} lines -> {out_path}")


if __name__ == "__main__":
    main()
