#!/usr/bin/env python3
"""Generate a tiny synthetic data directory for recipe smoke tests.

(reference: egs/librispeech/local/prepare_example_data.sh — the closest thing
the reference has to a fixture.) Creates wav.scp/text for train/dev/test
splits with short synthetic tone+noise wavs, runnable end-to-end through
run_prepare.sh and the training CLIs.

Usage: python local/prepare_example_data.py --out data_example [--n 20]
"""

import argparse
import os
import wave

import numpy as np

WORDS = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "to", "log"]


def write_wav(path, samples, sr=16000):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2")
                      .tobytes())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data_example")
    p.add_argument("--n", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    rng = np.random.default_rng(args.seed)
    sr = 16000
    for split, n in [("train", args.n), ("dev", max(args.n // 4, 2)),
                     ("test_clean", max(args.n // 4, 2))]:
        d = os.path.join(args.out, split)
        wav_dir = os.path.join(d, "wav")
        os.makedirs(wav_dir, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as scp, \
                open(os.path.join(d, "text"), "w") as txt:
            for i in range(n):
                utt = f"{split}_{i:03d}"
                dur = float(rng.uniform(1.0, 3.0))
                t = np.arange(int(dur * sr)) / sr
                freq = float(rng.uniform(100, 1000))
                sig = 0.3 * np.sin(2 * np.pi * freq * t) \
                    + 0.05 * rng.normal(size=t.shape)
                path = os.path.abspath(os.path.join(wav_dir, utt + ".wav"))
                write_wav(path, sig, sr)
                n_words = int(rng.integers(2, 7))
                words = " ".join(rng.choice(WORDS) for _ in range(n_words))
                scp.write(f"{utt} {path}\n")
                txt.write(f"{utt} {words}\n")
    print(f"Example data written to {args.out}")


if __name__ == "__main__":
    main()
