"""Feature preparation: wav.scp -> fbank ark/scp + utt2num_frames + CMVN.

In-framework replacement for Kaldi's make_fbank + compute-cmvn-stats
(reference: egs/librispeech/run_prepare.sh + conf/fbank.conf). Uses the
fused JAX frontend (ops/frontend.py) batched on the accelerator; falls back
transparently to CPU execution.

Usage:
  python -m cassnat_asr_public_tpu.bin.prepare_features \
      --wav_scp data/train/wav.scp --out_dir data/fbank/train \
      [--num_bins 80] [--window hamming] [--cmvn]
"""

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav_scp", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--name", default="feats")
    p.add_argument("--num_bins", type=int, default=80)
    p.add_argument("--window", default="hamming")  # fbank.conf: hamming
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--cmvn", action="store_true")
    p.add_argument("--batch_seconds", type=float, default=120.0)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from cassnat_asr_public_tpu.data.audio_loader import read_wav
    from cassnat_asr_public_tpu.data.kaldi_io import (
        compute_cmvn_stats,
        write_ark_scp,
    )
    from cassnat_asr_public_tpu.ops.frontend import log_mel_fbank, num_frames

    os.makedirs(args.out_dir, exist_ok=True)
    entries = []
    with open(args.wav_scp) as f:
        for line in f:
            # Kaldi extended filenames: the rvalue is everything after the
            # utt id (may be a multi-token "<cmd> |" pipe).
            parts = line.strip().split(None, 1)
            if len(parts) >= 2:
                rvalue = parts[1]
                if not rvalue.endswith("|"):
                    rvalue = rvalue.split()[0]
                entries.append((parts[0], rvalue))

    ark_path = os.path.join(args.out_dir, args.name + ".ark")
    scp_path = os.path.join(args.out_dir, args.name + ".scp")
    nframes_path = os.path.join(args.out_dir, "utt2num_frames")

    feats_for_cmvn = []

    def gen():
        with open(nframes_path, "w") as nf:
            for utt, path in entries:
                wav, sr = read_wav(path)
                # pad to a 0.5 s sample bucket so XLA compiles one fbank
                # graph per bucket, not per unique wav length; snip_edges
                # framing is local, so frames < num_frames(true length)
                # are bit-identical and the pad frames are sliced off
                true_nf = int(num_frames(len(wav)))
                bucket = 8000
                pad = (-len(wav)) % bucket
                if pad:
                    wav = np.concatenate([wav, np.zeros(pad, wav.dtype)])
                feats = np.asarray(log_mel_fbank(
                    jnp.asarray(wav[None]), num_bins=args.num_bins,
                    window_type=args.window,
                    sample_rate=args.sample_rate)[0])[:true_nf]
                nf.write(f"{utt} {feats.shape[0]}\n")
                if args.cmvn:
                    feats_for_cmvn.append(feats)
                yield utt, feats

    write_ark_scp(gen(), ark_path, scp_path)
    if args.cmvn:
        stats = compute_cmvn_stats(iter(feats_for_cmvn))
        write_ark_scp(iter([("global", stats)]),
                      os.path.join(args.out_dir, "cmvn.ark"))
    print(f"Wrote {len(entries)} utterances -> {scp_path}")


if __name__ == "__main__":
    main()
