#!/usr/bin/env python3
"""Filter/reduce a data dir by utterance list or frame-count bounds.

In-framework replacement for the reference's Kaldi-style helpers
(reference surface: utils/reduce_data_dir.sh, utils/remove_longshortdata.sh).
Keeps wav.scp/feats.scp/text/utt2num_frames consistent.

Usage:
  python utils/filter_data_dir.py --src data/train --dst data/train_10h \
      [--min_frames 10] [--max_frames 3000] [--utt_list keep.txt] [--head N]
"""

import argparse
import os

FILES = ["wav.scp", "feats.scp", "text", "utt2num_frames", "token_wp.scp",
         "token_char.scp", "wav_s.scp"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--min_frames", type=int, default=0)
    p.add_argument("--max_frames", type=int, default=1 << 60)
    p.add_argument("--utt_list", default=None)
    p.add_argument("--head", type=int, default=0,
                   help="keep only the first N utterances after filtering")
    args = p.parse_args()

    keep = None
    if args.utt_list:
        with open(args.utt_list) as f:
            keep = {line.split()[0] for line in f if line.strip()}

    nf_path = os.path.join(args.src, "utt2num_frames")
    frames = {}
    if os.path.exists(nf_path):
        with open(nf_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    frames[parts[0]] = int(parts[1])

    def ok(utt):
        if keep is not None and utt not in keep:
            return False
        if utt in frames and not (
                args.min_frames <= frames[utt] <= args.max_frames):
            return False
        return True

    # determine the final utt set from the first available index file
    selected = []
    for name in FILES:
        path = os.path.join(args.src, name)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                utt = line.split(None, 1)[0] if line.strip() else None
                if utt and ok(utt) and utt not in selected:
                    selected.append(utt)
        break
    if args.head:
        selected = selected[:args.head]
    sel = set(selected)

    os.makedirs(args.dst, exist_ok=True)
    for name in FILES:
        src = os.path.join(args.src, name)
        if not os.path.exists(src):
            continue
        with open(src) as fin, open(os.path.join(args.dst, name), "w") as out:
            for line in fin:
                if line.strip() and line.split(None, 1)[0] in sel:
                    out.write(line)
    print(f"Kept {len(sel)} utterances -> {args.dst}")


if __name__ == "__main__":
    main()
