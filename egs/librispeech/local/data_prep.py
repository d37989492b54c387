#!/usr/bin/env python3
"""LibriSpeech corpus split -> Kaldi-style data directory.

(reference: egs/librispeech/local/data_prep.sh — walks reader/chapter
subdirs, builds wav.scp/text/utt2spk/spk2utt/spk2gender with per-chapter
"speakers", and validates the result. That script requires the external
`flac` CLI and Kaldi's utils/; this port is self-contained: by default
wav.scp points straight at the .flac files, which the framework decodes
natively (native/flac_decoder.cpp). --pipe emits the reference's
"flac -c -d -s ... |" command form instead for drop-in compatibility with
externally prepared setups.)

Usage: python local/data_prep.py <LibriSpeech/part-dir> <dst-data-dir>
"""

import argparse
import os
import re
import sys


def read_speakers(spk_file):
    """SPEAKERS.TXT: ';'-prefixed comments, '|'-separated columns."""
    gender = {}
    with open(spk_file, encoding="utf-8", errors="replace") as f:
        for line in f:
            if line.startswith(";"):
                continue
            cols = [c.strip() for c in line.split("|")]
            if len(cols) >= 2 and cols[0].isdigit():
                gender[cols[0]] = cols[1].lower()
    return gender


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="corpus split dir, e.g. .../LibriSpeech/dev-clean")
    p.add_argument("dst", help="output data dir, e.g. data/dev_clean")
    p.add_argument("--pipe", action="store_true",
                   help="emit 'flac -c -d -s <f> |' wav.scp entries "
                        "(reference format) instead of direct .flac paths")
    args = p.parse_args()

    src = os.path.abspath(args.src)
    if not os.path.isdir(src):
        sys.exit(f"no such directory: {src}")
    spk_file = os.path.join(os.path.dirname(src), "SPEAKERS.TXT")
    gender = read_speakers(spk_file) if os.path.isfile(spk_file) else {}

    os.makedirs(args.dst, exist_ok=True)
    wav_scp, text, utt2spk, spk2gender = [], [], [], []

    readers = sorted(d for d in os.listdir(src)
                     if os.path.isdir(os.path.join(src, d)))
    for reader in readers:
        if not reader.isdigit():
            sys.exit(f"unexpected subdirectory name {reader}")
        rdir = os.path.join(src, reader)
        for chapter in sorted(d for d in os.listdir(rdir)
                              if os.path.isdir(os.path.join(rdir, d))):
            if not chapter.isdigit():
                sys.exit(f"unexpected chapter-subdirectory name {chapter}")
            cdir = os.path.join(rdir, chapter)
            trans = os.path.join(cdir, f"{reader}-{chapter}.trans.txt")
            if not os.path.isfile(trans):
                sys.exit(f"expected transcript {trans} to exist")
            utts_with_text = set()
            with open(trans, encoding="utf-8") as f:
                for line in f:
                    parts = line.strip().split(None, 1)
                    if not parts:
                        continue
                    utt = parts[0]
                    utts_with_text.add(utt)
                    text.append(f"{utt} {parts[1] if len(parts) > 1 else ''}")
                    utt2spk.append(f"{utt} {reader}-{chapter}")
            for fn in sorted(os.listdir(cdir)):
                if not fn.endswith(".flac"):
                    continue
                utt = fn[:-len(".flac")]
                if utt not in utts_with_text:
                    sys.exit(f"{cdir}/{fn} has no transcript in {trans}")
                fpath = os.path.join(cdir, fn)
                rvalue = (f"flac -c -d -s {fpath} |" if args.pipe else fpath)
                wav_scp.append(f"{utt} {rvalue}")
            g = gender.get(reader, "")
            if gender and g not in ("m", "f"):
                sys.exit(f"unexpected gender '{g}' for reader {reader}")
            spk2gender.append(f"{reader}-{chapter} {g or 'm'}")

    if len(text) != len(utt2spk) or len(wav_scp) != len(text):
        sys.exit(f"inconsistent counts: {len(wav_scp)} wavs, "
                 f"{len(text)} transcripts, {len(utt2spk)} utt2spk")

    def write_sorted(name, lines):
        with open(os.path.join(args.dst, name), "w", encoding="utf-8") as f:
            for line in sorted(lines):
                f.write(line + "\n")

    write_sorted("wav.scp", wav_scp)
    write_sorted("text", text)
    write_sorted("utt2spk", utt2spk)
    write_sorted("spk2gender", spk2gender)

    # spk2utt (reference: utils/utt2spk_to_spk2utt.pl)
    spk2utt = {}
    for line in sorted(utt2spk):
        utt, spk = line.split()
        spk2utt.setdefault(spk, []).append(utt)
    with open(os.path.join(args.dst, "spk2utt"), "w", encoding="utf-8") as f:
        for spk in sorted(spk2utt):
            f.write(f"{spk} {' '.join(spk2utt[spk])}\n")

    # validate_data_dir --no-feats equivalent: ids sorted+unique, parallel.
    ids = [l.split(None, 1)[0] for l in sorted(wav_scp)]
    tids = [l.split(None, 1)[0] for l in sorted(text)]
    assert ids == tids, "wav.scp / text utterance ids differ"
    assert len(set(ids)) == len(ids), "duplicate utterance ids"
    assert all(re.match(r"^[0-9]+-[0-9]+-[0-9]+$", u) for u in ids[:5])

    print(f"prepared {len(ids)} utterances in {args.dst}")


if __name__ == "__main__":
    main()
