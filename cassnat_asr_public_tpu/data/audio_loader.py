"""Raw-waveform pipeline for HuBERT/wav2vec training.

(reference: src/data/audio_loader.py — SingleWavSet over `wav_s.scp` lines
"<utt> <path> <num_samples>" (sample counts appended by data_prep.py),
HubertDataset batching by label length or sample budget, per-utterance
LayerNorm normalization, padded 1-D collate.)

WAV reading uses the stdlib `wave` module for PCM16/PCM32 (soundfile isn't in
this image); .npy waveforms are also accepted for tests/synthetic data.
"""

import wave
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from cassnat_asr_public_tpu.data.datasets import round_up


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns (float32 waveform in [-1,1], sample_rate).

    Accepts: .wav (PCM16/32), .npy, .flac (native decoder — reference
    shells out to the `flac` CLI instead, data_prep.sh:58), and Kaldi-style
    pipe commands ("<cmd> |": the command's stdout is parsed as WAV or
    FLAC, matching Kaldi extended-filename wav.scp semantics).
    """
    if path.rstrip().endswith("|"):
        import subprocess
        out = subprocess.run(path.rstrip().rstrip("|"), shell=True,
                             check=True, stdout=subprocess.PIPE).stdout
        if out[:4] == b"fLaC":
            from cassnat_asr_public_tpu.data.flac import read_flac_bytes
            return read_flac_bytes(out)
        import io
        with wave.open(io.BytesIO(out), "rb") as w:
            return _parse_wave(w)
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32), 16000
    if path.endswith(".flac"):
        from cassnat_asr_public_tpu.data.flac import read_flac
        return read_flac(path)
    with wave.open(path, "rb") as w:
        return _parse_wave(w)


def _parse_wave(w) -> Tuple[np.ndarray, int]:
    sr = w.getframerate()
    n = w.getnframes()
    width = w.getsampwidth()
    nch = w.getnchannels()
    raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if nch > 1:
        data = data.reshape(-1, nch).mean(axis=1)
    return data, sr


class SingleWavSet:
    """Parse wav_s.scp (+ text) (reference: audio_loader.py:19-94)."""

    def __init__(self, vocab, data_path: dict, filter_max=float("inf"),
                 filter_min=0):
        self.vocab = vocab
        text = None
        if "text_label" in data_path:
            text = {}
            sos, eos = vocab.word2index["sos"], vocab.word2index["eos"]
            unk = vocab.word2index["unk"]
            with open(data_path["text_label"]) as f:
                for line in f:
                    parts = line.strip().split(None, 1)
                    if not parts:
                        continue
                    words = parts[1].split() if len(parts) > 1 else []
                    text[parts[0]] = [sos] + [
                        vocab.word2index.get(w, unk) for w in words] + [eos]
        self.items = []
        with open(data_path["scp_path"]) as f:
            for line in f:
                line = line.strip()
                if line.endswith("|"):  # Kaldi pipe command rvalue
                    parts = line.split(None, 1)
                    if len(parts) < 2:
                        continue
                    utt, path, n_samples = parts[0], parts[1], None
                else:
                    parts = line.split()
                    if len(parts) < 2:
                        continue
                    utt, path = parts[0], parts[1]
                    n_samples = int(parts[2]) if len(parts) > 2 else None
                if n_samples is not None and not (
                        filter_min <= n_samples <= filter_max):
                    continue
                toks = text.get(utt, [1]) if text is not None else [1]
                self.items.append((utt, path, toks, n_samples))


class HubertDataset:
    """Pre-batched raw-audio dataset (reference: audio_loader.py:97-239)."""

    def __init__(self, vocab, data_paths, args):
        self.vocab = vocab
        self.normalize = getattr(args, "normalize", True)
        filter_max = getattr(args, "filter_max", float("inf"))
        filter_min = getattr(args, "filter_min", 0)
        self.streams = [SingleWavSet(vocab, dp, filter_max, filter_min)
                        for dp in data_paths]
        self.items = [it for s in self.streams for it in s.items]
        self.batch_size = args.batch_size
        self.batch_type = getattr(args, "batch_type", "utterance")
        self.max_samplen = getattr(args, "max_samplen", 250000)
        data = sorted(self.items, key=lambda it: (it[3] or 0), reverse=True)
        self.batches = []
        start = 0
        while start < len(data):
            if self.batch_type == "frame":  # sample budget
                tot, bs = 0, 0
                while start + bs < len(data):
                    tot += data[start + bs][3] or 0
                    if tot > self.batch_size and bs > 0:
                        break
                    bs += 1
            else:
                n = data[start][3] or 0
                factor = n // self.max_samplen
                bs = max(1, self.batch_size // (1 + factor))
            end = min(len(data), start + max(bs, 1))
            self.batches.append(list(reversed(data[start:end])))
            start = end

    def __len__(self):
        return len(self.batches)

    def load_item(self, item):
        utt, path, toks, _ = item
        wav, _ = read_wav(path)
        if self.normalize:
            wav = (wav - wav.mean()) / np.maximum(wav.std(), 1e-5)
        return utt, wav.astype(np.float32), toks


class HubertLoader:
    """Padded collate over prebuilt batches with DP sharding.

    (reference: audio_loader.py:247-299)
    """

    def __init__(self, dataset: HubertDataset, padding_idx: int = 0,
                 shuffle: bool = False, shard=(0, 1), sample_bucket=16000,
                 label_bucket: int = 8, seed: int = 0):
        self.ds = dataset
        self.padding_idx = padding_idx
        self.shuffle = shuffle
        self.shard = shard
        self.sample_bucket = sample_bucket
        self.label_bucket = label_bucket
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        rank, world = self.shard
        return len(self.ds.batches[rank::world])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds.batches))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        rank, world = self.shard
        for bi in order[rank::world]:
            batch = [self.ds.load_item(it) for it in self.ds.batches[bi]]
            bs = len(batch)
            smax = round_up(max(w.shape[0] for _, w, _ in batch),
                            self.sample_bucket)
            lmax = round_up(max(len(t) for _, _, t in batch),
                            self.label_bucket)
            wavs = np.zeros((bs, smax), np.float32)
            labels = np.full((bs, lmax), self.padding_idx, np.int32)
            wav_lens = np.zeros((bs,), np.int32)
            lsizes = np.zeros((bs,), np.int32)
            utts = []
            for i, (utt, wav, toks) in enumerate(batch):
                wavs[i, :len(wav)] = wav
                labels[i, :len(toks)] = toks
                wav_lens[i] = len(wav)
                lsizes[i] = max(len(toks) - 2, 0)
                utts.append(utt)
            yield {"utts": utts, "wavs": wavs, "wav_lens": wav_lens,
                   "labels": labels, "label_sizes": lsizes}


class SSLCropLoader:
    """Crop-to-min-length random-crop collate for fbank SSL training.

    (reference: speech_loader.py:364-383 SSLLoader)
    """

    def __init__(self, dataset, batch_size: int, shuffle=True, shard=(0, 1),
                 seed: int = 0, frame_bucket: int = 64):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.shard = shard
        self.seed = seed
        self.frame_bucket = frame_bucket
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        rank, world = self.shard
        n = (len(self.ds.items) + self.batch_size - 1) // self.batch_size
        return len(range(rank, n, world))

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        order = np.arange(len(self.ds.items))
        if self.shuffle:
            rng.shuffle(order)
        rank, world = self.shard
        groups = [order[i:i + self.batch_size]
                  for i in range(0, len(order), self.batch_size)]
        for g in groups[rank::world]:
            loaded = [self.ds.load_item(self.ds.items[i], augment=False)
                      for i in g]
            tmin = min(f.shape[0] for _, f, _ in loaded)
            tmin = max(self.frame_bucket,
                       (tmin // self.frame_bucket) * self.frame_bucket)
            fdim = loaded[0][1].shape[1]
            feats = np.zeros((len(loaded), tmin, fdim), np.float32)
            utts = []
            for i, (utt, f, _) in enumerate(loaded):
                t = f.shape[0]
                if t > tmin:
                    s = int(rng.integers(0, t - tmin + 1))
                    feats[i] = f[s:s + tmin]
                else:
                    feats[i, :t] = f
                utts.append(utt)
            yield {"utts": utts, "feats": feats,
                   "src_mask": np.ones((len(loaded), tmin), bool)}
