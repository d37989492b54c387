"""Datasets + dynamic batching with XLA-friendly static shapes.

Re-designs the reference data pipeline (reference: src/data/speech_loader.py)
for TPU: the DynamicDataset packing rules are preserved (sort by length desc,
batch size scaled down for long utterances / long labels, or a total-frame
budget; speech_loader.py:221-293), but every emitted batch is padded to
*bucketed* shapes (frame and label lengths rounded up to fixed multiples) so
the number of distinct compiled shapes stays small.

Returned batches are plain numpy dicts:
  utts        list[str]
  feats       (B, T, F) float32, zero-padded
  src_mask    (B, T) bool
  labels      (B, L) int32 — sos + tokens + eos + pad
  label_sizes (B,) int32 — token count excl sos/eos
  feat_frames (B,) int32 — true frame count

Sharding: `shard=(rank, world)` keeps every world-th batch, the per-process
data-parallel split (replaces DistributedSampler; reference:
speech_loader.py:385-405 + SURVEY.md §2.7).
"""

import math
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from cassnat_asr_public_tpu.data.feat_op import context_feat, skip_feat
from cassnat_asr_public_tpu.data.kaldi_io import (
    load_cmvn_stats,
    read_matrix,
    read_scp,
)
from cassnat_asr_public_tpu.data.spec_augment import spec_aug


def round_up(x: int, mult: int) -> int:
    return int(math.ceil(max(x, 1) / mult) * mult)


class SingleSet:
    """One scp+text+utt2num_frames stream with length filtering.

    (reference: speech_loader.py:13-86)
    """

    def __init__(self, vocab, data_path: dict, filter_max=float("inf"),
                 filter_min=0):
        self.name = data_path.get("name", "data")
        self.vocab = vocab
        ark = read_scp(data_path["scp_path"])
        text = self._load_text(data_path["text_label"]) \
            if "text_label" in data_path else None
        nframes = self._load_frames(data_path["utt2num_frames"]) \
            if "utt2num_frames" in data_path else None

        self.items: List[Tuple[str, Tuple[str, Optional[int]], List[int],
                               Optional[int]]] = []
        for utt, loc in ark.items():
            toks = text.get(utt) if text is not None else [1]
            if text is not None and toks is None:
                continue
            nf = nframes.get(utt) if nframes is not None else None
            if nf is not None and not (filter_min <= nf <= filter_max):
                continue
            self.items.append((utt, loc, toks, nf))

    def _load_text(self, path):
        out = {}
        unk = self.vocab.word2index["unk"]
        sos = self.vocab.word2index["sos"]
        eos = self.vocab.word2index["eos"]
        with open(path) as f:
            for line in f:
                parts = line.strip().split(None, 1)
                if not parts:
                    continue
                utt = parts[0]
                words = parts[1].split() if len(parts) > 1 else []
                ids = [self.vocab.word2index.get(w, unk) for w in words]
                out[utt] = [sos] + ids + [eos]
        return out

    def _load_frames(self, path):
        out = {}
        with open(path) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) >= 2:
                    out[parts[0]] = int(parts[1])
        return out


class SpeechDataset:
    """Per-utterance dataset: ark read -> CMVN -> SpecAug -> splice/skip.

    (reference: speech_loader.py:88-163)
    """

    def __init__(self, vocab, data_paths: Sequence[dict], args):
        self.vocab = vocab
        self.left_ctx = getattr(args, "left_ctx", 0)
        self.right_ctx = getattr(args, "right_ctx", 0)
        self.skip_frame = getattr(args, "skip_frame", 1)
        self.use_specaug = getattr(args, "use_specaug", False)
        self.specaug_conf = getattr(args, "specaug_conf", None)
        self.mean = self.std = None
        filter_max = getattr(args, "filter_max", float("inf"))
        filter_min = getattr(args, "filter_min", 0)
        self.streams = [SingleSet(vocab, dp, filter_max, filter_min)
                        for dp in data_paths]
        self.items = [it for s in self.streams for it in s.items]
        self.rng = np.random.default_rng(getattr(args, "seed", 0))

    def load_cmvn(self, cmvn_path: str):
        self.mean, self.std = load_cmvn_stats(cmvn_path)

    def __len__(self):
        return len(self.items)

    def load_item(self, item, augment=True):
        utt, (path, off), toks, _ = item
        feat = read_matrix(path, off)
        if self.mean is not None:
            feat = (feat - self.mean) / self.std
        if self.use_specaug and augment:
            feat = spec_aug(feat, self.specaug_conf, self.rng)
        if feat.shape[0] % self.skip_frame != 0:
            pad = self.skip_frame - feat.shape[0] % self.skip_frame
            feat = np.vstack([feat, np.zeros((pad, feat.shape[1]), np.float32)])
        feat = skip_feat(context_feat(feat, self.left_ctx, self.right_ctx),
                         self.skip_frame)
        return utt, feat.astype(np.float32), toks


class DynamicDataset(SpeechDataset):
    """Length-sorted pre-batched dataset (reference: speech_loader.py:165-293).

    batch_type='utterance': bs = batch_size / (1 + max(frm/max_frmlen,
    lab/max_lablen)); batch_type='frame': total-frame budget.
    """

    def __init__(self, vocab, data_paths, args):
        super().__init__(vocab, data_paths, args)
        self.batch_size = args.batch_size
        self.batch_type = getattr(args, "batch_type", "utterance")
        self.max_frmlen = getattr(args, "max_frmlen", 800)
        self.max_lablen = getattr(args, "max_lablen", 150)
        self.filter_max = getattr(args, "filter_max", float("inf"))
        self.filter_min = getattr(args, "filter_min", 0)
        if self.batch_type == "utterance":
            self.batches = self._batch_by_utt()
        elif self.batch_type == "frame":
            self.batches = self._batch_by_frame()
        else:
            raise NotImplementedError(self.batch_type)

    def _sorted_items(self):
        return sorted(self.items, key=lambda it: (it[3] or 0), reverse=True)

    def _batch_by_utt(self):
        data = self._sorted_items()
        batches, start = [], 0
        n = len(data)
        while start < n:
            frmlen = data[start][3] or 0
            if not (self.filter_min <= frmlen <= self.filter_max):
                start += 1
                continue
            lablen = len(data[start][2])
            factor = max(frmlen // self.max_frmlen, lablen // self.max_lablen)
            bs = max(1, int(self.batch_size / (1 + factor)))
            end = min(n, start + bs)
            batches.append(list(reversed(data[start:end])))
            start = end
        return batches

    def _batch_by_frame(self):
        data = self._sorted_items()
        batches, start = [], 0
        n = len(data)
        while start < n:
            bs, tot = 0, 0
            while start + bs < n:
                frm = data[start + bs][3] or 0
                if frm > self.batch_size:
                    bs = 1
                    break
                tot += frm
                if tot <= self.batch_size:
                    bs += 1
                else:
                    break
            end = min(n, start + max(bs, 1))
            batches.append(list(reversed(data[start:end])))
            start = end
        return batches

    def __len__(self):
        return len(self.batches)


class SpeechDataLoader:
    """Batching + padding to bucketed static shapes + optional DP sharding.

    For `DynamicDataset` the prebuilt batches are shuffled per epoch;
    for `SpeechDataset` indices are shuffled and grouped in loader-side
    fixed-size batches (reference SpeechDataLoader semantics,
    speech_loader.py:385-405).
    """

    def __init__(self, dataset, batch_size: int = 1, padding_idx: int = 0,
                 shuffle: bool = False, shard: Tuple[int, int] = (0, 1),
                 frame_bucket: int = 64, label_bucket: int = 8,
                 augment: bool = True, seed: int = 0,
                 pad_to_batch: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.padding_idx = padding_idx
        self.shuffle = shuffle
        self.shard = shard
        self.frame_bucket = frame_bucket
        self.label_bucket = label_bucket
        self.augment = augment
        self.seed = seed
        self.epoch = 0
        self.pad_to_batch = pad_to_batch
        self.prefetch = prefetch

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _batch_indices(self):
        if isinstance(self.dataset, DynamicDataset):
            order = np.arange(len(self.dataset.batches))
        else:
            order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        if isinstance(self.dataset, DynamicDataset):
            batches = [self.dataset.batches[i] for i in order]
        else:
            batches = [
                [self.dataset.items[j]
                 for j in order[i:i + self.batch_size]]
                for i in range(0, len(order), self.batch_size)]
        rank, world = self.shard
        shard = batches[rank::world]
        if world > 1:
            # Every process must see the SAME number of batches or lockstep
            # jitted steps hang at epoch end: truncate to the common minimum
            # across ranks (= floor division of the global count).
            shard = shard[:len(batches) // world]
        return shard

    def __len__(self):
        return len(self._batch_indices())

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate collated batches, loading/augmenting in a background
        thread so input prep overlaps the device step.

        The reference overlaps via multi-worker torch DataLoaders
        (reference: src/tasks/base_task.py:104 num_workers); here a single
        daemon thread with a bounded queue suffices — collate is
        numpy-bound and releases the GIL in BLAS/IO, and the device step
        dominates the step time.
        """
        batches = self._batch_indices()
        if self.prefetch <= 0 or len(batches) <= 1:
            for batch in batches:
                yield self.collate(batch)
            return
        import queue
        import threading
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        SENTINEL = object()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(self.collate(b))
                q.put(SENTINEL)
            except BaseException as e:  # surface loader errors to consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so a blocked put() can observe stop and exit
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    def collate(self, batch) -> Dict[str, np.ndarray]:
        loaded = [self.dataset.load_item(it, augment=self.augment)
                  for it in batch]
        bs = len(loaded)
        if not self.pad_to_batch:
            bs_pad = bs
        elif isinstance(self.dataset, DynamicDataset):
            # dynamic utterance batches never exceed the nominal batch_size;
            # pad the batch dim to it so XLA sees one batch shape.
            nominal = self.dataset.batch_size \
                if self.dataset.batch_type == "utterance" else None
            bs_pad = nominal if (nominal and bs <= nominal) else bs
        else:
            bs_pad = self.batch_size
        fmax = round_up(max(f.shape[0] for _, f, _ in loaded),
                        self.frame_bucket)
        lmax = round_up(max(len(t) for _, _, t in loaded), self.label_bucket)
        fdim = loaded[0][1].shape[1]
        feats = np.zeros((bs_pad, fmax, fdim), np.float32)
        labels = np.full((bs_pad, lmax), self.padding_idx, np.int32)
        frames = np.zeros((bs_pad,), np.int32)
        lsizes = np.zeros((bs_pad,), np.int32)
        utts = []
        for i, (utt, feat, toks) in enumerate(loaded):
            feats[i, :feat.shape[0]] = feat
            labels[i, :len(toks)] = toks
            frames[i] = feat.shape[0]
            lsizes[i] = max(len(toks) - 2, 0)  # excl sos/eos
            utts.append(utt)
        src_mask = np.arange(fmax)[None, :] < frames[:, None]
        return {"utts": utts, "feats": feats, "labels": labels,
                "src_mask": src_mask, "feat_frames": frames,
                "label_sizes": lsizes}
