"""LM text corpus loading: uniLM (causal) and MLM (BERT-style) targets.

(reference: src/data/text_loader.py — sos/eos wrap for uniLM; 80/10/10
random masking for MLM; padded collate.)
"""

from typing import Dict, Iterator, List, Tuple

import numpy as np

from cassnat_asr_public_tpu.data.datasets import round_up


class TextDataset:
    def __init__(self, vocab, text_path: str, lm_type: str = "uniLM",
                 max_len: int = 128, tokenizer=None, mask_prob: float = 0.15,
                 seed: int = 0):
        self.vocab = vocab
        self.lm_type = lm_type
        self.max_len = max_len
        self.rng = np.random.default_rng(seed)
        unk = vocab.word2index["unk"]
        self.items: List[List[int]] = []
        with open(text_path) as f:
            for line in f:
                parts = line.strip().split(None, 1)
                if len(parts) < 2:
                    continue
                words = parts[1].split() if tokenizer is None else \
                    tokenizer.encode_as_pieces(parts[1])
                ids = [vocab.word2index.get(w, unk) for w in words]
                if 0 < len(ids) <= max_len:
                    self.items.append(ids)
        self.mask_prob = mask_prob

    def __len__(self):
        return len(self.items)

    def get(self, idx) -> Tuple[List[int], List[int]]:
        """Returns (input_ids, target_ids)."""
        ids = self.items[idx]
        sos, eos = self.vocab.word2index["sos"], self.vocab.word2index["eos"]
        if self.lm_type == "uniLM":
            return [sos] + ids, ids + [eos]
        # MLM: 80% mask(=unk), 10% random, 10% keep; targets only at masked
        # positions (reference: text_loader.py:84-110).
        inp = list(ids)
        tgt = [0] * len(ids)
        unk = self.vocab.word2index["unk"]
        n_vocab = len(self.vocab)
        for i in range(len(ids)):
            if self.rng.random() < self.mask_prob:
                tgt[i] = ids[i]
                r = self.rng.random()
                if r < 0.8:
                    inp[i] = unk
                elif r < 0.9:
                    inp[i] = int(self.rng.integers(4, n_vocab))
        return inp, tgt


class TextDataLoader:
    def __init__(self, dataset: TextDataset, batch_size: int = 32,
                 padding_idx: int = 0, shuffle: bool = False,
                 shard: Tuple[int, int] = (0, 1), label_bucket: int = 16,
                 seed: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        self.padding_idx = padding_idx
        self.shuffle = shuffle
        self.shard = shard
        self.label_bucket = label_bucket
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        rank, world = self.shard
        n = (len(self.ds) + self.batch_size - 1) // self.batch_size
        return len(range(rank, n, world))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        rank, world = self.shard
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        for b in batches[rank::world]:
            items = [self.ds.get(i) for i in b]
            lmax = round_up(max(len(x) for x, _ in items), self.label_bucket)
            inp = np.full((self.batch_size, lmax), self.padding_idx, np.int32)
            tgt = np.full((self.batch_size, lmax), self.padding_idx, np.int32)
            for i, (x, y) in enumerate(items):
                inp[i, :len(x)] = x
                tgt[i, :len(y)] = y
            yield {"tokens": inp, "targets": tgt}
