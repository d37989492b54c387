"""Alignment diagnostics: hitrate + length-difference stats + profiling.

(reference: src/models/cassnat.py:454-463 test_hitrate accounting;
src/tasks/cassnat_task.py:315-365 print_utt2diff; SURVEY.md §5.1 — the
reference has no profiler, we add jax.profiler trace hooks.)
"""

import contextlib
import os
from collections import Counter
from typing import Dict, Optional

import numpy as np


def alignment_hitrate(pred_shift: np.ndarray, oracle_shift: np.ndarray,
                      stats: Optional[Dict] = None) -> Dict:
    """Trigger-position agreement between a predicted and an oracle alignment.

    Both inputs are (B, T) aligned_seq_shift arrays (nonzero at the frame
    after each token's first frame). Accumulates into `stats` with keys
    total / num_correct / length_total / length_correct
    (reference: cassnat.py:454-463).
    """
    stats = stats if stats is not None else {
        "total": 0, "num_correct": 0, "length_total": 0, "length_correct": 0}
    pred = np.asarray(pred_shift) != 0
    orac = np.asarray(oracle_shift) != 0
    stats["total"] += int(orac.sum())
    both_pos = pred & orac
    stats["num_correct"] += int(both_pos.sum())
    for b in range(pred.shape[0]):
        stats["length_total"] += 1
        if pred[b].sum() == orac[b].sum():
            stats["length_correct"] += 1
    return stats


def utt2diff(pred_lens: np.ndarray, label_sizes: np.ndarray,
             hist: Optional[Counter] = None) -> Counter:
    """Histogram of predicted-vs-true token-count differences.

    (reference: cassnat_task.py print_utt2diff)
    """
    hist = hist if hist is not None else Counter()
    for p, t in zip(np.asarray(pred_lens), np.asarray(label_sizes)):
        hist[int(p) - int(t)] += 1
    return hist


def format_hitrate(stats: Dict) -> str:
    tot = max(stats["total"], 1)
    lt = max(stats["length_total"], 1)
    return (f"trigger hitrate {stats['num_correct']/tot:.4f} "
            f"({stats['num_correct']}/{stats['total']}), "
            f"length accuracy {stats['length_correct']/lt:.4f} "
            f"({stats['length_correct']}/{stats['length_total']})")


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Lightweight per-step timing + token-throughput meter.

    (reference: TokenSpeed/AverageMeter, art_task.py:161-167)
    """

    def __init__(self):
        import time
        self._time = time
        self.reset()

    def reset(self):
        self.last = self._time.perf_counter()
        self.steps = 0
        self.tokens = 0
        self.elapsed = 0.0

    def step(self, n_tokens: int = 0):
        now = self._time.perf_counter()
        self.elapsed += now - self.last
        self.last = now
        self.steps += 1
        self.tokens += n_tokens

    @property
    def steps_per_sec(self):
        return self.steps / max(self.elapsed, 1e-9)

    @property
    def tokens_per_sec(self):
        return self.tokens / max(self.elapsed, 1e-9)
