"""WER/CER metrics, meters, and the native edit-distance binding.

Replaces the reference's editdistance extension + sclite scoring
(reference: src/utils/wer.py, egs/librispeech/run_art.sh:144) with an
in-framework C++ Levenshtein (native/edit_distance.cpp, auto-built on first
use) plus a pure-Python fallback.
"""

import ctypes
import os
import subprocess
from typing import List, Sequence, Tuple

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    root = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    root = os.path.abspath(root)
    so = os.path.join(root, "libcassnat_native.so")
    try:
        if not os.path.exists(so):
            subprocess.run(["make", "-C", root], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(so)
        lib.edit_distance_i32.restype = ctypes.c_int64
        lib.edit_distance_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.edit_alignment_i32.restype = None
        lib.edit_alignment_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        _NATIVE = lib
    except Exception:
        _NATIVE = None
    return _NATIVE


def _py_edit_distance(a, b):
    na, nb = len(a), len(b)
    if na == 0:
        return nb
    if nb == 0:
        return na
    prev = list(range(nb + 1))
    for i in range(1, na + 1):
        cur = [i] + [0] * nb
        ai = a[i - 1]
        for j in range(1, nb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ai != b[j - 1]))
        prev = cur
    return prev[nb]


def edit_distance(a: Sequence[int], b: Sequence[int]) -> int:
    lib = _native_lib()
    if lib is None:
        return _py_edit_distance(list(a), list(b))
    a32 = np.ascontiguousarray(a, np.int32)
    b32 = np.ascontiguousarray(b, np.int32)
    return int(lib.edit_distance_i32(
        a32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a32),
        b32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(b32)))


def alignment_counts(ref: Sequence[int], hyp: Sequence[int]
                     ) -> Tuple[int, int, int]:
    """(substitutions, insertions, deletions) — sclite-style detail."""
    lib = _native_lib()
    if lib is None:
        # fall back: only total distance; attribute everything to subs
        d = _py_edit_distance(list(ref), list(hyp))
        return d, 0, 0
    r = np.ascontiguousarray(ref, np.int32)
    h = np.ascontiguousarray(hyp, np.int32)
    s, i, dl = ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64()
    lib.edit_alignment_i32(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(r),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(h),
        ctypes.byref(s), ctypes.byref(i), ctypes.byref(dl))
    return s.value, i.value, dl.value


def ctc_greedy_wer(ctc_out: np.ndarray, labels: np.ndarray,
                   feat_sizes: np.ndarray, pad: int = 0) -> Tuple[int, int]:
    """Greedy-collapsed CTC WER numerator/denominator.

    (reference: src/utils/wer.py:7-28 — collapse repeats/blanks; labels drop
    pad and eos(=2).)
    """
    pred = np.asarray(ctc_out).argmax(-1)
    errs, tokens = 0, 0
    n = min(pred.shape[0], len(labels))
    for i in range(n):
        if not any(x != pad and x != 2 for x in labels[i]):
            continue  # batch-padding row
        t = int(feat_sizes[i])
        p = pred[i, :t]
        keep = (p != pad) & np.concatenate([[True], p[1:] != p[:-1]])
        hyp = p[keep]
        ref = [int(x) for x in labels[i] if x != pad and x != 2]
        errs += edit_distance(ref, hyp)
        tokens += len(ref)
    return errs, max(tokens, 1)


def att_greedy_wer(att_out: np.ndarray, labels: np.ndarray,
                   pad: int = 0) -> Tuple[int, int]:
    """Greedy attention-decoder WER; hypothesis stops at eos(=2)
    (reference: src/utils/wer.py:31-52)."""
    pred = np.asarray(att_out).argmax(-1)
    errs, tokens = 0, 0
    n = min(pred.shape[0], len(labels))
    for i in range(n):
        if not any(x != pad and x != 2 for x in labels[i]):
            continue  # batch-padding row
        hyp = []
        for j in range(pred.shape[1]):
            if pred[i, j] == pad and j < labels.shape[1] and labels[i, j] == 1:
                continue
            if pred[i, j] == 2:
                break
            hyp.append(int(pred[i, j]))
        ref = [int(x) for x in labels[i] if x != pad and x != 2]
        errs += edit_distance(ref, hyp)
        tokens += len(ref)
    return errs, max(tokens, 1)


def corpus_wer(refs: List[List[str]], hyps: List[List[str]]):
    """Corpus-level word error report over string token lists.

    Returns dict(wer, sub, ins, del, n_words, n_utts) — the in-framework
    replacement for sclite scoring.
    """
    id_map = {}

    def to_ids(seq):
        out = []
        for w in seq:
            if w not in id_map:
                id_map[w] = len(id_map)
            out.append(id_map[w])
        return out

    tot_s = tot_i = tot_d = tot_w = 0
    for ref, hyp in zip(refs, hyps):
        r, h = to_ids(ref), to_ids(hyp)
        s, i, d = alignment_counts(r, h)
        tot_s += s
        tot_i += i
        tot_d += d
        tot_w += len(r)
    wer = 100.0 * (tot_s + tot_i + tot_d) / max(tot_w, 1)
    return {"wer": wer, "sub": tot_s, "ins": tot_i, "del": tot_d,
            "n_words": tot_w, "n_utts": len(refs)}


class AverageMeter:
    """(reference: src/utils/util.py:8-29)"""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0
        self.avg = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        return ("{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
                ).format(**self.__dict__)


class ProgressMeter:
    """(reference: src/utils/util.py:31-47)"""

    def __init__(self, num_batches, *meters, prefix=""):
        self.num_batches = num_batches
        self.meters = meters
        self.prefix = prefix

    def print(self, batch):
        entries = [f"{self.prefix}[{batch}/{self.num_batches}]"]
        entries += [str(m) for m in self.meters]
        print("  ".join(entries), flush=True)
