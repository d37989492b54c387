"""Kaldi scp/ark matrix I/O, dependency-free.

Replaces the reference's kaldiio usage (reference: src/data/speech_loader.py:141
kaldiio.load_mat; cmvn stats speech_loader.py:109-115) with an in-framework
reader/writer for the Kaldi formats actually used by the recipes:

  * scp lines: "<utt> <ark_path>:<byte_offset>"
  * binary ark matrices: "\\0B" marker + "FM"/"DM" float/double matrix with
    int32 rows/cols, row-major data
  * compressed matrices (CM/CM2/CM3): per-column percentile codebook format
  * text ark matrices: "<utt>  [\\n r0c0 r0c1 ...\\n ... ]"
  * CMVN stats: 2 x (dim+1) double matrix [sum, count; sumsq, 0]
"""

import struct
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


def parse_scp_line(line: str) -> Tuple[str, str, Optional[int]]:
    utt, rest = line.strip().split(None, 1)
    if ":" in rest and rest.rsplit(":", 1)[1].isdigit():
        path, off = rest.rsplit(":", 1)
        return utt, path, int(off)
    return utt, rest, None


def read_scp(scp_path: str) -> Dict[str, Tuple[str, Optional[int]]]:
    out = {}
    with open(scp_path) as f:
        for line in f:
            if not line.strip():
                continue
            utt, path, off = parse_scp_line(line)
            out[utt] = (path, off)
    return out


def _read_token(f) -> str:
    tok = b""
    while True:
        c = f.read(1)
        if not c or c == b" ":
            break
        tok += c
    return tok.decode()


def _read_basic_int(f) -> int:
    size = f.read(1)[0]
    if size == 4:
        return struct.unpack("<i", f.read(4))[0]
    if size == 8:
        return struct.unpack("<q", f.read(8))[0]
    raise ValueError(f"unexpected int size {size}")


def _read_compressed(f, fmt: str) -> np.ndarray:
    """Kaldi CompressedMatrix (format 1/2/3)."""
    # GlobalHeader: min_value, range (float32), num_rows, num_cols (int32)
    min_v, rng, rows, cols = struct.unpack("<ffii", f.read(16))
    if fmt == "CM2":  # 16-bit per element
        data = np.frombuffer(f.read(rows * cols * 2), np.uint16)
        return (min_v + data.astype(np.float32) * (rng / 65535.0)) \
            .reshape(rows, cols)
    if fmt == "CM3":  # 8-bit per element
        data = np.frombuffer(f.read(rows * cols), np.uint8)
        return (min_v + data.astype(np.float32) * (rng / 255.0)) \
            .reshape(rows, cols)
    # CM (format 1): per-column 4-point codebook (uint16 percentiles) + uint8
    pch = np.frombuffer(f.read(cols * 8), np.uint16).reshape(cols, 4)
    pch = min_v + pch.astype(np.float32) * (rng / 65535.0)  # (cols, 4)
    data = np.frombuffer(f.read(rows * cols), np.uint8).reshape(cols, rows)
    p0, p25, p75, p100 = pch[:, 0:1], pch[:, 1:2], pch[:, 2:3], pch[:, 3:4]
    d = data.astype(np.float32)
    out = np.where(
        d <= 64, p0 + (p25 - p0) * (d / 64.0),
        np.where(d <= 192, p25 + (p75 - p25) * ((d - 64.0) / 128.0),
                 p75 + (p100 - p75) * ((d - 192.0) / 63.0)))
    return out.T.copy()  # (rows, cols)


def read_matrix(path: str, offset: Optional[int] = None) -> np.ndarray:
    """Read one matrix at `path[:offset]` (binary or text)."""
    with open(path, "rb") as f:
        if offset is not None:
            f.seek(offset)
        else:
            # skip "utt " key if present at file start (pure ark read)
            pos = f.tell()
            first = f.read(2)
            f.seek(pos)
            if first != b"\0B":
                _read_token(f)
        marker = f.read(2)
        if marker == b"\0B":
            fmt = _read_token(f)
            if fmt in ("CM", "CM2", "CM3"):
                return _read_compressed(f, fmt)
            if fmt in ("FM", "DM"):
                rows = _read_basic_int(f)
                cols = _read_basic_int(f)
                dtype = np.float32 if fmt == "FM" else np.float64
                count = rows * cols * dtype().itemsize
                return np.frombuffer(f.read(count), dtype).reshape(rows, cols) \
                    .astype(np.float32)
            if fmt in ("FV", "DV"):
                n = _read_basic_int(f)
                dtype = np.float32 if fmt == "FV" else np.float64
                return np.frombuffer(f.read(n * dtype().itemsize), dtype) \
                    .astype(np.float32)
            raise ValueError(f"unsupported kaldi format {fmt!r}")
        # text matrix
        f.seek(f.tell() - 2)
        text = f.read().decode()
        body = text[text.index("[") + 1: text.index("]")]
        rows = [r.split() for r in body.strip().split("\n") if r.strip()]
        return np.asarray(rows, np.float32)


def write_ark_scp(entries: Iterator[Tuple[str, np.ndarray]], ark_path: str,
                  scp_path: Optional[str] = None):
    """Write float32 binary ark (+ optional scp index)."""
    scp_f = open(scp_path, "w") if scp_path else None
    with open(ark_path, "wb") as f:
        for utt, mat in entries:
            f.write(utt.encode() + b" ")
            offset = f.tell()
            mat = np.ascontiguousarray(mat, np.float32)
            if mat.ndim == 1:
                f.write(b"\0BFV ")
                f.write(bytes([4]) + struct.pack("<i", mat.shape[0]))
            else:
                f.write(b"\0BFM ")
                f.write(bytes([4]) + struct.pack("<i", mat.shape[0]))
                f.write(bytes([4]) + struct.pack("<i", mat.shape[1]))
            f.write(mat.tobytes())
            if scp_f:
                scp_f.write(f"{utt} {ark_path}:{offset}\n")
    if scp_f:
        scp_f.close()


def load_cmvn_stats(cmvn_path: str) -> Tuple[np.ndarray, np.ndarray]:
    """(mean, std) from Kaldi CMVN stats (reference: speech_loader.py:109-115)."""
    stats = read_matrix(cmvn_path)
    count = stats[0, -1]
    mean = stats[0, :-1] / count
    var = stats[1, :-1] / count - mean ** 2
    return mean.astype(np.float32), np.sqrt(np.maximum(var, 1e-10)) \
        .astype(np.float32)


def compute_cmvn_stats(feature_iter) -> np.ndarray:
    """Accumulate global CMVN stats in Kaldi layout (2 x dim+1)."""
    total, sq, count = None, None, 0.0
    for feat in feature_iter:
        feat = np.asarray(feat, np.float64)
        if total is None:
            total = feat.sum(0)
            sq = (feat ** 2).sum(0)
        else:
            total += feat.sum(0)
            sq += (feat ** 2).sum(0)
        count += feat.shape[0]
    dim = total.shape[0]
    stats = np.zeros((2, dim + 1), np.float64)
    stats[0, :dim] = total
    stats[0, dim] = count
    stats[1, :dim] = sq
    return stats.astype(np.float32)
