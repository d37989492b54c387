"""Frame splicing / skipping (reference: src/data/feat_op.py:4-31).

With the librispeech configs (left_ctx=0, right_ctx=2, skip=1) the 80-dim
fbank becomes 240-dim spliced input (conf/transformer.yaml:26-30)."""

import numpy as np


def context_feat(feat: np.ndarray, left_ctx: int, right_ctx: int) -> np.ndarray:
    """Stack [t-left_ctx .. t+right_ctx] frames feature-wise (edge-padded)."""
    if left_ctx == 0 and right_ctx == 0:
        return feat
    pieces = []
    t = feat.shape[0]
    for off in range(-left_ctx, right_ctx + 1):
        idx = np.clip(np.arange(t) + off, 0, t - 1)
        pieces.append(feat[idx])
    return np.concatenate(pieces, axis=1)


def skip_feat(feat: np.ndarray, skip: int) -> np.ndarray:
    """Keep every skip-th frame."""
    if skip <= 1:
        return feat
    return feat[::skip]
