"""Batched Levenshtein distance on device (jittable).

The reference computes train/valid greedy WER on HOST every step
(reference: src/utils/wer.py:7-52 via editdistance, called from
art_task.py:196-202) — which on TPU forces a (B, T', V) logits
device-to-host pull through the tunnel each step. Here the whole metric —
greedy collapse, eos truncation, edit distance — runs in-graph and only
two scalars per metric leave the device.

The DP is vectorized with an associative trick: for each DP row i,

    D[i][j] = min(D[i-1][j] + 1, D[i][j-1] + 1, D[i-1][j-1] + sub)

the horizontal dependence D[i][j-1]+1 unrolls to a prefix minimum:
with a[j] = min(D[i-1][j] + 1, D[i-1][j-1] + sub[j]) (and a[0] = i),

    D[i][j] = min_{k<=j} (a[k] + (j - k)) = j + cummin(a - iota)[j]

so each row is one vectorized `cummin` and the row loop is a `lax.scan`
— O(N) scan steps of O(B*M) vector work, no host sync.
"""

import jax
import jax.numpy as jnp


def edit_distance(hyp, hyp_lens, ref, ref_lens):
    """Batched Levenshtein distance between padded token rows.

    hyp: (B, N) int tokens; ref: (B, M); *_lens: (B,) valid counts.
    Padding content is ignored (only the prefixes participate).
    Returns (B,) int32 distances.
    """
    bs, n = hyp.shape
    m = ref.shape[1]
    # row 0: D[0][j] = j (insertions), masked at j > ref_len later via gather
    row0 = jnp.broadcast_to(jnp.arange(m + 1, dtype=jnp.int32),
                            (bs, m + 1))
    iota = jnp.arange(m + 1, dtype=jnp.int32)

    def step(prev, x):
        h_tok, i = x  # h_tok: (B,), i: row index (1-based)
        sub = jnp.where(ref == h_tok[:, None], 0, 1).astype(jnp.int32)
        # a[j] = min(prev[j] + 1, prev[j-1] + sub[j-1]) for j >= 1
        diag = prev[:, :-1] + sub
        a = jnp.minimum(prev[:, 1:] + 1, diag)
        a = jnp.concatenate([jnp.full((bs, 1), i, jnp.int32), a], axis=1)
        row = iota[None, :] + jax.lax.cummin(a - iota[None, :], axis=1)
        # freeze rows beyond this sample's hyp length
        row = jnp.where((i <= hyp_lens)[:, None], row, prev)
        return row, None

    ts = jnp.arange(1, n + 1, dtype=jnp.int32)
    last, _ = jax.lax.scan(step, row0, (hyp.T.astype(jnp.int32), ts))
    # D[hyp_len][ref_len] == frozen last row at ref_len
    return jnp.take_along_axis(last, ref_lens[:, None].astype(jnp.int32),
                               axis=1)[:, 0]


def ctc_greedy_errors(ctc_out, frame_mask, labels, label_lens):
    """(sum errors, sum ref tokens) of greedy CTC decode vs labels, on
    device (reference: src/utils/wer.py:7-28 ctc_greedy_wer)."""
    from cassnat_asr_public_tpu.ops.ctc import ctc_greedy_collapse
    hyp, hyp_lens = ctc_greedy_collapse(ctc_out, frame_mask)
    valid = label_lens > 0
    errs = edit_distance(hyp, hyp_lens, labels, label_lens)
    errs = jnp.where(valid, errs, 0)
    return errs.sum(), jnp.where(valid, label_lens, 0).sum()


def att_greedy_errors(att_out, labels, label_lens, eos: int = 2):
    """(sum errors, sum ref tokens) of per-slot argmax predictions,
    eos-truncated, vs labels (reference: src/utils/wer.py:31-52)."""
    pred = att_out.argmax(-1).astype(jnp.int32)  # (B, U)
    # keep slots strictly before the first eos (the eos itself is dropped,
    # like the host break)
    keep = ~(jnp.cumsum((pred == eos).astype(jnp.int32), axis=1) > 0)
    hyp = jnp.where(keep, pred, 0)
    hyp_lens = keep.sum(-1).astype(jnp.int32)
    # labels are eos-free padded rows; compare prefixes
    valid = label_lens > 0
    errs = edit_distance(hyp, hyp_lens, labels, label_lens)
    errs = jnp.where(valid, errs, 0)
    return errs.sum(), jnp.where(valid, label_lens, 0).sum()
