"""CTC dynamic programs as batched `lax.scan`s (TPU-native).

The reference implements these with per-frame Python loops and a per-utterance
Python backtrace (reference: src/models/cassnat.py:272-414, Viterbi alignment
with 3-way transitions + sequential backtrace; torch.nn.CTCLoss for the loss).
Here every DP is a single `lax.scan` over time with the full batch and the
blank-interleaved path axis vectorized, and the backtrace is a reverse
`lax.scan` — everything jit-compilable with static shapes, no host syncs.

Conventions (identical to the reference, reference: src/data/vocab.py:8-11):
  blank = 0 (also the padding index), sos = 1, eos = 2, unk = 3.

All inputs are padded to static shapes; true lengths are passed separately.
"""

import jax
import jax.numpy as jnp

LOG_ZERO = -1e10  # reference: src/utils/ctc_prefix.py:12 (logzero = -1e10)
LOG_ONE = 0.0


def _interleave_blanks(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, U) labels -> (B, 2U+1) blank-interleaved path.

    path = [blank, y1, blank, y2, ..., yU, blank]
    (reference: src/models/cassnat.py:287-291)
    """
    bs, umax = labels.shape
    path = jnp.full((bs, 2 * umax + 1), blank, dtype=labels.dtype)
    return path.at[:, 1::2].set(labels)


def _path_log_probs(log_probs: jnp.ndarray, path: jnp.ndarray) -> jnp.ndarray:
    """Gather per-frame log probs along the interleaved path.

    log_probs: (B, T, V); path: (B, S) -> (B, T, S)
    (reference: src/models/cassnat.py:296-298)
    """
    return jnp.take_along_axis(log_probs, path[:, None, :], axis=2)


def _transition_stack(alpha: jnp.ndarray, same_transition: jnp.ndarray) -> jnp.ndarray:
    """Build the 3 candidate predecessors for each path state.

    alpha: (B, S) log scores. Returns (3, B, S):
      [0] stay at s; [1] from s-1; [2] from s-2 (disallowed when
      path[s] == path[s-2], i.e. blank->blank or repeated label).
    (reference: src/models/cassnat.py:316-320)
    """
    shift1 = jnp.concatenate(
        [jnp.full_like(alpha[:, :1], LOG_ZERO), alpha[:, :-1]], axis=1)
    shift2 = jnp.concatenate(
        [jnp.full_like(alpha[:, :2], LOG_ZERO), alpha[:, :-2]], axis=1)
    shift2 = jnp.where(same_transition, LOG_ZERO, shift2)
    return jnp.stack([alpha, shift1, shift2], axis=0)


def _same_transition(path: jnp.ndarray) -> jnp.ndarray:
    """(B, S) bool: True at s where path[s] == path[s-2] (s >= 2).

    (reference: src/models/cassnat.py:307)
    """
    bs, smax = path.shape
    same = jnp.zeros((bs, smax), dtype=bool)
    return same.at[:, 2:].set(path[:, :-2] == path[:, 2:])


# Pallas CTC loss dispatch (kernels/ctc_loss.py): alpha/beta DPs as single
# VMEM-resident kernels with a custom VJP emitting the CTC posterior
# gradient, replacing the T-step lax.scan (and its reverse-mode unroll).
# None = auto (TPU only), True/False = forced.
# On-chip A/B (benchmarks/ctc_loss_bench.py, v5e): loss fwd+bwd 3.89 ->
# 3.41 ms (1.14x), full CASS-NAT train step 76.7 -> 75.0 ms. TPU grads
# match the scan's autodiff to ~3e-3 abs (posterior reconstruction vs
# cotangent propagation; exact to 1e-5 in interpret mode).
# None = auto (TPU only), True/False = forced.
_PALLAS_CTC_LOSS = None


def enable_pallas_ctc_loss(on):
    """Force the Pallas CTC loss kernel on/off (None = auto: TPU only)."""
    global _PALLAS_CTC_LOSS
    _PALLAS_CTC_LOSS = on


def _pallas_ctc_loss_enabled() -> bool:
    if _PALLAS_CTC_LOSS is not None:
        return _PALLAS_CTC_LOSS
    return jax.default_backend() == "tpu"


def ctc_forward_score(log_probs, labels, input_lengths, label_lengths, blank=0):
    """Log P(labels | log_probs) under CTC, per sample.

    A log-space forward algorithm over the blank-interleaved path, scanned over
    time. Equivalent to -torch.nn.CTCLoss(reduction='none') used by the
    reference (reference: src/models/cassnat.py:126,232).

    Args:
      log_probs: (B, T, V) log-softmax outputs (float32 recommended).
      labels: (B, U) padded target ids (no sos/eos).
      input_lengths: (B,) valid frame counts.
      label_lengths: (B,) valid label counts.
    Returns:
      (B,) log probability of each label sequence (<= 0).
    """
    if _pallas_ctc_loss_enabled():
        from cassnat_asr_public_tpu.kernels.ctc_loss import \
            ctc_forward_score_pallas
        return ctc_forward_score_pallas(log_probs, labels,
                                        input_lengths, label_lengths, blank)
    log_probs = log_probs.astype(jnp.float32)
    path = _interleave_blanks(labels, blank)
    bs, smax = path.shape
    path_lens = 2 * label_lengths + 1
    lp_path = _path_log_probs(log_probs, path)  # (B, T, S)
    same = _same_transition(path)
    outside = jnp.arange(smax)[None, :] >= path_lens[:, None]

    alpha0 = jnp.full((bs, smax), LOG_ZERO, dtype=jnp.float32).at[:, 0].set(LOG_ONE)

    def step(alpha, xs):
        lp_t, t = xs
        cand = _transition_stack(alpha, same)
        new = jax.scipy.special.logsumexp(cand, axis=0) + lp_t
        new = jnp.where(outside, LOG_ZERO, new)
        # Freeze once past this sample's true length.
        alpha = jnp.where((t < input_lengths)[:, None], new, alpha)
        return alpha, None

    ts = jnp.arange(log_probs.shape[1])
    alpha, _ = jax.lax.scan(step, alpha0, (jnp.moveaxis(lp_path, 1, 0), ts))

    last = jnp.take_along_axis(alpha, (path_lens - 1)[:, None], axis=1)[:, 0]
    prev = jnp.take_along_axis(
        alpha, jnp.maximum(path_lens - 2, 0)[:, None], axis=1)[:, 0]
    prev = jnp.where(path_lens >= 2, prev, LOG_ZERO)
    return jnp.logaddexp(last, prev)


def ctc_loss(log_probs, labels, input_lengths, label_lengths, blank=0,
             reduction="mean", zero_infinity=True):
    """CTC loss matching torch.nn.CTCLoss semantics.

    reduction='mean': mean over batch of (per-sample NLL / label_length)
    (torch semantics; reference: src/models/cassnat.py:126).
    """
    nll = -ctc_forward_score(log_probs, labels, input_lengths, label_lengths, blank)
    if zero_infinity:
        nll = jnp.where(nll >= -LOG_ZERO / 2, 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return nll.sum()
    denom = jnp.maximum(label_lengths, 1).astype(nll.dtype)
    return (nll / denom).mean()


# Pallas Viterbi dispatch: the kernel (kernels/ctc_viterbi.py) keeps the
# alpha DP in VMEM and measured ~10% faster than the scan on-chip; it is the
# default on TPU for the recipe-default sample_topk<=1 path (sampled
# alignments need per-frame randomness the kernel does not implement — those
# fall back to the scan). None = auto (TPU only), True/False = forced.
_PALLAS_VITERBI = None


def enable_pallas_viterbi(on):
    """Force the Pallas Viterbi kernel on/off (None = auto: TPU only)."""
    global _PALLAS_VITERBI
    _PALLAS_VITERBI = on


def _pallas_viterbi_enabled() -> bool:
    if _PALLAS_VITERBI is not None:
        return _PALLAS_VITERBI
    return jax.default_backend() == "tpu"


def ctc_viterbi_align(log_probs, labels, input_lengths, label_lengths, blank=0,
                      sample_topk=0, rng=None):
    """Batched CTC Viterbi (forced) alignment with jittable backtrace.

    Max-product version of the forward algorithm, with stored backpointer
    offsets and a reverse-scan backtrace. Replaces the reference's Python
    per-frame DP + per-utterance backtrace loops
    (reference: src/models/cassnat.py:272-353).

    When sample_topk > 1, a random subset of frames takes the 2nd-best
    transition instead of the argmax (alignment sampling for training
    robustness; reference: src/models/cassnat.py:311-331). `rng` must be a
    jax PRNG key in that case.

    Returns:
      aligned_seq_shift: (B, T) int32 — token id at the frame AFTER each
        segment's first frame; 0 (blank) elsewhere. Exactly the reference's
        "aligned_seq_shift" (reference: src/models/cassnat.py:344-353): feeding
        it to `align_to_trigger_mask` reproduces the trigger mask.
      states: (B, T) int32 — the aligned path-state index per frame (debug).
    """
    if sample_topk <= 1 and _pallas_viterbi_enabled():
        from cassnat_asr_public_tpu.kernels.ctc_viterbi import \
            ctc_viterbi_align_pallas
        return ctc_viterbi_align_pallas(log_probs, labels, input_lengths,
                                        label_lengths, blank=blank)
    log_probs = log_probs.astype(jnp.float32)
    # Mask frames beyond input_lengths to logzero except we never read them.
    path = _interleave_blanks(labels, blank)
    bs, smax = path.shape
    tmax = log_probs.shape[1]
    path_lens = 2 * label_lengths + 1
    lp_path = _path_log_probs(log_probs, path)  # (B, T, S)
    same = _same_transition(path)
    outside = jnp.arange(smax)[None, :] >= path_lens[:, None]

    alpha0 = jnp.full((bs, smax), LOG_ZERO, dtype=jnp.float32).at[:, 0].set(LOG_ONE)

    if sample_topk > 1:
        assert rng is not None, "sample_topk > 1 requires an rng key"
        # Reference: sample_topk random frame indices in [1, tmax), with
        # replacement (reference: src/models/cassnat.py:311-312).
        idx = jax.random.randint(rng, (sample_topk,), 1, max(tmax, 2))
        sampled_frames = jnp.zeros((tmax,), bool).at[idx].set(True)
    else:
        sampled_frames = jnp.zeros((tmax,), bool)

    def step(alpha, xs):
        lp_t, t, is_sampled = xs
        cand = _transition_stack(alpha, same)  # (3, B, S)
        best = jnp.argmax(cand, axis=0)  # (B, S) in {0,1,2}
        best_val = jnp.max(cand, axis=0)
        if sample_topk > 1:
            # 2nd-best transition at sampled frames (position 0 keeps best:
            # it has a single predecessor).
            top2 = jax.lax.top_k(jnp.moveaxis(cand, 0, -1), 2)  # vals, idx (B,S,2)
            second_val, second_idx = top2[0][..., 1], top2[1][..., 1]
            use2 = is_sampled & (jnp.arange(smax)[None, :] > 0)
            best = jnp.where(use2, second_idx, best)
            best_val = jnp.where(use2, second_val, best_val)
        best_val = jnp.where(outside, LOG_ZERO, best_val)
        new = best_val + lp_t
        new = jnp.where((t < input_lengths)[:, None], new, alpha)
        # offset of the chosen predecessor; only meaningful for t < len.
        return new, best.astype(jnp.int32)

    ts = jnp.arange(tmax)
    alpha, offsets = jax.lax.scan(
        step, alpha0, (jnp.moveaxis(lp_path, 1, 0), ts, sampled_frames))
    # offsets: (T, B, S)

    # Final state: compare alpha at S-1 (last blank) vs S-2 (last label)
    # (reference: src/models/cassnat.py:335-339).
    last = jnp.take_along_axis(alpha, (path_lens - 1)[:, None], axis=1)[:, 0]
    prev = jnp.take_along_axis(
        alpha, jnp.maximum(path_lens - 2, 0)[:, None], axis=1)[:, 0]
    s_final = jnp.where(last > prev, path_lens - 1, jnp.maximum(path_lens - 2, 0))

    # Reverse backtrace scan: at frame t the aligned state is `cur`; the
    # predecessor (state at t-1) is cur - offsets[t, b, cur].
    def back(carry, xs):
        off_t, t = xs
        cur = jnp.where(t == input_lengths - 1, s_final, carry)
        prev_state = cur - jnp.take_along_axis(off_t, cur[:, None], axis=1)[:, 0]
        prev_state = jnp.clip(prev_state, 0, smax - 1)
        return prev_state, cur

    _, states_rev = jax.lax.scan(
        back, s_final, (offsets[::-1], ts[::-1]))
    states = states_rev[::-1].T  # (B, T)

    aligned_seq = jnp.take_along_axis(path, states, axis=1)  # (B, T) token ids
    frame_valid = jnp.arange(tmax)[None, :] < input_lengths[:, None]
    aligned_seq = jnp.where(frame_valid, aligned_seq, blank)

    aligned_seq_shift = _collapse_and_shift(aligned_seq, blank)
    return aligned_seq_shift, states


def _collapse_and_shift(aligned_seq, blank):
    """Dedup-collapse a framewise path, then shift right by one.

    Keeps only the first frame of each token segment, then shifts so the
    non-blank marker lands on the frame AFTER the segment start — the exact
    form `align_to_trigger_mask` consumes
    (reference: src/models/cassnat.py:344-353, 380-385).
    """
    shift = jnp.concatenate(
        [jnp.full_like(aligned_seq[:, :1], blank), aligned_seq[:, :-1]], axis=1)
    dup = aligned_seq == shift
    firsts = jnp.where(dup, blank, aligned_seq)
    return jnp.concatenate(
        [jnp.full_like(firsts[:, :1], blank), firsts[:, :-1]], axis=1)


def ctc_best_path_align(log_probs, frame_mask, blank=0, sample_num=0,
                        threshold=0.9, include_best=True, rng=None):
    """Greedy (best-path) alignment, optionally sampled (ESA decoding).

    With sample_num > 1 the batch is assumed pre-expanded sample_num× and at
    low-confidence frames (max prob < threshold) a random top-2 symbol is
    chosen; rows 0, sample_num, 2*sample_num, ... keep the pure argmax path
    (reference: src/models/cassnat.py:367-389).

    Args:
      log_probs: (B, T, V); frame_mask: (B, T) bool of valid frames.
    Returns:
      aligned_seq_shift: (B, T) int32 (see ctc_viterbi_align).
      ylen: (B,) number of emitted tokens.
    """
    bs, tmax, _ = log_probs.shape
    if sample_num > 1:
        assert rng is not None
        low_conf = jnp.exp(jnp.max(log_probs, axis=-1)) < threshold  # (B, T)
        top2 = _top2(log_probs)[1]  # (B, T, 2)
        select = jax.random.randint(rng, (bs, tmax), 0, 2)
        select = jnp.where(low_conf, select, 0)
        if include_best:
            is_best_row = (jnp.arange(bs) % sample_num) == 0
            select = jnp.where(is_best_row[:, None], 0, select)
        best_paths = jnp.take_along_axis(top2, select[..., None], axis=2)[..., 0]
    else:
        best_paths = jnp.argmax(log_probs, axis=-1)

    best_paths = jnp.where(frame_mask, best_paths, blank)
    aligned_seq_shift = _collapse_and_shift(best_paths, blank)
    ylen = jnp.sum(aligned_seq_shift != blank, axis=1)
    return aligned_seq_shift.astype(jnp.int32), ylen


def _top2(log_probs):
    """Exact top-2 over the vocab via two max/argmax passes.

    `lax.top_k(x, 2)` lowers to a full O(V log V) sort on TPU — ~20 ms of
    the ESA iteration at (B=16, T'=184, V=5k)
    (benchmarks/esa_topk_stage_bench.py); two reduction passes over the
    same tensor are bandwidth-bound instead. Ties resolve to the lowest
    index in both passes, matching top_k's stable order.
    """
    v = log_probs.shape[-1]
    i1 = jnp.argmax(log_probs, axis=-1)
    v1 = jnp.max(log_probs, axis=-1)
    masked = jnp.where(jnp.arange(v) == i1[..., None],
                       jnp.finfo(log_probs.dtype).min, log_probs)
    i2 = jnp.argmax(masked, axis=-1)
    v2 = jnp.max(masked, axis=-1)
    return (jnp.stack([v1, v2], axis=-1),
            jnp.stack([i1, i2], axis=-1).astype(jnp.int32))


def ctc_sampled_align(log_probs, frame_mask, sample_num, threshold=0.9,
                      include_best=True, rng=None, blank=0,
                      return_scores=False):
    """ESA sampled alignments from UNEXPANDED (B, T, V) posteriors.

    Same sampling rule as `ctc_best_path_align(sample_num>1)` (reference:
    src/models/cassnat.py:367-389) but the per-frame top-2 reduction runs
    BEFORE the sample_num-fold batch expansion, so only (B, T, 2) arrays are
    replicated instead of the (B, T, V) tensor — at the librispeech ESA
    config (B=16, S=50, V=5k f32) that skips a 2.9 GB repeat + expanded
    top_k that measured 745 ms of the ~1 s decode iteration
    (benchmarks/esa_stage_bench.py).

    Returns (aligned_seq_shift (B*S, T) int32, ylen (B*S,)) — rows grouped
    per utterance, row j=0 of each group the pure argmax path when
    include_best. With return_scores, also returns the per-candidate CTC
    path log-probability (B*S,) (sum of the chosen per-frame log-probs
    over valid frames) — the sampling density, usable to preselect
    candidates before the expensive NAT/rank passes (the argmax row is
    always its utterance's maximum, so include_best rows survive any
    top-k preselection).
    """
    bs, tmax, _ = log_probs.shape
    n = bs * sample_num
    top2v, top2i = _top2(log_probs)                   # (B, T, 2)
    low_conf = jnp.exp(top2v[..., 0]) < threshold
    top2i_r = jnp.repeat(top2i, sample_num, axis=0)
    top2v_r = jnp.repeat(top2v, sample_num, axis=0)
    low_r = jnp.repeat(low_conf, sample_num, axis=0)
    mask_r = jnp.repeat(frame_mask, sample_num, axis=0)
    select = jax.random.randint(rng, (n, tmax), 0, 2)
    select = jnp.where(low_r, select, 0)
    if include_best:
        is_best_row = (jnp.arange(n) % sample_num) == 0
        select = jnp.where(is_best_row[:, None], 0, select)
    best_paths = jnp.take_along_axis(top2i_r, select[..., None],
                                     axis=2)[..., 0]
    best_paths = jnp.where(mask_r, best_paths, blank)
    aligned_seq_shift = _collapse_and_shift(best_paths, blank)
    ylen = jnp.sum(aligned_seq_shift != blank, axis=1)
    if not return_scores:
        return aligned_seq_shift.astype(jnp.int32), ylen
    chosen_lp = jnp.take_along_axis(top2v_r, select[..., None],
                                    axis=2)[..., 0]
    path_score = jnp.where(mask_r, chosen_lp, 0.0).sum(-1)
    return aligned_seq_shift.astype(jnp.int32), ylen, path_score


def align_to_trigger_mask(aligned_seq_shift, umax_plus1, frame_mask,
                          input_lengths, ylen, blank=0):
    """Trigger mask (B, U+1, T) from a shifted alignment.

    Row u is True on the frames attended by output token u: from its trigger
    frame through the next token's trigger frame. Row `ylen[b]` (the EOS slot)
    additionally gets the final valid frame so EOS always sees >= 1 frame
    (reference: src/models/cassnat.py:355-365).

    Args:
      aligned_seq_shift: (B, T) from *_align above.
      umax_plus1: static int, number of query slots (max labels + 1 for EOS).
      frame_mask: (B, T) bool valid-frame mask.
      input_lengths: (B,) valid frame counts.
      ylen: (B,) token counts from the alignment.
    Returns:
      trigger_mask: (B, U+1, T) bool; new ylen = ylen + 1 (EOS slot added).
    """
    seg = jnp.cumsum(aligned_seq_shift != blank, axis=1)  # (B, T)
    trig = seg[:, None, :] == jnp.arange(umax_plus1)[None, :, None]
    trig = trig & frame_mask[:, None, :]
    bs, tmax = aligned_seq_shift.shape
    last_frame = jnp.clip(input_lengths - 1, 0, tmax - 1)
    eos_onehot = (jnp.arange(umax_plus1)[None, :, None] == ylen[:, None, None]) & \
                 (jnp.arange(tmax)[None, None, :] == last_frame[:, None, None])
    return trig | eos_onehot


def expand_trigger_mask(trigger_mask, left_trigger=0, right_trigger=0):
    """Widen each token's trigger span by +-1 frame on request.

    (reference: src/models/cassnat.py:259-270)
    """
    if right_trigger > 0:
        shifted = jnp.concatenate(
            [jnp.zeros_like(trigger_mask[:, :, :1]), trigger_mask[:, :, :-1]],
            axis=2)
        trigger_mask = trigger_mask | shifted
    if left_trigger > 0:
        shifted = jnp.concatenate(
            [trigger_mask[:, :, 1:], jnp.zeros_like(trigger_mask[:, :, :1])],
            axis=2)
        trigger_mask = trigger_mask | shifted
    return trigger_mask


def ctc_greedy_collapse(log_probs, frame_mask, blank=0):
    """Greedy CTC decode: argmax, collapse repeats, drop blanks.

    Returns (B, T) token ids left-aligned with trailing `blank` padding and
    (B,) lengths. Jittable (uses a stable sort to compact nonzeros).
    """
    best = jnp.argmax(log_probs, axis=-1)
    best = jnp.where(frame_mask, best, blank)
    shift = jnp.concatenate(
        [jnp.full_like(best[:, :1], blank), best[:, :-1]], axis=1)
    firsts = jnp.where(best == shift, blank, best)  # first frame of each token
    keep = firsts != blank
    # Compact: stable-sort by (not keep) so kept tokens move to the front.
    order = jnp.argsort(~keep, axis=1, stable=True)
    compacted = jnp.take_along_axis(firsts, order, axis=1)
    lengths = keep.sum(axis=1)
    valid = jnp.arange(best.shape[1])[None, :] < lengths[:, None]
    return jnp.where(valid, compacted, blank), lengths
