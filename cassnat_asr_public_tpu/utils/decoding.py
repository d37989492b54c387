"""Batched, jit-compiled decoding drivers.

TPU re-design of the reference's Python-object beam searches:

  * NAT greedy / ESA decode: the entire pipeline — encoder, CTC head, sampled
    best-path alignments (sample_num as an extra batch axis), trigger masks,
    single NAT decoder pass, LM/AT-baseline candidate ranking, final argmax —
    is ONE jitted function per shape bucket (reference: the multi-stage
    Python flow in src/models/cassnat.py:420-637).
  * AR beam search with CTC-prefix joint scoring + LM shallow fusion +
    length penalty: a fixed-beam `lax.fori_loop` with all hypotheses
    materialized as (B, K, L) arrays (reference: python list shuffling in
    src/models/transformer.py:122-241).
  * Frame-synchronous CTC beam decode (for CTC-only models) as a host-side
    reference implementation (reference: src/utils/beam_decode.py:8-93).

All functions take `model.apply`-style callables so they stay agnostic to the
specific model family.
"""

from functools import partial
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cassnat_asr_public_tpu.ops.ctc import (
    LOG_ZERO,
    ctc_best_path_align,
    ctc_greedy_collapse,
)
from cassnat_asr_public_tpu.ops.ctc_prefix import (
    initial_state,
    mask_ctc_out,
    prefix_score_step,
)


# ---------------------------------------------------------------------------
# NAT (CASS-NAT) decoding
# ---------------------------------------------------------------------------


def _repeat_batch(x, n):
    """(B, ...) -> (B*n, ...) repeating each row n times contiguously."""
    return jnp.repeat(x, n, axis=0)


def _encode_ctc(model, params, feats, src_mask, use_megakernel):
    """Encoder + CTC head, optionally through the fused conformer-layer
    Pallas megakernel (kernels/conformer_layer.py). The fused path covers
    conformer encoders with relative PE only; anything else falls back to
    the XLA encoder. use_megakernel="qblocked" selects the T-blocked
    flash-style half A (VERDICT r4 item 7 A/B)."""
    if use_megakernel and getattr(model, "use_conv_enc", False) \
            and getattr(model, "pos_type", "") == "relative":
        from cassnat_asr_public_tpu.kernels.conformer_layer import \
            fused_encode_ctc
        return fused_encode_ctc(model, params, feats, src_mask,
                                qblocked=(use_megakernel == "qblocked"))
    return model.apply(params, feats, src_mask, method="encode_ctc")


def _row_hashes(rows, lens):
    """Two independent 32-bit universal hashes of integer rows + lengths.

    rows: (N, T) int; lens: (N,) int. A collision requires both 32-bit
    hashes AND the mixed-in length to agree — negligible at ESA candidate
    counts. Used for exact duplicate detection of alignment / token rows.
    """
    t = rows.shape[1]
    r1 = jax.random.randint(jax.random.PRNGKey(0xC0FFEE), (t,),
                            0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
    r2 = jax.random.randint(jax.random.PRNGKey(0xBEEF), (t,),
                            0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
    u = rows.astype(jnp.uint32)
    h1 = (u * r1[None, :]).sum(-1) * jnp.uint32(2654435761) \
        + lens.astype(jnp.uint32)
    h2 = (u * r2[None, :]).sum(-1) * jnp.uint32(40503) \
        + lens.astype(jnp.uint32)
    return h1, h2


def _group_dedup(h1, h2, bs, n_cand):
    """Per-utterance duplicate marking from row hashes.

    Returns (is_dup (B, S) bool — True where an earlier row in the same
    utterance group has identical hashes, n_unique (B,) int32).
    """
    g1 = h1.reshape(bs, n_cand)
    g2 = h2.reshape(bs, n_cand)
    eq = (g1[:, :, None] == g1[:, None, :]) & \
         (g2[:, :, None] == g2[:, None, :])
    rep = jnp.argmax(eq, axis=-1)  # first occurrence index per row
    is_dup = rep != jnp.arange(n_cand)[None, :]
    return is_dup, (~is_dup).sum(-1).astype(jnp.int32)


def _nat_confidence(att_out, att_pred, slot_valid, fast_logits):
    """Mean per-token log-prob of the NAT argmax tokens (the model's own
    candidate confidence; reference ranks with this when no external rank
    model is configured, cassnat.py:505-511). With fast_logits, att_out
    are raw logits and log-probs are logit - logsumexp."""
    own = jnp.take_along_axis(att_out, att_pred[..., None],
                              axis=-1)[..., 0].astype(jnp.float32)
    if fast_logits:
        own = own - jax.nn.logsumexp(att_out.astype(jnp.float32), axis=-1)
    own = jnp.where(slot_valid, own, 0.0)
    return own.sum(-1) / jnp.maximum(slot_valid.sum(-1), 1)


@partial(jax.jit, static_argnames=("model", "umax", "sample_num",
                                  "rank_model", "threshold", "lm_apply",
                                  "beam_width", "lm_weight", "align",
                                  "lm_model", "esa_topk",
                                  "lm_apply_logits", "dedup_align",
                                  "dedup_rank", "use_megakernel",
                                  "rank_topm", "return_margin"))
def nat_decode_jit(model, params, feats, src_mask, rng, umax: int,
                   sample_num: int = 1, threshold: float = 0.9,
                   rank_model: str = "none",
                   lm_apply: Optional[Callable] = None,
                   lm_params=None, beam_width: int = 1,
                   lm_weight: float = 0.0, align: str = "best_path",
                   labels=None, label_sizes=None,
                   ext_shift=None, ext_ylen=None, lm_model=None,
                   text_input=None, text_mask=None, esa_topk: int = 0,
                   lm_apply_logits: bool = False, dedup_align: int = 0,
                   dedup_rank: int = 0, pre_enc=None,
                   use_megakernel: bool = False, rank_topm: int = 0,
                   return_margin: bool = False):
    """Single-pass NAT decode, optionally with ESA sampling + ranking.

    Returns dict(tokens (B, umax), lengths (B,)) — argmax tokens per slot up
    to the predicted length (eos slot excluded).

    align: 'best_path' (ESA sampling when sample_num>1) | 'oracle' (Viterbi
    against provided labels; reference decode_type oracle_att,
    cassnat.py:449-450) | 'external' (precomputed aligned_seq_shift/ylen,
    e.g. from CTC-beam hypotheses; reference beam_path_align
    cassnat.py:391-414).

    rank_model: 'none' | 'lm' | 'at_baseline' — ESA candidate ranking
    (reference: cassnat.py:499-573). lm_apply has the uniform signature
    lm_apply(lm_params, tokens, feats, src_mask) -> (N, L, V) log-probs; the
    'lm' flavor ignores feats/src_mask, 'at_baseline' runs the AST decoder
    over its own encoding of the same utterances.

    ESA candidate dedup (TPU-native; the reference ranks all sample_num
    candidates incl. exact duplicates, cassnat.py:441-573):
      dedup_align > 0: duplicate sampled ALIGNMENTS — identical
        (shift, ylen) rows, which produce bit-identical NAT outputs — are
        pushed behind the uniques (ordered densest-first by CTC path score)
        and only the first `dedup_align` rows per utterance reach the NAT
        decoder. Output is provably identical to the undeduped decode
        whenever dedup_align >= max per-utterance unique count (reported as
        `n_unique_align`); below that it degrades gracefully into
        density-topk (the argmax row always survives).
      dedup_rank > 0 (with rank_model lm/at_baseline/host): duplicate NAT
        OUTPUT token sequences — identical (att_pred, ylen) rows, which get
        identical rank scores, and whose winner's output tokens are shared
        by every group member — are deduped the same way before the rank
        model runs; `n_unique_rank` is reported. Exact under the same
        cap condition.

    rank_topm > 0 (with rank_model lm/at_baseline; TPU-native extension,
    default off): two-stage ranking — the NAT model's own confidence
    (mean per-token log-prob, the reference's no-rank-model score,
    cassnat.py:505-511) prescreens candidates and only the top
    `rank_topm` per utterance reach the external rank model. Cuts the
    rank-model batch n_cand/rank_topm-fold; changes output when the rank
    model would have preferred a candidate outside the NAT's own top-M.
    WER-measured on the trained parity task (WER_PARITY.md): dominated by
    esa_topk at equal cost there, hence default-off.
    """
    bs = feats.shape[0]
    if pre_enc is None:
        enc_h, enc_mask, ctc_out = _encode_ctc(model, params, feats,
                                               src_mask, use_megakernel)
    else:
        # two-phase decoding: the driver already ran the encoder (via
        # esa_align_jit) and picked umax / candidate buckets from the
        # alignment lengths; don't run it twice.
        enc_h, enc_mask, ctc_out = pre_enc

    enc_mask_1x = enc_mask
    n_cand = sample_num  # candidate rows per utterance after alignment
    if align == "oracle":
        from cassnat_asr_public_tpu.ops.ctc import ctc_viterbi_align
        if sample_num > 1:
            ctc_out = _repeat_batch(ctc_out, sample_num)
            enc_mask = _repeat_batch(enc_mask, sample_num)
        shift, _ = ctc_viterbi_align(ctc_out, labels, enc_mask.sum(-1),
                                     label_sizes)
        ylen0 = label_sizes
    elif align == "external":
        if sample_num > 1:
            enc_mask = _repeat_batch(enc_mask, sample_num)
        shift, ylen0 = ext_shift, ext_ylen
    elif sample_num > 1:
        # sampled ESA alignments from the UNEXPANDED posteriors: only the
        # per-frame top-2 is replicated sample_num-fold (the (B,T,V) repeat
        # + expanded top_k measured 745 ms of the ~1 s ESA iteration;
        # benchmarks/esa_stage_bench.py).
        from cassnat_asr_public_tpu.ops.ctc import ctc_sampled_align
        if (dedup_align and dedup_align < sample_num
                and esa_topk and esa_topk < sample_num):
            # both are pre-NAT candidate caps with different selection
            # semantics (unique-first vs top-path-score); composing them
            # silently would make one a no-op — make the conflict loud
            raise ValueError(
                "esa_dedup and esa_topk are mutually exclusive candidate "
                "preselections; set only one")
        if dedup_align and dedup_align < sample_num:
            # Stage-1 dedup: identical alignments -> identical NAT outputs;
            # run the NAT decoder once per unique alignment.
            shift, ylen0, psc = ctc_sampled_align(
                ctc_out, enc_mask_1x, sample_num, threshold=threshold,
                rng=rng, return_scores=True)
            h1, h2 = _row_hashes(shift, ylen0)
            is_dup, n_unique_align = _group_dedup(h1, h2, bs, sample_num)
            # uniques first (densest-first within each class); duplicates
            # trail and are cut by the cap. |psc| <= T*|log p| << 1e30.
            key = is_dup.astype(jnp.float32) * 1e30 \
                - psc.reshape(bs, sample_num)
            order = jnp.argsort(key, axis=-1)
            sel = order[:, :dedup_align]
            flat = (jnp.arange(bs)[:, None] * sample_num + sel).reshape(-1)
            shift, ylen0 = shift[flat], ylen0[flat]
            n_cand = dedup_align
        elif esa_topk and esa_topk < sample_num:
            # TPU-native EXTENSION (default off): preselect the esa_topk
            # highest-CTC-path-probability sampled alignments per utterance
            # before the expensive NAT + rank passes. The argmax candidate
            # always survives (it maximizes the path score), so this only
            # prunes low-density samples the rank model rarely prefers.
            shift, ylen0, psc = ctc_sampled_align(
                ctc_out, enc_mask_1x, sample_num, threshold=threshold,
                rng=rng, return_scores=True)
            idx = jax.lax.top_k(psc.reshape(bs, sample_num), esa_topk)[1]
            flat = (jnp.arange(bs)[:, None] * sample_num + idx).reshape(-1)
            shift, ylen0 = shift[flat], ylen0[flat]
            n_cand = esa_topk
        else:
            shift, ylen0 = ctc_sampled_align(ctc_out, enc_mask_1x,
                                             sample_num,
                                             threshold=threshold, rng=rng)
        enc_mask = _repeat_batch(enc_mask, n_cand)
    else:
        shift, ylen0 = ctc_best_path_align(ctc_out, enc_mask)
    if n_cand > 1:
        enc_h = _repeat_batch(enc_h, n_cand)
    nat_kwargs = {}
    if text_input is not None:
        # host-retokenized text (LMNAT gpt2/bert flavors): one row per
        # utterance, repeated across ESA candidates
        # (reference: lmnat.py:523-525)
        if n_cand > 1 and text_input.shape[0] == bs:
            text_input = _repeat_batch(text_input, n_cand)
            text_mask = _repeat_batch(text_mask, n_cand)
        nat_kwargs = {"text_input": text_input, "text_mask": text_mask}
    elif n_cand > 1 and not getattr(model, "use_esa_for_text_encoder", True):
        # device-lm text built once per utterance from its first candidate
        # and tiled over the ESA expansion (reference: lmnat2.py:485-516
        # use_esa_for_text_encoder=0)
        nat_kwargs = {"text_stride": n_cand}
    # Fast path: when neither per-position beam nor LM fusion needs the
    # full normalized distribution, fetch raw logits — argmax is identical
    # and per-token log-probs are logit - logsumexp; skipping the (N,U,V)
    # f32 log-softmax materialization saves ~8 ms at ESA shapes
    # (benchmarks/nat_microbench.py).
    fast_logits = beam_width == 1 and lm_weight == 0
    if fast_logits:
        nat_kwargs["return_logits"] = True
    att_out, ylen = model.apply(params, enc_h, enc_mask, shift, ylen0, umax,
                                method="nat_decode", **nat_kwargs)
    # token slots: positions < ylen-1 are tokens, slot ylen-1 is EOS.
    n = att_out.shape[0]
    att_pred = att_out.argmax(-1)  # (N, umax)
    slot_valid = jnp.arange(umax)[None, :] < (ylen - 1)[:, None]

    stats = {}
    if align not in ("oracle", "external") and sample_num > 1 \
            and dedup_align and dedup_align < sample_num:
        stats["n_unique_align"] = n_unique_align
    if n_cand > 1:
        if dedup_rank and dedup_rank < n_cand and \
                rank_model in ("lm", "at_baseline", "host"):
            # Stage-2 dedup: candidates whose NAT OUTPUT token sequences
            # coincide get identical rank scores, and the winning group's
            # output tokens are shared by every member — rank one
            # representative per unique sequence.
            toks_masked = jnp.where(slot_valid, att_pred, 0)
            th1, th2 = _row_hashes(toks_masked, ylen)
            is_dup_r, n_unique_rank = _group_dedup(th1, th2, bs, n_cand)
            stats["n_unique_rank"] = n_unique_rank
            order_r = jnp.argsort(is_dup_r.astype(jnp.int32), axis=-1,
                                  stable=True)
            sel_r = order_r[:, :dedup_rank]
            flat_r = (jnp.arange(bs)[:, None] * n_cand + sel_r).reshape(-1)
            att_pred = att_pred[flat_r]
            att_out = att_out[flat_r]
            ylen = ylen[flat_r]
            n_cand = dedup_rank
            n = bs * n_cand
            slot_valid = jnp.arange(umax)[None, :] < (ylen - 1)[:, None]
        if rank_model == "host":
            # Host-side ranking (n-gram ARPA scorer): hand all candidates
            # back; the task detokenizes and ranks them on host
            # (reference: cassnat.py:521-533 scores kenlm on word strings).
            return {
                "cand_tokens": jnp.where(slot_valid, att_pred,
                                         0).reshape(bs, n_cand, umax),
                "cand_lengths": jnp.maximum(ylen - 1,
                                            0).reshape(bs, n_cand),
                **stats,
            }
        if rank_model in ("lm", "at_baseline") and rank_topm \
                and rank_topm < n_cand:
            # Two-stage ranking: NAT-confidence prescreen, external rank
            # model only on the top-M candidates per utterance.
            conf = _nat_confidence(att_out, att_pred, slot_valid,
                                   fast_logits)
            idx_m = jax.lax.top_k(conf.reshape(bs, n_cand), rank_topm)[1]
            flat_m = (jnp.arange(bs)[:, None] * n_cand + idx_m).reshape(-1)
            att_pred = att_pred[flat_m]
            att_out = att_out[flat_m]
            ylen = ylen[flat_m]
            n_cand = rank_topm
            n = bs * n_cand
            slot_valid = jnp.arange(umax)[None, :] < (ylen - 1)[:, None]
        if rank_model in ("lm", "at_baseline"):
            sos = jnp.ones((n, 1), att_pred.dtype)
            lm_input = jnp.concatenate([sos, att_pred[:, :-1]], axis=1)
            feats_rep = _repeat_batch(feats, n_cand)
            mask_rep = _repeat_batch(src_mask, n_cand)
            lm_out = lm_apply(lm_params, lm_input, feats_rep,
                              mask_rep)  # (N, umax, V)
            tok_scores = jnp.take_along_axis(
                lm_out, att_pred[..., None], axis=-1)[..., 0]
            if lm_apply_logits:
                # lm_apply returned raw logits: per-token log-prob is
                # logit - logsumexp (skips the vocab-wide log-softmax)
                tok_scores = tok_scores.astype(jnp.float32) - \
                    jax.nn.logsumexp(lm_out.astype(jnp.float32), axis=-1)
            # Rank over slots < ylen: the real tokens PLUS the EOS slot.
            # The reference's tgt_mask1 keeps position ylen-1 (the EOS
            # slot: scatter(ylen-1, 0).cumprod.scatter(ylen-1, 1),
            # cassnat.py:478-480) and its rank mean divides by the nonzero
            # count (cassnat.py:518-519), so the LM's log P(eos | tokens)
            # is part of every candidate's score. Excluding it let
            # tail-truncated candidates ("...e" vs "...ee") escape the
            # end-of-sentence penalty — the systematic +0.12 WER gap on
            # the hard variant (all 5 repo-vs-torch disagreements were
            # utterance-final token drops; esa_gap_diag_hard.json).
            rank_valid = jnp.arange(umax)[None, :] < ylen[:, None]
            tok_scores = jnp.where(rank_valid, tok_scores, 0.0)
            denom = jnp.maximum(rank_valid.sum(-1), 1)
            cand_score = tok_scores.sum(-1) / denom  # (N,)
        else:
            # rank by the NAT model's own confidence (logits path computes
            # per-token log-prob as logit - logsumexp, no V-normalization)
            cand_score = _nat_confidence(att_out, att_pred, slot_valid,
                                         fast_logits)
        cand_score = cand_score.reshape(bs, n_cand)
        if return_margin:
            # Per-utterance ranking margin (confidence-gated escalation,
            # VERDICT r4 item 2c): top1-top2 rank-score gap over DISTINCT
            # candidate outputs — duplicate sequences carry identical
            # scores and would fake a zero margin, so they're masked out.
            # A single-unique utterance gets +inf margin (never escalate).
            toks_m = jnp.where(slot_valid, att_pred, 0)
            mh1, mh2 = _row_hashes(toks_m, ylen)
            is_dup_m, _ = _group_dedup(mh1, mh2, bs, n_cand)
            sc = jnp.where(is_dup_m, -jnp.inf, cand_score)
            top2sc = jax.lax.top_k(sc, 2)[0]          # (B, 2)
            stats["esa_margin"] = jnp.where(
                jnp.isfinite(top2sc[:, 1]),
                top2sc[:, 0] - top2sc[:, 1], jnp.inf)
        best = cand_score.argmax(-1)  # (B,)
        att_pred = att_pred.reshape(bs, n_cand, umax)[
            jnp.arange(bs), best]
        att_out_sel = att_out.reshape(bs, n_cand, umax, -1)[
            jnp.arange(bs), best]
        ylen = ylen.reshape(bs, n_cand)[jnp.arange(bs), best]
        slot_valid = jnp.arange(umax)[None, :] < (ylen - 1)[:, None]
    else:
        att_out_sel = att_out

    if beam_width > 1:
        # per-position beam with KV-cached LM fusion
        # (reference: cassnat.py:574-637)
        out = nat_position_beam(att_out_sel, ylen, lm_model, lm_params,
                                beam_width=beam_width, lm_weight=lm_weight)
        out.update(stats)
        return out

    if lm_weight > 0 and lm_apply is not None:
        sos = jnp.ones((att_pred.shape[0], 1), att_pred.dtype)
        lm_input = jnp.concatenate([sos, att_pred[:, :-1]], axis=1)
        lm_out = lm_apply(lm_params, lm_input, feats, src_mask)
        if lm_apply_logits:
            # lm_apply returned raw logits; fusion must combine log-prob
            # scales (ADVICE r2) — normalize over the vocab first.
            lm_out = jax.nn.log_softmax(lm_out.astype(jnp.float32), axis=-1)
        fused = att_out_sel + lm_weight * lm_out
        att_pred = fused.argmax(-1)

    tokens = jnp.where(slot_valid, att_pred, 0)
    return {"tokens": tokens, "lengths": jnp.maximum(ylen - 1, 0), **stats}


@partial(jax.jit, static_argnames=("model", "sample_num", "threshold",
                                   "use_megakernel"))
def esa_align_jit(model, params, feats, src_mask, rng, sample_num: int,
                  threshold: float = 0.9, use_megakernel: bool = False):
    """Phase 1 of the two-phase ESA decode: encoder + CTC head + sampled
    alignments + per-candidate row hashes.

    The driver pulls ONLY the tiny per-candidate metadata (ylen, hashes,
    path scores: 4 x (B*S,) scalars) to host, picks the umax and
    candidate-count buckets for THIS batch (exact dedup at the true
    per-batch unique count, output-slot budget at the true max length),
    gathers the kept alignment rows on device, and calls nat_decode_jit
    with align='external' and pre_enc set — the encoder runs once.

    The reference's dynamic torch shapes did this implicitly
    (ymax = ylen.max().item(), cassnat.py:479); under XLA this bucketing
    is the static-shape equivalent.
    """
    enc_h, enc_mask, ctc_out = _encode_ctc(model, params, feats, src_mask,
                                           use_megakernel)
    from cassnat_asr_public_tpu.ops.ctc import ctc_sampled_align
    shift, ylen, psc = ctc_sampled_align(ctc_out, enc_mask, sample_num,
                                         threshold=threshold, rng=rng,
                                         return_scores=True)
    h1, h2 = _row_hashes(shift, ylen)
    return {"enc_h": enc_h, "enc_mask": enc_mask, "ctc_out": ctc_out,
            "shift": shift, "ylen": ylen, "path_score": psc,
            "h1": h1, "h2": h2}


def select_unique_candidates(ylen, h1, h2, path_score, bs, sample_num,
                             bucket=8):
    """Host-side phase-1 -> phase-2 bucket selection (two-phase ESA).

    Returns (kept (B, C) flat row indices — every unique alignment per
    utterance, densest first, padded by repeating the densest row — and
    umax_b = max alignment length + 2). C is the per-batch max unique
    count rounded up to 8 (compile-shape bucketing). Exact: padding rows
    are bit-identical duplicates of kept rows, so ranking over the kept
    set reproduces ranking over all sample_num candidates.
    """
    ylen = np.asarray(ylen).reshape(bs, sample_num)
    h1 = np.asarray(h1).reshape(bs, sample_num)
    h2 = np.asarray(h2).reshape(bs, sample_num)
    psc = np.asarray(path_score).reshape(bs, sample_num)
    keep_rows, max_unique = [], 1
    for b in range(bs):
        seen = {}
        for j in range(sample_num):
            key = (int(h1[b, j]), int(h2[b, j]), int(ylen[b, j]))
            if key not in seen:
                seen[key] = j
        uniq = sorted(seen.values(), key=lambda j: -psc[b, j])
        max_unique = max(max_unique, len(uniq))
        keep_rows.append(uniq)
    c = min(-(-max_unique // bucket) * bucket, sample_num)
    kept = np.zeros((bs, c), np.int64)
    for b, uniq in enumerate(keep_rows):
        row = (uniq + [uniq[0]] * c)[:c]
        kept[b] = [b * sample_num + j for j in row]
    return kept, int(ylen.max()) + 2


@partial(jax.jit, static_argnames=("model", "use_megakernel"))
def ctc_greedy_decode_jit(model, params, feats, src_mask,
                          use_megakernel: bool = False):
    """Collapsed greedy CTC decode via the model's encoder."""
    _, enc_mask, ctc_out = _encode_ctc(model, params, feats, src_mask,
                                       use_megakernel)
    toks, lens = ctc_greedy_collapse(ctc_out, enc_mask)
    return {"tokens": toks, "lengths": lens}


@partial(jax.jit, static_argnames=("model", "umax", "lm_apply", "lm_weight",
                                   "sos", "eos", "beam_width", "lm_model",
                                   "lm_apply_logits"))
def ctc_correct_decode_jit(model, params, feats, src_mask, umax: int,
                           lm_apply: Optional[Callable] = None,
                           lm_params=None, lm_weight: float = 0.0,
                           sos: int = 1, eos: int = 2,
                           beam_width: int = 1, lm_model=None,
                           lm_apply_logits: bool = False):
    """"CTC correction" decode: feed the collapsed CTC greedy path to the AR
    decoder in ONE pass, then a per-position beam (+ optional LM fusion).

    (reference: src/models/transformer.py:243-342 fast_decode_with_ctc —
    the single corrective decoder pass at :243-304, then the per-position
    beam with LM at :305-342. With beam_width > 1 the beam shares
    `nat_position_beam` — a `lax.fori_loop` over positions with the fusion
    LM advanced through its KV cache — instead of the reference's Python
    hypothesis lists; beam_width 1 keeps the vectorized argmax (+shallow
    fusion) path.)
    """
    enc_h, enc_mask, ctc_out = model.apply(params, feats, src_mask,
                                           method="encode_ctc")
    hyp, lens = ctc_greedy_collapse(ctc_out, enc_mask)  # (B, T'), (B,)
    hyp = hyp[:, :umax - 1]
    lens = jnp.minimum(lens, umax - 1)
    bs = hyp.shape[0]
    tgt_in = jnp.concatenate(
        [jnp.full((bs, 1), sos, hyp.dtype), hyp], axis=1)[:, :umax]
    u = tgt_in.shape[1]  # min(T'+1, umax): T' can undershoot the cap
    att_out = model.apply(params, enc_h, enc_mask, tgt_in,
                          method="forward_att_scores")  # (B, u, V)
    if beam_width > 1:
        # per-position beam over the corrective posteriors with KV-cached
        # LM fusion. Positions 0..lens INCLUSIVE are live (the reference
        # beams while i <= length[b] and keeps a non-eos token emitted in
        # the eos slot; reference: transformer.py:284-342), so the beam
        # sees lens+1 token slots.
        return nat_position_beam(att_out, lens + 2, lm_model, lm_params,
                                 beam_width=beam_width,
                                 lm_weight=lm_weight, sos=sos, eos=eos)
    if lm_apply is not None and lm_weight > 0:
        lm_out = lm_apply(lm_params, tgt_in, feats, src_mask)
        if lm_apply_logits:
            lm_out = jax.nn.log_softmax(lm_out.astype(jnp.float32), axis=-1)
        att_out = att_out + lm_weight * lm_out
    pred = att_out.argmax(-1)
    valid = jnp.arange(u)[None, :] <= lens[:, None]  # +1 slot for eos
    pred = jnp.where(valid & (pred != eos), pred, 0)
    out_len = (pred != 0).sum(-1)
    return {"tokens": pred, "lengths": out_len}


@partial(jax.jit, static_argnames=("lm_model", "beam_width", "lm_weight",
                                   "sos", "eos"))
def nat_position_beam(att_out, ylen, lm_model=None, lm_params=None,
                      beam_width: int = 4, lm_weight: float = 0.0,
                      sos: int = 1, eos: int = 2):
    """Per-position beam over the NAT output posteriors with optional
    KV-cached LM fusion.

    The NAT decoder emits all positions at once; the reference then runs a
    small per-position beam where each hypothesis accumulates
    att_logp[i, tok] + lm_weight * lm_logp(tok | prefix)
    (reference: cassnat.py:574-637, Python hypothesis lists). Here it is a
    `lax.fori_loop` over positions with (B, K) beams and the LM advanced by
    its KV cache.

    att_out: (B, U, V) log-probs; ylen: (B,) slots incl the EOS slot.
    Returns dict(tokens (B, U), lengths (B,)).
    """
    bs, umax, vocab = att_out.shape
    k = beam_width
    n = bs * k
    use_lm = lm_model is not None and lm_weight > 0

    ys0 = jnp.zeros((bs, k, umax), jnp.int32)
    scores0 = jnp.full((bs, k), LOG_ZERO).at[:, 0].set(0.0)
    if use_lm:
        cache0 = lm_model.apply(lm_params, n, umax + 1, method="init_cache")
        last0 = jnp.full((n,), sos, jnp.int32)
    else:
        cache0, last0 = None, None

    def step(i, carry):
        ys, scores, cache, last = carry
        local = att_out[:, i]  # (B, V)
        if use_lm:
            lm_logp, cache = lm_model.apply(lm_params, last, cache, i,
                                            method="score_step")
            local = local[:, None, :] + lm_weight * lm_logp.reshape(bs, k,
                                                                    vocab)
        else:
            local = jnp.broadcast_to(local[:, None, :], (bs, k, vocab))
        active = (i < (ylen - 1))[:, None, None]  # token slots only
        # inactive rows: freeze by forcing candidate 0 at score 0
        freeze = (jnp.arange(vocab) == 0)[None, None, :]
        local = jnp.where(active, local,
                          jnp.where(freeze, 0.0, LOG_ZERO))
        total = scores[:, :, None] + local
        _, top_idx = jax.lax.top_k(total.reshape(bs, k * vocab), k)
        parent = top_idx // vocab
        token = (top_idx % vocab).astype(jnp.int32)
        scores = jnp.take_along_axis(total.reshape(bs, k * vocab), top_idx,
                                     axis=1)
        ys = jnp.take_along_axis(ys, parent[:, :, None], axis=1)
        ys = ys.at[:, :, i].set(jnp.where(active[:, :, 0], token, 0))
        if use_lm:
            def reorder(c):
                cb = c.reshape(bs, k, *c.shape[1:])
                cb = jnp.take_along_axis(
                    cb, parent.reshape(bs, k, *([1] * (cb.ndim - 2))), axis=1)
                return cb.reshape(n, *c.shape[1:])
            cache = jax.tree_util.tree_map(reorder, cache)
            last = jnp.where((i < (ylen - 1))[:, None],
                             ys[:, :, i], sos).reshape(n)
        return ys, scores, cache, last

    ys, scores, _, _ = jax.lax.fori_loop(
        0, umax, step, (ys0, scores0, cache0, last0))
    best = scores.argmax(-1)
    tokens = ys[jnp.arange(bs), best]
    valid = jnp.arange(umax)[None, :] < (ylen - 1)[:, None]
    tokens = jnp.where(valid & (tokens != eos), tokens, 0)
    return {"tokens": tokens, "lengths": jnp.maximum(ylen - 1, 0)}


# ---------------------------------------------------------------------------
# AR beam search with CTC joint scoring + LM shallow fusion
# ---------------------------------------------------------------------------


class BeamState(NamedTuple):
    ys: jnp.ndarray          # (B, K, L) token prefixes (sos at 0)
    scores: jnp.ndarray      # (B, K) accumulated scores
    lengths: jnp.ndarray     # (B, K) prefix length incl sos
    finished: jnp.ndarray    # (B, K) bool
    ctc_r: jnp.ndarray       # (B, K, T, 2) prefix-scorer states
    ctc_score: jnp.ndarray   # (B, K) previous CTC prefix score


@partial(jax.jit, static_argnames=("model", "beam_width", "ctc_beam",
                                   "max_steps", "lm_apply", "ctc_weight",
                                   "lm_weight", "length_penalty",
                                   "temperature", "sos", "eos", "blank"))
def ar_beam_decode_jit(model, params, feats, src_mask,
                       beam_width: int = 20, ctc_beam: int = 30,
                       ctc_weight: float = 0.4, lm_weight: float = 0.0,
                       length_penalty: float = 0.0, max_steps: int = 120,
                       lm_apply: Optional[Callable] = None, lm_params=None,
                       temperature: float = 1.0,
                       sos: int = 1, eos: int = 2, blank: int = 0):
    """Vectorized label-synchronous beam search.

    Joint score per reference (transformer.py:198-212):
      local = ctc_weight*(ctc_psi - ctc_prev) + (1-ctc_weight)*att_logp
            + lm_weight*lm_logp
    with hypotheses ranked by score + (len-1)*length_penalty.

    Returns dict(tokens (B, max_steps), lengths (B,), scores (B,)) for the
    best hypothesis per utterance.
    """
    bs = feats.shape[0]
    k, w = beam_width, ctc_beam
    use_ctc = ctc_weight > 0

    enc_h, enc_mask, ctc_out = model.apply(params, feats, src_mask,
                                           method="encode_ctc")
    tmax = ctc_out.shape[1]
    ctc_m = mask_ctc_out(ctc_out, enc_mask, blank)
    r0 = initial_state(ctc_m, blank)

    lmax = max_steps + 1
    ys0 = jnp.full((bs, k, lmax), blank, jnp.int32).at[:, :, 0].set(sos)
    scores0 = jnp.full((bs, k), LOG_ZERO).at[:, 0].set(0.0)
    state = BeamState(
        ys=ys0,
        scores=scores0,
        lengths=jnp.ones((bs, k), jnp.int32),
        finished=jnp.zeros((bs, k), bool),
        ctc_r=jnp.broadcast_to(r0[:, None], (bs, k, tmax, 2)),
        ctc_score=jnp.zeros((bs, k)),
    )

    enc_flat = _repeat_batch(enc_h, k)          # (B*K, T, D)
    mask_flat = _repeat_batch(enc_mask, k)
    ctc_flat = _repeat_batch(ctc_m, k)

    def step(i, state):
        n = bs * k
        ys_flat = state.ys.reshape(n, lmax)
        att_logp = model.apply(params, enc_flat, mask_flat, ys_flat,
                               temperature, method="decoder_logprobs")
        # (the decoder reads the last valid position of each prefix)
        if lm_apply is not None and lm_weight > 0:
            lm_full = lm_apply(lm_params, ys_flat)  # (N, L, V)
            lm_logp = jnp.take_along_axis(
                lm_full, (state.lengths.reshape(n) - 1)[:, None, None]
                .repeat(lm_full.shape[-1], -1), axis=1)[:, 0]
        else:
            lm_logp = None

        if use_ctc:
            att_top, cand = jax.lax.top_k(att_logp, w)  # (N, W)
            y_last = jnp.take_along_axis(
                ys_flat, (state.lengths.reshape(n) - 1)[:, None],
                axis=1)[:, 0]
            psi, r_new = prefix_score_step(
                ctc_flat, cand, y_last, state.ctc_r.reshape(n, tmax, 2),
                is_empty_prefix=(state.lengths.reshape(n) == 1),
                blank=blank, eos=eos)
            local = ctc_weight * (psi - state.ctc_score.reshape(n)[:, None]) \
                + (1 - ctc_weight) * att_top
            if lm_logp is not None:
                local = local + lm_weight * jnp.take_along_axis(
                    lm_logp, cand, axis=1)
            new_ctc_score = psi
        else:
            local = att_logp + (lm_weight * lm_logp
                                if lm_logp is not None else 0.0)
            cand = jnp.broadcast_to(
                jnp.arange(local.shape[1])[None], local.shape)
            r_new = None
            new_ctc_score = None

        wdim = local.shape[1]
        local = local.reshape(bs, k, wdim)
        cand = cand.reshape(bs, k, wdim)

        # Finished beams contribute exactly one "stay" candidate: force
        # candidate 0 = eos with local score 0 and the rest to -inf.
        fin = state.finished[:, :, None]
        is_first = (jnp.arange(wdim) == 0)[None, None, :]
        local = jnp.where(fin, jnp.where(is_first, 0.0, LOG_ZERO), local)
        cand = jnp.where(fin & is_first, eos, cand)

        total = state.scores[:, :, None] + local  # (B, K, W)
        # Rank with length penalty: finished beams keep their length.
        new_len = jnp.where(state.finished, state.lengths,
                            state.lengths + 1)[:, :, None]
        rank_key = total + length_penalty * (new_len.astype(total.dtype) - 1)
        flat_rank = rank_key.reshape(bs, k * wdim)
        _, top_idx = jax.lax.top_k(flat_rank, k)  # (B, K)
        parent = top_idx // wdim
        cand_idx = top_idx % wdim

        def gather_parent(x):
            return jnp.take_along_axis(
                x, parent.reshape(bs, k, *([1] * (x.ndim - 2))), axis=1)

        new_scores = jnp.take_along_axis(
            total.reshape(bs, k * wdim), top_idx, axis=1)
        token = jnp.take_along_axis(
            cand.reshape(bs, k * wdim), top_idx, axis=1)  # (B, K)
        old_fin = jnp.take_along_axis(state.finished, parent, axis=1)
        old_len = jnp.take_along_axis(state.lengths, parent, axis=1)

        ys = gather_parent(state.ys)
        ys = jnp.where(
            (jnp.arange(lmax)[None, None, :] == old_len[:, :, None])
            & ~old_fin[:, :, None],
            token[:, :, None], ys)
        new_lengths = jnp.where(old_fin, old_len, old_len + 1)
        new_finished = old_fin | (token == eos)

        if use_ctc:
            r_new = r_new.reshape(bs, k, wdim, tmax, 2)
            ctc_r = gather_parent(r_new.reshape(bs, k, wdim * tmax * 2)) \
                .reshape(bs, k, wdim, tmax, 2)
            ctc_r = jnp.take_along_axis(
                ctc_r, cand_idx[:, :, None, None, None], axis=2)[:, :, 0]
            new_cs = jnp.take_along_axis(
                new_ctc_score.reshape(bs, k, wdim), parent[:, :, None],
                axis=1)
            new_cs = jnp.take_along_axis(new_cs, cand_idx[:, :, None],
                                         axis=2)[:, :, 0]
            old_ctc_r = gather_parent(state.ctc_r)
            old_cs = jnp.take_along_axis(state.ctc_score, parent, axis=1)
            ctc_r = jnp.where(old_fin[:, :, None, None], old_ctc_r, ctc_r)
            new_cs = jnp.where(old_fin, old_cs, new_cs)
        else:
            ctc_r = state.ctc_r
            new_cs = state.ctc_score

        return BeamState(ys, new_scores, new_lengths, new_finished,
                         ctc_r, new_cs)

    state = jax.lax.fori_loop(0, max_steps, step, state)

    final_key = state.scores + length_penalty * \
        (state.lengths.astype(state.scores.dtype) - 1)
    best = final_key.argmax(-1)  # (B,)
    ys = state.ys[jnp.arange(bs), best]  # (B, L)
    lengths = state.lengths[jnp.arange(bs), best]
    # strip sos; mask everything at/after eos
    hyp = ys[:, 1:]
    pos = jnp.arange(hyp.shape[1])[None, :]
    valid = pos < (lengths - 1)[:, None]
    hyp = jnp.where(valid & (hyp != eos), hyp, 0)
    hyp_len = (jnp.where(valid, hyp, 0) != 0).sum(-1)
    return {"tokens": hyp, "lengths": hyp_len,
            "scores": state.scores[jnp.arange(bs), best]}


@partial(jax.jit, static_argnames=("model", "beam_width", "ctc_beam",
                                   "max_steps", "lm_apply", "ctc_weight",
                                   "lm_weight", "length_penalty",
                                   "temperature", "sos", "eos", "blank",
                                   "lm_model"))
def ar_beam_decode_cached_jit(model, params, feats, src_mask,
                              beam_width: int = 20, ctc_beam: int = 30,
                              ctc_weight: float = 0.4,
                              lm_weight: float = 0.0,
                              length_penalty: float = 0.0,
                              max_steps: int = 120,
                              lm_apply: Optional[Callable] = None,
                              lm_params=None, temperature: float = 1.0,
                              sos: int = 1, eos: int = 2, blank: int = 0,
                              lm_model=None):
    """KV-cached label-synchronous beam search.

    Same scoring as ar_beam_decode_jit, but the decoder runs ONE token per
    step against per-layer self-attention caches and precomputed cross
    K/V — O(L*(L+T)) instead of the reference's O(L^2*(L+T)) cache-less
    re-run (reference: transformer.py:188). The beam reorder gathers the
    caches by parent index each step.

    LM fusion: pass `lm_model` (a TransformerLM) to advance the fusion LM
    through its own KV cache one token per step (every unfinished beam grows
    by exactly one token per step, so a uniform write position is exact);
    `lm_apply` remains as the full-prefix fallback for other scorers.
    """
    bs = feats.shape[0]
    k, w = beam_width, ctc_beam
    use_ctc = ctc_weight > 0

    enc_h, enc_mask, ctc_out = model.apply(params, feats, src_mask,
                                           method="encode_ctc")
    tmax = ctc_out.shape[1]
    ctc_m = mask_ctc_out(ctc_out, enc_mask, blank)
    r0 = initial_state(ctc_m, blank)

    n = bs * k
    enc_flat = _repeat_batch(enc_h, k)
    mask_flat = _repeat_batch(enc_mask, k)
    ctc_flat = _repeat_batch(ctc_m, k)

    lmax = max_steps + 1
    cross_kvs, cache0 = model.apply(params, enc_flat, n, lmax,
                                    method="init_decode_state")
    use_cached_lm = lm_model is not None and lm_weight > 0
    lm_cache0 = lm_model.apply(lm_params, n, lmax,
                               method="init_cache") if use_cached_lm else None

    ys0 = jnp.full((bs, k, lmax), blank, jnp.int32).at[:, :, 0].set(sos)
    state = BeamState(
        ys=ys0,
        scores=jnp.full((bs, k), LOG_ZERO).at[:, 0].set(0.0),
        lengths=jnp.ones((bs, k), jnp.int32),
        finished=jnp.zeros((bs, k), bool),
        ctc_r=jnp.broadcast_to(r0[:, None], (bs, k, tmax, 2)),
        ctc_score=jnp.zeros((bs, k)),
    )

    def step(i, carry):
        state, cache, lm_cache = carry
        last_tok = jnp.take_along_axis(
            state.ys.reshape(n, lmax),
            jnp.clip(state.lengths.reshape(n) - 1, 0, lmax - 1)[:, None],
            axis=1)[:, 0]
        att_logp, cache = model.apply(
            params, last_tok, i, cache, cross_kvs, mask_flat, temperature,
            method="decoder_step")

        if use_cached_lm:
            # every unfinished beam's prefix has exactly i+1 tokens at step
            # i, so a shared write position is exact; finished beams' scores
            # are discarded below anyway
            lm_logp, lm_cache = lm_model.apply(lm_params, last_tok, lm_cache,
                                               i, method="score_step")
        elif lm_apply is not None and lm_weight > 0:
            lm_full = lm_apply(lm_params, state.ys.reshape(n, lmax))
            lm_logp = jnp.take_along_axis(
                lm_full, (state.lengths.reshape(n) - 1)[:, None, None]
                .repeat(lm_full.shape[-1], -1), axis=1)[:, 0]
        else:
            lm_logp = None

        if use_ctc:
            att_top, cand = jax.lax.top_k(att_logp, w)
            psi, r_new = prefix_score_step(
                ctc_flat, cand, last_tok, state.ctc_r.reshape(n, tmax, 2),
                is_empty_prefix=(state.lengths.reshape(n) == 1),
                blank=blank, eos=eos)
            local = ctc_weight * (psi - state.ctc_score.reshape(n)[:, None]) \
                + (1 - ctc_weight) * att_top
            if lm_logp is not None:
                local = local + lm_weight * jnp.take_along_axis(
                    lm_logp, cand, axis=1)
            new_ctc_score = psi
        else:
            local = att_logp + (lm_weight * lm_logp
                                if lm_logp is not None else 0.0)
            cand = jnp.broadcast_to(
                jnp.arange(local.shape[1])[None], local.shape)
            r_new, new_ctc_score = None, None

        wdim = local.shape[1]
        local = local.reshape(bs, k, wdim)
        cand = cand.reshape(bs, k, wdim)
        fin = state.finished[:, :, None]
        is_first = (jnp.arange(wdim) == 0)[None, None, :]
        local = jnp.where(fin, jnp.where(is_first, 0.0, LOG_ZERO), local)
        cand = jnp.where(fin & is_first, eos, cand)

        total = state.scores[:, :, None] + local
        new_len = jnp.where(state.finished, state.lengths,
                            state.lengths + 1)[:, :, None]
        rank_key = total + length_penalty * (new_len.astype(total.dtype) - 1)
        _, top_idx = jax.lax.top_k(rank_key.reshape(bs, k * wdim), k)
        parent = top_idx // wdim
        cand_idx = top_idx % wdim

        def gather_parent(x):
            return jnp.take_along_axis(
                x, parent.reshape(bs, k, *([1] * (x.ndim - 2))), axis=1)

        new_scores = jnp.take_along_axis(
            total.reshape(bs, k * wdim), top_idx, axis=1)
        token = jnp.take_along_axis(
            cand.reshape(bs, k * wdim), top_idx, axis=1)
        old_fin = jnp.take_along_axis(state.finished, parent, axis=1)
        old_len = jnp.take_along_axis(state.lengths, parent, axis=1)

        ys = gather_parent(state.ys)
        ys = jnp.where(
            (jnp.arange(lmax)[None, None, :] == old_len[:, :, None])
            & ~old_fin[:, :, None], token[:, :, None], ys)
        new_lengths = jnp.where(old_fin, old_len, old_len + 1)
        new_finished = old_fin | (token == eos)

        # reorder self-attn caches by parent beam
        def reorder(c):
            ck = c.reshape(bs, k, *c.shape[1:])
            ck = jnp.take_along_axis(
                ck, parent.reshape(bs, k, *([1] * (ck.ndim - 2))), axis=1)
            return ck.reshape(n, *c.shape[1:])

        cache = jax.tree_util.tree_map(reorder, cache)
        if use_cached_lm:
            lm_cache = jax.tree_util.tree_map(reorder, lm_cache)

        if use_ctc:
            r_new = r_new.reshape(bs, k, wdim, tmax, 2)
            ctc_r = gather_parent(r_new.reshape(bs, k, wdim * tmax * 2)) \
                .reshape(bs, k, wdim, tmax, 2)
            ctc_r = jnp.take_along_axis(
                ctc_r, cand_idx[:, :, None, None, None], axis=2)[:, :, 0]
            new_cs = jnp.take_along_axis(
                new_ctc_score.reshape(bs, k, wdim), parent[:, :, None],
                axis=1)
            new_cs = jnp.take_along_axis(new_cs, cand_idx[:, :, None],
                                         axis=2)[:, :, 0]
            old_ctc_r = gather_parent(state.ctc_r)
            old_cs = jnp.take_along_axis(state.ctc_score, parent, axis=1)
            ctc_r = jnp.where(old_fin[:, :, None, None], old_ctc_r, ctc_r)
            new_cs = jnp.where(old_fin, old_cs, new_cs)
        else:
            ctc_r, new_cs = state.ctc_r, state.ctc_score

        return (BeamState(ys, new_scores, new_lengths, new_finished,
                          ctc_r, new_cs), cache, lm_cache)

    state, _, _ = jax.lax.fori_loop(0, max_steps, step,
                                    (state, cache0, lm_cache0))

    final_key = state.scores + length_penalty * \
        (state.lengths.astype(state.scores.dtype) - 1)
    best = final_key.argmax(-1)
    ys = state.ys[jnp.arange(bs), best]
    lengths = state.lengths[jnp.arange(bs), best]
    hyp = ys[:, 1:]
    pos = jnp.arange(hyp.shape[1])[None, :]
    valid = pos < (lengths - 1)[:, None]
    hyp = jnp.where(valid & (hyp != eos), hyp, 0)
    hyp_len = (jnp.where(valid, hyp, 0) != 0).sum(-1)
    return {"tokens": hyp, "lengths": hyp_len,
            "scores": state.scores[jnp.arange(bs), best]}


# ---------------------------------------------------------------------------
# Frame-synchronous CTC beam decode (host-side; CTC-only decoding w/ opt. LM)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("beam_width", "pruning_size", "blank",
                                   "length_penalty", "blank_skip",
                                   "lm_model", "lm_weight", "sos"))
def ctc_frame_beam_decode_jit(ctc_out, feat_sizes, beam_width: int = 10,
                              pruning_size: int = 10, blank: int = 0,
                              length_penalty: float = 0.0,
                              blank_skip: float = 0.95,
                              lm_model=None, lm_params=None,
                              lm_weight: float = 0.0, sos: int = 1):
    """Device-side frame-synchronous CTC beam search: fixed beam K, one
    `lax.scan` over frames, prefix-merging via rolling-hash equality.

    Same semantics as the host `ctc_frame_beam_decode`
    (reference: src/utils/beam_decode.py:8-93, incl. the blank-skip
    shortcut): per frame each hypothesis spawns a 'stay' candidate
    (blank / repeat-last) and `pruning_size` extension candidates; equal
    prefixes from different parents are merged by logaddexp before top-K
    pruning. Prefix identity uses two independent 32-bit rolling hashes
    plus the length — a collision needs both 32-bit hashes AND the length
    to agree, which is negligible at beam sizes.

    LM fusion (reference queries the LM in-beam per frame,
    beam_decode.py:31-55): pass lm_model/lm_params/lm_weight > 0. Each
    beam carries the fusion LM's next-token distribution for its own
    prefix; extension candidates add lm_weight * log P(c | prefix) to the
    ranking score (not to the CTC probabilities), and after pruning the LM
    advances one token — through its KV cache at PER-ROW positions
    (score_step_at), since frame-synchronous hypotheses have ragged
    lengths — only for beams that actually extended. Merged prefixes are
    identical strings, so keeping the first occurrence's LM state is
    exact.

    ctc_out: (B, T, V) log-probs; feat_sizes: (B,). Returns dict with
    tokens (B, K, T) n-best token arrays (best first), lengths (B, K),
    scores (B, K) (scores include the LM term).
    """
    bs, tmax, vocab = ctc_out.shape
    k, p = beam_width, min(pruning_size, vocab)
    n = k * (p + 1)
    nk = bs * k
    M1, M2 = jnp.uint32(2654435761), jnp.uint32(40503)
    use_lm = lm_model is not None and lm_weight > 0

    hyps0 = jnp.zeros((bs, k, tmax), jnp.int32)
    # beams > 0 start invalid: negative distinct lens so they never merge
    # with (or shadow) real hypotheses
    lens0 = jnp.broadcast_to(-jnp.arange(k, dtype=jnp.int32)[None], (bs, k))
    pb0 = jnp.full((bs, k), LOG_ZERO).at[:, 0].set(0.0)
    pnb0 = jnp.full((bs, k), LOG_ZERO)
    h10 = jnp.zeros((bs, k), jnp.uint32)
    h20 = jnp.zeros((bs, k), jnp.uint32)
    if use_lm:
        cache0 = lm_model.apply(lm_params, nk, tmax + 1,
                                method="init_cache")
        logp0, cache0 = lm_model.apply(
            lm_params, jnp.full((nk,), sos, jnp.int32), cache0,
            jnp.zeros((nk,), jnp.int32), method="score_step_at")
        lmlogp0 = logp0.astype(jnp.float32).reshape(bs, k, vocab)
        lmacc0 = jnp.zeros((bs, k), jnp.float32)
    else:
        cache0 = {}
        lmlogp0 = jnp.zeros((bs, k, 0), jnp.float32)
        lmacc0 = jnp.zeros((bs, k), jnp.float32)

    def step(carry, t):
        hyps, lens, pb, pnb, h1, h2, lmacc, lmlogp, cache = carry
        logp_t = ctc_out[:, t]                      # (B, V)
        active = (t < feat_sizes)                   # (B,)
        p_blank = logp_t[:, blank]                  # (B,)
        skip = jnp.exp(p_blank) > blank_skip
        topv, topi = jax.lax.top_k(logp_t, p)       # (B, P)

        valid_len = jnp.maximum(lens, 0)
        last = jnp.take_along_axis(
            hyps, jnp.maximum(valid_len - 1, 0)[..., None], axis=2)[..., 0]
        p_last = jnp.take_along_axis(logp_t[:, None, :].repeat(k, 1),
                                     last[..., None], axis=2)[..., 0]
        ptot = jnp.logaddexp(pb, pnb)               # (B, K)

        # stay candidates (hyp unchanged)
        stay_pb = ptot + p_blank[:, None]
        stay_pnb = jnp.where((lens > 0) & ~skip[:, None],
                             pnb + p_last, LOG_ZERO)

        # extension candidates (B, K, P)
        c = jnp.broadcast_to(topi[:, None, :], (bs, k, p))
        p_c = jnp.broadcast_to(topv[:, None, :], (bs, k, p))
        same = (c == last[..., None]) & (lens > 0)[..., None]
        ext_pnb = jnp.where(same, pb[..., None] + p_c,
                            ptot[..., None] + p_c)
        # invalid extensions: blank token, skip frames, dead parents
        bad = (c == blank) | skip[:, None, None] | (lens < 0)[..., None]
        ext_pnb = jnp.where(bad, LOG_ZERO, ext_pnb)
        ext_pb = jnp.full_like(ext_pnb, LOG_ZERO)

        # candidate flattening: slot 0 per beam = stay, slots 1..P = extend
        cand_pb = jnp.concatenate([stay_pb[..., None], ext_pb], -1) \
            .reshape(bs, n)
        cand_pnb = jnp.concatenate([stay_pnb[..., None], ext_pnb], -1) \
            .reshape(bs, n)
        is_ext = jnp.concatenate(
            [jnp.zeros((bs, k, 1), bool), ~bad], -1).reshape(bs, n)
        tok = jnp.concatenate(
            [jnp.zeros((bs, k, 1), jnp.int32), c], -1).reshape(bs, n)
        parent = jnp.broadcast_to(jnp.arange(k)[None, :, None],
                                  (bs, k, p + 1)).reshape(bs, n)

        tu = tok.astype(jnp.uint32)
        ch1 = jnp.where(is_ext, h1[:, :, None].repeat(p + 1, 2)
                        .reshape(bs, n) * M1 + tu,
                        h1[:, :, None].repeat(p + 1, 2).reshape(bs, n))
        ch2 = jnp.where(is_ext, h2[:, :, None].repeat(p + 1, 2)
                        .reshape(bs, n) * M2 + tu + jnp.uint32(1),
                        h2[:, :, None].repeat(p + 1, 2).reshape(bs, n))
        clen = jnp.where(
            is_ext,
            (lens[:, :, None].repeat(p + 1, 2).reshape(bs, n) + 1),
            lens[:, :, None].repeat(p + 1, 2).reshape(bs, n))

        if use_lm:
            # extension candidates add the fusion term to the RANKING
            # score (kept out of pb/pnb like the reference's per-hyp lm
            # accumulator, beam_decode.py:44-55)
            ext_lm = lmacc[:, :, None] + lm_weight * jnp.take_along_axis(
                lmlogp, c, axis=2)
            cand_lm = jnp.concatenate([lmacc[:, :, None], ext_lm],
                                      -1).reshape(bs, n)
        else:
            cand_lm = jnp.zeros((bs, n), jnp.float32)

        # prefix merge: logsumexp over identical (h1, h2, len) candidates,
        # then keep only each group's first occurrence (identical prefixes
        # share one lm value, so cand_lm needs no merging)
        eq = (ch1[:, :, None] == ch1[:, None, :]) & \
             (ch2[:, :, None] == ch2[:, None, :]) & \
             (clen[:, :, None] == clen[:, None, :])        # (B, N, N)
        def merge(x):
            big = jnp.where(eq, x[:, None, :], LOG_ZERO)
            m = big.max(-1)
            return m + jnp.log(jnp.sum(jnp.exp(big - m[..., None]),
                                       axis=-1))
        mpb = merge(cand_pb)
        mpnb = merge(cand_pnb)
        first = jnp.argmax(eq, axis=-1) == jnp.arange(n)[None, :]
        score = jnp.logaddexp(mpb, mpnb) + cand_lm \
            + length_penalty * clen.astype(jnp.float32)
        score = jnp.where(first & (clen >= 0), score, 2 * LOG_ZERO)

        top_s, top_i = jax.lax.top_k(score, k)               # (B, K)
        sel = lambda x: jnp.take_along_axis(x, top_i, axis=1)
        new_pb, new_pnb = sel(mpb), sel(mpnb)
        new_h1, new_h2 = sel(ch1), sel(ch2)
        new_len, new_tok = sel(clen), sel(tok)
        new_ext, new_parent = sel(is_ext), sel(parent)
        new_lm = sel(cand_lm)

        new_hyps = jnp.take_along_axis(hyps, new_parent[..., None], axis=1)
        write = (jnp.arange(tmax)[None, None, :] ==
                 jnp.maximum(new_len - 1, 0)[..., None]) & \
            new_ext[..., None]
        new_hyps = jnp.where(write, new_tok[..., None], new_hyps)

        # dead slots (score = 2*LOG_ZERO) keep distinct negative lens so
        # they can never merge into a real group later
        dead = top_s <= 1.5 * LOG_ZERO
        new_len = jnp.where(dead, -jnp.arange(k, dtype=jnp.int32)[None] - 1,
                            new_len)

        if use_lm:
            # reorder LM state by parent beam, then advance one token for
            # beams that extended (per-row positions: token j sits at
            # cache slot j, sos at 0)
            flat_parent = (jnp.arange(bs)[:, None] * k
                           + new_parent).reshape(-1)
            cache_p = jax.tree_util.tree_map(
                lambda cc: cc[flat_parent], cache)
            logp_p = jnp.take_along_axis(lmlogp, new_parent[..., None],
                                         axis=1)
            adv = new_ext & active[:, None] & ~dead
            pos_flat = jnp.maximum(new_len, 1).reshape(-1)
            logp_n, cache_n = lm_model.apply(
                lm_params, new_tok.reshape(-1), cache_p, pos_flat,
                method="score_step_at")
            advf = adv.reshape(-1)
            new_cache = jax.tree_util.tree_map(
                lambda cn, co: jnp.where(
                    advf.reshape(-1, *([1] * (cn.ndim - 1))), cn, co),
                cache_n, cache_p)
            # inactive utterances keep their rows un-reordered
            actf = jnp.repeat(active, k)
            cache = jax.tree_util.tree_map(
                lambda cn, co: jnp.where(
                    actf.reshape(-1, *([1] * (cn.ndim - 1))), cn, co),
                new_cache, cache)
            lmlogp_new = jnp.where(adv[..., None],
                                   logp_n.astype(jnp.float32)
                                   .reshape(bs, k, vocab), logp_p)
        else:
            lmlogp_new = lmlogp

        out = (jnp.where(active[:, None, None], new_hyps, hyps),
               jnp.where(active[:, None], new_len, lens),
               jnp.where(active[:, None], new_pb, pb),
               jnp.where(active[:, None], new_pnb, pnb),
               jnp.where(active[:, None], new_h1, h1),
               jnp.where(active[:, None], new_h2, h2),
               jnp.where(active[:, None], new_lm, lmacc),
               jnp.where(active[:, None, None], lmlogp_new, lmlogp),
               cache)
        return out, None

    (hyps, lens, pb, pnb, _, _, lmacc, _, _), _ = jax.lax.scan(
        step, (hyps0, lens0, pb0, pnb0, h10, h20, lmacc0, lmlogp0, cache0),
        jnp.arange(tmax))

    final = jnp.logaddexp(pb, pnb) + lmacc
    final = jnp.where(lens >= 0, final, 2 * LOG_ZERO)
    order = jnp.argsort(-final, axis=1)
    tokens = jnp.take_along_axis(hyps, order[..., None], axis=1)
    lengths = jnp.maximum(jnp.take_along_axis(lens, order, axis=1), 0)
    scores = jnp.take_along_axis(final, order, axis=1)
    return {"tokens": tokens, "lengths": lengths, "scores": scores}


def ctc_frame_beam_decode(ctc_out: np.ndarray, feat_sizes: np.ndarray,
                          beam_width: int = 10, pruning_size: int = 10,
                          blank: int = 0, lm_score_fn=None,
                          lm_weight: float = 0.0,
                          length_penalty: float = 0.0,
                          blank_skip: float = 0.95,
                          return_nbest: int = 0):
    """Classic prefix-merging CTC beam search on host.

    (reference: src/utils/beam_decode.py:8-93 — including the blank-skip
    shortcut when P(blank) > 0.95.)
    ctc_out: (B, T, V) numpy log-probs. Returns list of token lists, or with
    return_nbest > 0 a list of n-best lists per utterance (short lists are
    padded by repeating the best hypothesis — used as ESA candidate
    alignments, reference: cassnat.py:391-414).
    """
    ctc_out = np.asarray(ctc_out)
    bs = ctc_out.shape[0]
    results = []
    for b in range(bs):
        beams = {(): (0.0, LOG_ZERO, 0.0)}  # hyp -> (p_blank, p_nblank, lm)
        t_len = int(feat_sizes[b])
        top_idx = np.argsort(-ctc_out[b], axis=-1)[:, :pruning_size]
        for t in range(t_len):
            if np.exp(ctc_out[b, t, blank]) > blank_skip:
                # all hyps extend with blank implicitly
                beams = {h: (np.logaddexp(pb, pnb) + ctc_out[b, t, blank],
                             LOG_ZERO, lm)
                         for h, (pb, pnb, lm) in beams.items()}
                continue
            new_beams = {}

            def add(h, pb, pnb, lm):
                if h in new_beams:
                    opb, opnb, olm = new_beams[h]
                    new_beams[h] = (np.logaddexp(opb, pb),
                                    np.logaddexp(opnb, pnb), olm)
                else:
                    new_beams[h] = (pb, pnb, lm)

            for h, (pb, pnb, lm) in beams.items():
                p_blank = ctc_out[b, t, blank]
                add(h, np.logaddexp(pb, pnb) + p_blank,
                    pnb + (ctc_out[b, t, h[-1]] if h else LOG_ZERO), lm)
                for c in top_idx[t]:
                    c = int(c)
                    if c == blank:
                        continue
                    p_c = ctc_out[b, t, c]
                    if h and c == h[-1]:
                        pnb_new = pb + p_c
                    else:
                        pnb_new = np.logaddexp(pb, pnb) + p_c
                    lm_new = lm
                    if lm_score_fn is not None and lm_weight > 0:
                        lm_new = lm + lm_weight * lm_score_fn(h, c)
                    add(h + (c,), LOG_ZERO, pnb_new, lm_new)
            scored = sorted(
                new_beams.items(),
                key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]) + kv[1][2]
                + length_penalty * len(kv[0]),
                reverse=True)
            beams = dict(scored[:beam_width])
        ranked = sorted(
            beams.items(),
            key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]) + kv[1][2],
            reverse=True)
        if return_nbest > 0:
            nbest = [list(h) for h, _ in ranked[:return_nbest]]
            while len(nbest) < return_nbest:
                nbest.append(list(nbest[0]) if nbest else [])
            results.append(nbest)
        else:
            results.append(list(ranked[0][0]))
    return results
