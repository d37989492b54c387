"""CassNATTask: CASS-NAT training + ESA decoding driver.

(reference: src/tasks/cassnat_task.py — AST-encoder init w/ optional freeze,
multi-group MulNoam optimizer splitting pretrained encoder vs fresh decoder,
SpecAug scheduling by epoch, sample_topk on for train / off for valid, decode
types ctc_only / esa_att / oracle hitrate stats, utt2diff dumps.)
"""

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cassnat_asr_public_tpu.models import make_cassnat, make_conformer, \
    make_lm, make_transformer
from cassnat_asr_public_tpu.tasks.base import BaseTask, TrainState
from cassnat_asr_public_tpu.utils import checkpoint as ckpt
from cassnat_asr_public_tpu.utils import metrics as M
from cassnat_asr_public_tpu.utils.decoding import (
    ctc_greedy_decode_jit,
    nat_decode_jit,
)
from cassnat_asr_public_tpu.utils.schedules import get_mul_optim, get_optim

ENCODER_SUBTREES = ("src_embed", "encoder", "ctc_generator",
                    "interctc_generator")


def _subtree_mask(tree, subtrees):
    """Bool pytree marking leaves under params/<name> for name in subtrees
    (optax.masked convention)."""
    def mark(sub, flag):
        return jax.tree_util.tree_map(lambda _: flag, sub)
    return {k: ({n: mark(v, n in subtrees) for n, v in sub.items()}
                if k == "params" else mark(sub, False))
            for k, sub in tree.items()}


class CassNATTask(BaseTask):
    model_name = "cassnat"

    def set_model(self, args):
        self.model = make_cassnat(args.input_size, args)
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        feats = jnp.zeros((2, 16, args.input_size))
        mask = jnp.ones((2, 16), bool)
        lbl = jnp.ones((2, 5), jnp.int32)
        ls = jnp.ones((2,), jnp.int32)
        params = self.model.init(
            {"params": rng, "dropout": rng, "sample": rng}, feats, mask,
            lbl, ls, deterministic=False)
        self.state = TrainState(params, None)

    def _optim_encoder_subtrees(self, args):
        """Subtrees forming the 'pretrained encoder' optimizer group.

        Default is the AST-init set (reference cassnat_task.py:62-83). When
        initializing from a checkpoint that lacks some of them — e.g. a
        wav2vec SSL checkpoint has no ctc_generator — only the subtrees the
        checkpoint actually provides go in the slow/frozen group, so fresh
        heads keep the fast schedule (fairseq freeze_finetune_updates
        semantics for SSL fine-tuning). Override explicitly with the
        encoder_group_subtrees config key."""
        sub = getattr(args, "encoder_group_subtrees", None)
        if sub:
            return tuple(sub)
        path = getattr(args, "resume_model", "")
        resumed = os.path.exists(os.path.join(args.exp_dir,
                                              "model.last.ckpt"))
        if path and not resumed and os.path.exists(path):
            from flax import serialization
            state = ckpt.load_checkpoint(path)
            src = serialization.to_state_dict(state["params"])
            inner = src.get("params", src)
            present = tuple(s for s in ENCODER_SUBTREES if s in inner)
            if present:
                return present
        return ENCODER_SUBTREES

    def set_optimizer(self, args):
        """Multi-group optimizer: pretrained encoder slower/frozen vs fresh
        decoder (reference: cassnat_task.py:133-154)."""
        group_subtrees = self._optim_encoder_subtrees(args)
        if isinstance(getattr(args, "noam_factor", None), (list, tuple)):
            def label_fn(params):
                def label_of(path):
                    top = path[0].key if hasattr(path[0], "key") else path[0]
                    # The params tree nests under 'params'
                    if top == "params" and len(path) > 1:
                        top = path[1].key if hasattr(path[1], "key") \
                            else path[1]
                    return "encoder" if top in group_subtrees else "decoder"
                return jax.tree_util.tree_map_with_path(
                    lambda p, _: label_of(p), params)
            self.optimizer = get_mul_optim(
                args.optim_type, ("encoder", "decoder"), label_fn, args)
        else:
            self.optimizer = get_optim(args.optim_type, args)
        if getattr(args, "fix_encoder", False):
            # permanent encoder freeze (reference: cassnat_task.py:80-81
            # requires_grad=False on the transplanted subtrees)
            self.optimizer = optax.chain(
                self.optimizer,
                optax.masked(optax.set_to_zero(),
                             lambda p: _subtree_mask(p, group_subtrees)))
        accum = getattr(args, "accum_grad", 1)
        if accum > 1:
            self.optimizer = optax.MultiSteps(self.optimizer, accum)
        self.state.opt_state = self.optimizer.init(self.state.params)

    def load_pretrained_model(self, args):
        """AST checkpoint -> encoder subtrees only, gated by init_encoder
        (reference: cassnat_task.py:58-83)."""
        if not getattr(args, "init_encoder", True):
            return
        state = ckpt.load_checkpoint(args.resume_model)
        self.state.params = ckpt.transplant_subtrees(
            self.state.params, state["params"], ENCODER_SUBTREES)
        if self.rank == 0:
            print(f"Initialized encoder from {args.resume_model}", flush=True)

    def on_epoch_start(self, epoch, args):
        """SpecAug scheduling (reference: cassnat_task.py:172)."""
        start = getattr(args, "specaug_start_epoch", 0)
        self.train_loader.dataset.use_specaug = (
            epoch >= start and getattr(args, "use_specaug", False))

    def loss_fn(self, params, batch, rngs, train: bool):
        tgt_label = batch["labels"][:, 1:]
        sample_topk = getattr(self.args, "sample_topk", 0) if train else 0
        out = self.model.apply(
            params, batch["feats"], batch["src_mask"], tgt_label,
            batch["label_sizes"], sample_topk=sample_topk,
            label_smooth=batch.get("ls"),
            deterministic=not train, rngs=rngs if train else {})
        return self.attach_wer_metrics(out, batch)

    def make_meters(self):
        m = super().make_meters()
        m.update(ctc_loss=M.AverageMeter("CtcLoss", ":.4e"),
                 att_loss=M.AverageMeter("AttLoss", ":.4e"),
                 ctc_wer=M.AverageMeter("CtcWer", ":.4f"),
                 att_wer=M.AverageMeter("AttWer", ":.4f"))
        return m

    metric_keys = ("ctc_loss", "att_loss", "ctc_errs", "ctc_tokens",
                   "att_errs", "att_tokens")

    def epoch_metric(self, valid_meters):
        # a meter nothing updated must never win best-model selection (a
        # silent-zero att_wer once froze best_model.ckpt at epoch 0)
        m = valid_meters["att_wer"]
        return m.avg if m.count else float("inf")

    # ---- decoding (reference: cassnat_task.py:307-377) ----
    def load_lm_model(self, args):
        """Rank model: 'lm' (transformer LM), 'at_baseline' (AST model),
        or 'n-gram' (ARPA word LM, host-side — the kenlm replacement).

        (reference: cassnat_task.py:85-131)
        lm_apply has the uniform signature (params, tokens, feats, src_mask).
        """
        rank_model = getattr(args, "rank_model", "none")
        from cassnat_asr_public_tpu.utils.config import merge_configs
        if rank_model == "n-gram" and getattr(args, "rnnlm", None):
            # reference: kenlm.Model(args.rnnlm) (cassnat_task.py:89-90);
            # scored host-side on detokenized candidates.
            from cassnat_asr_public_tpu.utils.ngram_lm import ArpaLM
            self.lm_model = ArpaLM(args.rnnlm)
            self.lm_params = None
            self.lm_apply = None
        elif rank_model == "lm" and getattr(args, "lm_config", None):
            lm_args = merge_configs(None, args.lm_config)
            lm_args.vocab_size = args.vocab_size
            self.lm_model = make_lm(lm_args)
            self.lm_params = self.lm_model.init(
                jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
            lm_path = getattr(args, "rnnlm", None)
            if lm_path:
                if not os.path.exists(lm_path):
                    # a configured-but-missing ranker must fail loudly: a
                    # silently random-initialized rank LM decodes without
                    # error at garbage WER (reference torch.load raises)
                    raise FileNotFoundError(
                        f"rank LM checkpoint not found: {lm_path}")
                state = ckpt.load_checkpoint(lm_path)
                self.lm_params = ckpt.restore_params(self.lm_params,
                                                     state["params"])
            lm = self.lm_model
            self.lm_apply = lambda p, ys, feats, mask: lm.apply(
                p, ys, method="forward_logits")
            self.lm_apply_logits = True
        elif rank_model == "at_baseline" and getattr(args, "rank_config",
                                                     None):
            # AT baseline scores candidates with its own decoder
            # (reference: cassnat.py:509-515)
            at_args = merge_configs(None, args.rank_config)
            at_args.vocab_size = args.vocab_size
            from cassnat_asr_public_tpu.models import make_conformer, \
                make_transformer
            maker = make_conformer if getattr(
                at_args, "model_type", "") == "conformer" or getattr(
                at_args, "use_conv_enc", False) else make_transformer
            self.lm_model = maker(args.input_size, at_args)
            f0 = jnp.zeros((1, 16, args.input_size))
            m0 = jnp.ones((1, 16), bool)
            t0 = jnp.ones((1, 4), jnp.int32)
            self.lm_params = self.lm_model.init(
                {"params": jax.random.PRNGKey(0)}, f0, m0, t0, t0,
                jnp.ones((1,), jnp.int32))
            at_path = getattr(args, "rank_model_path", None)
            if at_path:
                if not os.path.exists(at_path):
                    raise FileNotFoundError(
                        f"at_baseline ranker checkpoint not found: "
                        f"{at_path}")
                state = ckpt.load_checkpoint(at_path)
                self.lm_params = ckpt.restore_params(self.lm_params,
                                                     state["params"])
            at = self.lm_model

            def at_apply(p, ys, feats, mask):
                enc_h, enc_mask, _ = at.apply(p, feats, mask,
                                              method="encode_ctc")
                return at.apply(p, enc_h, enc_mask, ys,
                                method="forward_att_scores")

            self.lm_apply = at_apply

    def decode_batch(self, args, bd, rng):
        """Decode ONE padded batch dict (feats + src_mask [+ labels for
        oracle]) with the configured decode_type; returns (out, rng).

        Shared by the offline decode loop below and the serving driver
        (bin/serve_asr.py), so the served path is exactly the scored path.
        """
        decode_type = getattr(args, "decode_type", "esa_att")
        sample_num = getattr(args, "sample_num", 0) or 1
        rank_model = getattr(args, "rank_model", "none")
        if self.lm_model is None:
            rank_model = "none"
        lm_apply = getattr(self, "lm_apply", None)
        # fused conformer-layer Pallas encoder (kernels/conformer_layer.py);
        # conformer/relative encoders only, A/B'd in bench.py
        use_mk = bool(getattr(args, "use_megakernel", False))
        feats = bd["feats"]
        mask = bd["src_mask"]
        if decode_type == "ctc_only":
            out = ctc_greedy_decode_jit(self.model, self.state.params,
                                        feats, mask,
                                        use_megakernel=use_mk)
        elif decode_type == "oracle_att":
            # upper bound given perfect alignment
            # (reference: cassnat.py:449-450)
            out = nat_decode_jit(
                self.model, self.state.params, feats, mask, rng,
                umax=bd["labels"].shape[1] - 1, sample_num=1,
                align="oracle",
                labels=bd["labels"][:, 1:-1],
                label_sizes=bd["label_sizes"],
                use_megakernel=use_mk)
        elif decode_type == "ctc_att":
            out = self._decode_ctc_beam_align(args, feats, mask,
                                              sample_num, rng,
                                              lm_apply)
        else:  # esa_att / att
            rng, sub = jax.random.split(rng)
            umax = max(8, min(feats.shape[1] // 4 + 1,
                              getattr(args, "decode_max_tokens", 160)))
            from cassnat_asr_public_tpu.models.lm import TransformerLM
            fusion_lm = self.lm_model if isinstance(
                self.lm_model, TransformerLM) else None
            kw = dict(
                umax=umax, sample_num=sample_num,
                threshold=getattr(args, "threshold", 0.9),
                rank_model=("host" if rank_model == "n-gram"
                            else rank_model),
                lm_apply=lm_apply,
                lm_params=self.lm_params,
                beam_width=getattr(args, "beam_width", 1),
                lm_model=fusion_lm,
                lm_weight=getattr(args, "lm_weight", 0.0),
                esa_topk=getattr(args, "esa_topk", 0),
                rank_topm=getattr(args, "esa_rank_topm", 0),
                lm_apply_logits=getattr(self, "lm_apply_logits",
                                        False),
                use_megakernel=use_mk,
                return_margin=(
                    float(getattr(args, "esa_gate_margin", 0) or 0) > 0
                    and getattr(args, "esa_topk", 0) > 0
                    and sample_num > 1
                    and rank_model in ("lm", "at_baseline")),
                **self._decode_text_kwargs(feats, mask))
            if getattr(args, "esa_two_phase", False) and sample_num > 1:
                out = self._nat_decode_two_phase(args, feats, mask,
                                                 sub, sample_num, kw)
            else:
                out = self._nat_decode_dedup(args, feats, mask, sub,
                                             sample_num, kw)
            if "cand_tokens" in out:
                out = self._rank_ngram(out)
        return out, rng

    def decode(self, args):
        results = {}
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        hit_stats = None
        diffs = None
        gate_thr = float(getattr(args, "esa_gate_margin", 0) or 0)
        gated = []  # (utt, feats_row, mask_row) to escalate to full-S
        t0 = time.time()
        for batch in self.test_loader:
            bd = self.shard_decode_batch(batch)
            feats = bd["feats"]
            mask = bd["src_mask"]
            out, rng = self.decode_batch(args, bd, rng)
            if getattr(args, "test_hitrate", False):
                hit_stats, diffs = self._hitrate_update(
                    bd, feats, mask, out, hit_stats, diffs,
                    n_real=len(batch["utts"]))
            toks = np.asarray(out["tokens"])
            lens = np.asarray(out["lengths"])
            for i, utt in enumerate(batch["utts"]):
                hyp = [int(t) for t in toks[i, :lens[i]] if t > 2]
                results[utt] = self.vocab.decode(hyp)
            if gate_thr > 0 and "esa_margin" in out:
                marg = np.asarray(out["esa_margin"])
                f_np = np.asarray(feats)
                m_np = np.asarray(mask)
                for i, utt in enumerate(batch["utts"]):
                    if marg[i] < gate_thr:
                        gated.append((utt, f_np[i], m_np[i]))
        if gated:
            results.update(self._escalate_gated(args, gated, rng))
        if gate_thr > 0:
            # surfaced for harnesses (WER validation records the measured
            # escalation rate that bench.py's gated-composite RTF uses)
            self.gate_stats = {
                "margin_thr": gate_thr,
                "n_escalated": len(gated),
                "n_utts": len(results),
                "escalation_rate": len(gated) / max(1, len(results)),
            }
        elapsed = time.time() - t0
        if hit_stats is not None:
            from cassnat_asr_public_tpu.utils.diagnostics import \
                format_hitrate
            print(format_hitrate(hit_stats), flush=True)
        if diffs is not None and getattr(args, "print_utt2diff", False):
            for d in sorted(diffs):
                print(f"utt2diff {d} {diffs[d]}", flush=True)
        return results, elapsed

    def _escalate_gated(self, args, gated, rng):
        """Confidence-gated topk escalation (TPU-native extension, VERDICT
        r4 item 2c): utterances whose topk-preselected ESA decode ranked
        its winner with a small top1-top2 margin over distinct candidate
        outputs (`esa_margin` < args.esa_gate_margin) are re-decoded with
        the FULL sample_num candidate set (no esa_topk preselection) —
        low margin marks exactly the rank-sensitive utterances where
        preselection can drop the would-be winner. Gated utterances are
        re-batched across the whole test set by frame-bucket (not per
        source batch), so escalations run at efficient batch sizes.

        Reference behavior matched: the full-S re-decode is the
        reference's own ESA decode (cassnat.py:441-573); the gate only
        decides who pays for it."""
        import copy
        a2 = copy.copy(args)
        a2.esa_topk = 0
        a2.esa_gate_margin = 0
        max_b = getattr(args, "test_batch_size", 16) or 16
        by_t = {}
        for utt, f, m in gated:
            by_t.setdefault(f.shape[0], []).append((utt, f, m))
        out_results = {}
        n = 0
        for t, items in sorted(by_t.items()):
            for s in range(0, len(items), max_b):
                chunk = items[s:s + max_b]
                # pad to a multiple of 4 by repeating the last row: keeps
                # the compiled-shape grid small; padded rows are dropped
                bpad = min(max_b, -(-len(chunk) // 4) * 4)
                rows = chunk + [chunk[-1]] * (bpad - len(chunk))
                feats = jnp.asarray(np.stack([r[1] for r in rows]))
                smask = jnp.asarray(np.stack([r[2] for r in rows]))
                out, rng = self.decode_batch(
                    a2, {"feats": feats, "src_mask": smask}, rng)
                toks = np.asarray(out["tokens"])
                lens = np.asarray(out["lengths"])
                for i, (utt, _, _) in enumerate(chunk):
                    hyp = [int(tk) for tk in toks[i, :lens[i]] if tk > 2]
                    out_results[utt] = self.vocab.decode(hyp)
                n += len(chunk)
        print(f"esa_gate: escalated {n} utterances to full sample_num "
              f"(margin < {getattr(args, 'esa_gate_margin', 0)})",
              flush=True)
        return out_results

    def _nat_decode_dedup(self, args, feats, mask, rng, sample_num, kw):
        """ESA decode with exact candidate dedup and overflow-safe caps.

        Config keys `esa_dedup` (alignment-dedup cap before the NAT pass)
        and `esa_rank_dedup` (token-dedup cap before the rank model) cut
        the candidate batch the expensive stages see. Dedup is exact as
        long as the caps cover the per-utterance unique counts; the jitted
        decode reports those counts, and on overflow the cap doubles (up
        to sample_num = no dedup) and the batch re-runs, preserving output
        equality with the undeduped reference semantics
        (reference ranks all sample_num candidates: cassnat.py:441-573).
        """
        dedup_align = min(getattr(args, "esa_dedup", 0), sample_num)
        dedup_rank = min(getattr(args, "esa_rank_dedup", 0), sample_num)
        while True:
            out = nat_decode_jit(
                self.model, self.state.params, feats, mask, rng,
                dedup_align=(dedup_align if dedup_align < sample_num else 0),
                dedup_rank=(dedup_rank if dedup_rank < sample_num else 0),
                **kw)
            grew = False
            if "n_unique_align" in out and \
                    int(np.asarray(out["n_unique_align"]).max()) > \
                    dedup_align:
                dedup_align = min(dedup_align * 2, sample_num)
                grew = True
            if not grew and "n_unique_rank" in out and \
                    int(np.asarray(out["n_unique_rank"]).max()) > \
                    dedup_rank:
                dedup_rank = min(dedup_rank * 2, sample_num)
                grew = True
            if not grew:
                return out

    def _nat_decode_two_phase(self, args, feats, mask, rng, sample_num, kw):
        """Two-phase ESA decode: phase 1 (esa_align_jit) runs the encoder +
        sampled alignments and hands back per-candidate metadata; the host
        picks THIS batch's buckets — candidate count C = the true max
        unique-alignment count (rounded to 8) and umax = the true max
        alignment length (rounded to 8) — then phase 2 runs the NAT +
        ranking on exactly the unique candidates via align='external' with
        the phase-1 encoder outputs. Output is identical to the one-call
        decode (duplicates share bit-identical NAT outputs; padding slots
        repeat the argmax row); the NAT/LM batch shrinks from
        B*sample_num*umax_static to B*C*umax_batch.

        (reference: dynamic torch shapes did the umax part implicitly —
        ymax = ylen.max().item(), cassnat.py:479 — and ranked all
        sample_num candidates; this is the static-shape XLA equivalent
        plus exact dedup.)
        """
        from cassnat_asr_public_tpu.utils.decoding import (
            esa_align_jit, select_unique_candidates)
        # same key the one-call path would hand ctc_sampled_align, so the
        # two paths sample identical candidates (exactness is testable)
        p1 = esa_align_jit(self.model, self.state.params, feats, mask, rng,
                           sample_num=sample_num,
                           threshold=getattr(args, "threshold", 0.9),
                           use_megakernel=kw.get("use_megakernel", False))
        bs = feats.shape[0]
        kept, umax_b = select_unique_candidates(
            p1["ylen"], p1["h1"], p1["h2"], p1["path_score"], bs,
            sample_num)
        c = kept.shape[1]
        flat = jnp.asarray(kept.reshape(-1))
        umax = min(max(8, -(-umax_b // 8) * 8),
                   getattr(args, "decode_max_tokens", 160))
        kw = dict(kw)
        kw.update(umax=umax, sample_num=c, align="external",
                  ext_shift=p1["shift"][flat], ext_ylen=p1["ylen"][flat],
                  pre_enc=(p1["enc_h"], p1["enc_mask"], p1["ctc_out"]))
        kw.pop("esa_topk", None)
        dedup_rank = min(getattr(args, "esa_rank_dedup", 0), c)
        while True:
            out = nat_decode_jit(
                self.model, self.state.params, feats, mask, rng,
                dedup_rank=(dedup_rank if 0 < dedup_rank < c else 0), **kw)
            if "n_unique_rank" in out and \
                    int(np.asarray(out["n_unique_rank"]).max()) > dedup_rank:
                dedup_rank = min(dedup_rank * 2, c)
                continue
            return out

    def _rank_ngram(self, out):
        """Rank ESA candidates by ARPA n-gram sentence score / length.

        Mirrors reference cassnat.py:521-533: detokenize each candidate
        (shared pieces_to_text: '▁' and '<space>' delimiters), kenlm-style
        full-sentence log10 score, normalized by the slot count, argmax
        over sample_num.
        """
        from cassnat_asr_public_tpu.utils.ngram_lm import arpa_slot_score
        cands = np.asarray(out["cand_tokens"])    # (B, S, U)
        lens = np.asarray(out["cand_lengths"])    # (B, S)
        bs, s, umax = cands.shape
        best_tok = np.zeros((bs, umax), cands.dtype)
        best_len = np.zeros((bs,), lens.dtype)
        for i in range(bs):
            scores = np.empty(s, np.float64)
            for j in range(s):
                scores[j] = arpa_slot_score(
                    self.lm_model, self.vocab,
                    cands[i, j, :lens[i, j]], int(lens[i, j]))
            k = int(scores.argmax())
            best_tok[i] = cands[i, k]
            best_len[i] = lens[i, k]
        return {"tokens": best_tok, "lengths": best_len}

    def _decode_text_kwargs(self, feats, mask):
        """Extra nat_decode_jit kwargs; LMNAT gpt2/bert flavors inject
        host-retokenized text here."""
        return {}

    def _decode_ctc_beam_align(self, args, feats, mask, sample_num, rng,
                               lm_apply):
        """CTC-beam N-best candidate alignments -> Viterbi -> batched NAT
        pass with candidate ranking.

        (reference: cassnat.py:391-414 beam_path_align + decode_type ctc_att:
        every beam hypothesis becomes a candidate alignment; the NAT decoder
        scores all of them in one batched pass and the rank model picks.)
        """
        from cassnat_asr_public_tpu.ops.ctc import ctc_viterbi_align
        from cassnat_asr_public_tpu.utils.decoding import (
            ctc_frame_beam_decode_jit, _repeat_batch)
        import jax.numpy as jnp
        enc_h, enc_mask, ctc_out = self.model.apply(
            self.state.params, feats, mask, method="encode_ctc")
        beam = ctc_frame_beam_decode_jit(
            ctc_out, enc_mask.sum(-1), beam_width=sample_num,
            pruning_size=getattr(args, "ctc_pruning", 10) or 10)
        bs = feats.shape[0]
        toks = np.asarray(beam["tokens"])      # (B, S, T)
        lens = np.asarray(beam["lengths"])     # (B, S)
        # dead beam slots (len 0): reuse the best hypothesis, matching the
        # host version's n-best padding
        best = toks[:, :1], lens[:, :1]
        empty = lens == 0
        lens = np.where(empty, np.broadcast_to(best[1], lens.shape), lens)
        toks = np.where(empty[..., None], np.broadcast_to(
            best[0], toks.shape), toks)
        umax = max(int(lens.max()) + 1, 8)
        labels = toks[:, :, :umax - 1].reshape(bs * sample_num, -1)
        if labels.shape[1] < umax - 1:
            labels = np.pad(labels,
                            ((0, 0), (0, umax - 1 - labels.shape[1])))
        lsizes = np.maximum(np.minimum(lens, umax - 1), 1) \
            .reshape(bs * sample_num)
        ctc_rep = jnp.repeat(ctc_out, sample_num, axis=0)
        mask_rep = jnp.repeat(enc_mask, sample_num, axis=0)
        shift, _ = ctc_viterbi_align(
            ctc_rep, jnp.asarray(labels), mask_rep.sum(-1),
            jnp.asarray(lsizes))
        rank_model = getattr(args, "rank_model", "none")
        if self.lm_model is None:
            rank_model = "none"
        out = nat_decode_jit(
            self.model, self.state.params, feats, mask, rng, umax=umax,
            sample_num=sample_num, align="external", ext_shift=shift,
            ext_ylen=jnp.asarray(lsizes),
            rank_model=("host" if rank_model == "n-gram" else rank_model),
            lm_apply=lm_apply, lm_params=self.lm_params,
            lm_weight=getattr(args, "lm_weight", 0.0),
            lm_apply_logits=getattr(self, "lm_apply_logits", False))
        if "cand_tokens" in out:
            out = self._rank_ngram(out)
        return out

    def _hitrate_update(self, batch, feats, mask, out, stats, diffs,
                        n_real=None):
        """Alignment-accuracy + length-diff stats
        (reference: cassnat.py:454-463, cassnat_task.py:315-365).
        `batch` may be the sharded device dict; rows past n_real are
        SPMD padding and excluded from the statistics."""
        from collections import Counter
        from cassnat_asr_public_tpu.ops.ctc import (
            ctc_best_path_align, ctc_viterbi_align)
        from cassnat_asr_public_tpu.utils.diagnostics import (
            alignment_hitrate, utt2diff)
        enc_h, enc_mask, ctc_out = self.model.apply(
            self.state.params, feats, mask, method="encode_ctc")
        oracle, _ = ctc_viterbi_align(
            ctc_out, jnp.asarray(batch["labels"][:, 1:-1]),
            enc_mask.sum(-1), jnp.asarray(batch["label_sizes"]))
        pred, plen = ctc_best_path_align(ctc_out, enc_mask)
        n = n_real if n_real is not None else pred.shape[0]
        stats = alignment_hitrate(np.asarray(pred)[:n],
                                  np.asarray(oracle)[:n], stats)
        diffs = utt2diff(np.asarray(plen)[:n],
                         np.asarray(batch["label_sizes"])[:n],
                         diffs if diffs is not None else Counter())
        return stats, diffs
