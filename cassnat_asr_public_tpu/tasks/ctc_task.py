"""CTCTask: CTC-only training + greedy/beam decoding.

(reference: src/tasks/ctc_task.py)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cassnat_asr_public_tpu.models import make_ctc_model
from cassnat_asr_public_tpu.tasks.base import BaseTask, TrainState
from cassnat_asr_public_tpu.utils import metrics as M
from cassnat_asr_public_tpu.utils.decoding import ctc_greedy_decode_jit


class CTCTask(BaseTask):
    model_name = "ctc"

    def set_model(self, args):
        self.model = make_ctc_model(args.input_size, args)
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        params = self.model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((2, 16, args.input_size)), jnp.ones((2, 16), bool),
            jnp.ones((2, 4), jnp.int32), jnp.ones((2,), jnp.int32),
            deterministic=False)
        self.state = TrainState(params, None)

    def set_optimizer(self, args):
        super().set_optimizer(args)
        self.state.opt_state = self.optimizer.init(self.state.params)

    def loss_fn(self, params, batch, rngs, train: bool):
        tgt_label = batch["labels"][:, 1:]
        out = self.model.apply(
            params, batch["feats"], batch["src_mask"], tgt_label,
            batch["label_sizes"], deterministic=not train,
            rngs=rngs if train else {})
        return self.attach_wer_metrics(out, batch, att=False)

    def make_meters(self):
        m = super().make_meters()
        m.update(ctc_wer=M.AverageMeter("CtcWer", ":.4f"))
        return m

    metric_keys = ("ctc_errs", "ctc_tokens")

    def epoch_metric(self, valid_meters):
        m = valid_meters["ctc_wer"]
        return m.avg if m.count else float("inf")

    def load_lm_model(self, args):
        """Beam-fusion LM. Beyond the reference's transformer-LM fusion
        (reference: src/tasks/ctc_task.py:61-83), `rank_model: n-gram`
        loads an ARPA word LM (the kenlm replacement) used to rerank the
        device beam's n-best host-side."""
        if getattr(args, "rank_model", "") == "n-gram" and getattr(
                args, "rnnlm", None):
            from cassnat_asr_public_tpu.utils.ngram_lm import ArpaLM
            self.lm_model = ArpaLM(args.rnnlm)
            self.lm_params = None
            return
        super().load_lm_model(args)

    def _rerank_nbest_ngram(self, toks, lens, scores, lm_w):
        """Pick argmax_k [beam_score(k) + lm_w * arpa(sentence_k)/slots]
        over the device beam's n-best (scores are length-penalized CTC
        log-probs; ARPA score is log10 over detokenized words, normalized
        like CassNATTask._rank_ngram / reference cassnat.py:521-533)."""
        from cassnat_asr_public_tpu.utils.ngram_lm import arpa_slot_score
        hyps = []
        for i in range(toks.shape[0]):
            best, best_s = [], -np.inf
            for k in range(toks.shape[1]):
                hyp = [int(t) for t in toks[i, k, :max(lens[i, k], 0)]]
                s = float(scores[i, k]) + lm_w * arpa_slot_score(
                    self.lm_model, self.vocab, hyp, len(hyp))
                if s > best_s:
                    best, best_s = hyp, s
            hyps.append(best)
        return hyps

    def decode_batch(self, args, bd, rng=None):
        """Decode ONE padded batch dict; returns (out, rng) with
        out["tokens"] (B, U) / out["lengths"] (B,). Shared by the offline
        decode loop and the serving driver (bin/serve_asr.py)."""
        decode_type = getattr(args, "decode_type", "greedy")
        feats = bd["feats"]
        mask = bd["src_mask"]
        if decode_type in ("greedy", "ctc_only"):
            out = ctc_greedy_decode_jit(self.model, self.state.params,
                                        feats, mask)
            return out, rng
        # beam
        _, enc_mask, ctc_out = self.model.apply(
            self.state.params, feats, mask, method="encode_ctc")
        lm_w = getattr(args, "ctc_lm_weight", 0.0)
        from cassnat_asr_public_tpu.models.lm import TransformerLM
        fusion_lm = self.lm_model if isinstance(
            self.lm_model, TransformerLM) else None
        # device beam; with a fusion LM it advances in-graph
        # through its KV cache (reference: beam_decode.py:31-55
        # batched per-frame LM queries)
        from cassnat_asr_public_tpu.utils.decoding import \
            ctc_frame_beam_decode_jit
        out = ctc_frame_beam_decode_jit(
            ctc_out, enc_mask.sum(-1),
            beam_width=getattr(args, "ctc_beam", 10),
            pruning_size=getattr(args, "ctc_pruning", 10) or 10,
            length_penalty=getattr(args, "ctc_lp", 0.0) or 0.0,
            lm_model=fusion_lm if lm_w > 0 else None,
            lm_params=self.lm_params if lm_w > 0 else None,
            lm_weight=lm_w)
        toks = np.asarray(out["tokens"])
        lens = np.asarray(out["lengths"])
        if lm_w > 0 and fusion_lm is None and self.lm_model is not None:
            # word n-gram (ARPA) can't be queried per-token in the
            # frame-sync beam: rerank the device n-best host-side
            # with combined score + lm_w * ngram/slots (same
            # normalization as CassNATTask._rank_ngram)
            hyps = self._rerank_nbest_ngram(
                toks, lens, np.asarray(out["scores"]), lm_w)
        else:
            hyps = [list(toks[i, 0, :lens[i, 0]])
                    for i in range(toks.shape[0])]
        # flatten the n-best to a uniform (B, U) / (B,) top-1 layout
        umax = max((len(h) for h in hyps), default=1) or 1
        top = np.zeros((len(hyps), umax), toks.dtype)
        top_len = np.zeros((len(hyps),), np.int32)
        for i, h in enumerate(hyps):
            top[i, :len(h)] = h
            top_len[i] = len(h)
        return {"tokens": top, "lengths": top_len}, rng

    def decode(self, args):
        results = {}
        t0 = time.time()
        for batch in self.test_loader:
            bd = self.shard_decode_batch(batch)
            out, _ = self.decode_batch(args, bd)
            toks = np.asarray(out["tokens"])
            lens = np.asarray(out["lengths"])
            for i, utt in enumerate(batch["utts"]):
                results[utt] = self.vocab.decode(
                    [int(t) for t in toks[i, :lens[i]] if t > 2])
        return results, time.time() - t0
