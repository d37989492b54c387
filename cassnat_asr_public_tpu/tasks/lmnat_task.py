"""LMNATTask family: CASS-NAT + text-encoder fusion training.

(reference: src/tasks/lmnat_task.py, lmnat2_task.py, lmnat3_task.py —
text-encoder tokenizer setup (SP / GPT-2 BPE / BERT WordPiece), freeze logic,
text-encoder init from pretrained checkpoints.)

Here the 'lm' text-encoder path trains fully on-device (the tokenizer hop is
the identity over the shared SP vocab); GPT-2/BERT tokenization happens
host-side per batch via the detok->retok hop and is fed as `text_input`.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cassnat_asr_public_tpu.models.lmnat import (
    make_lmnat,
    make_lmnat2,
    make_lmnat3,
)
from cassnat_asr_public_tpu.tasks.cassnat_task import CassNATTask
from cassnat_asr_public_tpu.tasks.base import TrainState
from cassnat_asr_public_tpu.utils import checkpoint as ckpt

MAKERS = {"lmnat": make_lmnat, "lmnat2": make_lmnat2, "lmnat3": make_lmnat3}


class LMNATTask(CassNATTask):
    model_name = "lmnat"
    variant = "lmnat"

    def set_model(self, args):
        self.model = MAKERS[self.variant](args.input_size, args)
        self._set_text_tokenizers(args)
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        feats = jnp.zeros((2, 16, args.input_size))
        mask = jnp.ones((2, 16), bool)
        lbl = jnp.ones((2, 5), jnp.int32)
        ls = jnp.ones((2,), jnp.int32)
        rngs = {"params": rng, "dropout": rng, "sample": rng, "mask": rng,
                "mix": rng}
        init_kwargs = {}
        if self._needs_host_text():
            init_kwargs = {"text_input": jnp.ones((2, 6), jnp.int32),
                           "text_mask": jnp.ones((2, 6), bool)}
        params = self.model.init(rngs, feats, mask, lbl, ls,
                                 deterministic=False, **init_kwargs)
        self.state = TrainState(params, None)

    # ---- host-side detok->retok hop for GPT-2/BERT text encoders
    # (reference: lmnat_task.py:29-45 tokenizer setup; lmnat.py:219-233
    # per-batch re-tokenization) ----
    def _set_text_tokenizers(self, args):
        self.asr_tokenizer = None
        self.text_tokenizer = None
        ttype = getattr(args, "text_encoder_type", "lm")
        if ttype not in ("gpt2", "bert"):
            return
        from cassnat_asr_public_tpu.data.tokenizer import SPModelTokenizer
        from cassnat_asr_public_tpu.data.hf_tokenizers import (
            BertWordPieceTokenizer,
            GPT2BPETokenizer,
        )
        sp_path = getattr(args, "tokenizer", "")
        if sp_path:
            self.asr_tokenizer = SPModelTokenizer(sp_path, self.vocab)
        if ttype == "gpt2":
            self.text_tokenizer = GPT2BPETokenizer(
                args.gpt2_encoder_json, args.gpt2_vocab_bpe)
            eot = self.text_tokenizer.encoder.get("<|endoftext|>", 0)
            self._text_sos = [eot]  # reference addsos=True for gpt2
        else:
            self.text_tokenizer = BertWordPieceTokenizer(args.bert_vocab)
            self._text_sos = []

    def _needs_host_text(self):
        # LMNAT3's SAD consumes acoustic embeddings, never token text
        return self.variant != "lmnat3" and self.text_tokenizer is not None \
            and getattr(self.args, "text_encoder_type", "lm") in \
            ("gpt2", "bert")

    def _detok(self, ids):
        """ASR token ids -> text (SP detok when available, else vocab join)."""
        if self.asr_tokenizer is not None:
            pieces = [self.vocab.index2word[int(i)] for i in ids]
            return self.asr_tokenizer.tokens2text(pieces)
        from cassnat_asr_public_tpu.data.vocab import pieces_to_text
        return pieces_to_text(
            self.vocab.index2word[int(i)] for i in ids)

    def _host_text_batch(self, hyp_tokens, hyp_lens, pad_to: int = 16):
        """CTC-greedy ids -> detok -> text-encoder ids, padded (bucketed to
        multiples of `pad_to` to bound jit recompiles)."""
        rows = []
        for i in range(len(hyp_lens)):
            ids = [int(t) for t in hyp_tokens[i, :hyp_lens[i]] if t > 2]
            text = self._detok(ids)
            rows.append(self._text_sos + self.text_tokenizer.text2tokens(text))
        tmax = max(max((len(r) for r in rows), default=1), 1)
        tmax = -(-tmax // pad_to) * pad_to
        out = np.zeros((len(rows), tmax), np.int32)
        for i, r in enumerate(rows):
            out[i, :len(r)] = r[:tmax]
        # GPT-2 id 0 ('!') is a real token; mask by length, not by id
        mask = np.arange(tmax)[None, :] < np.array(
            [min(len(r), tmax) for r in rows])[:, None]
        mask[:, 0] = True  # never a fully-empty text row
        return out, mask

    def run_one_epoch(self, epoch, args, is_train=True):
        self._epoch_is_train = is_train
        return super().run_one_epoch(epoch, args, is_train)

    def _scheduled_mix_gt(self):
        """Linear anneal of the schedule-sampling ground-truth probability:
        1 before mix_gt_start_steps, then mix_gt_prob_max -> mix_gt_prob_min
        over mix_gt_steps updates (reference: lmnat_task.py:333-338). Falls
        back to the static mix_gt_prob when no schedule keys are set.

        The reference anneals on OPTIMIZER updates (its step counter
        increments once per accum_grad micro-batches) while self.state.step
        counts micro-batches — divide by accum_grad before comparing
        (same convention as BaseTask.on_train_step)."""
        a = self.args
        start = getattr(a, "mix_gt_start_steps", None)
        if start is None:
            return float(getattr(a, "mix_gt_prob", 0.5))
        accum = max(getattr(a, "accum_grad", 1), 1)
        updates = self.state.step // accum
        if updates < start:
            return 1.0
        pmax = float(getattr(a, "mix_gt_prob_max",
                             getattr(a, "mix_gt_prob", 0.5)))
        pmin = float(getattr(a, "mix_gt_prob_min", 0.0))
        steps = max(int(getattr(a, "mix_gt_steps", 1)), 1)
        return max(pmin,
                   pmax - (updates - start) * (pmax - pmin) / steps)

    def prepare_batch(self, batch):
        d = super().prepare_batch(batch)
        if self._needs_host_text():
            from cassnat_asr_public_tpu.utils.decoding import \
                ctc_greedy_decode_jit
            g = ctc_greedy_decode_jit(self.model, self.state.params,
                                      d["feats"], d["src_mask"])
            ti, tm = self._host_text_batch(np.asarray(g["tokens"]),
                                           np.asarray(g["lengths"]))
            from cassnat_asr_public_tpu.parallel.mesh import shard_batch
            d.update(shard_batch({"text_input": ti, "text_mask": tm},
                                 self.mesh))
        if getattr(self.args, "mix_type", "none") != "none" and \
                getattr(self, "_epoch_is_train", False):
            # traced scalar -> no recompile as the anneal advances
            d["mix_gt_prob"] = np.float32(self._scheduled_mix_gt())
        return d

    def load_model(self, args):
        """Fresh starts without an AST resume_model must still honor
        text_encoder_path (the reference inits the text encoder from its
        own checkpoint independently of the encoder init,
        lmnat_task.py:119-130); resuming from model.last.ckpt keeps the
        text encoder from that checkpoint."""
        resumed = os.path.exists(os.path.join(args.exp_dir,
                                              "model.last.ckpt"))
        super().load_model(args)
        if self.mode == "train" and not resumed and \
                not getattr(args, "resume_model", ""):
            self._load_text_encoder(args)

    def load_pretrained_model(self, args):
        """AST encoder init (gated by init_encoder, via super) + optional
        pretrained text encoder gated by init_text_encoder — LMNAT3 spells
        it init_sad (reference: lmnat_task.py:99-147, lmnat3_task.py:83-102)."""
        super().load_pretrained_model(args)
        self._load_text_encoder(args)

    def _load_text_encoder(self, args):
        init_te = getattr(args, "init_sad", None) if self.variant == \
            "lmnat3" else None
        if init_te is None:
            init_te = getattr(args, "init_text_encoder", True)
        te_path = getattr(args, "text_encoder_path", "")
        if te_path and init_te:
            from flax import serialization
            state = ckpt.load_checkpoint(te_path)
            src = serialization.to_state_dict(state["params"])
            inner = src.get("params", src)
            if "text_encoder" not in inner:
                # A standalone LM checkpoint (bin/lm_train) has the backbone
                # at its top level (embed/layer{i}/norm/generator); re-root
                # it under the LMNAT submodule name so the transplant maps
                # onto self.text_encoder (reference loads the LM state dict
                # directly into model.text_encoder, lmnat_task.py:119-130).
                src = {"text_encoder": inner}
            self.state.params = ckpt.transplant_subtrees(
                self.state.params, src, ("text_encoder",))
            if self.rank == 0:
                print(f"Loaded text encoder from {te_path}", flush=True)

    def loss_fn(self, params, batch, rngs, train: bool):
        tgt_label = batch["labels"][:, 1:]
        sample_topk = getattr(self.args, "sample_topk", 0) if train else 0
        kwargs = {}
        if "text_input" in batch:
            kwargs = {"text_input": batch["text_input"],
                      "text_mask": batch["text_mask"]}
        if train and "mix_gt_prob" in batch and self.variant != "lmnat3":
            kwargs["mix_gt_prob"] = batch["mix_gt_prob"]
        out = self.model.apply(
            params, batch["feats"], batch["src_mask"], tgt_label,
            batch["label_sizes"], sample_topk=sample_topk,
            deterministic=not train, rngs=rngs if train else {}, **kwargs)
        # in-graph greedy WER counts (pops the big ctc/att logits so the
        # jitted step returns only scalars; CtcWer/AttWer meters were
        # silently 0 without this — inherited metric_keys expect *_errs)
        return self.attach_wer_metrics(out, batch)

    def _decode_text_kwargs(self, feats, mask):
        """GPT-2/BERT decode: text from the CTC greedy hypothesis, host
        re-tokenized (reference: lmnat.py:493-521, use_esa_for_text_encoder=0
        — one text per utterance, repeated over ESA candidates in
        nat_decode_jit)."""
        if not self._needs_host_text():
            return {}
        from cassnat_asr_public_tpu.utils.decoding import \
            ctc_greedy_decode_jit
        g = ctc_greedy_decode_jit(self.model, self.state.params, feats, mask)
        ti, tm = self._host_text_batch(np.asarray(g["tokens"]),
                                       np.asarray(g["lengths"]))
        return {"text_input": jnp.asarray(ti), "text_mask": jnp.asarray(tm)}

    def build_steps(self):
        import optax
        optimizer = self.optimizer
        loss_fn = self.loss_fn

        @jax.jit
        def train_step(params, opt_state, batch, rng, lr_scale):
            rngs = {"dropout": rng, "sample": jax.random.fold_in(rng, 1),
                    "mask": jax.random.fold_in(rng, 2),
                    "mix": jax.random.fold_in(rng, 3)}

            def lf(p):
                out = loss_fn(p, batch, rngs, train=True)
                return out["loss"], out

            (loss, out), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, out

        @jax.jit
        def eval_step(params, batch):
            return loss_fn(params, batch, {}, train=False)

        self.train_step = train_step
        self.eval_step = eval_step


class LMNAT2Task(LMNATTask):
    model_name = "lmnat2"
    variant = "lmnat2"


class LMNAT3Task(LMNATTask):
    model_name = "lmnat3"
    variant = "lmnat3"
