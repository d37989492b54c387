"""LMNATTask family: CASS-NAT + text-encoder fusion training.

(reference: src/tasks/lmnat_task.py, lmnat2_task.py, lmnat3_task.py —
text-encoder tokenizer setup (SP / GPT-2 BPE / BERT WordPiece), freeze logic,
text-encoder init from pretrained checkpoints.)

Here the 'lm' text-encoder path trains fully on-device (the tokenizer hop is
the identity over the shared SP vocab); GPT-2/BERT tokenization happens
host-side per batch via the detok->retok hop and is fed as `text_input`.
"""

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
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        feats = jnp.zeros((2, 16, args.input_size))
        mask = jnp.ones((2, 16), bool)
        lbl = jnp.ones((2, 5), jnp.int32)
        ls = jnp.ones((2,), jnp.int32)
        rngs = {"params": rng, "dropout": rng, "sample": rng, "mask": rng,
                "mix": rng}
        params = self.model.init(rngs, feats, mask, lbl, ls,
                                 deterministic=False)
        self.state = TrainState(params, None)

    def load_pretrained_model(self, args):
        """AST encoder init + optional pretrained text encoder
        (reference: lmnat_task.py:119-130)."""
        super().load_pretrained_model(args)
        te_path = getattr(args, "text_encoder_path", "")
        if te_path:
            state = ckpt.load_checkpoint(te_path)
            self.state.params = ckpt.transplant_subtrees(
                self.state.params, state["params"], ("text_encoder",))
            if self.rank == 0:
                print(f"Loaded text encoder from {te_path}", flush=True)

    def loss_fn(self, params, batch, rngs, train: bool):
        tgt_label = batch["labels"][:, 1:]
        sample_topk = getattr(self.args, "sample_topk", 0) if train else 0
        return self.model.apply(
            params, batch["feats"], batch["src_mask"], tgt_label,
            batch["label_sizes"], sample_topk=sample_topk,
            deterministic=not train, rngs=rngs if train else {})

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
