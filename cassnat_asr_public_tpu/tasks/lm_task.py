"""LMTask: transformer LM training (uniLM causal / MLM masked).

(reference: src/bin/lm_train.py — self-contained loop with NLLLoss and
accuracy metric; here folded into the task layer like the other families.
Note the reference's lm_train.py imports a nonexistent `get_opt`
(lm_train.py:19, latent bug) — we use the real schedule factory.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cassnat_asr_public_tpu.data.text_loader import TextDataLoader, TextDataset
from cassnat_asr_public_tpu.data.vocab import Vocab
from cassnat_asr_public_tpu.models import make_lm
from cassnat_asr_public_tpu.tasks.base import BaseTask, TrainState
from cassnat_asr_public_tpu.utils import metrics as M
from cassnat_asr_public_tpu.utils.losses import nll_loss


class LMTask(BaseTask):
    model_name = "lm"

    def set_model(self, args):
        self.model = make_lm(args)
        self.causal = getattr(args, "lm_type", "uniLM") == "uniLM"
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        params = self.model.init({"params": rng, "dropout": rng},
                                 jnp.ones((2, 8), jnp.int32),
                                 causal=self.causal, deterministic=False)
        self.state = TrainState(params, None)

    def set_optimizer(self, args):
        super().set_optimizer(args)
        self.state.opt_state = self.optimizer.init(self.state.params)

    def set_dataloader(self, args):
        lm_type = getattr(args, "lm_type", "uniLM")
        train_ds = TextDataset(self.vocab, args.train_text, lm_type,
                               getattr(args, "max_len", 128))
        dev_ds = TextDataset(self.vocab, args.dev_text, lm_type,
                             getattr(args, "max_len", 128))
        self.train_loader = TextDataLoader(
            train_ds, args.batch_size, shuffle=True,
            shard=(self.rank, self.world))
        self.valid_loader = TextDataLoader(
            dev_ds, args.batch_size, shard=(self.rank, self.world))

    def set_test_dataloader(self, args):
        self.set_dataloader(args)

    def loss_fn(self, params, batch, rngs, train: bool):
        logp = self.model.apply(params, batch["tokens"], causal=self.causal,
                                deterministic=not train,
                                rngs=rngs if train else {})
        loss = nll_loss(logp, batch["targets"])
        pred = logp.argmax(-1)
        mask = batch["targets"] != 0
        acc = jnp.where(mask, pred == batch["targets"], False).sum() / \
            jnp.maximum(mask.sum(), 1)
        return {"loss": loss, "acc": acc}

    def make_meters(self):
        m = super().make_meters()
        m.update(acc=M.AverageMeter("Acc", ":.4f"))
        return m

    def metric_stage(self, out, batch):
        return {"loss": out["loss"], "acc": out["acc"],
                "tokens": int((batch["targets"] != 0).sum())}

    def metric_apply(self, vals, meters):
        meters["loss"].update(float(vals["loss"]), vals["tokens"])
        meters["acc"].update(float(vals["acc"]), vals["tokens"])

    def prepare_batch(self, batch):
        from cassnat_asr_public_tpu.parallel.mesh import shard_batch
        # pad batch dim to a multiple of the data axis (padding rows are
        # all-padding_idx and contribute nothing to nll_loss/accuracy)
        n_data = self.mesh.shape["data"]
        bs = batch["tokens"].shape[0]
        pad = (-bs) % n_data
        if pad:
            batch = {k: np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)], 0)
                if isinstance(v, np.ndarray) and v.ndim >= 1
                and v.shape[0] == bs else v
                for k, v in batch.items()}
        return shard_batch(batch, self.mesh)

    def epoch_metric(self, valid_meters):
        return valid_meters["loss"].avg
