"""Schedule-formula parity vs the reference equations + loss parity vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from cassnat_asr_public_tpu.utils.config import Config, merge_configs
from cassnat_asr_public_tpu.utils.losses import (
    kd_loss,
    label_smoothing_loss,
    nll_loss,
)
from cassnat_asr_public_tpu.utils.schedules import (
    cosine_schedule,
    get_mul_optim,
    get_optim,
    multistep_schedule,
    noam_schedule,
)


def _ref_noam(step, factor, d_model, warmup, total, wtype):
    """The reference rate equations (reference: optimizer.py:104-117)."""
    import math
    if wtype == "noam_warmup":
        return factor * (warmup ** 0.5 * min(step ** -0.5,
                                             step * warmup ** -1.5))
    c = d_model ** -0.5
    if step <= warmup:
        return factor * c * step * warmup ** -1.5
    if wtype == "custom_exp":
        return factor * c * step ** -0.5
    base = c * warmup ** -0.5
    return factor * base * max(1 - (step - warmup) / (total - warmup), 0)


def test_noam_schedule_parity():
    for wtype in ["noam_warmup", "custom_exp", "custom_linear"]:
        s = noam_schedule(5.0, 512, 25000, 250000, wtype)
        for step in [1, 100, 25000, 50000, 200000]:
            got = float(s(jnp.asarray(step)))
            want = _ref_noam(step, 5.0, 512, 25000, 250000, wtype)
            # f32 on-device vs f64 host: tiny absolute slack for the
            # near-zero linear-decay tail
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


def test_multistep_schedule_shape():
    s = multistep_schedule(0.01, 1000, 40000, 160000)
    assert float(s(jnp.asarray(500))) == 0.5          # warmup ramp
    assert float(s(jnp.asarray(20000))) == 1.0        # hold
    assert float(s(jnp.asarray(160000))) <= 0.0101    # decayed
    np.testing.assert_allclose(float(s(jnp.asarray(200000))), 0.01)


def test_cosine_schedule():
    s = cosine_schedule(total=1000, warmup=0)
    np.testing.assert_allclose(float(s(jnp.asarray(0))), 1.0)
    np.testing.assert_allclose(float(s(jnp.asarray(1000))), 0.0, atol=1e-6)


def test_mul_optim_freeze_steps():
    """Frozen group receives zero updates until freeze_steps."""
    import optax
    args = Config(optim_type="noam", d_model=8, noam_factor=[1.0, 1.0],
                  warmup_steps=[5, 5], freeze_steps=[10, 0],
                  total_steps=100, warmup_type="noam_warmup",
                  learning_rate=1e-3, weight_decay=0, grad_clip=0, eps=1e-9)

    def label_fn(params):
        return {"enc": "encoder", "dec": "decoder"}

    tx = get_mul_optim("noam", ("encoder", "decoder"), label_fn, args)
    params = {"enc": jnp.ones((3,)), "dec": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"enc": jnp.ones((3,)), "dec": jnp.ones((3,))}
    updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["enc"]).max()) == 0.0   # frozen
    assert float(jnp.abs(updates["dec"]).max()) > 0.0


def test_label_smoothing_matches_torch(rng):
    """Exact parity with the reference LabelSmoothing (loss.py:21-35)."""
    v, n = 11, 12
    logits = rng.normal(size=(n, v)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    tgt = rng.integers(0, v, size=(n,))
    tgt[3] = 0  # padding rows
    tgt[7] = 0

    got = float(label_smoothing_loss(jnp.asarray(lp), jnp.asarray(tgt), v,
                                     padding_idx=0, smoothing=0.1))

    # torch reference computation
    x = torch.tensor(lp)
    target = torch.tensor(tgt)
    true_dist = torch.full((n, v), 0.1 / (v - 1))
    mask = target != 0
    tokens = int(mask.sum())
    t_safe = target.masked_fill(~mask, 0)
    true_dist.scatter_(1, t_safe.unsqueeze(1), 0.9)
    kl = torch.nn.KLDivLoss(reduction="none")(x, true_dist)
    kl = kl.masked_fill(~mask.unsqueeze(1), 0)
    want = float(kl.sum() / tokens)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kd_loss_runs(rng):
    v, n = 7, 6
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(n, v)).astype(np.float32)), -1))
    teacher = np.asarray(jax.nn.softmax(
        jnp.asarray(rng.normal(size=(n, v)).astype(np.float32)), -1))
    tgt = rng.integers(1, v, size=(n,))
    out = float(kd_loss(jnp.asarray(lp), jnp.asarray(teacher),
                        jnp.asarray(tgt), v))
    assert np.isfinite(out) and out > 0


def test_nll_loss(rng):
    v, n = 5, 8
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(n, v)).astype(np.float32)), -1))
    tgt = rng.integers(1, v, size=(n,))
    got = float(nll_loss(jnp.asarray(lp), jnp.asarray(tgt)))
    want = float(torch.nn.NLLLoss()(torch.tensor(lp), torch.tensor(tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_config_three_way_merge(tmp_path):
    import yaml
    t = tmp_path / "train.yaml"
    d = tmp_path / "data.yaml"
    t.write_text(yaml.safe_dump({"d_model": 256, "dropout": 0.2,
                                 "spec_aug": {"n_freq_mask": 2}}))
    d.write_text(yaml.safe_dump({"vocab_file": "v.txt", "d_model": 128}))

    cfg = merge_configs(Config(exp_dir="exp", task="art"), str(t), str(d))
    assert cfg.exp_dir == "exp"
    assert cfg.d_model == 128         # data yaml applied last
    assert cfg.dropout == 0.2
    assert cfg.specaug_conf.n_freq_mask == 2


def test_mwer_loss_hand_computed():
    """Expected-WER loss vs a hand-rolled numpy oracle (reference:
    src/utils/loss.py:37-49 semantics: per-candidate length-normalized
    hypothesis log-prob weighted by max-shifted WER weights)."""
    from cassnat_asr_public_tpu.utils.losses import mwer_loss
    rng = np.random.default_rng(3)
    B1, S, U, V = 2, 3, 4, 6
    lp = np.log(rng.dirichlet(np.ones(V), size=(B1 * S, U))).astype(
        np.float32)
    tgt = rng.integers(1, V, size=(B1 * S, U)).astype(np.int32)
    tgt[0, 2:] = 0   # padded tails
    tgt[4, 1:] = 0
    ww = rng.normal(size=(B1, S)).astype(np.float32)

    got = float(mwer_loss(jnp.asarray(lp), jnp.asarray(tgt),
                          jnp.asarray(ww)))

    att_prob = np.empty(B1 * S, np.float64)
    for i in range(B1 * S):
        m = tgt[i] != 0
        att_prob[i] = lp[i, np.arange(U), tgt[i]][m].sum() / max(m.sum(), 1)
    att_prob = att_prob.reshape(B1, S)
    w = ww - ww.max(1, keepdims=True)
    want = float((att_prob * w).mean(1).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_weight_decay_skips_rel_pe_table():
    """weight_decay must not shrink the frozen */pos_enc/table params
    (ADVICE r2: stop_gradient blocks the grad, not the decay term)."""
    import optax
    from cassnat_asr_public_tpu.utils.config import Config
    from cassnat_asr_public_tpu.utils.schedules import get_optim

    args = Config(optim_type="noam", noam_factor=1.0, d_model=8,
                  warmup_steps=10, warmup_type="noam_warmup",
                  weight_decay=0.1, grad_clip=0.0)
    params = {"params": {"enc": {"pos_enc": {"table": jnp.ones((3, 4))},
                                 "dense": {"kernel": jnp.ones((4, 4))}}}}
    tx = get_optim("noam", args)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    # zero grad + decay: the table update must be exactly zero, the dense
    # kernel update must be nonzero (decayed).
    table_u = updates["params"]["enc"]["pos_enc"]["table"]
    dense_u = updates["params"]["enc"]["dense"]["kernel"]
    assert float(jnp.abs(table_u).max()) == 0.0
    assert float(jnp.abs(dense_u).max()) > 0.0
