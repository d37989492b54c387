"""Training losses (label smoothing, KD, MWER) as pure functions.

(reference: src/utils/loss.py — LabelSmoothing KLDiv w/ padding mask and
token normalization, forward_best_path masked variant, MWER, KLDivLoss.)
"""

import jax
import jax.numpy as jnp


def label_smoothing_loss(log_probs, targets, vocab_size, padding_idx=0,
                         smoothing=0.1, extra_mask=None):
    """KL(true_smoothed || model) summed over non-pad tokens / token count.

    log_probs: (..., V) log-softmax outputs; targets: (...) int ids.
    Matches the reference exactly: the smoothed distribution puts
    `1-smoothing` on the target and `smoothing/(V-1)` on every other class
    (including over the target's own slot before the scatter), and the KLDiv
    sum runs over ALL classes of non-pad positions
    (reference: src/utils/loss.py:21-35).

    extra_mask: optional extra bool mask over positions (forward_best_path
    variant, reference: loss.py:51-66).
    """
    lp = log_probs.reshape(-1, vocab_size).astype(jnp.float32)
    tgt = targets.reshape(-1)
    mask = tgt != padding_idx
    if extra_mask is not None:
        loss_mask = mask & extra_mask.reshape(-1)
    else:
        loss_mask = mask
    tokens = jnp.maximum(mask.sum(), 1)

    confidence = 1.0 - smoothing
    low = smoothing / (vocab_size - 1)
    tgt_safe = jnp.where(mask, tgt, 0)
    onehot = jax.nn.one_hot(tgt_safe, vocab_size, dtype=jnp.float32)
    true_dist = onehot * (confidence - low) + low
    # KLDiv(log q, p) elementwise = p * (log p - log q)
    log_true = jnp.log(jnp.clip(true_dist, 1e-20, 1.0))
    kl = true_dist * (log_true - lp)
    kl = jnp.where(loss_mask[:, None], kl, 0.0)
    return kl.sum() / tokens.astype(jnp.float32)


def kd_loss(log_probs, teacher_probs, targets, vocab_size, padding_idx=0,
            kd_weight=0.1):
    """Knowledge-distillation KLDiv: target = (1-w)*onehot + w*teacher.

    (reference: src/utils/loss.py:68-90)
    """
    lp = log_probs.reshape(-1, vocab_size).astype(jnp.float32)
    tp = teacher_probs.reshape(-1, vocab_size).astype(jnp.float32)
    tgt = targets.reshape(-1)
    mask = tgt != padding_idx
    tokens = jnp.maximum(mask.sum(), 1)
    onehot = jax.nn.one_hot(jnp.where(mask, tgt, 0), vocab_size,
                            dtype=jnp.float32)
    target_dist = (1 - kd_weight) * onehot + kd_weight * tp
    log_t = jnp.log(jnp.clip(target_dist, 1e-20, 1.0))
    kl = target_dist * (log_t - lp)
    kl = jnp.where(mask[:, None], kl, 0.0)
    return kl.sum() / tokens.astype(jnp.float32)


def mwer_loss(att_log_probs, ctc_targets, wer_weight):
    """Expected-WER loss over sampled hypotheses.

    att_log_probs: (B, U, V); ctc_targets: (B, U); wer_weight: (B', S)
    reshaped sample scores (reference: src/utils/loss.py:37-49).
    """
    tgt_mask = ctc_targets != 0
    tokens = tgt_mask.sum(1).reshape(wer_weight.shape)
    picked = jnp.take_along_axis(att_log_probs, ctc_targets[..., None],
                                 axis=-1)[..., 0]
    picked = jnp.where(tgt_mask, picked, 0.0).sum(1).reshape(wer_weight.shape)
    att_prob = picked / jnp.maximum(tokens, 1).astype(jnp.float32)
    w = wer_weight.astype(jnp.float32)
    w = w - w.max(1, keepdims=True)
    return (att_prob * w).mean(1).mean()


def nll_loss(log_probs, targets, padding_idx=0):
    """Token-mean negative log likelihood (LM training; reference lm_train.py)."""
    lp = log_probs.reshape(-1, log_probs.shape[-1]).astype(jnp.float32)
    tgt = targets.reshape(-1)
    mask = tgt != padding_idx
    picked = jnp.take_along_axis(lp, jnp.where(mask, tgt, 0)[:, None],
                                 axis=1)[:, 0]
    tokens = jnp.maximum(mask.sum(), 1)
    return -(jnp.where(mask, picked, 0.0).sum()) / tokens.astype(jnp.float32)
