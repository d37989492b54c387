"""Label-synchronous CTC prefix scoring, fully vectorized over batch x beam.

Implements Algorithm 2 of Watanabe et al., "Hybrid CTC/Attention Architecture
for End-to-End Speech Recognition" as a `lax.scan` over frames — the
jit-compilable replacement for the reference's per-step Python DP
(reference: src/utils/ctc_prefix.py:14-106). Used by the AR joint beam search
(ctc_weight > 0; reference: src/models/transformer.py:198-212).

Unlike the reference (which restarts the frame loop at the prefix length each
step, ctc_prefix.py:85-88), the recursion here runs uniformly over all frames:
states before the reachable frontier are LOG_ZERO and propagate correctly, so
the prefix length never enters the graph shape — the whole beam loop can sit
inside one `lax.fori_loop`.

Conventions: log-domain, LOG_ZERO = -1e10. Frames beyond a sample's true
length must have x[:, t, blank] = 0 and everything else LOG_ZERO (use
`mask_ctc_out`; the reference applies the same masking,
transformer.py:139-140).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from cassnat_asr_public_tpu.ops.ctc import LOG_ZERO


def mask_ctc_out(ctc_out: jnp.ndarray, frame_mask: jnp.ndarray,
                 blank: int = 0) -> jnp.ndarray:
    """Prepare ctc_out for prefix scoring: pad frames emit blank w.p. 1."""
    out = jnp.where(frame_mask[:, :, None], ctc_out, LOG_ZERO)
    blank_col = jnp.where(frame_mask, ctc_out[:, :, blank], 0.0)
    return out.at[:, :, blank].set(blank_col)


def initial_state(ctc_out: jnp.ndarray, blank: int = 0) -> jnp.ndarray:
    """r_0 for the <sos> prefix: (B, T, 2) with r^b = cumsum blank log-probs.

    (reference: ctc_prefix.py:26-36)
    """
    bs, tmax, _ = ctc_out.shape
    r = jnp.full((bs, tmax, 2), LOG_ZERO, dtype=jnp.float32)
    return r.at[:, :, 1].set(jnp.cumsum(ctc_out[:, :, blank], axis=1))


def prefix_score_step(x: jnp.ndarray, cs: jnp.ndarray, y_last: jnp.ndarray,
                      r_prev: jnp.ndarray, is_empty_prefix: jnp.ndarray,
                      blank: int = 0, eos: int = 2
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score extending each prefix g (implicit in r_prev) by candidates cs.

    Args:
      x: (N, T, V) masked CTC log-probs (N = batch*beam).
      cs: (N, W) candidate next tokens.
      y_last: (N,) last token of each prefix (sos if empty).
      r_prev: (N, T, 2) previous CTC state [non-blank, blank].
      is_empty_prefix: (N,) bool — True when g is empty (c is first label).
    Returns:
      log_psi: (N, W) prefix scores log P(g+c prefix | X).
      r_new: (N, W, T, 2) per-candidate states (gather the chosen candidate
        along W to form the next r_prev).
    """
    n, tmax, _ = x.shape
    x = x.astype(jnp.float32)
    x_select = jnp.take_along_axis(
        x, cs[:, None, :].astype(jnp.int32), axis=2)  # (N, T, W)
    x_blank = x[:, :, blank]  # (N, T)

    r_sum = jnp.logaddexp(r_prev[:, :, 0], r_prev[:, :, 1])  # (N, T)
    same_last = cs == y_last[:, None]  # (N, W)
    # phi(t): prob of g complete by frame t, available to start c at t+1.
    log_phi = jnp.where(same_last[:, None, :], r_prev[:, :, 1:2],
                        r_sum[:, :, None])  # (N, T, W)
    # "phi(-1)": LOG_ONE only for the empty prefix.
    w = cs.shape[1]
    phi_m1 = jnp.where(is_empty_prefix[:, None], 0.0, LOG_ZERO)
    phi_m1 = jnp.broadcast_to(phi_m1, (n, w))
    phi_shift = jnp.concatenate(
        [phi_m1[:, None, :], log_phi[:, :-1, :]], axis=1)  # (N, T, W)

    # The frame recurrences are first-order linear in the log semiring:
    #   s_t = logaddexp(s_{t-1} + A_t, C_t),  s_{-1} = LOG_ZERO
    # so instead of a 184-step sequential lax.scan (~5.5 ms per beam step
    # at (N=160, W=30) — the dominant cost of the whole AR beam), solve
    # each with an O(log T)-depth associative scan over (A, C) pairs:
    #   (A1,C1) then (A2,C2)  ==  (A1+A2, logaddexp(C1+A2, C2))
    # With s_{-1} = LOG_ZERO the solution is just the accumulated C.
    #   rn_t = logaddexp(rn_{t-1}, phi_{t-1}) + x_t(c)
    #          -> A = x_sel, C = phi_shift + x_sel
    #   rb_t = logaddexp(rb_{t-1}, rn_{t-1}) + x_t(blank)
    #          -> A = x_blank, C = shift(rn) + x_blank   (needs rn first)
    #   psi_T = logsumexp_t(phi_{t-1} + x_t(c))          (no scan at all)

    def lin_logsemiring_scan(a, c):
        def combine(l, r):
            (a1, c1), (a2, c2) = l, r
            return a1 + a2, jnp.logaddexp(c1 + a2, c2)
        return jax.lax.associative_scan(combine, (a, c), axis=1)[1]

    rn_seq = lin_logsemiring_scan(x_select, phi_shift + x_select)
    rn_prev = jnp.concatenate(
        [jnp.full_like(rn_seq[:, :1], LOG_ZERO), rn_seq[:, :-1]], axis=1)
    xb_w = jnp.broadcast_to(x_blank[:, :, None], x_select.shape)
    rb_seq = lin_logsemiring_scan(xb_w, rn_prev + xb_w)
    log_psi = jax.nn.logsumexp(phi_shift + x_select, axis=1)  # (N, W)

    r_new = jnp.stack([rn_seq, rb_seq], axis=-1)  # (N, T, W, 2)
    r_new = jnp.moveaxis(r_new, 1, 2)  # (N, W, T, 2)

    # eos candidate: score is total prefix prob; blank candidate: invalid.
    log_psi = jnp.where(cs == eos, r_sum[:, -1:], log_psi)
    log_psi = jnp.where(cs == blank, LOG_ZERO, log_psi)
    return log_psi, r_new
