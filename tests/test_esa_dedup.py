"""ESA candidate dedup: exactness vs the undeduped ranked decode.

The dedup stages (utils/decoding.py nat_decode_jit dedup_align/dedup_rank)
must produce output identical to ranking all sample_num candidates whenever
the caps cover the per-utterance unique counts (the reference ranks every
candidate incl. duplicates; reference: src/models/cassnat.py:441-573).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cassnat_asr_public_tpu.utils.decoding import (
    _group_dedup,
    _row_hashes,
    nat_decode_jit,
)


def test_row_hash_group_dedup_matches_numpy():
    rng = np.random.default_rng(0)
    bs, s, t = 3, 10, 17
    rows = rng.integers(0, 4, size=(bs * s, t)).astype(np.int32)
    # plant exact duplicates
    rows[1] = rows[0]
    rows[4] = rows[0]
    rows[s + 3] = rows[s + 1]
    lens = (rows != 0).sum(-1).astype(np.int32)
    h1, h2 = _row_hashes(jnp.asarray(rows), jnp.asarray(lens))
    is_dup, n_unique = _group_dedup(h1, h2, bs, s)
    is_dup = np.asarray(is_dup)
    n_unique = np.asarray(n_unique)
    for b in range(bs):
        seen = set()
        for j in range(s):
            key = rows[b * s + j].tobytes()
            assert bool(is_dup[b, j]) == (key in seen)
            seen.add(key)
        assert n_unique[b] == len(seen)


@pytest.fixture(scope="module")
def tiny_setup():
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _tiny_cassnat

    model = _tiny_cassnat()
    rng = jax.random.PRNGKey(0)
    bs, t, fdim = 3, 64, 40
    feats = jax.random.normal(rng, (bs, t, fdim), jnp.float32)
    mask = jnp.ones((bs, t), bool)
    labels = jnp.concatenate(
        [jax.random.randint(rng, (bs, 8), 3, 64),
         jnp.full((bs, 1), 2, jnp.int32)], axis=1)
    params = model.init({"params": rng}, feats, mask, labels,
                        jnp.full((bs,), 8, jnp.int32))
    # Sharpen the CTC head so posteriors are peaked like a trained model's:
    # only a few frames fall below the sampling threshold, so the sampled
    # alignments contain many exact duplicates (the regime dedup targets).
    params = jax.tree_util.tree_map(lambda x: x, params)  # copy
    gen = params["params"]["ctc_generator"]["proj"]
    gen["kernel"] = gen["kernel"] * 60.0
    gen["bias"] = gen["bias"] * 60.0

    def lm_apply(lm_params, ys, f, m):
        # deterministic toy "LM": fixed random per-(position, token) logits
        v = 64
        tab = jax.random.normal(jax.random.PRNGKey(7), (ys.shape[1], v))
        return jnp.broadcast_to(tab[None], (ys.shape[0],) + tab.shape)

    return model, params, feats, mask, lm_apply


SAMPLE_NUM = 8


def _decode(model, params, feats, mask, lm_apply, **kw):
    return nat_decode_jit(
        model, params, feats, mask, jax.random.PRNGKey(5), umax=24,
        sample_num=SAMPLE_NUM, threshold=0.9, rank_model="lm",
        lm_apply=lm_apply, lm_apply_logits=True, **kw)


def test_dedup_align_exact(tiny_setup):
    model, params, feats, mask, lm_apply = tiny_setup
    full = _decode(model, params, feats, mask, lm_apply)
    probe = _decode(model, params, feats, mask, lm_apply,
                    dedup_align=SAMPLE_NUM - 1)
    n_unique = int(np.asarray(probe["n_unique_align"]).max())
    assert n_unique < SAMPLE_NUM - 1, \
        f"fixture not peaked enough: {n_unique} uniques of {SAMPLE_NUM}"
    dedup = _decode(model, params, feats, mask, lm_apply,
                    dedup_align=max(n_unique, 2))
    np.testing.assert_array_equal(np.asarray(full["tokens"]),
                                  np.asarray(dedup["tokens"]))
    np.testing.assert_array_equal(np.asarray(full["lengths"]),
                                  np.asarray(dedup["lengths"]))


def test_dedup_rank_exact(tiny_setup):
    model, params, feats, mask, lm_apply = tiny_setup
    full = _decode(model, params, feats, mask, lm_apply)
    probe = _decode(model, params, feats, mask, lm_apply,
                    dedup_rank=SAMPLE_NUM - 1)
    n_unique = int(np.asarray(probe["n_unique_rank"]).max())
    assert n_unique < SAMPLE_NUM - 1
    dedup = _decode(model, params, feats, mask, lm_apply,
                    dedup_rank=max(n_unique, 2))
    np.testing.assert_array_equal(np.asarray(full["tokens"]),
                                  np.asarray(dedup["tokens"]))


def test_dedup_both_stages_exact(tiny_setup):
    model, params, feats, mask, lm_apply = tiny_setup
    full = _decode(model, params, feats, mask, lm_apply)
    probe = _decode(model, params, feats, mask, lm_apply,
                    dedup_align=SAMPLE_NUM - 1, dedup_rank=SAMPLE_NUM - 2)
    c1 = int(np.asarray(probe["n_unique_align"]).max())
    c2 = int(np.asarray(probe["n_unique_rank"]).max())
    dedup = _decode(model, params, feats, mask, lm_apply,
                    dedup_align=max(c1, 2), dedup_rank=max(c2, 2))
    np.testing.assert_array_equal(np.asarray(full["tokens"]),
                                  np.asarray(dedup["tokens"]))


def test_rank_topm_cap_is_noop(tiny_setup):
    """rank_topm >= n_cand leaves the ranked decode bit-identical."""
    model, params, feats, mask, lm_apply = tiny_setup
    full = _decode(model, params, feats, mask, lm_apply)
    capped = _decode(model, params, feats, mask, lm_apply,
                     rank_topm=SAMPLE_NUM)
    np.testing.assert_array_equal(np.asarray(full["tokens"]),
                                  np.asarray(capped["tokens"]))


def test_rank_topm_one_equals_confidence_ranking(tiny_setup):
    """rank_topm=1 hands the rank model exactly one candidate per
    utterance — the NAT-confidence argmax — so the decode must equal
    rank_model='none' (the reference's own-confidence ranking,
    cassnat.py:505-511) regardless of the LM."""
    model, params, feats, mask, lm_apply = tiny_setup
    topm1 = _decode(model, params, feats, mask, lm_apply, rank_topm=1)
    conf = nat_decode_jit(
        model, params, feats, mask, jax.random.PRNGKey(5), umax=24,
        sample_num=SAMPLE_NUM, threshold=0.9, rank_model="none")
    np.testing.assert_array_equal(np.asarray(topm1["tokens"]),
                                  np.asarray(conf["tokens"]))
    np.testing.assert_array_equal(np.asarray(topm1["lengths"]),
                                  np.asarray(conf["lengths"]))


def test_rank_topm_properties(tiny_setup):
    """rank_topm=M: the winner (a) appears among the full candidate set
    (host-rank path exposes it) and (b) has toy-LM score >= the score of
    the NAT-confidence argmax candidate — which always survives the
    prescreen, so the two-stage rank can only improve on it."""
    model, params, feats, mask, lm_apply = tiny_setup
    m = 3
    topm = _decode(model, params, feats, mask, lm_apply, rank_topm=m)
    conf1 = _decode(model, params, feats, mask, lm_apply, rank_topm=1)
    host = nat_decode_jit(
        model, params, feats, mask, jax.random.PRNGKey(5), umax=24,
        sample_num=SAMPLE_NUM, threshold=0.9, rank_model="host")
    cands = np.asarray(host["cand_tokens"])     # (B, S, U)
    lens = np.asarray(host["cand_lengths"])     # (B, S)
    bs, s, _ = cands.shape
    tab = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (24, 64)))
    logp_tab = tab - np.log(np.exp(tab).sum(-1, keepdims=True))

    def toy_lm_score(row, ln):
        if ln == 0:
            return 0.0
        return logp_tab[np.arange(ln), row[:ln]].mean()

    picked = np.asarray(topm["tokens"])
    picked_len = np.asarray(topm["lengths"])
    conf_tok = np.asarray(conf1["tokens"])
    conf_len = np.asarray(conf1["lengths"])
    for b in range(bs):
        found = any(
            lens[b, j] == picked_len[b]
            and np.array_equal(cands[b, j, :lens[b, j]],
                               picked[b, :lens[b, j]])
            for j in range(s))
        assert found, f"rank_topm winner not among candidates (utt {b})"
        assert toy_lm_score(picked[b], picked_len[b]) >= \
            toy_lm_score(conf_tok[b], conf_len[b]) - 1e-6


def test_gate_margin_properties(tiny_setup):
    """return_margin (the confidence-gated escalation signal): per-utt
    top1-top2 rank-score gap over DISTINCT candidate outputs — finite
    margins are non-negative, +inf marks single-unique-output utterances,
    and requesting it never changes the decode output."""
    model, params, feats, mask, lm_apply = tiny_setup
    plain = _decode(model, params, feats, mask, lm_apply, esa_topk=4)
    out = _decode(model, params, feats, mask, lm_apply, esa_topk=4,
                  return_margin=True)
    marg = np.asarray(out["esa_margin"])
    assert marg.shape == (feats.shape[0],)
    assert (marg >= 0).all()
    np.testing.assert_array_equal(np.asarray(plain["tokens"]),
                                  np.asarray(out["tokens"]))

    # a near-deterministic CTC head -> every sample is the argmax path ->
    # one unique output -> margin must be +inf (never escalate)
    sharp = jax.tree_util.tree_map(lambda x: x, params)
    gen = sharp["params"]["ctc_generator"]["proj"]
    gen["kernel"] = gen["kernel"] * 50.0
    gen["bias"] = gen["bias"] * 50.0
    out2 = _decode(model, sharp, feats, mask, lm_apply, esa_topk=4,
                   return_margin=True)
    marg2 = np.asarray(out2["esa_margin"])
    assert np.isinf(marg2).all(), marg2


def test_two_phase_exact(tiny_setup):
    """Two-phase decode (esa_align_jit + host bucket selection +
    nat_decode_jit external/pre_enc) must equal the one-call ESA decode."""
    from cassnat_asr_public_tpu.utils.decoding import (
        esa_align_jit, select_unique_candidates)
    model, params, feats, mask, lm_apply = tiny_setup
    rng = jax.random.PRNGKey(5)
    full = nat_decode_jit(
        model, params, feats, mask, rng, umax=24, sample_num=SAMPLE_NUM,
        threshold=0.9, rank_model="lm", lm_apply=lm_apply,
        lm_apply_logits=True)

    p1 = esa_align_jit(model, params, feats, mask, rng,
                       sample_num=SAMPLE_NUM, threshold=0.9)
    bs = feats.shape[0]
    kept, umax_b = select_unique_candidates(
        p1["ylen"], p1["h1"], p1["h2"], p1["path_score"], bs, SAMPLE_NUM,
        bucket=4)
    c = kept.shape[1]
    assert c < SAMPLE_NUM  # fixture is peaked: dedup actually engages
    flat = jnp.asarray(kept.reshape(-1))
    two = nat_decode_jit(
        model, params, feats, mask, rng, umax=24, sample_num=c,
        align="external", ext_shift=p1["shift"][flat],
        ext_ylen=p1["ylen"][flat],
        pre_enc=(p1["enc_h"], p1["enc_mask"], p1["ctc_out"]),
        rank_model="lm", lm_apply=lm_apply, lm_apply_logits=True)
    np.testing.assert_array_equal(np.asarray(full["tokens"]),
                                  np.asarray(two["tokens"]))
    np.testing.assert_array_equal(np.asarray(full["lengths"]),
                                  np.asarray(two["lengths"]))
