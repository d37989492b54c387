"""Frontend tests: shape/semantics + parity vs torchaudio-free reference DP
(scipy STFT as oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal as sps

from cassnat_asr_public_tpu.ops.frontend import (
    apply_cmvn,
    kaldi_mel_banks,
    log_mel_fbank,
    num_frames,
    spec_augment_jit,
    window_function,
)


def test_num_frames():
    assert num_frames(16000) == 98  # 1s @ 16k, 25ms/10ms snip_edges
    assert num_frames(400) == 1
    assert num_frames(399) == 0


def test_mel_banks_shape_and_partition():
    banks = kaldi_mel_banks(80, 512, 16000)
    assert banks.shape == (80, 257)
    # each filter is nonnegative, peaks <= 1
    assert (banks >= 0).all() and banks.max() <= 1.0
    # neighboring filters overlap (sum > 0 in midband)
    mid = banks.sum(0)[20:200]
    assert (mid > 0).all()


def test_fbank_matches_manual_stft(rng):
    wave = rng.normal(size=(1, 4000)).astype(np.float32)
    feats = np.asarray(log_mel_fbank(
        jnp.asarray(wave), num_bins=23, window_type="hamming",
        preemph=0.0, remove_dc=False))
    t = num_frames(4000)
    assert feats.shape == (1, t, 23)
    # manual frame 0
    frame = wave[0, :400] * window_function(400, "hamming")
    spec = np.fft.rfft(frame, 512)
    power = np.abs(spec) ** 2
    mel = kaldi_mel_banks(23, 512, 16000)
    expect = np.log(np.maximum(mel @ power, 1.1921e-07))
    np.testing.assert_allclose(feats[0, 0], expect, rtol=1e-3, atol=1e-3)


def test_fbank_on_sine_peaks_at_right_bin():
    sr = 16000
    t = np.arange(sr) / sr
    freq = 1000.0
    wave = np.sin(2 * np.pi * freq * t).astype(np.float32)[None]
    feats = np.asarray(log_mel_fbank(jnp.asarray(wave)))
    # average over time; peak mel bin should correspond to ~1 kHz
    prof = feats[0].mean(0)
    peak_bin = prof.argmax()
    banks = kaldi_mel_banks(80, 512, 16000)
    # frequency of that filter's peak
    peak_fft = banks[peak_bin].argmax()
    peak_freq = peak_fft * sr / 512
    assert abs(peak_freq - freq) < 150


def test_cmvn():
    f = jnp.asarray(np.random.default_rng(0).normal(2.0, 3.0,
                                                    size=(2, 50, 8)))
    mean = f.reshape(-1, 8).mean(0)
    std = f.reshape(-1, 8).std(0)
    out = apply_cmvn(f, mean, std)
    np.testing.assert_allclose(np.asarray(out.reshape(-1, 8).mean(0)), 0,
                               atol=1e-5)


def test_spec_augment_jit(rng):
    f = jnp.asarray(rng.normal(size=(2, 60, 20)).astype(np.float32))
    mask = jnp.ones((2, 60), bool)
    out = spec_augment_jit(f, mask, jax.random.PRNGKey(0),
                           max_freq_width=5, n_freq_mask=2,
                           max_time_width=0.2, n_time_mask=2)
    assert out.shape == f.shape
    assert not np.allclose(np.asarray(out), np.asarray(f))


def test_fbank_zero_pad_invariance():
    """Zero-padding a wav to a length bucket must not change the frames
    below num_frames(true length) — the compile-bucketing in
    bin/prepare_features.py relies on this (snip_edges framing is local)."""
    import numpy as np
    import jax.numpy as jnp
    from cassnat_asr_public_tpu.ops.frontend import log_mel_fbank, num_frames

    rng = np.random.default_rng(0)
    wav = rng.normal(size=(12345,)).astype(np.float32)
    nf = int(num_frames(len(wav)))
    a = np.asarray(log_mel_fbank(jnp.asarray(wav[None]))[0])[:nf]
    padded = np.concatenate([wav, np.zeros(8000 - len(wav) % 8000,
                                           np.float32)])
    b = np.asarray(log_mel_fbank(jnp.asarray(padded[None]))[0])[:nf]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
