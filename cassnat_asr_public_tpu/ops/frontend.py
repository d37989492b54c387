"""Fused log-mel fbank frontend: framing -> window -> rFFT -> mel -> log.

In-framework replacement for the external Kaldi `make_fbank` pipeline
(reference: egs/librispeech/conf/fbank.conf — hamming window, 16 kHz, 80 mel
bins; SURVEY.md §2.9). One jittable function from waveform to features, so on
TPU the whole frontend fuses with CMVN + SpecAugment and the ConvEmbedding:
no host feature extraction, no ark files needed (both paths are supported —
precomputed-feature input remains available for strict parity runs).

Kaldi numerics replicated: snip_edges framing, optional dither, DC-offset
removal, preemphasis inside the frame, povey/hamming windows, raw-energy
floor, power-spectrum mel filterbank with Kaldi's bin layout, natural log
with a 1e-10-style floor (we use float-eps like Kaldi's std::numeric_limits
epsilon).
"""

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def inverse_mel_scale(mel):
    return 700.0 * (np.exp(mel / 1127.0) - 1.0)


def kaldi_mel_banks(num_bins: int = 80, fft_size: int = 512,
                    sample_rate: int = 16000, low_freq: float = 20.0,
                    high_freq: float = 0.0) -> np.ndarray:
    """Kaldi-style triangular mel filterbank matrix (num_bins, fft//2+1)."""
    if high_freq <= 0:
        high_freq = sample_rate / 2 + high_freq
    num_fft_bins = fft_size // 2
    fft_bin_width = sample_rate / fft_size
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    banks = np.zeros((num_bins, fft_size // 2 + 1), np.float32)
    for b in range(num_bins):
        left, center, right = (mel_low + b * mel_delta,
                               mel_low + (b + 1) * mel_delta,
                               mel_low + (b + 2) * mel_delta)
        for i in range(num_fft_bins):
            mel = mel_scale(fft_bin_width * i)
            if left < mel < right:
                if mel <= center:
                    banks[b, i] = (mel - left) / (center - left)
                else:
                    banks[b, i] = (right - mel) / (right - center)
    return banks


def window_function(frame_length: int, window_type: str = "povey"
                    ) -> np.ndarray:
    n = np.arange(frame_length)
    a = 2 * math.pi / (frame_length - 1)
    if window_type == "hanning":
        return (0.5 - 0.5 * np.cos(a * n)).astype(np.float32)
    if window_type == "hamming":
        return (0.54 - 0.46 * np.cos(a * n)).astype(np.float32)
    if window_type == "povey":  # kaldi default: hanning^0.85
        return ((0.5 - 0.5 * np.cos(a * n)) ** 0.85).astype(np.float32)
    if window_type == "rectangular":
        return np.ones(frame_length, np.float32)
    raise ValueError(window_type)


def num_frames(num_samples: int, frame_length: int = 400,
               frame_shift: int = 160, snip_edges: bool = True) -> int:
    if snip_edges:
        return max(0, 1 + (num_samples - frame_length) // frame_shift)
    return (num_samples + frame_shift // 2) // frame_shift


@partial(jax.jit, static_argnames=("num_bins", "frame_length", "frame_shift",
                                   "fft_size", "sample_rate", "window_type",
                                   "preemph", "remove_dc", "use_log",
                                   "dither"))
def log_mel_fbank(waveform: jnp.ndarray, num_bins: int = 80,
                  frame_length: int = 400, frame_shift: int = 160,
                  fft_size: int = 512, sample_rate: int = 16000,
                  window_type: str = "povey", preemph: float = 0.97,
                  remove_dc: bool = True, use_log: bool = True,
                  dither: float = 0.0,
                  rng: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, S) waveform -> (B, T, num_bins) log-mel features.

    T = 1 + (S - frame_length)//frame_shift (snip_edges). Fully jittable;
    the rFFT, mel matmul and log fuse into one XLA computation.
    """
    b, s = waveform.shape
    t = num_frames(s, frame_length, frame_shift)
    idx = (jnp.arange(t)[:, None] * frame_shift
           + jnp.arange(frame_length)[None, :])  # (T, L)
    frames = waveform[:, idx]  # (B, T, L)

    if dither > 0 and rng is not None:
        frames = frames + dither * jax.random.normal(rng, frames.shape)
    if remove_dc:
        frames = frames - frames.mean(-1, keepdims=True)
    if preemph > 0:
        first = frames[..., :1] * (1 - preemph)
        rest = frames[..., 1:] - preemph * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)

    win = jnp.asarray(window_function(frame_length, window_type))
    frames = frames * win

    pad = fft_size - frame_length
    if pad > 0:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
    spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)

    mel = jnp.asarray(kaldi_mel_banks(num_bins, fft_size, sample_rate))
    feats = jnp.einsum("btf,mf->btm", power, mel,
                       preferred_element_type=jnp.float32)
    if use_log:
        feats = jnp.log(jnp.maximum(feats, 1.1921e-07))  # f32 epsilon floor
    return feats


def apply_cmvn(feats: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray
               ) -> jnp.ndarray:
    """Global CMVN (reference consumes Kaldi cmvn.ark;
    speech_loader.py:109-121)."""
    return (feats - mean) / std


@partial(jax.jit, static_argnames=("max_freq_width", "n_freq_mask",
                                   "max_time_width", "n_time_mask"))
def spec_augment_jit(feats: jnp.ndarray, frame_mask: jnp.ndarray,
                     rng: jnp.ndarray, max_freq_width: int = 27,
                     n_freq_mask: int = 2, max_time_width: float = 0.05,
                     n_time_mask: int = 10) -> jnp.ndarray:
    """On-device SpecAugment masks (freq + time), batched and jittable.

    Equivalent to the host variant (data/spec_augment.py) but applied after
    the fused frontend so augmentation runs on TPU. Mask widths are sampled
    per utterance; fill value is each utterance's mean (replace_with_zero
    False default, reference: spec_augment.py:53-115).
    """
    b, t, f = feats.shape
    lengths = frame_mask.sum(-1)  # (B,)
    denom = jnp.maximum(lengths[:, None] * f, 1)
    fill = jnp.where(frame_mask[..., None], feats, 0).sum((1, 2)) / denom[:, 0]
    keep = jnp.ones((b, t, f), bool)

    keys = jax.random.split(rng, 2 * (n_freq_mask + n_time_mask))
    ki = 0
    for _ in range(n_freq_mask):
        w = jax.random.randint(keys[ki], (b, 1), 0, max_freq_width + 1)
        f0 = jax.random.randint(keys[ki + 1], (b, 1), 0,
                                jnp.maximum(f - w, 1))
        ki += 2
        fr = jnp.arange(f)[None, :]
        m = (fr >= f0) & (fr < f0 + w)  # (B, F)
        keep = keep & ~m[:, None, :]
    tw = jnp.maximum((max_time_width * lengths).astype(jnp.int32), 1) \
        if max_time_width < 1 else jnp.full((b,), int(max_time_width))
    for _ in range(n_time_mask):
        w = jax.random.randint(keys[ki], (b, 1), 0, 10**9) % (tw[:, None] + 1)
        t0 = jax.random.randint(keys[ki + 1], (b, 1), 0, 10**9) % \
            jnp.maximum(lengths[:, None] - w, 1)
        ki += 2
        tr = jnp.arange(t)[None, :]
        m = (tr >= t0) & (tr < t0 + w)  # (B, T)
        keep = keep & ~m[:, :, None]
    return jnp.where(keep, feats, fill[:, None, None])
