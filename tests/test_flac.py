"""Native FLAC decoder tests (native/flac_decoder.cpp via data/flac.py).

A minimal FLAC *encoder* lives here in the test (bit-exact container
writer supporting constant/verbatim/fixed subframes, Rice residuals,
left/side + mid/side stereo) so the decoder is exercised without any
external flac tool. (reference: data_prep.sh pipes through the flac CLI;
the framework decodes natively instead.)
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from cassnat_asr_public_tpu.data.flac import read_flac, read_flac_bytes
from cassnat_asr_public_tpu.data.audio_loader import read_wav


# ---------------------------------------------------------------- encoder

class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, nbits):
        value &= (1 << nbits) - 1 if nbits < 64 else (1 << 64) - 1
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def crc8(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def utf8_number(n):
    if n < 0x80:
        return bytes([n])
    out, nbytes = [], 2
    while n >= (1 << (5 * nbytes + 6 - nbytes)) and nbytes < 6:
        nbytes += 1
    lead_bits = 7 - nbytes
    shift = 6 * (nbytes - 1)
    lead = (0xFF << (lead_bits + 1)) & 0xFF | (n >> shift)
    out.append(lead)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _write_residual(bw, res, param):
    bw.write(0, 2)        # rice method 0 (4-bit params)
    bw.write(0, 4)        # partition order 0
    bw.write(param, 4)
    for r in res:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        u = (abs(r) << 1) - (1 if r < 0 else 0)
        bw.write_unary(u >> param)
        bw.write(u, param)


def _write_subframe(bw, sig, bps, mode):
    bw.write(0, 1)  # pad
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(int(sig[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for s in sig:
            bw.write(int(s), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for s in sig[:order]:
            bw.write(int(s), bps)
        x = np.asarray(sig, np.int64)
        res = x.copy()
        for _ in range(order):  # repeated first difference
            res = np.diff(res)
        _write_residual(bw, [int(v) for v in res], param=6)
    else:
        raise ValueError(mode)


def encode_flac(channels, bps=16, sr=16000, blocksize=4096, modes=None,
                ch_mode="independent"):
    """channels: list of equal-length int arrays (one per channel)."""
    n = len(channels[0])
    nch = len(channels)
    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    body = bytes(si.bytes) + b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, blocksize):
        bs = min(blocksize, n - start)
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)   # reserved
        bw.write(0, 1)   # fixed blocksize strategy
        bw.write(7, 4)   # 16-bit blocksize-1 follows the coded number
        bw.write(0, 4)   # sample rate from streaminfo
        if ch_mode == "independent":
            bw.write(nch - 1, 4)
            side = None
        elif ch_mode == "left_side":
            bw.write(8, 4)
            side = 1
        elif ch_mode == "mid_side":
            bw.write(10, 4)
            side = 1
        bw.write(4, 3)   # 16-bit samples
        bw.write(0, 1)
        bw.align()
        hdr = bytes(bw.bytes) + utf8_number(frame_no)
        bw2 = BitWriter()
        bw2.bytes = bytearray(hdr)
        bw2.write(bs - 1, 16)
        bw2.bytes.append(crc8(bytes(bw2.bytes)))

        subsigs = []
        if ch_mode == "independent":
            subsigs = [(np.asarray(c[start:start + bs], np.int64), bps)
                       for c in channels]
        elif ch_mode == "left_side":
            l = np.asarray(channels[0][start:start + bs], np.int64)
            r = np.asarray(channels[1][start:start + bs], np.int64)
            subsigs = [(l, bps), (l - r, bps + 1)]
        elif ch_mode == "mid_side":
            l = np.asarray(channels[0][start:start + bs], np.int64)
            r = np.asarray(channels[1][start:start + bs], np.int64)
            subsigs = [((l + r) >> 1, bps), (l - r, bps + 1)]

        for ci, (sig, cb) in enumerate(subsigs):
            mode = modes[ci] if modes else "verbatim"
            _write_subframe(bw2, sig, cb, mode)
        bw2.align()
        frame = bytes(bw2.bytes)
        out += frame + crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)


# ----------------------------------------------------------------- tests

def _roundtrip(channels, **kw):
    data = encode_flac(channels, **kw)
    wav, sr = read_flac_bytes(data)
    assert sr == kw.get("sr", 16000)
    ref = np.stack([np.asarray(c, np.float64) for c in channels], 1)
    ref = ref.mean(axis=1) / 32768.0
    np.testing.assert_allclose(wav, ref.astype(np.float32), atol=1e-7)


def test_verbatim_mono():
    rng = np.random.default_rng(0)
    sig = rng.integers(-32768, 32767, size=10000, dtype=np.int64)
    _roundtrip([sig])


def test_constant_mono():
    _roundtrip([np.full(5000, -1234, np.int64)], modes=["constant"])


@pytest.mark.parametrize("order", [0, 1, 2])
def test_fixed_orders(order):
    rng = np.random.default_rng(order)
    # smooth-ish signal so fixed-predictor residuals stay small
    t = np.arange(9000)
    sig = (3000 * np.sin(t / 40.0) + rng.integers(-40, 40, t.shape)).astype(
        np.int64)
    _roundtrip([sig], modes=[f"fixed{order}"])


def test_stereo_independent_downmix():
    rng = np.random.default_rng(3)
    l = rng.integers(-30000, 30000, 4096, dtype=np.int64)
    r = rng.integers(-30000, 30000, 4096, dtype=np.int64)
    _roundtrip([l, r])


@pytest.mark.parametrize("ch_mode", ["left_side", "mid_side"])
def test_stereo_decorrelated(ch_mode):
    rng = np.random.default_rng(4)
    l = rng.integers(-30000, 30000, 4096, dtype=np.int64)
    r = l + rng.integers(-100, 100, 4096, dtype=np.int64)  # correlated
    _roundtrip([l, r], ch_mode=ch_mode)


def test_multi_frame_and_file_io(tmp_path):
    rng = np.random.default_rng(5)
    sig = rng.integers(-32768, 32767, size=3 * 4096 + 123, dtype=np.int64)
    data = encode_flac([sig], blocksize=4096)
    p = tmp_path / "x.flac"
    p.write_bytes(data)
    wav, sr = read_flac(str(p))
    assert len(wav) == len(sig)
    np.testing.assert_allclose(
        wav, (sig / 32768.0).astype(np.float32), atol=1e-7)
    # read_wav dispatches on extension
    wav2, _ = read_wav(str(p))
    np.testing.assert_array_equal(wav, wav2)


def test_pipe_command_wav_and_flac(tmp_path):
    rng = np.random.default_rng(6)
    sig = rng.integers(-32768, 32767, size=2048, dtype=np.int64)
    p = tmp_path / "y.flac"
    p.write_bytes(encode_flac([sig]))
    wav, sr = read_wav(f"cat {p} |")  # Kaldi pipe form, FLAC payload
    np.testing.assert_allclose(
        wav, (sig / 32768.0).astype(np.float32), atol=1e-7)

    import wave as wavmod
    wp = tmp_path / "y.wav"
    with wavmod.open(str(wp), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.astype("<i2").tobytes())
    wav2, sr2 = read_wav(f"cat {wp} |")  # pipe form, WAV payload
    assert sr2 == 16000
    np.testing.assert_allclose(wav2, sig / 32768.0, atol=1e-4)


def test_data_prep_script(tmp_path):
    """End-to-end: synthetic LibriSpeech tree -> data dir -> features."""
    rng = np.random.default_rng(7)
    corpus = tmp_path / "LibriSpeech"
    split = corpus / "dev-mini"
    corpus.mkdir()
    (corpus / "SPEAKERS.TXT").write_text(
        "; comment line\n"
        "12  | F | dev-mini | 1.0 | reader twelve\n"
        "34  | M | dev-mini | 1.0 | reader thirtyfour\n")
    for reader, chapter, nutt in [("12", "100", 2), ("34", "200", 1)]:
        cdir = split / reader / chapter
        cdir.mkdir(parents=True)
        lines = []
        for i in range(nutt):
            utt = f"{reader}-{chapter}-{i:04d}"
            sig = (8000 * np.sin(np.arange(4000) / 30.0)).astype(np.int64)
            (cdir / f"{utt}.flac").write_bytes(encode_flac([sig]))
            lines.append(f"{utt} HELLO WORLD {i}")
        (cdir / f"{reader}-{chapter}.trans.txt").write_text(
            "\n".join(lines) + "\n")

    dst = tmp_path / "data" / "dev_mini"
    script = os.path.join(os.path.dirname(__file__), "..", "egs",
                          "librispeech", "local", "data_prep.py")
    subprocess.run([sys.executable, script, str(split), str(dst)],
                   check=True, capture_output=True)
    wavs = (dst / "wav.scp").read_text().strip().split("\n")
    assert len(wavs) == 3
    assert (dst / "spk2utt").read_text().startswith("12-100 ")
    # every scp entry decodes through the loader
    for line in wavs:
        utt, path = line.split(None, 1)
        wav, sr = read_wav(path)
        assert sr == 16000 and len(wav) == 4000
