"""Native FLAC decoding (ctypes binding over native/flac_decoder.cpp).

(reference: egs/librispeech/local/data_prep.sh pipes every utterance through
the external `flac -c -d -s` CLI; this framework decodes FLAC in-process
instead so LibriSpeech-style corpora need no external tools.)
"""

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "native"))
    so = os.path.join(root, "libcassnat_native.so")
    try:
        if not os.path.exists(so):
            subprocess.run(["make", "-C", root], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(so)
        for fn, argtypes in [
            ("flac_decode_file",
             [ctypes.c_char_p,
              ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
              ctypes.POINTER(ctypes.c_int64),
              ctypes.POINTER(ctypes.c_int32),
              ctypes.POINTER(ctypes.c_int32),
              ctypes.POINTER(ctypes.c_int32)]),
            ("flac_decode_buffer",
             [ctypes.c_char_p, ctypes.c_int64,
              ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
              ctypes.POINTER(ctypes.c_int64),
              ctypes.POINTER(ctypes.c_int32),
              ctypes.POINTER(ctypes.c_int32),
              ctypes.POINTER(ctypes.c_int32)]),
        ]:
            getattr(lib, fn).restype = ctypes.c_int
            getattr(lib, fn).argtypes = argtypes
        lib.flac_free.restype = None
        lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        _NATIVE = lib
    except Exception:
        _NATIVE = None
    return _NATIVE


def _unpack(lib, rc, buf, n, ch, sr, bits, what) -> Tuple[np.ndarray, int]:
    if rc != 0:
        raise ValueError(f"FLAC decode failed ({what}, rc={rc})")
    try:
        nframes, channels = n.value, ch.value
        arr = np.ctypeslib.as_array(buf, shape=(nframes * channels,)).copy()
    finally:
        lib.flac_free(buf)
    arr = arr.reshape(nframes, channels)
    if channels > 1:  # downmix, matching `flac -d` + mono expectations
        arr = arr.mean(axis=1)
    else:
        arr = arr[:, 0]
    scale = float(1 << (bits.value - 1))
    return (arr.astype(np.float32) / scale), sr.value


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> (float32 mono waveform in [-1,1], rate)."""
    lib = _native_lib()
    if lib is None:
        raise RuntimeError(
            "native FLAC decoder unavailable (build native/ with make)")
    buf = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    ch, sr, bits = ctypes.c_int32(), ctypes.c_int32(), ctypes.c_int32()
    rc = lib.flac_decode_file(path.encode(), ctypes.byref(buf),
                              ctypes.byref(n), ctypes.byref(ch),
                              ctypes.byref(sr), ctypes.byref(bits))
    return _unpack(lib, rc, buf, n, ch, sr, bits, path)


def read_flac_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode an in-memory FLAC stream (e.g. from a pipe)."""
    lib = _native_lib()
    if lib is None:
        raise RuntimeError(
            "native FLAC decoder unavailable (build native/ with make)")
    buf = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    ch, sr, bits = ctypes.c_int32(), ctypes.c_int32(), ctypes.c_int32()
    rc = lib.flac_decode_buffer(data, len(data), ctypes.byref(buf),
                                ctypes.byref(n), ctypes.byref(ch),
                                ctypes.byref(sr), ctypes.byref(bits))
    return _unpack(lib, rc, buf, n, ch, sr, bits, "<buffer>")
