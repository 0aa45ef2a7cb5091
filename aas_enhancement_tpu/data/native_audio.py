"""ctypes binding to the native C++ wav batch decoder.

Reference parity: the reference's audio decode is native (SoX — SURVEY.md §2
"NATIVE: SoX / audio codecs"); this is the TPU rebuild's native equivalent
(native/audio/wav_batch.cc): parallel RIFF decode + zero-padded batch packing,
bit-identical to the pure-python reader (data/wav.py) and used by the dataset's
batch assembly when available (data/dataset.py).

Build the library EXPLICITLY with `make -C native` (or `build()` here); loading
never shells out (ADVICE r2: an implicit `make` on first batch decode could
stall the training input path for up to 120 s or pick up a mid-edit source
tree).  When the library is absent, the dataset falls back to the pure-python
reader and this module logs that once.
"""

from __future__ import annotations

import ctypes
import logging
import os

import numpy as np

from aas_enhancement_tpu.utils import native_build

_NATIVE_DIR = native_build.NATIVE_DIR
_LIB_PATH = native_build.lib_path("libwavbatch.so")

_log = logging.getLogger(__name__)

_lib = None
_lib_tried = False

_ERRORS = {-1: "io error", -2: "not RIFF/WAVE", -3: "missing fmt/data chunk",
           -4: "unsupported format", -5: "sample-rate mismatch"}


def build(timeout: float = 120.0) -> bool:
    """Explicitly (re)build the native library; returns availability.

    The one sanctioned way to compile from python (setup scripts, tests) —
    the data path itself never builds implicitly."""
    global _lib, _lib_tried
    native_build.build(timeout)
    _lib, _lib_tried = None, False        # force a fresh CDLL attempt
    return available()


def _load_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        _log.info("native wav decoder not built (%s missing) — using the "
                  "pure-python reader; run `make -C native` to enable it",
                  _LIB_PATH)
        return None
    src = os.path.join(_NATIVE_DIR, "audio", "wav_batch.cc")
    if os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH):
        _log.warning("native wav decoder source is newer than %s — using the "
                     "existing library; run `make -C native` to refresh",
                     _LIB_PATH)
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wav_decode.restype = ctypes.c_long
        lib.wav_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.wav_batch_decode.restype = ctypes.c_int
        lib.wav_batch_decode.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.wav_batch_decode_i16.restype = ctypes.c_int
        lib.wav_batch_decode_i16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = lib
    except (OSError, AttributeError):
        _lib = None
    return _lib


def available() -> bool:
    return _load_lib() is not None


def batch_decode(paths: list[str], bucket: int, expected_sr: int = 0,
                 n_threads: int = 0,
                 dtype: str = "float32") -> tuple[np.ndarray, np.ndarray] | None:
    """Decode `paths` into a zero-padded [B, bucket] batch + lengths.

    dtype "float32" matches data/wav.py bit-for-bit; "int16" is the quantized
    transport (PCM16 sources: a direct copy, no float round-trip — matches
    dataset._to_int16(read_wav(...)) bit-for-bit).

    Returns None when the native library is unavailable (caller falls back to
    the python reader); raises ValueError on a decode failure (bad file /
    sample-rate mismatch), mirroring data/wav.py's error contract.
    """
    lib = _load_lib()
    if lib is None:
        return None
    b = len(paths)
    i16 = dtype == "int16"
    out = np.empty((b, bucket), np.int16 if i16 else np.float32)
    lengths = np.zeros(b, np.int32)
    if b == 0:
        return out, lengths
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    fn = lib.wav_batch_decode_i16 if i16 else lib.wav_batch_decode
    ptr_t = ctypes.c_int16 if i16 else ctypes.c_float
    rc = fn(
        arr, b, bucket, expected_sr,
        out.ctypes.data_as(ctypes.POINTER(ptr_t)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    if rc != 0:
        idx = -rc - 1
        # Re-decode the failing file through the python reader for its
        # specific error message (also distinguishes rate mismatch).
        from aas_enhancement_tpu.data.wav import read_wav
        wav, sr = read_wav(paths[idx])   # raises ValueError with detail if bad
        if expected_sr and sr != expected_sr:
            raise ValueError(f"{paths[idx]}: sample rate {sr} != {expected_sr}")
        raise ValueError(f"{paths[idx]}: native decode failed")
    return out, lengths
