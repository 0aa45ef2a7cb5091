"""The ONE sanctioned way to compile the native C++ components from python.

Policy (ADVICE r2 + VERDICT r3 #5): library LOADING never shells out to
`make` — an implicit compile on first use can stall a hot path for up to
120 s or pick up a mid-edit source tree.  Binding modules
(`data/native_audio.py`, `decode/beam.py`) only `CDLL` an existing .so and
fall back to their pure-python implementations (with one log line) when it
is absent.  Setup scripts and tests call `build()` here (or run
`make -C native` directly).
"""

from __future__ import annotations

import logging
import os
import subprocess

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")

_log = logging.getLogger(__name__)


def lib_path(name: str) -> str:
    """Path of a built native library, e.g. lib_path('libctcbeam.so')."""
    return os.path.join(NATIVE_DIR, "build", name)


def build(timeout: float = 120.0) -> bool:
    """Explicitly (re)build ALL native libraries; returns success.

    One `make -C native` covers both libctcbeam.so and libwavbatch.so."""
    try:
        subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                       capture_output=True, timeout=timeout)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        _log.warning("native build failed (%s); python fallbacks will be "
                     "used", e)
        return False
