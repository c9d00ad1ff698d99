"""Loader shim for the optional C++ WAV decoder (cpp/wavio.cc via ctypes).

Builds lazily the first time it is requested; failures (no compiler, sandbox) are
non-fatal — callers fall back to the NumPy parser in ``wav.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_state: dict = {"tried": False, "lib": None}

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "cpp", "wavio.cc")
_SO = os.path.join(_REPO_ROOT, "cpp", "build", "libwavio.so")


class _Native:
    def __init__(self, lib):
        self._lib = lib
        lib.wavio_load.restype = ctypes.c_int
        lib.wavio_load.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),  # samples
            ctypes.POINTER(ctypes.c_int32),  # channels
            ctypes.POINTER(ctypes.c_int32),  # sample_rate
        ]
        lib.wavio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]

    def load(self, path: str):
        buf = ctypes.POINTER(ctypes.c_float)()
        samples = ctypes.c_int64()
        channels = ctypes.c_int32()
        rate = ctypes.c_int32()
        rc = self._lib.wavio_load(path.encode(), ctypes.byref(buf),
                                  ctypes.byref(samples), ctypes.byref(channels),
                                  ctypes.byref(rate))
        if rc != 0:
            raise ValueError(f"wavio_load failed with code {rc} for {path}")
        try:
            n = samples.value * channels.value
            arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
        finally:
            self._lib.wavio_free(buf)
        return arr.reshape(samples.value, channels.value).T.copy(), rate.value


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get():
    """Return the native decoder or None."""
    if os.environ.get("WCA_DISABLE_NATIVE"):
        return None
    with _lock:
        if not _state["tried"]:
            _state["tried"] = True
            if os.path.exists(_SO) or _build():
                try:
                    _state["lib"] = _Native(ctypes.CDLL(_SO))
                except Exception:
                    _state["lib"] = None
        return _state["lib"]
