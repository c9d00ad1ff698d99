"""One loader for the optional C++ fast paths (cpp/*.cc via ctypes).

Both native shims (audio/_wavio_native.py, text/_bpe_native.py) previously
carried their own copy of the build-and-load plumbing, which had already
drifted (different WCA_DISABLE_NATIVE gate placement, and neither rebuilt a
stale .so after its source changed). This is the single home:

- ``WCA_DISABLE_NATIVE=1`` disables every native path (callers fall back to
  their pure-Python implementations).
- The .so is (re)built with g++ when missing OR older than its source, so an
  edited cpp/*.cc can never be silently shadowed by a stale binary.
- All failures (no compiler, sandbox, bad .so) are non-fatal: ``load``
  returns None and the caller falls back.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_lock = threading.Lock()
# src path -> ctypes.CDLL | None; an entry means "tried" (None = gave up)
_loaded: dict = {}


def _build(src: str, so: str) -> bool:
    # compile to a private temp name and os.replace into place: linking
    # directly onto the live path truncates an inode another process may have
    # dlopen'd (SIGBUS in a running serve), and two concurrent rebuilds would
    # interleave writes; the atomic rename gives every dlopen a whole file
    os.makedirs(os.path.dirname(so), exist_ok=True)
    tmp = f"{so}.build.{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def disabled() -> bool:
    """The WCA_DISABLE_NATIVE gate, falsy-aware: '0'/'off'/'false'/'' mean
    ENABLED (a user exporting WCA_DISABLE_NATIVE=0 to re-enable must not
    silently drop to the pure-Python paths — round-4 review finding)."""
    return os.environ.get("WCA_DISABLE_NATIVE", "") not in ("", "0", "off",
                                                            "false")


def load(src_name: str, so_name: str) -> Optional[ctypes.CDLL]:
    """CDLL for ``cpp/<src_name>`` built at ``cpp/build/<so_name>``, or None.

    The result (including a failed attempt) is cached per source path; the
    symbol setup (restype/argtypes) stays with the caller.
    """
    if disabled():
        return None
    src = os.path.join(_REPO_ROOT, "cpp", src_name)
    so = os.path.join(_REPO_ROOT, "cpp", "build", so_name)
    with _lock:
        if src in _loaded:
            return _loaded[src]
        lib = None
        try:
            if os.path.exists(src):
                stale = (not os.path.exists(so)
                         or os.path.getmtime(so) < os.path.getmtime(src))
                # rebuild when the .so looks older than its source — BUT a
                # failed rebuild (no compiler: a supported sandbox case) must
                # not discard a present, working binary: git checkouts give
                # arbitrary sub-second mtime ordering, so the checked-in
                # prebuilt can look "stale" on a fresh clone while being
                # exactly in sync with the source (round-4 self-review)
                if stale:
                    _build(src, so)
                if os.path.exists(so):
                    lib = ctypes.CDLL(so)
        except Exception:
            lib = None
        _loaded[src] = lib
        return lib
