"""Persistent-compile-cache host keying for XLA:CPU artifacts.

XLA:CPU jit results are AOT machine code. jax's persistent cache keys them by
HLO + compile options — NOT by the host machine — so a cache directory written
on one fleet host and read on another can load executables compiled for a
different micro-architecture. That failure is not graceful: depending on which
instruction actually differs it ranges from an `cpu_aot_loader` error log to a
silent SIGILL/SIGABRT *mid-suite* (observed round 4: the fast tier aborted
inside ``dryrun_multichip`` with exit 134 after the fleet moved the session to
a new VM whose `/proc/cpuinfo` FLAGS line was identical but whose XLA-detected
target features were not — the old tag hashed only the flags line and
collided).

The tag therefore hashes every host-identity field that feeds LLVM's target
detection (vendor/family/model/stepping/model-name/microcode — virtual
machines with identical feature masks still differ here when the hypervisor
exposes a different CPU model, which is exactly what changes XLA's
`prefer-no-gather`-style tuning features) plus the flags line and the jaxlib
version (the AOT format is jaxlib-internal). Anything unparseable degrades to
the empty string — worst case a cold cache, never a cross-host hit.
"""

import hashlib
import os

_ID_FIELDS = ("vendor_id", "cpu family", "model", "model name", "stepping",
              "microcode", "flags")


def cpu_cache_tag() -> str:
    """A 12-hex tag identifying (host CPU identity, jaxlib version)."""
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            block = []
            for line in f:
                if not line.strip():
                    break  # first logical CPU only; all cores are identical
                block.append(line)
        for field in _ID_FIELDS:
            parts.append(next((l.strip() for l in block
                               if l.split(":")[0].strip() == field), ""))
    except OSError:
        pass
    try:
        import jaxlib

        parts.append(f"jaxlib={jaxlib.__version__}")
    except Exception:
        pass
    return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:12]


def cpu_cache_dir() -> str:
    """The CPU-test persistent cache directory for THIS host epoch."""
    return os.path.expanduser(f"~/.cache/jax_wca_cputests_{cpu_cache_tag()}")
