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
detection, from TWO sources:

- **Raw CPUID + XCR0** (``cpp/hostid.cc`` via ctypes) — the same leaves
  LLVM's runtime host detection reads, so the tag follows the physical truth
  even where a hypervisor virtualizes ``/proc/cpuinfo`` identically across
  differing hosts.
- ``/proc/cpuinfo`` identity fields (vendor/family/model/stepping/model-name/
  microcode/flags) as the fallback when the native helper is unavailable
  (no compiler, non-x86), plus the jaxlib version (the AOT format is
  jaxlib-internal).

Anything unparseable degrades to the empty string — worst case a cold cache,
never a cross-host hit.

Round-5 correction (important for future debugging): a full-suite SIGSEGV
inside ``compilation_cache.get_executable_and_time`` was initially blamed on
cross-host entries under this key, because the cache's ``cpu_aot_loader``
logs showed entries with ``+prefer-no-scatter``/``+prefer-no-gather`` target
features "not supported on the host machine". Both parts of that theory were
subsequently DISPROVEN on this image:

- That E-log is benign self-noise. XLA's compile path appends tuning
  features to the serialized attribute list that LLVM's host detection never
  reports, so the loader's comparison warns for EVERY persistent-cache load —
  verified by writing an entry and re-loading it in the same process on the
  same host (the warning fired for our own seconds-old entry).
- The SIGSEGV was ``vm.max_map_count`` exhaustion: every live XLA:CPU
  executable holds per-kernel anon mappings, the full suite crosses the
  65530 kernel ceiling near its end (sampled 59,689 right before a
  reproduced crash), mmap ENOMEMs, and an unchecked LLVM allocation-failure
  path segfaults during cache deserialization. Fixed by utils/hostmaps.py +
  the conftest ``_bound_host_mappings`` fixture, not by this key.

The CPUID keying stays as cheap defense-in-depth (a genuinely foreign AOT
blob would still be an arbitrary-crash hazard), but it is not load-bearing
for any incident observed so far.
"""

import ctypes
import hashlib
import os

_ID_FIELDS = ("vendor_id", "cpu family", "model", "model name", "stepping",
              "microcode", "flags")


def _cpuid_fingerprint() -> str:
    """Hex dump of the raw CPUID feature leaves + XCR0 (cpp/hostid.cc), or ''
    when the native helper can't be built/loaded."""
    try:
        from . import native as native_lib

        lib = native_lib.load("hostid.cc", "libhostid.so")
        if lib is None:
            return ""
        lib.hostid_cpuid.restype = ctypes.c_int
        lib.hostid_cpuid.argtypes = [ctypes.POINTER(ctypes.c_uint32),
                                     ctypes.c_int]
        buf = (ctypes.c_uint32 * 128)()
        n = lib.hostid_cpuid(buf, len(buf))
        return "cpuid=" + ",".join(f"{buf[i]:08x}" for i in range(max(0, n)))
    except Exception:
        return ""


def cpu_cache_tag() -> str:
    """A 12-hex tag identifying (host CPU identity, jaxlib version)."""
    parts = [_cpuid_fingerprint()]
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
