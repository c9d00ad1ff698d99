"""Host keying of the XLA:CPU persistent compile cache (utils/compile_cache).

Round-4 incident: the fleet moved this session to a VM whose /proc/cpuinfo
FLAGS line was byte-identical to the previous host's but whose XLA-detected
target features were not ("+prefer-no-gather" tuning features come from the
CPU *model*, not the flags) — the old flags-only tag collided and the fast
tier aborted (SIGABRT) executing a cross-host AOT blob inside
dryrun_multichip. The tag must therefore cover the full CPU identity block
and the jaxlib version.

Round 5 added a raw-CPUID fingerprint (cpp/hostid.cc) in front of the
cpuinfo fields: CPUID is what LLVM's host detection actually reads, so the
tag follows the physical CPU even where a hypervisor virtualizes cpuinfo.
NOTE the incident that motivated it was later root-caused to
vm.max_map_count exhaustion, not cache poisoning (see utils/hostmaps.py);
the CPUID keying stays as defense-in-depth and these tests pin its
contract, not a crash fix.
"""

import hashlib
import re

from whisper_char_alignment_tpu.utils import compile_cache


def test_tag_is_stable_and_hexish():
    t1 = compile_cache.cpu_cache_tag()
    t2 = compile_cache.cpu_cache_tag()
    assert t1 == t2
    assert re.fullmatch(r"[0-9a-f]{12}", t1)
    assert compile_cache.cpu_cache_dir().endswith(f"jax_wca_cputests_{t1}")


def test_tag_covers_model_identity_not_just_flags():
    """Two hosts with identical flags but different model/stepping/microcode
    must get different cache dirs (the exact round-4 collision)."""
    sig_parts = [compile_cache._cpuid_fingerprint()]
    with open("/proc/cpuinfo") as f:
        block = []
        for line in f:
            if not line.strip():
                break
            block.append(line)
    for field in compile_cache._ID_FIELDS:
        sig_parts.append(next((l.strip() for l in block
                               if l.split(":")[0].strip() == field), ""))
    assert any(p.startswith("model name") for p in sig_parts)
    assert any(p.startswith("stepping") for p in sig_parts)
    assert any(p.startswith("microcode") for p in sig_parts)
    assert any(p.startswith("flags") for p in sig_parts)
    # and the hash input includes jaxlib's version, so a jaxlib upgrade
    # (new AOT format) also rolls the directory
    import jaxlib

    joined = "\n".join(sig_parts + [f"jaxlib={jaxlib.__version__}"])
    assert compile_cache.cpu_cache_tag() == hashlib.sha1(
        joined.encode()).hexdigest()[:12]


def test_tag_leads_with_raw_cpuid(monkeypatch):
    """The round-5 collision: identical /proc/cpuinfo, different physical
    CPUID. The fingerprint must be present on x86 and load-bearing — a
    different CPUID dump must roll the tag (and so the cache dir)."""
    fp = compile_cache._cpuid_fingerprint()
    import platform

    if platform.machine() in ("x86_64", "i686"):
        assert fp.startswith("cpuid=")
        # real leaf data, not an empty dump: vendor leaf 0 is present
        assert len(fp.split(",")) >= 24
    base = compile_cache.cpu_cache_tag()
    monkeypatch.setattr(compile_cache, "_cpuid_fingerprint",
                        lambda: "cpuid=deadbeef")
    assert compile_cache.cpu_cache_tag() != base


def test_fingerprint_failure_degrades_to_cpuinfo_tag(monkeypatch):
    """No compiler / non-x86: the fingerprint is '' and the tag still works
    (cold cache at worst, never an exception)."""
    monkeypatch.setattr(compile_cache, "_cpuid_fingerprint", lambda: "")
    t = compile_cache.cpu_cache_tag()
    assert re.fullmatch(r"[0-9a-f]{12}", t)


def test_flags_only_signature_would_collide():
    """Sanity: the old tag (flags line only) is insensitive to a model-name
    change — demonstrating why it had to be replaced."""
    with open("/proc/cpuinfo") as f:
        flags_line = next((l for l in f if l.startswith("flags")), "")
    old_tag = hashlib.sha1(flags_line.encode()).hexdigest()[:12]
    # same flags on a different CPU model -> same old tag (the bug)
    assert hashlib.sha1(flags_line.encode()).hexdigest()[:12] == old_tag
    # the new tag input contains strictly more than the flags line
    assert compile_cache.cpu_cache_tag() != old_tag or flags_line == ""
