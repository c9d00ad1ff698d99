// Host CPU fingerprint for the XLA:CPU persistent-compile-cache key
// (utils/compile_cache.py). XLA:CPU jit artifacts are AOT machine code whose
// target features LLVM derives from RAW CPUID (and the OS-enabled XCR0 state)
// at runtime — NOT from /proc/cpuinfo, which hypervisors fully virtualize.
// Round 5 observed two fleet VMs with byte-identical /proc/cpuinfo identity
// blocks whose XLA-detected feature sets differed (+prefer-no-scatter /
// +prefer-no-gather tuning plus ISA deltas): a cache entry written by one
// SIGSEGV'd inside jax's cache deserialization on the other. Hashing the same
// CPUID leaves LLVM reads makes the cache key follow the physical truth.
//
// Build: utils/native.py (g++ -O3 -shared -fPIC). ctypes entry point:
//   int hostid_cpuid(uint32_t* out, int max_words)
// writes (leaf, subleaf, eax, ebx, ecx, edx) runs followed by an XCR0 record,
// returns the number of uint32 words written (0 on non-x86).

#include <cstdint>

#if defined(__x86_64__) || defined(__i386__)
#include <cpuid.h>

extern "C" int hostid_cpuid(uint32_t* out, int max_words) {
  // the leaves LLVM's getHostCPUName/getHostCPUFeatures consult: vendor +
  // family/model/stepping (0, 1), structured extended features (7.0-7.2),
  // XSAVE state shape (0xD.0/0xD.1), and the AMD/extended range incl.
  // address-size leaf 0x80000008 used for tuning decisions
  static const struct { uint32_t leaf, sub; } kLeaves[] = {
      {0u, 0u},          {1u, 0u},          {7u, 0u},  {7u, 1u},
      {7u, 2u},          {0xDu, 0u},        {0xDu, 1u},
      {0x80000000u, 0u}, {0x80000001u, 0u}, {0x80000008u, 0u}};
  int n = 0;
  for (const auto& l : kLeaves) {
    if (n + 6 > max_words) return n;
    uint32_t a = 0, b = 0, c = 0, d = 0;
    __get_cpuid_count(l.leaf, l.sub, &a, &b, &c, &d);
    out[n++] = l.leaf;
    out[n++] = l.sub;
    out[n++] = a;
    out[n++] = b;
    out[n++] = c;
    out[n++] = d;
  }
  // XCR0: which register states the OS enabled — gates AVX/AVX512 feature
  // detection even when CPUID advertises them
  uint32_t a = 0, b = 0, c = 0, d = 0;
  __get_cpuid(1, &a, &b, &c, &d);
  if ((c & (1u << 27)) != 0u && n + 3 <= max_words) {  // OSXSAVE
    uint32_t lo, hi;
    __asm__ volatile("xgetbv" : "=a"(lo), "=d"(hi) : "c"(0));
    out[n++] = 0xFFFFFFFFu;  // XCR0 record marker (not a CPUID leaf)
    out[n++] = lo;
    out[n++] = hi;
  }
  return n;
}

#else  // non-x86: no CPUID; callers fall back to the /proc/cpuinfo-only tag

extern "C" int hostid_cpuid(uint32_t* out, int max_words) {
  (void)out;
  (void)max_words;
  return 0;
}

#endif
