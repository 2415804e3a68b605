// Goldilocks field helpers shared by the native host library translation
// units (p = 2^64 - 2^32 + 1).
#pragma once
#include <cstdint>

namespace gl {

static const uint64_t P = 0xffffffff00000001ULL;
static const uint64_t EPS = 0xffffffffULL;  // 2^64 mod p

static inline uint64_t add(uint64_t a, uint64_t b) {
  uint64_t s = a + b;
  if (s < a) s += EPS;
  if (s >= P) s -= P;
  return s;
}

static inline uint64_t sub(uint64_t a, uint64_t b) {
  return add(a, b == 0 ? 0 : P - b);
}

static inline uint64_t reduce128(unsigned __int128 w) {
  uint64_t lo = (uint64_t)w;
  uint64_t hi = (uint64_t)(w >> 64);
  uint64_t n1 = hi & 0xffffffffULL;
  uint64_t n2 = hi >> 32;
  uint64_t t = lo - n2;
  if (lo < n2) t -= EPS;
  if (t >= P) t -= P;
  uint64_t u = (n1 << 32) - n1;
  return add(t, u);
}

static inline uint64_t mul(uint64_t a, uint64_t b) {
  return reduce128((unsigned __int128)a * b);
}

// Fermat inverse; inv(0) = 0 (the "pseudoinverse-or-zero" trace
// convention).
static inline uint64_t inv(uint64_t a) {
  if (!a) return 0;
  uint64_t r = 1, base = a, e = 0xfffffffeffffffffULL;  // p - 2
  while (e) {
    if (e & 1) r = mul(r, base);
    base = mul(base, base);
    e >>= 1;
  }
  return r;
}

}  // namespace gl
