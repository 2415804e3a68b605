// 256-bit unsigned arithmetic for the native kernel interpreter
// (native/zvm.cpp). Plain schoolbook/Knuth-D on 32-bit digits — the EVM
// word ops need exact u256 semantics (wrapping add/sub/mul, full-width
// div/mod, 512-bit intermediates for addmod/mulmod), matching the python
// int semantics of zk_evm_tpu/witness/interpreter.py.
#pragma once
#include <cstdint>
#include <cstring>

struct U256 {
  uint64_t w[4];  // little-endian 64-bit limbs

  bool operator==(const U256& o) const {
    return w[0] == o.w[0] && w[1] == o.w[1] && w[2] == o.w[2] &&
           w[3] == o.w[3];
  }
  bool is_zero() const { return !(w[0] | w[1] | w[2] | w[3]); }
  bool fits_u64() const { return !(w[1] | w[2] | w[3]); }
  uint64_t lo64() const { return w[0]; }
};

static inline U256 u256_from_u64(uint64_t v) { return U256{{v, 0, 0, 0}}; }

static inline int u256_cmp(const U256& a, const U256& b) {
  for (int i = 3; i >= 0; i--) {
    if (a.w[i] != b.w[i]) return a.w[i] < b.w[i] ? -1 : 1;
  }
  return 0;
}

static inline U256 u256_add(const U256& a, const U256& b) {  // mod 2^256
  U256 r;
  unsigned __int128 c = 0;
  for (int i = 0; i < 4; i++) {
    c += (unsigned __int128)a.w[i] + b.w[i];
    r.w[i] = (uint64_t)c;
    c >>= 64;
  }
  return r;
}

static inline U256 u256_sub(const U256& a, const U256& b) {  // mod 2^256
  U256 r;
  unsigned __int128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    unsigned __int128 d =
        (unsigned __int128)a.w[i] - b.w[i] - (uint64_t)borrow;
    r.w[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  return r;
}

struct U512 {
  uint64_t w[8];
};

static inline U512 u256_mul_full(const U256& a, const U256& b) {
  U512 r;
  std::memset(r.w, 0, sizeof r.w);
  for (int i = 0; i < 4; i++) {
    unsigned __int128 carry = 0;
    for (int j = 0; j < 4; j++) {
      carry += (unsigned __int128)a.w[i] * b.w[j] + r.w[i + j];
      r.w[i + j] = (uint64_t)carry;
      carry >>= 64;
    }
    r.w[i + 4] = (uint64_t)carry;
  }
  return r;
}

static inline U256 u256_mul(const U256& a, const U256& b) {  // mod 2^256
  U512 f = u256_mul_full(a, b);
  return U256{{f.w[0], f.w[1], f.w[2], f.w[3]}};
}

// Knuth algorithm D on 32-bit digits: u (num_n digits) / v (num_d digits).
// quotient into q (num_n digits, zero-padded), remainder into r (num_d).
// v must be nonzero.
static inline void knuth_divmod(const uint32_t* u_in, int un,
                                const uint32_t* v_in, int vn, uint32_t* q,
                                uint32_t* r) {
  // strip leading zeros of v
  while (vn > 1 && v_in[vn - 1] == 0) vn--;
  while (un > 1 && u_in[un - 1] == 0) un--;
  std::memset(q, 0, sizeof(uint32_t) * 16);
  std::memset(r, 0, sizeof(uint32_t) * 8);
  if (un < vn) {  // quotient 0, remainder = u
    for (int i = 0; i < un; i++) r[i] = u_in[i];
    return;
  }
  if (vn == 1) {
    uint64_t d = v_in[0], rem = 0;
    for (int i = un - 1; i >= 0; i--) {
      uint64_t cur = (rem << 32) | u_in[i];
      q[i] = (uint32_t)(cur / d);
      rem = cur % d;
    }
    r[0] = (uint32_t)rem;
    return;
  }
  // normalize
  int s = __builtin_clz(v_in[vn - 1]);
  uint32_t vn_[17], un_[18];
  for (int i = vn - 1; i > 0; i--)
    vn_[i] = (uint32_t)((v_in[i] << s) |
                        (s ? ((uint64_t)v_in[i - 1] >> (32 - s)) : 0));
  vn_[0] = v_in[0] << s;
  un_[un] = s ? (uint32_t)((uint64_t)u_in[un - 1] >> (32 - s)) : 0;
  for (int i = un - 1; i > 0; i--)
    un_[i] = (uint32_t)((u_in[i] << s) |
                        (s ? ((uint64_t)u_in[i - 1] >> (32 - s)) : 0));
  un_[0] = u_in[0] << s;
  for (int j = un - vn; j >= 0; j--) {
    uint64_t num = ((uint64_t)un_[j + vn] << 32) | un_[j + vn - 1];
    uint64_t qhat = num / vn_[vn - 1];
    uint64_t rhat = num % vn_[vn - 1];
    while (qhat >= ((uint64_t)1 << 32) ||
           qhat * vn_[vn - 2] > ((rhat << 32) | un_[j + vn - 2])) {
      qhat--;
      rhat += vn_[vn - 1];
      if (rhat >= ((uint64_t)1 << 32)) break;
    }
    // multiply-subtract
    int64_t borrow = 0;
    uint64_t carry = 0;
    for (int i = 0; i < vn; i++) {
      uint64_t p = qhat * vn_[i] + carry;
      carry = p >> 32;
      int64_t t = (int64_t)un_[i + j] - (int64_t)(uint32_t)p - borrow;
      un_[i + j] = (uint32_t)t;
      borrow = t < 0 ? 1 : 0;
    }
    int64_t t = (int64_t)un_[j + vn] - (int64_t)carry - borrow;
    un_[j + vn] = (uint32_t)t;
    if (t < 0) {  // add back
      qhat--;
      uint64_t c = 0;
      for (int i = 0; i < vn; i++) {
        c += (uint64_t)un_[i + j] + vn_[i];
        un_[i + j] = (uint32_t)c;
        c >>= 32;
      }
      un_[j + vn] += (uint32_t)c;
    }
    q[j] = (uint32_t)qhat;
  }
  // denormalize remainder
  for (int i = 0; i < vn - 1; i++)
    r[i] = (uint32_t)((un_[i] >> s) |
                      (s ? ((uint64_t)un_[i + 1] << (32 - s)) : 0));
  r[vn - 1] = un_[vn - 1] >> s;
}

static inline void u256_to_d32(const U256& a, uint32_t* d) {
  for (int i = 0; i < 4; i++) {
    d[2 * i] = (uint32_t)a.w[i];
    d[2 * i + 1] = (uint32_t)(a.w[i] >> 32);
  }
}

static inline U256 u256_from_d32(const uint32_t* d) {
  U256 r;
  for (int i = 0; i < 4; i++)
    r.w[i] = (uint64_t)d[2 * i] | ((uint64_t)d[2 * i + 1] << 32);
  return r;
}

static inline U256 u256_div(const U256& a, const U256& b) {  // b != 0
  uint32_t u[8], v[8], q[16], r[8];
  u256_to_d32(a, u);
  u256_to_d32(b, v);
  knuth_divmod(u, 8, v, 8, q, r);
  return u256_from_d32(q);
}

static inline U256 u256_mod(const U256& a, const U256& b) {  // b != 0
  uint32_t u[8], v[8], q[16], r[8];
  u256_to_d32(a, u);
  u256_to_d32(b, v);
  knuth_divmod(u, 8, v, 8, q, r);
  return u256_from_d32(r);
}

// (a + b) mod n over the 257-bit sum; n != 0
static inline U256 u256_addmod(const U256& a, const U256& b, const U256& n) {
  uint32_t u[10], v[8], q[16], r[8];
  unsigned __int128 c = 0;
  uint64_t s64[5];
  for (int i = 0; i < 4; i++) {
    c += (unsigned __int128)a.w[i] + b.w[i];
    s64[i] = (uint64_t)c;
    c >>= 64;
  }
  s64[4] = (uint64_t)c;
  for (int i = 0; i < 5; i++) {
    u[2 * i] = (uint32_t)s64[i];
    u[2 * i + 1] = (uint32_t)(s64[i] >> 32);
  }
  u256_to_d32(n, v);
  knuth_divmod(u, 10, v, 8, q, r);
  return u256_from_d32(r);
}

// (a * b) mod n over the 512-bit product; n != 0
static inline U256 u256_mulmod(const U256& a, const U256& b, const U256& n) {
  U512 f = u256_mul_full(a, b);
  uint32_t u[16], v[8], q[16], r[8];
  for (int i = 0; i < 8; i++) {
    u[2 * i] = (uint32_t)f.w[i];
    u[2 * i + 1] = (uint32_t)(f.w[i] >> 32);
  }
  u256_to_d32(n, v);
  knuth_divmod(u, 16, v, 8, q, r);
  return u256_from_d32(r);
}

// (a - b) mod n with python's sign convention (result in [0, n)); n != 0
static inline U256 u256_submod(const U256& a, const U256& b, const U256& n) {
  if (u256_cmp(a, b) >= 0) return u256_mod(u256_sub(a, b), n);
  U256 d = u256_mod(u256_sub(b, a), n);  // (b - a) mod n
  if (d.is_zero()) return d;
  return u256_sub(n, d);  // n - d, no wrap since 0 < d < n
}

static inline U256 u256_shl(const U256& a, unsigned s) {  // s < 256
  U256 r{{0, 0, 0, 0}};
  unsigned limb = s / 64, bits = s % 64;
  for (int i = 3; i >= (int)limb; i--) {
    uint64_t v = a.w[i - limb] << bits;
    if (bits && i - (int)limb - 1 >= 0)
      v |= a.w[i - limb - 1] >> (64 - bits);
    r.w[i] = v;
  }
  return r;
}

static inline U256 u256_shr(const U256& a, unsigned s) {  // s < 256
  U256 r{{0, 0, 0, 0}};
  unsigned limb = s / 64, bits = s % 64;
  for (int i = 0; i + (int)limb < 4; i++) {
    uint64_t v = a.w[i + limb] >> bits;
    if (bits && i + (int)limb + 1 < 4) v |= a.w[i + limb + 1] << (64 - bits);
    r.w[i] = v;
  }
  return r;
}
