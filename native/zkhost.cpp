// Native host-side kernels for zk_evm_tpu.
//
// The reference keeps its hot host loops (witness generation, trie
// hashing) in compiled code; this library is our counterpart for the
// CPU-resident pieces: keccak-f[1600] / keccak256 (kernel code hashing,
// MPT node hashing, KECCAK_GENERAL in the interpreter) and vectorized
// Goldilocks arithmetic for host-side trace post-processing. Loaded via
// ctypes (pybind11 is not available in the target image); python callers
// fall back to the pure-python twins when the library isn't built.
//
// Build: make -C native    (produces libzkhost.so)

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Keccak-f[1600]
// ---------------------------------------------------------------------------

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int RHO[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3, 10, 43,
                            25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};

static inline uint64_t rotl(uint64_t v, int n) {
  return n ? (v << n) | (v >> (64 - n)) : v;
}

// lanes[x + 5*y] convention (state[x][y] = lanes[x + 5y])
void keccak_f1600(uint64_t lanes[25]) {
  uint64_t C[5], D[5], B[25];
  for (int round = 0; round < 24; round++) {
    for (int x = 0; x < 5; x++)
      C[x] = lanes[x] ^ lanes[x + 5] ^ lanes[x + 10] ^ lanes[x + 15] ^
             lanes[x + 20];
    for (int x = 0; x < 5; x++) D[x] = C[(x + 4) % 5] ^ rotl(C[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) {
        uint64_t v = lanes[x + 5 * y] ^ D[x];
        B[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(v, RHO[x + 5 * y]);
      }
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        lanes[x + 5 * y] =
            B[x + 5 * y] ^ ((~B[(x + 1) % 5 + 5 * y]) & B[(x + 2) % 5 + 5 * y]);
    lanes[0] ^= RC[round];
  }
}

// keccak256 (legacy 10*1 padding, rate 136)
void keccak256(const uint8_t* data, uint64_t len, uint8_t out[32]) {
  uint64_t lanes[25];
  std::memset(lanes, 0, sizeof lanes);
  uint8_t block[136];
  uint64_t off = 0;
  while (len - off >= 136) {
    for (int i = 0; i < 17; i++) {
      uint64_t w;
      std::memcpy(&w, data + off + 8 * i, 8);
      lanes[i] ^= w;
    }
    keccak_f1600(lanes);
    off += 136;
  }
  uint64_t rem = len - off;
  std::memset(block, 0, sizeof block);
  std::memcpy(block, data + off, rem);
  block[rem] = 0x01;
  block[135] |= 0x80;
  for (int i = 0; i < 17; i++) {
    uint64_t w;
    std::memcpy(&w, block + 8 * i, 8);
    lanes[i] ^= w;
  }
  keccak_f1600(lanes);
  std::memcpy(out, lanes, 32);
}

// ---------------------------------------------------------------------------
// Goldilocks (p = 2^64 - 2^32 + 1) vector ops for host post-processing
// ---------------------------------------------------------------------------

static const uint64_t P = 0xffffffff00000001ULL;
static const uint64_t EPS = 0xffffffffULL;  // 2^64 mod p

static inline uint64_t gl_add(uint64_t a, uint64_t b) {
  uint64_t s = a + b;
  if (s < a) s += EPS;           // wrapped: add 2^64 mod p
  if (s >= P) s -= P;
  return s;
}

static inline uint64_t gl_reduce128(unsigned __int128 w) {
  uint64_t lo = (uint64_t)w;
  uint64_t hi = (uint64_t)(w >> 64);
  uint64_t n1 = hi & 0xffffffffULL;
  uint64_t n2 = hi >> 32;
  // t = lo - n2 (mod p)
  uint64_t t = lo - n2;
  if (lo < n2) t -= EPS;
  if (t >= P) t -= P;
  uint64_t u = (n1 << 32) - n1;  // n1 * (2^32 - 1) < p
  return gl_add(t, u);
}

static inline uint64_t gl_mul(uint64_t a, uint64_t b) {
  return gl_reduce128((unsigned __int128)a * b);
}

void gl_vec_add(const uint64_t* a, const uint64_t* b, uint64_t* out,
                uint64_t n) {
  for (uint64_t i = 0; i < n; i++) out[i] = gl_add(a[i], b[i]);
}

void gl_vec_mul(const uint64_t* a, const uint64_t* b, uint64_t* out,
                uint64_t n) {
  for (uint64_t i = 0; i < n; i++) out[i] = gl_mul(a[i], b[i]);
}

// ---------------------------------------------------------------------------
// Poseidon permutation (width 12, x^7 S-box, small-circulant MDS).
// Exact host twin of hash/host_poseidon.py:permute — parameters are passed
// in (round constants, circulant, diagonal) so this stays bit-compatible
// with whatever constant table the python layer derives or imports.
// ---------------------------------------------------------------------------

static inline uint64_t gl_sbox7(uint64_t x) {
  uint64_t x2 = gl_mul(x, x);
  uint64_t x3 = gl_mul(x2, x);
  uint64_t x4 = gl_mul(x2, x2);
  return gl_mul(x3, x4);
}

// MDS entries are <= 6 bits, so 13 terms of u64*u6 products accumulate in
// u128 without overflow; one reduction per output element.
static inline void poseidon_mds12(const uint64_t* circ, const uint64_t* diag,
                                  const uint64_t* in, uint64_t* out) {
  for (int r = 0; r < 12; r++) {
    unsigned __int128 acc = (unsigned __int128)diag[r] * in[r];
    for (int i = 0; i < 12; i++)
      acc += (unsigned __int128)circ[i] * in[(i + r) % 12];
    out[r] = gl_reduce128(acc);
  }
}

// states: (n, 12) row-major, updated in place. rc: (n_rounds, 12).
void poseidon_permute_many(const uint64_t* rc, const uint64_t* circ,
                           const uint64_t* diag, uint64_t half_full,
                           uint64_t n_partial, uint64_t* states, uint64_t n) {
  for (uint64_t k = 0; k < n; k++) {
    uint64_t* s = states + 12 * k;
    uint64_t tmp[12];
    const uint64_t* r = rc;
    for (uint64_t f = 0; f < half_full; f++, r += 12) {
      for (int i = 0; i < 12; i++) tmp[i] = gl_sbox7(gl_add(s[i], r[i]));
      poseidon_mds12(circ, diag, tmp, s);
    }
    for (uint64_t p = 0; p < n_partial; p++, r += 12) {
      for (int i = 0; i < 12; i++) tmp[i] = gl_add(s[i], r[i]);
      tmp[0] = gl_sbox7(tmp[0]);
      poseidon_mds12(circ, diag, tmp, s);
    }
    for (uint64_t f = 0; f < half_full; f++, r += 12) {
      for (int i = 0; i < 12; i++) tmp[i] = gl_sbox7(gl_add(s[i], r[i]));
      poseidon_mds12(circ, diag, tmp, s);
    }
  }
}

// Full witness of one Poseidon permutation per input: the state after
// every round, each S-box's cube, and the digest-limb inverses — the
// Poseidon TABLE's generate_perm (tables/poseidon.py _perm_into_row).
// Round structure: half_full full rounds, n_partial partial, half_full
// full. x^7 = (x^3)^2 * x with the cube recorded as the witness.
void poseidon_witness_batch(const uint64_t* rc, const uint64_t* circ,
                            const uint64_t* diag, uint64_t half_full,
                            uint64_t n_partial, const uint64_t* inp,
                            uint64_t n, uint64_t* round_states,
                            uint64_t* cubes_full, uint64_t* cubes_partial,
                            uint64_t* pinv) {
  uint64_t n_rounds = 2 * half_full + n_partial;
  for (uint64_t k = 0; k < n; k++) {
    uint64_t s[12], x[12], y[12];
    std::memcpy(s, inp + 12 * k, 96);
    uint64_t* rs = round_states + k * n_rounds * 12;
    uint64_t* cf = cubes_full + k * 2 * half_full * 12;
    uint64_t* cp = cubes_partial + k * n_partial;
    const uint64_t* r = rc;
    uint64_t full_pos = 0, par_pos = 0;
    for (uint64_t rnd = 0; rnd < n_rounds; rnd++, r += 12) {
      for (int i = 0; i < 12; i++) x[i] = gl_add(s[i], r[i]);
      bool full = rnd < half_full || rnd >= half_full + n_partial;
      if (full) {
        for (int i = 0; i < 12; i++) {
          uint64_t cube = gl_mul(gl_mul(x[i], x[i]), x[i]);
          cf[full_pos * 12 + i] = cube;
          y[i] = gl_mul(gl_mul(cube, cube), x[i]);
        }
        full_pos++;
      } else {
        uint64_t cube = gl_mul(gl_mul(x[0], x[0]), x[0]);
        cp[par_pos++] = cube;
        y[0] = gl_mul(gl_mul(cube, cube), x[0]);
        for (int i = 1; i < 12; i++) y[i] = x[i];
      }
      poseidon_mds12(circ, diag, y, s);
      std::memcpy(rs + rnd * 12, s, 96);
    }
    for (int i = 0; i < 4; i++) {
      uint64_t hi = s[i] >> 32;
      uint64_t d = gl_reduce128((unsigned __int128)hi + P - 0xffffffffULL);
      if (d == 0) {
        pinv[4 * k + i] = 0;
        continue;
      }
      // Fermat inverse
      uint64_t inv = 1, base = d, e = 0xfffffffeffffffffULL;
      while (e) {
        if (e & 1) inv = gl_mul(inv, base);
        base = gl_mul(base, base);
        e >>= 1;
      }
      pinv[4 * k + i] = inv;
    }
  }
}

// Overwrite-mode rate-8 sponge over a flat element stream: for each input
// span (given by offsets[i]..offsets[i+1]) compute the 4-element digest —
// with the <=4-element hash_or_noop passthrough — into digests[4*i..].
void poseidon_hash_leaves(const uint64_t* rc, const uint64_t* circ,
                          const uint64_t* diag, uint64_t half_full,
                          uint64_t n_partial, const uint64_t* elems,
                          const uint64_t* offsets, uint64_t n_leaves,
                          uint64_t* digests) {
  for (uint64_t k = 0; k < n_leaves; k++) {
    const uint64_t* in = elems + offsets[k];
    uint64_t len = offsets[k + 1] - offsets[k];
    uint64_t* out = digests + 4 * k;
    if (len <= 4) {
      for (uint64_t i = 0; i < 4; i++) out[i] = i < len ? in[i] : 0;
      continue;
    }
    uint64_t state[12] = {0};
    for (uint64_t off = 0; off < len; off += 8) {
      uint64_t chunk = len - off < 8 ? len - off : 8;
      for (uint64_t i = 0; i < chunk; i++) state[i] = in[off + i];
      poseidon_permute_many(rc, circ, diag, half_full, n_partial, state, 1);
    }
    for (int i = 0; i < 4; i++) out[i] = state[i];
  }
}

// Batched field inversion (Montgomery trick): one Fermat inverse + 3n
// muls. Zeros invert to zero (the convention the trace generators use
// for "inverse-or-zero" columns).
void gl_batch_inv(const uint64_t* a, uint64_t* out, uint64_t n) {
  // prefix products, mapping zero -> 1
  uint64_t acc = 1;
  for (uint64_t i = 0; i < n; i++) {
    out[i] = acc;  // product of a[0..i) (zeros skipped)
    uint64_t v = a[i];
    if (v) acc = gl_mul(acc, v);
  }
  // acc^-1 via Fermat (p-2 = 0xfffffffeffffffff)
  uint64_t inv = 1, base = acc;
  uint64_t e = 0xfffffffeffffffffULL;
  while (e) {
    if (e & 1) inv = gl_mul(inv, base);
    base = gl_mul(base, base);
    e >>= 1;
  }
  for (uint64_t i = n; i-- > 0;) {
    uint64_t v = a[i];
    if (v) {
      uint64_t r = gl_mul(inv, out[i]);
      inv = gl_mul(inv, v);
      out[i] = r;
    } else {
      out[i] = 0;
    }
  }
}

// cumulative suffix sums mod p (logUp running-sum generation on host)
void gl_suffix_sum(const uint64_t* a, uint64_t* out, uint64_t n) {
  uint64_t acc = 0;
  for (uint64_t i = n; i-- > 0;) {
    acc = gl_add(acc, a[i]);
    out[i] = acc;
  }
}

}  // extern "C"
