// Native tape core for the L2 verifier-VM (zk_evm_tpu/recursion/vm.py).
//
// The wrap tape for a real block's segment chain is millions of ops; the
// pure-python Tape builder costs ~10-100us per op (dict rows + dataclass
// RAM ops). This core keeps the whole tape — rows, single-assignment RAM,
// liveness, Poseidon — in struct-of-array C++ storage behind a ctypes
// handle, and emits finished numpy traces directly. RAM ops are NOT
// stored: the per-row slot schedule is deterministic (reads in slots 0-2,
// result write in 3, Poseidon reads 4-15 / writes 16-27), so each chunk's
// op list is re-derived from the rows on demand.
//
// Semantics are an exact twin of the python Tape (recursion/vm.py) and
// ram.generate_trace (recursion/ram.py); tests/test_tapecore.py asserts
// bit-identical traces between the two.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include "gl.h"

extern "C" void poseidon_permute_many(const uint64_t* rc,
                                      const uint64_t* circ,
                                      const uint64_t* diag,
                                      uint64_t half_full, uint64_t n_partial,
                                      uint64_t* states, uint64_t n);

namespace {

// known-column indices (recursion/vm.py:43-62)
enum {
  F_LOAD = 0,
  F_ARITH = 1,
  F_SEL = 2,
  F_ASSERT = 3,
  F_POSE = 4,
  F_PUB = 5,
  A0 = 6,
  A1 = 7,
  A2 = 8,
  AOUT = 9,
  C2 = 10,
  C0 = 11,
  C1 = 12,
  USE0 = 13,
  USE1 = 14,
  USE2 = 15,
  USEW = 16,
  PADDR0 = 17,   // ..28
  POADDR0 = 29,  // ..40
  PUBSEL_START = 41,
};

enum Kind : uint8_t {
  K_LOAD = 0,
  K_ARITH = 1,
  K_SEL = 2,
  K_ASSERT = 3,
  K_POSE = 4,
  K_PUB = 5,
};

const int N_SLOTS = 28;

struct RamRow {
  uint64_t addr;
  uint64_t ts;
  uint64_t value;
  uint8_t is_read;
  uint8_t filter;  // 1 = real op, 0 = dummy/padding
};

struct Tape {
  uint64_t npub;
  // Poseidon parameters (set once at creation)
  std::vector<uint64_t> rc, circ, diag;
  uint64_t half_full = 0, n_partial = 0;

  // struct-of-arrays rows
  std::vector<uint8_t> kind;
  std::vector<int64_t> a0, a1, a2, aout;
  std::vector<uint64_t> c2, c0, c1;
  std::vector<uint64_t> v0, v1, v2, vout, v01;
  std::vector<uint8_t> uses;  // bit0..3 = use0,use1,use2,usew
  std::vector<int32_t> pubk;
  std::vector<int32_t> pose_idx;

  // per-POSE-row side tables
  std::vector<int64_t> pose_in_addr;   // 12 per pose
  std::vector<int64_t> pose_out_base;  // 1 per pose (outputs contiguous)
  std::vector<uint64_t> pose_in;       // 12 per pose
  std::vector<uint64_t> pose_out;      // 12 per pose

  // single-assignment RAM + liveness
  std::vector<uint64_t> mem;
  std::vector<int64_t> write_clk;      // alloc row per addr
  std::vector<int64_t> last_read_clk;  // -1 if never read

  std::vector<uint64_t> pub_vals;
  std::vector<uint8_t> pub_bound;

  // cached RAM build (size query then fill)
  std::vector<RamRow> ram_cache;
  uint64_t ram_key[4] = {~0ULL, 0, 0, 0};

  uint64_t n_rows() const { return kind.size(); }

  int64_t alloc(int64_t clk) {
    mem.push_back(0);
    write_clk.push_back(clk);
    last_read_clk.push_back(-1);
    return (int64_t)mem.size() - 1;
  }

  uint64_t read(int64_t addr, int64_t clk) {
    if (last_read_clk[addr] < clk) last_read_clk[addr] = clk;
    return mem[addr];
  }

  void push_row(uint8_t k) {
    kind.push_back(k);
    a0.push_back(-1);
    a1.push_back(-1);
    a2.push_back(-1);
    aout.push_back(-1);
    c2.push_back(0);
    c0.push_back(0);
    c1.push_back(0);
    v0.push_back(0);
    v1.push_back(0);
    v2.push_back(0);
    vout.push_back(0);
    v01.push_back(0);
    uses.push_back(0);
    pubk.push_back(-1);
    pose_idx.push_back(-1);
  }
};

}  // namespace

extern "C" {

void* tape_new(uint64_t npub, const uint64_t* rc, uint64_t n_rc,
               const uint64_t* circ, const uint64_t* diag,
               uint64_t half_full, uint64_t n_partial) {
  Tape* t = new Tape();
  t->npub = npub;
  t->rc.assign(rc, rc + n_rc);
  t->circ.assign(circ, circ + 12);
  t->diag.assign(diag, diag + 12);
  t->half_full = half_full;
  t->n_partial = n_partial;
  t->pub_vals.assign(npub, 0);
  t->pub_bound.assign(npub, 0);
  return t;
}

void tape_free(void* h) { delete (Tape*)h; }

int64_t tape_load(void* h, uint64_t value) {
  Tape* t = (Tape*)h;
  int64_t clk = (int64_t)t->n_rows();
  t->push_row(K_LOAD);
  int64_t addr = t->alloc(clk);
  t->aout.back() = addr;
  t->uses.back() = 8;  // usew
  t->vout.back() = value;
  t->mem[addr] = value;
  return addr;
}

int64_t tape_const(void* h, uint64_t value) {
  // an ARITH row computing C1 (python Tape.const); caller caches
  Tape* t = (Tape*)h;
  int64_t clk = (int64_t)t->n_rows();
  t->push_row(K_ARITH);
  int64_t addr = t->alloc(clk);
  t->aout.back() = addr;
  t->uses.back() = 8;
  t->c1.back() = value;
  t->vout.back() = value;
  t->mem[addr] = value;
  return addr;
}

int64_t tape_arith(void* h, int64_t a, int64_t b, int64_t c, uint64_t kc2,
                   uint64_t kc0, uint64_t kc1) {
  Tape* t = (Tape*)h;
  int64_t clk = (int64_t)t->n_rows();
  uint64_t va = 0, vb = 0, vc = 0;
  uint8_t use = 8;  // usew
  if (a >= 0) {
    va = t->read(a, clk);
    use |= 1;
  }
  if (b >= 0) {
    vb = t->read(b, clk);
    use |= 2;
  }
  if (c >= 0) {
    vc = t->read(c, clk);
    use |= 4;
  }
  uint64_t p01 = gl::mul(va, vb);
  uint64_t out =
      gl::add(gl::add(gl::mul(kc2, p01), gl::mul(kc0, vc)), kc1);
  t->push_row(K_ARITH);
  int64_t addr = t->alloc(clk);
  t->a0.back() = a;
  t->a1.back() = b;
  t->a2.back() = c;
  t->aout.back() = addr;
  t->c2.back() = kc2;
  t->c0.back() = kc0;
  t->c1.back() = kc1;
  t->v0.back() = va;
  t->v1.back() = vb;
  t->v2.back() = vc;
  t->v01.back() = p01;
  t->vout.back() = out;
  t->uses.back() = use;
  t->mem[addr] = out;
  return addr;
}

int64_t tape_sel(void* h, int64_t bit, int64_t a, int64_t b) {
  Tape* t = (Tape*)h;
  int64_t clk = (int64_t)t->n_rows();
  uint64_t vb = t->read(b, clk);
  uint64_t va = t->read(a, clk);
  uint64_t vbit = t->read(bit, clk);
  uint64_t out = gl::add(vb, gl::mul(vbit, gl::sub(va, vb)));
  t->push_row(K_SEL);
  int64_t addr = t->alloc(clk);
  t->a0.back() = b;
  t->a1.back() = a;
  t->a2.back() = bit;
  t->aout.back() = addr;
  t->v0.back() = vb;
  t->v1.back() = va;
  t->v2.back() = vbit;
  t->v01.back() = gl::mul(vb, va);
  t->vout.back() = out;
  t->uses.back() = 15;
  t->mem[addr] = out;
  return addr;
}

int64_t tape_assert_eq(void* h, int64_t a, int64_t b) {
  Tape* t = (Tape*)h;
  int64_t clk = (int64_t)t->n_rows();
  uint64_t va = t->read(a, clk);
  uint64_t vb = t->read(b, clk);
  if (va != vb) return -1;  // python raises with the values
  t->push_row(K_ASSERT);
  t->a0.back() = a;
  t->a1.back() = b;
  t->v0.back() = va;
  t->v1.back() = vb;
  t->v01.back() = gl::mul(va, vb);
  t->uses.back() = 3;
  return 0;
}

// in_addrs[12]; returns the base of 12 contiguous output addresses
int64_t tape_pose(void* h, const int64_t* in_addrs) {
  Tape* t = (Tape*)h;
  int64_t clk = (int64_t)t->n_rows();
  uint64_t state[12];
  int32_t pidx = (int32_t)t->pose_out_base.size();
  t->push_row(K_POSE);
  t->pose_idx.back() = pidx;
  for (int i = 0; i < 12; i++) {
    state[i] = t->read(in_addrs[i], clk);
    t->pose_in_addr.push_back(in_addrs[i]);
    t->pose_in.push_back(state[i]);
  }
  poseidon_permute_many(t->rc.data(), t->circ.data(), t->diag.data(),
                        t->half_full, t->n_partial, state, 1);
  int64_t base = -1;
  for (int j = 0; j < 12; j++) {
    int64_t addr = t->alloc(clk);
    if (j == 0) base = addr;
    t->mem[addr] = state[j];
    t->pose_out.push_back(state[j]);
  }
  t->pose_out_base.push_back(base);
  return base;
}

int64_t tape_bind_public(void* h, int64_t cell, uint64_t k) {
  Tape* t = (Tape*)h;
  if (k >= t->npub || t->pub_bound[k]) return -1;
  uint64_t v = t->read(cell, (int64_t)t->n_rows());
  t->push_row(K_PUB);
  t->a0.back() = cell;
  t->v0.back() = v;
  t->uses.back() = 1;
  t->pubk.back() = (int32_t)k;
  t->pub_vals[k] = v;
  t->pub_bound[k] = 1;
  return 0;
}

uint64_t tape_value(void* h, int64_t addr) { return ((Tape*)h)->mem[addr]; }
uint64_t tape_n_rows(void* h) { return ((Tape*)h)->n_rows(); }
uint64_t tape_n_alloc(void* h) { return ((Tape*)h)->mem.size(); }
uint64_t tape_n_pose(void* h) { return ((Tape*)h)->pose_out_base.size(); }

// publics: values into out[npub]; returns count of UNbound slots
uint64_t tape_get_publics(void* h, uint64_t* out) {
  Tape* t = (Tape*)h;
  uint64_t unbound = 0;
  for (uint64_t k = 0; k < t->npub; k++) {
    out[k] = t->pub_vals[k];
    if (!t->pub_bound[k]) unbound++;
  }
  return unbound;
}

// Fill the dense (ncols, n_pad) C-contiguous trace slice for rows
// [row_lo, row_hi); `out` must be zeroed. CLK is left to the caller.
void tape_export_trace(void* h, uint64_t row_lo, uint64_t row_hi,
                       uint64_t* out, uint64_t n_pad) {
  Tape* t = (Tape*)h;
  uint64_t npub = t->npub;
  uint64_t k0 = PUBSEL_START + npub;  // NUM_KNOWN
  uint64_t V0c = k0 + 1, V1c = k0 + 2, V2c = k0 + 3, VOUTc = k0 + 4,
           V01c = k0 + 5, PINc = k0 + 6, PLIMBc = k0 + 18, PPARTc = k0 + 26;
  auto put = [&](uint64_t colidx, uint64_t r, uint64_t v) {
    out[colidx * n_pad + r] = v;
  };
  for (uint64_t row = row_lo; row < row_hi; row++) {
    uint64_t r = row - row_lo;
    uint8_t k = t->kind[row];
    uint8_t use = t->uses[row];
    static const int flag_col[6] = {F_LOAD, F_ARITH, F_SEL,
                                    F_ASSERT, F_POSE, F_PUB};
    put(flag_col[k], r, 1);
    if (t->a0[row] >= 0) put(A0, r, (uint64_t)t->a0[row]);
    if (t->a1[row] >= 0) put(A1, r, (uint64_t)t->a1[row]);
    if (t->a2[row] >= 0) put(A2, r, (uint64_t)t->a2[row]);
    if (t->aout[row] >= 0) put(AOUT, r, (uint64_t)t->aout[row]);
    put(C2, r, t->c2[row]);
    put(C0, r, t->c0[row]);
    put(C1, r, t->c1[row]);
    put(USE0, r, use & 1);
    put(USE1, r, (use >> 1) & 1);
    put(USE2, r, (use >> 2) & 1);
    put(USEW, r, (use >> 3) & 1);
    if (t->pubk[row] >= 0) put(PUBSEL_START + t->pubk[row], r, 1);
    put(V0c, r, t->v0[row]);
    put(V1c, r, t->v1[row]);
    put(V2c, r, t->v2[row]);
    put(VOUTc, r, t->vout[row]);
    put(V01c, r, t->v01[row]);
    int32_t pi = t->pose_idx[row];
    if (pi >= 0) {
      const int64_t* pia = &t->pose_in_addr[12 * pi];
      const uint64_t* pin = &t->pose_in[12 * pi];
      const uint64_t* po = &t->pose_out[12 * pi];
      int64_t base = t->pose_out_base[pi];
      for (int i = 0; i < 12; i++) {
        put(PADDR0 + i, r, (uint64_t)pia[i]);
        put(POADDR0 + i, r, (uint64_t)(base + i));
        put(PINc + i, r, pin[i]);
      }
      for (int j = 0; j < 4; j++) {
        put(PLIMBc + 2 * j, r, po[j] & 0xffffffffULL);
        put(PLIMBc + 2 * j + 1, r, po[j] >> 32);
      }
      for (int j = 0; j < 8; j++) put(PPARTc + j, r, po[4 + j]);
    }
  }
}

// Poseidon inputs of pose rows in [row_lo, row_hi) -> out (n, 12)
uint64_t tape_count_pose(void* h, uint64_t row_lo, uint64_t row_hi) {
  Tape* t = (Tape*)h;
  uint64_t n = 0;
  for (uint64_t row = row_lo; row < row_hi; row++)
    if (t->pose_idx[row] >= 0) n++;
  return n;
}

void tape_export_pose(void* h, uint64_t row_lo, uint64_t row_hi,
                      uint64_t* out) {
  Tape* t = (Tape*)h;
  for (uint64_t row = row_lo; row < row_hi; row++) {
    int32_t pi = t->pose_idx[row];
    if (pi < 0) continue;
    std::memcpy(out, &t->pose_in[12 * pi], 12 * sizeof(uint64_t));
    out += 12;
  }
}

// Live addresses at a row boundary: written before `boundary`, read at or
// after it. Single-assignment makes this exact (continuation.py).
uint64_t tape_live_at(void* h, int64_t boundary, uint64_t* out_addrs,
                      uint64_t* out_vals) {
  Tape* t = (Tape*)h;
  uint64_t n = 0;
  for (uint64_t a = 0; a < t->mem.size(); a++) {
    if (t->write_clk[a] < boundary && t->last_read_clk[a] >= boundary) {
      if (out_addrs) {
        out_addrs[n] = a;
        out_vals[n] = t->mem[a];
      }
      n++;
    }
  }
  return n;
}

// -- RAM trace (exact twin of recursion/ram.py generate_trace) -------------

static void derive_ram_ops(Tape* t, uint64_t row_lo, uint64_t row_hi,
                           const uint64_t* before_addrs, uint64_t n_before,
                           std::vector<RamRow>& ops) {
  for (uint64_t i = 0; i < n_before; i++) {
    uint64_t a = before_addrs[i];
    ops.push_back({a, 0, t->mem[a], 0, 1});
  }
  for (uint64_t row = row_lo; row < row_hi; row++) {
    uint64_t ts0 = row * N_SLOTS + 1;
    uint8_t use = t->uses[row];
    switch (t->kind[row]) {
      case K_LOAD:
        ops.push_back({(uint64_t)t->aout[row], ts0 + 3, t->vout[row], 0, 1});
        break;
      case K_ARITH:
        if (use & 1)
          ops.push_back({(uint64_t)t->a0[row], ts0 + 0, t->v0[row], 1, 1});
        if (use & 2)
          ops.push_back({(uint64_t)t->a1[row], ts0 + 1, t->v1[row], 1, 1});
        if (use & 4)
          ops.push_back({(uint64_t)t->a2[row], ts0 + 2, t->v2[row], 1, 1});
        ops.push_back({(uint64_t)t->aout[row], ts0 + 3, t->vout[row], 0, 1});
        break;
      case K_SEL:
        ops.push_back({(uint64_t)t->a0[row], ts0 + 0, t->v0[row], 1, 1});
        ops.push_back({(uint64_t)t->a1[row], ts0 + 1, t->v1[row], 1, 1});
        ops.push_back({(uint64_t)t->a2[row], ts0 + 2, t->v2[row], 1, 1});
        ops.push_back({(uint64_t)t->aout[row], ts0 + 3, t->vout[row], 0, 1});
        break;
      case K_ASSERT:
        ops.push_back({(uint64_t)t->a0[row], ts0 + 0, t->v0[row], 1, 1});
        ops.push_back({(uint64_t)t->a1[row], ts0 + 1, t->v1[row], 1, 1});
        break;
      case K_PUB:
        ops.push_back({(uint64_t)t->a0[row], ts0 + 0, t->v0[row], 1, 1});
        break;
      case K_POSE: {
        int32_t pi = t->pose_idx[row];
        const int64_t* pia = &t->pose_in_addr[12 * pi];
        const uint64_t* pin = &t->pose_in[12 * pi];
        const uint64_t* po = &t->pose_out[12 * pi];
        int64_t base = t->pose_out_base[pi];
        for (int i = 0; i < 12; i++)
          ops.push_back({(uint64_t)pia[i], ts0 + 4 + i, pin[i], 1, 1});
        for (int j = 0; j < 12; j++)
          ops.push_back(
              {(uint64_t)(base + j), ts0 + 16 + j, po[j], 0, 1});
        break;
      }
    }
  }
}

// sorted real ops -> dummy-filled rows within budget, or empty on overflow
static bool ram_build(const std::vector<RamRow>& sorted_ops,
                      uint64_t n_budget, std::vector<RamRow>& out) {
  out.clear();
  out.reserve(n_budget);
  uint64_t max_rc = n_budget - 1;
  for (const RamRow& op : sorted_ops) {
    if (!out.empty()) {
      const RamRow prev = out.back();
      if (op.addr == prev.addr) {
        uint64_t tts = prev.ts;
        while (op.ts - tts > max_rc) {
          tts += max_rc;
          out.push_back({prev.addr, tts, prev.value, 1, 0});
          if (out.size() > n_budget) return false;
        }
      } else {
        uint64_t a = prev.addr;
        while (op.addr - a - 1 > max_rc) {
          a += max_rc + 1;
          out.push_back({a, 0, 0, 1, 0});
          if (out.size() > n_budget) return false;
        }
      }
    }
    out.push_back(op);
    if (out.size() > n_budget) return false;
  }
  return true;
}

static void ram_prepare(Tape* t, uint64_t row_lo, uint64_t row_hi,
                        const uint64_t* before_addrs, uint64_t n_before,
                        uint64_t min_rows) {
  uint64_t key[4] = {row_lo, row_hi, n_before, min_rows};
  if (std::memcmp(key, t->ram_key, sizeof key) == 0) return;
  std::vector<RamRow> ops;
  derive_ram_ops(t, row_lo, row_hi, before_addrs, n_before, ops);
  if (ops.empty()) {  // python asserts "no RAM ops"; signal size 0
    t->ram_cache.clear();
    std::memcpy(t->ram_key, key, sizeof key);
    return;
  }
  std::sort(ops.begin(), ops.end(), [](const RamRow& x, const RamRow& y) {
    return x.addr != y.addr ? x.addr < y.addr : x.ts < y.ts;
  });
  uint64_t n = min_rows < 2 ? 2 : min_rows;
  std::vector<RamRow> filled;
  for (;;) {
    while (n < ops.size()) n *= 2;
    if (ram_build(ops, n, filled) && filled.size() <= n) break;
    n *= 2;
  }
  while (n < filled.size()) n *= 2;  // paranoia; build bounds already
  t->ram_cache = std::move(filled);
  std::memcpy(t->ram_key, key, sizeof key);
  // pad to n with terminal dummy reads of the last row
  RamRow last = t->ram_cache.back();
  while (t->ram_cache.size() < n)
    t->ram_cache.push_back({last.addr, last.ts, last.value, 1, 0});
}

// Materialize the derived ops of rows [lo, hi) as (ts, addr, is_read,
// value) quadruples (compat shim for python-side RamOp consumers).
uint64_t tape_count_ops(void* h, uint64_t row_lo, uint64_t row_hi) {
  std::vector<RamRow> ops;
  derive_ram_ops((Tape*)h, row_lo, row_hi, nullptr, 0, ops);
  return ops.size();
}

void tape_export_ops(void* h, uint64_t row_lo, uint64_t row_hi,
                     uint64_t* out) {
  std::vector<RamRow> ops;
  derive_ram_ops((Tape*)h, row_lo, row_hi, nullptr, 0, ops);
  for (const RamRow& o : ops) {
    out[0] = o.ts;
    out[1] = o.addr;
    out[2] = o.is_read;
    out[3] = o.value;
    out += 4;
  }
}

uint64_t tape_ram_size(void* h, uint64_t row_lo, uint64_t row_hi,
                       const uint64_t* before_addrs, uint64_t n_before,
                       uint64_t min_rows) {
  Tape* t = (Tape*)h;
  ram_prepare(t, row_lo, row_hi, before_addrs, n_before, min_rows);
  return t->ram_cache.size();
}

// out: (10, n) C-contiguous, zeroed. Column order mirrors ram.py.
// Returns the number of FINAL_EXPORT rows marked (caller asserts it
// equals n_export).
uint64_t tape_ram_fill(void* h, uint64_t row_lo, uint64_t row_hi,
                       const uint64_t* before_addrs, uint64_t n_before,
                       uint64_t min_rows, const uint64_t* export_addrs,
                       uint64_t n_export, uint64_t* out, uint64_t n) {
  Tape* t = (Tape*)h;
  ram_prepare(t, row_lo, row_hi, before_addrs, n_before, min_rows);
  const std::vector<RamRow>& rows = t->ram_cache;
  uint64_t* FILTER = out + 0 * n;
  uint64_t* ADDR = out + 1 * n;
  uint64_t* TS = out + 2 * n;
  uint64_t* IS_READ = out + 3 * n;
  uint64_t* VALUE = out + 4 * n;
  uint64_t* ADDR_CHANGE = out + 5 * n;
  uint64_t* RANGE_CHECK = out + 6 * n;
  uint64_t* COUNTER = out + 7 * n;
  uint64_t* FREQ = out + 8 * n;
  uint64_t* FINAL_EXPORT = out + 9 * n;
  for (uint64_t r = 0; r < n; r++) {
    FILTER[r] = rows[r].filter;
    ADDR[r] = rows[r].addr;
    TS[r] = rows[r].ts;
    IS_READ[r] = rows[r].is_read;
    VALUE[r] = rows[r].value;
  }
  for (uint64_t r = 0; r + 1 < n; r++) {
    if (ADDR[r + 1] != ADDR[r]) {
      ADDR_CHANGE[r] = 1;
      RANGE_CHECK[r] = ADDR[r + 1] - ADDR[r] - 1;
    } else {
      RANGE_CHECK[r] = TS[r + 1] - TS[r];
    }
  }
  for (uint64_t r = 0; r < n; r++) {
    COUNTER[r] = r;
    FREQ[RANGE_CHECK[r]] += 1;  // all range checks are < n by construction
  }
  uint64_t marked = 0;
  if (n_export) {
    // export addrs are a sorted set; an address's final row is the one
    // whose successor changes address (exactly one per address), or the
    // global last row (the final address's run, padding included, never
    // sees an ADDR_CHANGE). Matches ram.py's mark-and-discard loop.
    for (uint64_t r = 0; r < n; r++) {
      if ((r == n - 1 || ADDR_CHANGE[r]) &&
          std::binary_search(export_addrs, export_addrs + n_export,
                             ADDR[r])) {
        FINAL_EXPORT[r] = 1;
        marked++;
      }
    }
  }
  return marked;
}

}  // extern "C"
