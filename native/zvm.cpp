// Native kernel-interpreter core ("zvm") for witness generation.
//
// Exact semantic twin of the hot dispatch loop in
// zk_evm_tpu/witness/interpreter.py (itself mirroring the reference's
// witness/transition.rs + operation.rs): the sparse memory state,
// registers, per-step trace recording, coprocessor op logs, syscall/
// exception traps and gas accounting all run in C++; the python layer
// keeps everything cold — PROVER_INPUT oracles, jumpdest analysis
// bit-setting, contract-code observation, GenerationState bookkeeping —
// and is re-entered through explicit yields. tests/test_zvm.py asserts
// step-for-step equality (trace, logs, memory, registers) against the
// pure-python interpreter on real kernel runs.
//
// Memory keys pack exactly like the kernel's address words
// (interpreter.py _unpack_addr): ctx * 2^64 + segment * 2^32 + virtual.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include "gl.h"
#include "u256.h"

extern "C" void keccak256(const uint8_t* data, uint64_t len,
                          uint8_t out[32]);

namespace {

typedef unsigned __int128 u128;

struct KeyHash {
  size_t operator()(u128 k) const {
    uint64_t x = (uint64_t)k ^ (uint64_t)(k >> 64) * 0x9e3779b97f4a7c15ULL;
    x ^= x >> 30;
    x *= 0xbf58476d1ce4e5b9ULL;
    x ^= x >> 27;
    return (size_t)x;
  }
};

static inline u128 mem_key(uint64_t ctx, uint64_t seg, uint64_t virt) {
  return ((u128)ctx << 64) | (seg << 32) | virt;
}

// One (ctx, seg)'s cells: a dense value array with a written-bitmask
// (virt < v.size()) plus a sparse overflow map for far-out virts.
// Semantics are identical to the old flat u128->U256 map — a cell
// "exists" iff it was explicitly written (or preinit-materialized);
// holes inside the dense range stay non-existent via the bitmask, so
// snapshots/MemBefore exports see exactly the live cells. Invariant:
// every ovf virt >= v.size() (growth migrates lower ovf entries in).
struct SegArr {
  std::vector<U256> v;
  std::vector<uint64_t> bits;   // written bitmask, ceil(v.size()/64)
  std::unordered_map<uint64_t, U256> ovf;
  uint64_t maxv = 0;
  uint64_t count = 0;           // number of written cells

  bool dense_set(uint64_t virt) const {
    return virt < v.size() && (bits[virt >> 6] >> (virt & 63)) & 1;
  }
  // grow the dense range when the write lands near it; wild virts go
  // to the overflow map so one far write can't balloon memory. Below
  // 2^20 cells (32 MB) growth is unconditional — dense access is what
  // makes the interpreter fast and the waste is bounded; above that,
  // an occupancy gate (count >= new_size/8) stops a sparse ascending
  // pattern from ratcheting the dense array to the 2^26 cap (~2 GB)
  // while holding few live cells — such writes stay in the overflow
  // map, whose entries migrate in if density ever catches up.
  bool should_grow(uint64_t virt) const {
    if (virt >= (v.size() << 1) + 4096 || virt >= (1ULL << 26))
      return false;
    return virt < (1ULL << 20) || count + 1 >= ((virt + 1) >> 3);
  }
  void grow_to(uint64_t n) {
    v.resize(n, U256{{0, 0, 0, 0}});
    bits.resize((n + 63) >> 6, 0);
    if (!ovf.empty()) {
      for (auto it = ovf.begin(); it != ovf.end();) {
        if (it->first < n) {
          v[it->first] = it->second;
          bits[it->first >> 6] |= 1ULL << (it->first & 63);
          it = ovf.erase(it);
        } else {
          ++it;
        }
      }
    }
  }
  void put(uint64_t virt, const U256& val) {
    if (virt < v.size()) {
      uint64_t& w = bits[virt >> 6];
      if (!((w >> (virt & 63)) & 1)) {
        w |= 1ULL << (virt & 63);
        count++;
      }
      v[virt] = val;
    } else if (should_grow(virt)) {
      grow_to(virt + 1);
      bits[virt >> 6] |= 1ULL << (virt & 63);
      count++;
      v[virt] = val;
    } else {
      count += ovf.insert_or_assign(virt, val).second;
    }
    if (count == 1 || virt > maxv) maxv = virt;
  }
  const U256* find(uint64_t virt) const {
    if (virt < v.size())
      return dense_set(virt) ? &v[virt] : nullptr;
    auto it = ovf.find(virt);
    return it == ovf.end() ? nullptr : &it->second;
  }
  // written virts in ascending order
  void keys(std::vector<uint64_t>& out) const {
    for (size_t w = 0; w < bits.size(); w++) {
      uint64_t m = bits[w];
      while (m) {
        out.push_back((w << 6) + __builtin_ctzll(m));
        m &= m - 1;
      }
    }
    size_t dense_n = out.size();
    for (auto& kv : ovf) out.push_back(kv.first);
    std::sort(out.begin() + dense_n, out.end());
  }
};

struct ZvmMem {
  std::unordered_map<u128, SegArr, KeyHash> segs;  // key (ctx, seg, 0)
  std::unordered_map<uint32_t, std::vector<U256>> preinit;

  U256 get(uint64_t ctx, uint64_t seg, uint64_t virt) {
    auto it = segs.find(mem_key(ctx, seg, 0));
    if (it != segs.end()) {
      const U256* p = it->second.find(virt);
      if (p) return *p;
    }
    auto p = preinit.find((uint32_t)seg);
    if (p != preinit.end() && virt < p->second.size()) {
      // materialize the fallback hit (MemoryState.get semantics)
      U256 v = p->second[virt];
      set(ctx, seg, virt, v);
      return v;
    }
    return U256{{0, 0, 0, 0}};
  }

  void set(uint64_t ctx, uint64_t seg, uint64_t virt, const U256& v) {
    segs[mem_key(ctx, seg, 0)].put(virt, v);
  }

  bool is_set(uint64_t ctx, uint64_t seg, uint64_t virt) const {
    auto it = segs.find(mem_key(ctx, seg, 0));
    return it != segs.end() && it->second.find(virt) != nullptr;
  }

  uint64_t total_count() const {
    uint64_t n = 0;
    for (auto& kv : segs) n += kv.second.count;
    return n;
  }
};

// exception codes (interpreter.py:50-56)
enum {
  EXC_OUT_OF_GAS = 0,
  EXC_INVALID_OPCODE = 1,
  EXC_STACK_UNDERFLOW = 2,
  EXC_INVALID_JUMP = 3,
  EXC_INVALID_JUMPI = 4,
  EXC_STACK_OVERFLOW = 5,
  EXC_STOP = 6,
};

// yield reasons (python NativeRunner matches these)
enum {
  Y_HALTED = 0,
  Y_FINAL = 1,
  Y_PROVER_INPUT = 2,
  Y_OBSERVE_CONTRACT = 3,
  Y_JD_ANALYSIS = 4,
  Y_MAX_CYCLES = 5,
  Y_ERROR = 6,
};

// error codes for Y_ERROR (python raises KernelPanic / AssertionError)
enum {
  E_PC_OOB = 1,         // kernel pc out of code bounds
  E_KERNEL_EXC = 2,     // ProgramError raised in kernel mode (err_info=exc)
  E_PANIC = 3,          // PANIC opcode
  E_EXIT_GAS = 4,       // gas limit assert in EXIT_KERNEL
  E_KERNEL_EXC_TRAP = 5,  // exception() entered in kernel mode
  E_BIG_CTX = 6,        // packed address context exceeds 64 bits
  E_BIG_LEN = 7,        // byte-op length exceeds 2^32
};

// arith kinds (python strings; mapping mirrored in witness/native_vm.py)
enum {
  A_ADD = 0, A_MUL, A_SUB, A_DIV, A_MOD, A_ADDMOD, A_MULMOD, A_SUBMOD,
  A_ADDFP, A_MULFP, A_SUBFP, A_LT, A_GT, A_BYTE, A_SHL, A_SHR, A_RANGE,
};
enum { L_AND = 0, L_OR = 1, L_XOR = 2 };

struct ProgramError {
  int exc_code;
};

struct TraceMeta {
  uint64_t pc;
  uint64_t ctx;
  uint64_t gas;
  uint32_t stack_len;
  uint8_t op;
  uint8_t kernel;
  uint8_t kind;  // 0 native, 1 syscall, 2 exception
  uint8_t exc;
};

struct ArithRec {
  uint64_t step;
  uint8_t kind, opcode, has_result;
  U256 in0, in1, in2, result;
};
struct LogicRec {
  uint64_t step;
  uint8_t op;
  U256 in0, in1;
};
struct ByteRec {  // bp_log and sponge_log
  uint64_t step, ctx, seg, virt, off, len;
  uint8_t is_read;
};

struct Regs {
  uint64_t pc = 0, ctx = 0, stack_len = 0, gas = 0;
  bool kernel = true;
};

struct Zvm {
  ZvmMem* mem = nullptr;
  // kernel identity / config
  std::vector<uint8_t> code;
  uint64_t seg_stack, seg_code, seg_ctxmeta, seg_jdbits;
  uint64_t ctxm_gas_limit, ctxm_stack_size;
  uint64_t syscall_jt, exception_jt;
  int64_t halt_label = -1;
  std::unordered_set<uint64_t> halt_offsets;
  int64_t halt_context = -1;
  int64_t cycle_limit = -1;
  uint64_t max_cycles = 0;
  int64_t jd_label = -1, observe_addr = -1, observe_contract = -1;
  uint8_t analysis = 0, record = 1, final_done = 0;
  uint8_t sys_nread[256];
  int8_t sys_flag[256];  // -1 not a syscall; else grows flag
  uint8_t gas_tab[256];
  U256 bn_base;

  Regs r;
  uint64_t clock = 0;
  uint64_t iters = 0;  // run()-loop iterations against max_cycles
  uint64_t last_dst = 0;  // observe yield payload
  int last_err = 0, err_info = 0;
  uint64_t err_pc = 0;
  uint8_t pending_end = 0;  // resume must finish the yielded 0xEE step
  uint8_t pending_op = 0;

  std::vector<TraceMeta> trace;
  std::vector<U256> tops;  // 17 per trace entry
  std::vector<ArithRec> arith;
  std::vector<LogicRec> logic;
  std::vector<ByteRec> sponge, bp;
  std::vector<uint8_t> sponge_bytes, bp_bytes;
  std::vector<uint64_t> stale;
  std::vector<uint64_t> jd_collected;  // (ctx, dst) pairs

  // ---- stack ----
  void push(const U256& v) {
    mem->set(r.ctx, seg_stack, r.stack_len, v);
    r.stack_len++;
  }
  void push_checked(const U256& v) {
    if (!r.kernel && r.stack_len >= 1024) throw ProgramError{EXC_STACK_OVERFLOW};
    push(v);
  }
  U256 pop() {
    if (r.stack_len == 0) throw ProgramError{EXC_STACK_UNDERFLOW};
    r.stack_len--;
    return mem->get(r.ctx, seg_stack, r.stack_len);
  }
  void require(uint64_t n) {
    if (r.stack_len < n) throw ProgramError{EXC_STACK_UNDERFLOW};
  }
  U256 peek(uint64_t i) {
    require(i + 1);
    return mem->get(r.ctx, seg_stack, r.stack_len - 1 - i);
  }
  U256 top_or_zero() {
    if (r.stack_len == 0) return U256{{0, 0, 0, 0}};
    return mem->get(r.ctx, seg_stack, r.stack_len - 1);
  }

  // ---- recording ----
  uint64_t step_idx() const { return trace.size() - 1; }

  void rec_arith(uint8_t kind, const U256& a, const U256& b, const U256& c,
                 uint8_t opcode, const U256* result) {
    if (!record) return;
    ArithRec x;
    x.step = step_idx();
    x.kind = kind;
    x.opcode = opcode;
    x.has_result = result != nullptr;
    x.in0 = a;
    x.in1 = b;
    x.in2 = c;
    x.result = result ? *result : U256{{0, 0, 0, 0}};
    arith.push_back(x);
  }
  void rec_logic(uint8_t op, const U256& a, const U256& b) {
    if (!record) return;
    logic.push_back({step_idx(), op, a, b});
  }
  void rec_bp(uint8_t is_read, uint64_t ctx, uint64_t seg, uint64_t virt,
              const uint8_t* data, uint64_t len) {
    if (!record || len == 0) return;
    bp.push_back({step_idx(), ctx, seg, virt, bp_bytes.size(), len, is_read});
    bp_bytes.insert(bp_bytes.end(), data, data + len);
  }

  void record_entry(uint64_t pc, uint8_t op) {
    if (!record) return;
    if (trace.empty() && trace.capacity() < (1 << 16)) {
      // one recorded row = TraceMeta + 17 stack tops; reserve for the
      // segment budget up front so the tops vector never re-copies
      uint64_t n = cycle_limit > 0 ? (uint64_t)cycle_limit + 128
                                   : (1ULL << 16);
      if (n > (1ULL << 22)) n = 1ULL << 22;
      trace.reserve(n);
      tops.reserve(17 * n);
    }
    TraceMeta m;
    m.pc = pc;
    m.op = op;
    m.kernel = r.kernel;
    m.ctx = r.ctx;
    m.gas = r.gas;
    m.stack_len = (uint32_t)r.stack_len;
    m.kind = 0;
    m.exc = 0;
    trace.push_back(m);
    uint64_t n = r.stack_len < 17 ? r.stack_len : 17;
    U256 z{{0, 0, 0, 0}};
    tops.resize(tops.size() + 17, z);
    U256* t = &tops[tops.size() - 17];
    // one segment lookup for all 17 tops (not 17 hash probes); stack
    // cells below stack_len are written, so a miss reads as zero
    // exactly like mem->get (the Stack segment has no preinit)
    auto sit = mem->segs.find(mem_key(r.ctx, seg_stack, 0));
    if (sit != mem->segs.end()) {
      const SegArr& sa = sit->second;
      for (uint64_t i = 0; i < n; i++) {
        const U256* p = sa.find(r.stack_len - n + i);
        if (p) t[17 - n + i] = *p;
      }
    }
  }

  // ---- code / jumptables ----
  uint64_t jumptable_target(uint64_t base_label, uint64_t index) {
    uint64_t base = base_label + 3 * index;
    uint64_t v = 0;
    for (int i = 0; i < 3; i++)
      v = (v << 8) | (base + i < code.size() ? code[base + i] : 0);
    return v;
  }

  std::vector<uint8_t> read_bytes(uint64_t ctx, uint64_t seg, uint64_t virt,
                                  uint64_t n) {
    std::vector<uint8_t> out(n);
    for (uint64_t i = 0; i < n; i++)
      out[i] = (uint8_t)(mem->get(ctx, seg, virt + i).w[0] & 0xFF);
    return out;
  }

  // ---- traps ----
  void syscall(uint8_t op) {
    uint64_t n_read = sys_nread[op];
    bool grows = sys_flag[op] > 0;
    require(n_read);
    if (grows && !r.kernel && r.stack_len >= 1024)
      throw ProgramError{EXC_STACK_OVERFLOW};
    uint64_t new_pc = jumptable_target(syscall_jt, op);
    // pc already incremented: kexit pc = syscall pc + 1
    U256 kexit{{r.pc | ((uint64_t)r.kernel << 32), 0, 0, r.gas}};
    uint64_t jt = syscall_jt + 3 * op;
    uint8_t jtb[3] = {code[jt], code[jt + 1], code[jt + 2]};
    rec_bp(1, 0, seg_code, jt, jtb, 3);
    U256 npc = u256_from_u64(new_pc);
    rec_arith(A_RANGE, top_or_zero(), npc, U256{{0, 0, 0, 0}}, op, &kexit);
    r.pc = new_pc;
    r.kernel = true;
    r.gas = 0;
    push(kexit);
  }

  // returns false if the trap itself panics (kernel-mode exception)
  bool exception(int exc_code) {
    if (r.kernel && exc_code != EXC_STOP) {
      last_err = E_KERNEL_EXC_TRAP;
      err_info = exc_code;
      err_pc = r.pc;
      return false;
    }
    uint64_t new_pc = jumptable_target(exception_jt, exc_code);
    U256 exc_info{{r.pc | ((uint64_t)r.kernel << 32), 0, 0, r.gas}};
    uint64_t code_ctx = r.kernel ? 0 : r.ctx;
    uint8_t opc;
    if (code_ctx == 0 && r.kernel)
      opc = r.pc < code.size() ? code[r.pc] : 0;
    else
      opc = (uint8_t)(mem->get(code_ctx, seg_code, r.pc).w[0] & 0xFF);
    uint64_t jt = exception_jt + 3 * exc_code;
    uint8_t jtb[3] = {code[jt], code[jt + 1], code[jt + 2]};
    rec_bp(1, 0, seg_code, jt, jtb, 3);
    U256 npc = u256_from_u64(new_pc);
    rec_arith(A_RANGE, top_or_zero(), npc, U256{{0, 0, 0, 0}}, opc,
              &exc_info);
    r.pc = new_pc;
    r.kernel = true;
    r.gas = 0;
    push(exc_info);
    return true;
  }

  void check_jump_dest(const U256& dst, bool is_jumpi) {
    int exc = is_jumpi ? EXC_INVALID_JUMPI : EXC_INVALID_JUMP;
    if (!dst.fits_u64() || dst.w[0] >= (1ULL << 32)) throw ProgramError{exc};
    uint64_t d = dst.w[0];
    if (!r.kernel && d > 0x6000) throw ProgramError{exc};
    if (analysis && !r.kernel) {
      jd_collected.push_back(r.ctx);
      jd_collected.push_back(d);
      return;
    }
    if (!r.kernel) {
      U256 bit = mem->get(r.ctx, seg_jdbits, d);
      if (!(bit.fits_u64() && bit.w[0] == 1)) throw ProgramError{exc};
    }
  }

  // unpack a kernel address word; context must fit u64
  void unpack(const U256& addr, uint64_t* ctx, uint64_t* seg,
              uint64_t* virt) {
    if (addr.w[2] | addr.w[3]) throw ProgramError{-E_BIG_CTX};
    *ctx = addr.w[1];
    *seg = (addr.w[0] >> 32) & 0xFFFFFFFF;
    *virt = addr.w[0] & 0xFFFFFFFF;
  }

  // ---- the dispatch (interpreter.py execute(), same case order) ----
  // returns: 0 normal, 1 = yield PROVER_INPUT, 2 = observe-contract after
  // this step, 3 = panic (last_err set), 4 = exit-gas assert failure
  int execute(uint8_t op) {
    if (sys_flag[op] >= 0) {
      syscall(op);
      return 0;
    }
    if (op >= 0x5F && op <= 0x7F) {  // PUSH0..32
      unsigned n = op - 0x5F;
      require(0);
      uint64_t pc = r.pc;
      U256 v{{0, 0, 0, 0}};
      if (r.kernel) {  // code_context() == 0
        // big-endian immediate from kernel code
        for (unsigned i = 0; i < n; i++) {
          uint8_t b = pc + i < code.size() ? code[pc + i] : 0;
          v = u256_shl(v, 8);
          v.w[0] |= b;
        }
      } else {
        std::vector<uint8_t> data = read_bytes(r.ctx, seg_code, pc, n);
        for (unsigned i = 0; i < n; i++) {
          v = u256_shl(v, 8);
          v.w[0] |= data[i];
        }
        rec_bp(1, r.ctx, seg_code, pc, data.data(), n);
      }
      r.pc += n;
      push_checked(v);
      return 0;
    }
    if (op >= 0x80 && op <= 0x8F) {  // DUP1..16
      U256 v = peek(op - 0x80);
      push_checked(v);
      return 0;
    }
    if (op >= 0x90 && op <= 0x9F) {  // SWAP1..16
      unsigned d = op - 0x8F;
      require(d + 1);
      uint64_t i0 = r.stack_len - 1;
      U256 a = mem->get(r.ctx, seg_stack, i0);
      U256 b = mem->get(r.ctx, seg_stack, i0 - d);
      mem->set(r.ctx, seg_stack, i0, b);
      mem->set(r.ctx, seg_stack, i0 - d, a);
      return 0;
    }
    U256 a, b, c, v;
    switch (op) {
      case 0x01:  // ADD
        require(2);
        a = pop(); b = pop();
        rec_arith(A_ADD, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push(u256_add(a, b));
        return 0;
      case 0x02:  // MUL
        require(2);
        a = pop(); b = pop();
        rec_arith(A_MUL, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push(u256_mul(a, b));
        return 0;
      case 0x03:  // SUB
        require(2);
        a = pop(); b = pop();
        rec_arith(A_SUB, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push(u256_sub(a, b));
        return 0;
      case 0x04:  // DIV
        require(2);
        a = pop(); b = pop();
        rec_arith(A_DIV, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push(b.is_zero() ? U256{{0,0,0,0}} : u256_div(a, b));
        return 0;
      case 0x06:  // MOD
        require(2);
        a = pop(); b = pop();
        rec_arith(A_MOD, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push(b.is_zero() ? U256{{0,0,0,0}} : u256_mod(a, b));
        return 0;
      case 0x08:  // ADDMOD
        require(3);
        a = pop(); b = pop(); c = pop();
        rec_arith(A_ADDMOD, a, b, c, 0, nullptr);
        push(c.is_zero() ? U256{{0,0,0,0}} : u256_addmod(a, b, c));
        return 0;
      case 0x09:  // MULMOD
        require(3);
        a = pop(); b = pop(); c = pop();
        rec_arith(A_MULMOD, a, b, c, 0, nullptr);
        push(c.is_zero() ? U256{{0,0,0,0}} : u256_mulmod(a, b, c));
        return 0;
      case 0x0C:  // ADDFP254 (kernel)
        if (!r.kernel) break;
        a = pop(); b = pop();
        rec_arith(A_ADDFP, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push(u256_addmod(a, b, bn_base));
        return 0;
      case 0x0D:  // MULFP254
        if (!r.kernel) break;
        a = pop(); b = pop();
        rec_arith(A_MULFP, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push(u256_mulmod(a, b, bn_base));
        return 0;
      case 0x0E:  // SUBFP254
        if (!r.kernel) break;
        a = pop(); b = pop();
        rec_arith(A_SUBFP, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push(u256_submod(a, b, bn_base));
        return 0;
      case 0x0F:  // SUBMOD (kernel)
        if (!r.kernel) break;
        a = pop(); b = pop(); c = pop();
        rec_arith(A_SUBMOD, a, b, c, 0, nullptr);
        push(c.is_zero() ? U256{{0,0,0,0}} : u256_submod(a, b, c));
        return 0;
      case 0x10:  // LT
        require(2);
        a = pop(); b = pop();
        rec_arith(A_LT, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push(u256_from_u64(u256_cmp(a, b) < 0));
        return 0;
      case 0x11:  // GT
        require(2);
        a = pop(); b = pop();
        rec_arith(A_GT, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push(u256_from_u64(u256_cmp(a, b) > 0));
        return 0;
      case 0x14:  // EQ
        require(2);
        a = pop(); b = pop();
        push(u256_from_u64(a == b));
        return 0;
      case 0x15:  // ISZERO
        a = pop();
        push(u256_from_u64(a.is_zero()));
        return 0;
      case 0x16:  // AND
        require(2);
        a = pop(); b = pop();
        rec_logic(L_AND, a, b);
        push(U256{{a.w[0] & b.w[0], a.w[1] & b.w[1], a.w[2] & b.w[2],
                   a.w[3] & b.w[3]}});
        return 0;
      case 0x17:  // OR
        require(2);
        a = pop(); b = pop();
        rec_logic(L_OR, a, b);
        push(U256{{a.w[0] | b.w[0], a.w[1] | b.w[1], a.w[2] | b.w[2],
                   a.w[3] | b.w[3]}});
        return 0;
      case 0x18:  // XOR
        require(2);
        a = pop(); b = pop();
        rec_logic(L_XOR, a, b);
        push(U256{{a.w[0] ^ b.w[0], a.w[1] ^ b.w[1], a.w[2] ^ b.w[2],
                   a.w[3] ^ b.w[3]}});
        return 0;
      case 0x19:  // NOT
        a = pop();
        push(U256{{~a.w[0], ~a.w[1], ~a.w[2], ~a.w[3]}});
        return 0;
      case 0x1A:  // BYTE
        require(2);
        a = pop(); b = pop();  // i, x
        rec_arith(A_BYTE, a, b, U256{{0,0,0,0}}, 0, nullptr);
        if (!a.fits_u64() || a.w[0] >= 32)
          push(U256{{0, 0, 0, 0}});
        else
          push(u256_from_u64(
              u256_shr(b, 8 * (31 - (unsigned)a.w[0])).w[0] & 0xFF));
        return 0;
      case 0x1B:  // SHL
        require(2);
        a = pop(); b = pop();  // s, x
        rec_arith(A_SHL, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push((a.fits_u64() && a.w[0] < 256) ? u256_shl(b, (unsigned)a.w[0])
                                            : U256{{0, 0, 0, 0}});
        return 0;
      case 0x1C:  // SHR
        require(2);
        a = pop(); b = pop();
        rec_arith(A_SHR, a, b, U256{{0,0,0,0}}, 0, nullptr);
        push((a.fits_u64() && a.w[0] < 256) ? u256_shr(b, (unsigned)a.w[0])
                                            : U256{{0, 0, 0, 0}});
        return 0;
      case 0x21: {  // KECCAK_GENERAL (kernel)
        if (!r.kernel) break;
        require(2);
        a = pop(); b = pop();  // addr, length
        if (!b.fits_u64() || b.w[0] >= (1ULL << 32))
          throw ProgramError{-E_BIG_LEN};
        uint64_t ctx, seg, virt;
        unpack(a, &ctx, &seg, &virt);
        std::vector<uint8_t> data = read_bytes(ctx, seg, virt, b.w[0]);
        uint8_t digest[32];
        keccak256(data.data(), data.size(), digest);
        if (record) {
          sponge.push_back({step_idx(), ctx, seg, virt,
                            sponge_bytes.size(), data.size(), 1});
          sponge_bytes.insert(sponge_bytes.end(), data.begin(), data.end());
        }
        U256 d{{0, 0, 0, 0}};
        for (int i = 0; i < 32; i++) {  // big-endian digest
          d = u256_shl(d, 8);
          d.w[0] |= digest[i];
        }
        push(d);
        return 0;
      }
      case 0x50:  // POP
        pop();
        return 0;
      case 0x56: {  // JUMP
        U256 dst = pop();
        check_jump_dest(dst, false);
        r.pc = dst.w[0];
        last_dst = dst.w[0];
        if (r.stack_len > 0 &&
            (int64_t)dst.w[0] == observe_contract)
          return 2;
        return 0;
      }
      case 0x57: {  // JUMPI
        require(2);
        U256 dst = pop();
        U256 cond = pop();
        if (!cond.is_zero()) {
          check_jump_dest(dst, true);
          r.pc = dst.w[0];
          last_dst = dst.w[0];
          if (r.stack_len > 0 &&
              (int64_t)dst.w[0] == observe_contract)
            return 2;
        }
        return 0;
      }
      case 0x58:  // PC
        push_checked(u256_from_u64(r.pc - 1));
        return 0;
      case 0x5B:  // JUMPDEST
        return 0;
      case 0xA5:  // PANIC (kernel)
        if (!r.kernel) break;
        last_err = E_PANIC;
        err_pc = r.pc - 1;
        return 3;
      case 0xEE:  // PROVER_INPUT (kernel)
        if (!r.kernel) break;
        return 1;
      case 0xF6:  // GET_CONTEXT (kernel)
        if (!r.kernel) break;
        push(U256{{0, r.ctx, 0, 0}});
        return 0;
      case 0xF7: {  // SET_CONTEXT (kernel)
        if (!r.kernel) break;
        U256 cs = pop();
        if (cs.w[2] | cs.w[3]) throw ProgramError{-E_BIG_CTX};
        uint64_t new_ctx = cs.w[1];
        if (cs.w[0] & 1) stale.push_back(r.ctx);
        mem->set(r.ctx, seg_ctxmeta, ctxm_stack_size,
                 u256_from_u64(r.stack_len));
        U256 sp = mem->get(new_ctx, seg_ctxmeta, ctxm_stack_size);
        r.ctx = new_ctx;
        r.stack_len = sp.w[0];
        return 0;
      }
      case 0xF8: {  // MLOAD_32BYTES (kernel)
        if (!r.kernel) break;
        require(2);
        a = pop(); b = pop();  // addr, length
        if (!b.fits_u64() || b.w[0] > 32) throw ProgramError{-E_BIG_LEN};
        uint64_t ctx, seg, virt;
        unpack(a, &ctx, &seg, &virt);
        std::vector<uint8_t> data = read_bytes(ctx, seg, virt, b.w[0]);
        rec_bp(1, ctx, seg, virt, data.data(), data.size());
        U256 d{{0, 0, 0, 0}};
        for (uint8_t x : data) {
          d = u256_shl(d, 8);
          d.w[0] |= x;
        }
        push(d);
        return 0;
      }
      case 0xF9: {  // EXIT_KERNEL (kernel)
        if (!r.kernel) break;
        U256 kexit = pop();
        r.pc = kexit.w[0] & 0xFFFFFFFF;
        r.kernel = (kexit.w[0] >> 32) & 1;
        r.gas = kexit.w[3];
        if (r.gas >= (1ULL << 32)) {
          last_err = E_EXIT_GAS;
          err_pc = r.pc;
          return 4;
        }
        return 0;
      }
      case 0xFB: {  // MLOAD_GENERAL (kernel)
        if (!r.kernel) break;
        a = pop();
        uint64_t ctx, seg, virt;
        unpack(a, &ctx, &seg, &virt);
        push(mem->get(ctx, seg, virt));
        return 0;
      }
      case 0xFC: {  // MSTORE_GENERAL (kernel)
        if (!r.kernel) break;
        require(2);
        v = pop();
        a = pop();
        uint64_t ctx, seg, virt;
        unpack(a, &ctx, &seg, &virt);
        mem->set(ctx, seg, virt, v);
        return 0;
      }
      default:
        break;
    }
    if (op >= 0xC0 && op <= 0xDF && r.kernel) {  // MSTORE_32BYTES_1..32
      unsigned n = op - 0xC0 + 1;
      require(2);
      U256 addr = pop();
      U256 value = pop();
      uint64_t ctx, seg, virt;
      unpack(addr, &ctx, &seg, &virt);
      uint8_t bs[32];
      for (unsigned i = 0; i < n; i++) {  // big-endian low n bytes
        unsigned bit = 8 * (n - 1 - i);
        bs[i] = (uint8_t)(value.w[bit / 64] >> (bit % 64));
      }
      rec_bp(0, ctx, seg, virt, bs, n);
      for (unsigned i = 0; i < n; i++)
        mem->set(ctx, seg, virt + i, u256_from_u64(bs[i]));
      push(u256_add(addr, u256_from_u64(n)));
      return 0;
    }
    throw ProgramError{EXC_INVALID_OPCODE};
  }

  void charge_gas(uint8_t op) {
    uint8_t g = gas_tab[op];
    if (g) r.gas += g;
    if (!r.kernel) {
      U256 limit = mem->get(r.ctx, seg_ctxmeta, ctxm_gas_limit);
      // gas_used > limit (gas fits u64; limit may be wide)
      if (limit.fits_u64() ? r.gas > limit.w[0] : false)
        throw ProgramError{EXC_OUT_OF_GAS};
    }
  }

  int run() {
    if (pending_end) {  // finish a yielded PROVER_INPUT step
      pending_end = 0;
      // 0xEE carries no gas cost and is kernel-only: just close the step
      clock++;
      iters++;
    }
    for (;;) {
      if (iters >= max_cycles) return Y_MAX_CYCLES;
      bool at_halt = r.kernel && halt_label >= 0 &&
                     r.pc == (uint64_t)halt_label;
      bool at_limit = cycle_limit >= 0 && clock >= (uint64_t)cycle_limit;
      if (!final_done && (at_halt || at_limit)) return Y_FINAL;
      if (r.kernel && halt_offsets.count(r.pc) &&
          (halt_context < 0 || r.ctx == (uint64_t)halt_context))
        return Y_HALTED;
      // ---- one step ----
      uint64_t pc = r.pc;
      uint8_t op;
      if (r.kernel) {
        if (pc >= code.size()) {
          last_err = E_PC_OOB;
          err_pc = pc;
          return Y_ERROR;
        }
        op = code[pc];
      } else {
        op = (uint8_t)(mem->get(r.ctx, seg_code, pc).w[0] & 0xFF);
      }
      record_entry(pc, op);
      Regs saved = r;
      if (analysis && r.kernel && jd_label >= 0 &&
          pc == (uint64_t)jd_label)
        return Y_JD_ANALYSIS;
      r.pc = pc + 1;
      int rc = 0;
      try {
        rc = execute(op);
        if (rc == 1) return Y_PROVER_INPUT;  // python completes the step
        if (rc == 3 || rc == 4) return Y_ERROR;
        charge_gas(op);
        if (!trace.empty() && record && trace.back().kind == 0 &&
            sys_flag[op] >= 0)
          trace.back().kind = 1;  // syscall
      } catch (ProgramError& e) {
        if (e.exc_code < 0) {  // internal panic conditions
          last_err = -e.exc_code;
          err_pc = pc;
          return Y_ERROR;
        }
        if (saved.kernel) {
          last_err = E_KERNEL_EXC;
          err_info = e.exc_code;
          err_pc = pc;
          return Y_ERROR;
        }
        r = saved;  // roll back
        rc = 0;     // a rolled-back jump never observes
        if (record && !trace.empty()) {
          trace.back().kind = 2;
          trace.back().exc = (uint8_t)e.exc_code;
        }
        if (!exception(e.exc_code)) return Y_ERROR;
      }
      clock++;
      iters++;
      if (rc == 2) return Y_OBSERVE_CONTRACT;
    }
  }
};

}  // namespace

extern "C" {

// ---- memory handle ----
void* zvm_mem_new() {
  ZvmMem* m = new ZvmMem();
  m->segs.reserve(1 << 12);
  return m;
}
void zvm_mem_free(void* m) { delete (ZvmMem*)m; }
void* zvm_mem_clone(void* m) { return new ZvmMem(*(ZvmMem*)m); }

void zvm_mem_get(void* m, uint64_t ctx, uint64_t seg, uint64_t virt,
                 uint64_t out[4]) {
  U256 v = ((ZvmMem*)m)->get(ctx, seg, virt);
  std::memcpy(out, v.w, 32);
}

int zvm_mem_is_set(void* m, uint64_t ctx, uint64_t seg, uint64_t virt) {
  return ((ZvmMem*)m)->is_set(ctx, seg, virt) ? 1 : 0;
}

void zvm_mem_set(void* m, uint64_t ctx, uint64_t seg, uint64_t virt,
                 const uint64_t v[4]) {
  U256 x;
  std::memcpy(x.w, v, 32);
  ((ZvmMem*)m)->set(ctx, seg, virt, x);
}

// bulk u64 writes (kernel code / shift-table style preloads)
void zvm_mem_set_range(void* m, uint64_t ctx, uint64_t seg,
                       uint64_t virt0, const uint64_t* vals,
                       uint64_t n) {
  ZvmMem* mm = (ZvmMem*)m;
  for (uint64_t i = 0; i < n; i++)
    mm->set(ctx, seg, virt0 + i, u256_from_u64(vals[i]));
}

// bulk u256 writes from an (n, 4)-limb array
void zvm_mem_set_range4(void* m, uint64_t ctx, uint64_t seg,
                        uint64_t virt0, const uint64_t* limbs,
                        uint64_t n) {
  ZvmMem* mm = (ZvmMem*)m;
  for (uint64_t i = 0; i < n; i++) {
    U256 v;
    std::memcpy(v.w, limbs + 4 * i, 32);
    mm->set(ctx, seg, virt0 + i, v);
  }
}

// bulk byte reads (contract code / returndata exports): low byte of
// each word, through the same get() (preinit materialization included)
void zvm_mem_read_bytes(void* m, uint64_t ctx, uint64_t seg,
                        uint64_t virt0, uint64_t n, uint8_t* out) {
  ZvmMem* mm = (ZvmMem*)m;
  for (uint64_t i = 0; i < n; i++)
    out[i] = (uint8_t)mm->get(ctx, seg, virt0 + i).w[0];
}

// largest set virtual in (ctx, seg), or -1 if none
int64_t zvm_mem_max_virt(void* m, uint64_t ctx, uint64_t seg) {
  ZvmMem* mm = (ZvmMem*)m;
  auto it = mm->segs.find(mem_key(ctx, seg, 0));
  return (it == mm->segs.end() || it->second.count == 0)
             ? -1
             : (int64_t)it->second.maxv;
}

// drop every key of a context (stale-context pruning between segments)
void zvm_mem_delete_context(void* m, uint64_t ctx) {
  ZvmMem* mm = (ZvmMem*)m;
  for (auto it = mm->segs.begin(); it != mm->segs.end();) {
    if ((uint64_t)(it->first >> 64) == ctx)
      it = mm->segs.erase(it);
    else
      ++it;
  }
}

// (virt, value) items of one (ctx, seg), virt-ascending
uint64_t zvm_mem_seg_len(void* m, uint64_t ctx, uint64_t seg) {
  ZvmMem* mm = (ZvmMem*)m;
  auto it = mm->segs.find(mem_key(ctx, seg, 0));
  return it == mm->segs.end() ? 0 : it->second.count;
}

void zvm_mem_seg_dump(void* m, uint64_t ctx, uint64_t seg,
                      uint64_t* virts, uint64_t* vals4) {
  ZvmMem* mm = (ZvmMem*)m;
  auto it = mm->segs.find(mem_key(ctx, seg, 0));
  if (it == mm->segs.end()) return;
  std::vector<uint64_t> ks;
  ks.reserve(it->second.count);
  it->second.keys(ks);
  for (size_t i = 0; i < ks.size(); i++) {
    virts[i] = ks[i];
    std::memcpy(vals4 + 4 * i, it->second.find(ks[i])->w, 32);
  }
}

// preinit from (n, 4)-limb array
void zvm_mem_preinit(void* m, uint64_t seg, const uint64_t* vals,
                     uint64_t n) {
  std::vector<U256>& v = ((ZvmMem*)m)->preinit[(uint32_t)seg];
  v.resize(n);
  std::memcpy(v.data(), vals, n * 32);
}

uint64_t zvm_mem_preinit_len(void* m, uint64_t seg) {
  auto it = ((ZvmMem*)m)->preinit.find((uint32_t)seg);
  return it == ((ZvmMem*)m)->preinit.end() ? 0 : it->second.size();
}

int zvm_mem_has_preinit(void* m, uint64_t seg) {
  return ((ZvmMem*)m)->preinit.count((uint32_t)seg) ? 1 : 0;
}

void zvm_mem_preinit_get(void* m, uint64_t seg, uint64_t* out,
                         uint64_t n) {
  const std::vector<U256>& v = ((ZvmMem*)m)->preinit[(uint32_t)seg];
  std::memcpy(out, v.data(), (n < v.size() ? n : v.size()) * 32);
}

// sorted (ctx, seg, virt, value) dump of the live cells
uint64_t zvm_mem_len(void* m) { return ((ZvmMem*)m)->total_count(); }

void zvm_mem_dump(void* m, uint64_t* keys3, uint64_t* vals4) {
  ZvmMem* mm = (ZvmMem*)m;
  std::vector<u128> skeys;
  skeys.reserve(mm->segs.size());
  for (auto& kv : mm->segs) skeys.push_back(kv.first);
  std::sort(skeys.begin(), skeys.end());
  uint64_t i = 0;
  std::vector<uint64_t> ks;
  for (u128 sk : skeys) {
    const SegArr& sa = mm->segs[sk];
    ks.clear();
    ks.reserve(sa.count);
    sa.keys(ks);
    for (uint64_t virt : ks) {
      keys3[3 * i] = (uint64_t)(sk >> 64);
      keys3[3 * i + 1] = ((uint64_t)sk >> 32) & 0xFFFFFFFF;
      keys3[3 * i + 2] = virt;
      std::memcpy(vals4 + 4 * i, sa.find(virt)->w, 32);
      i++;
    }
  }
}

// ---- vm handle ----
void* zvm_new(void* mem, const uint8_t* code, uint64_t code_len,
              const uint64_t* seg_ids,   // stack, code, ctxmeta, jdbits
              const uint64_t* ctxm_ids,  // gas_limit, stack_size
              uint64_t syscall_jt, uint64_t exception_jt,
              const uint8_t* sys_nread, const int8_t* sys_flag,
              const uint8_t* gas_tab, const uint64_t bn_base[4],
              int64_t jd_label, int64_t observe_addr,
              int64_t observe_contract, uint64_t max_cycles) {
  Zvm* z = new Zvm();
  z->mem = (ZvmMem*)mem;
  z->code.assign(code, code + code_len);
  z->seg_stack = seg_ids[0];
  z->seg_code = seg_ids[1];
  z->seg_ctxmeta = seg_ids[2];
  z->seg_jdbits = seg_ids[3];
  z->ctxm_gas_limit = ctxm_ids[0];
  z->ctxm_stack_size = ctxm_ids[1];
  z->syscall_jt = syscall_jt;
  z->exception_jt = exception_jt;
  std::memcpy(z->sys_nread, sys_nread, 256);
  std::memcpy(z->sys_flag, sys_flag, 256);
  std::memcpy(z->gas_tab, gas_tab, 256);
  std::memcpy(z->bn_base.w, bn_base, 32);
  z->jd_label = jd_label;
  z->observe_addr = observe_addr;
  z->observe_contract = observe_contract;
  z->max_cycles = max_cycles;
  return z;
}

void zvm_free(void* h) { delete (Zvm*)h; }

void zvm_set_mem(void* h, void* mem) { ((Zvm*)h)->mem = (ZvmMem*)mem; }

void zvm_set_flags(void* h, uint8_t analysis, uint8_t record,
                   uint8_t final_done, int64_t halt_context,
                   int64_t cycle_limit) {
  Zvm* z = (Zvm*)h;
  z->analysis = analysis;
  z->record = record;
  z->final_done = final_done;
  z->halt_context = halt_context;
  z->cycle_limit = cycle_limit;
}

void zvm_set_halt(void* h, int64_t halt_label,
                  const uint64_t* halt_offsets, uint64_t n_halt) {
  Zvm* z = (Zvm*)h;
  z->halt_label = halt_label;
  z->halt_offsets.clear();
  for (uint64_t i = 0; i < n_halt; i++)
    z->halt_offsets.insert(halt_offsets[i]);
}

void zvm_set_regs(void* h, uint64_t pc, uint8_t kernel, uint64_t ctx,
                  uint64_t stack_len, uint64_t gas, uint64_t clock) {
  Zvm* z = (Zvm*)h;
  z->r.pc = pc;
  z->r.kernel = kernel;
  z->r.ctx = ctx;
  z->r.stack_len = stack_len;
  z->r.gas = gas;
  z->clock = clock;
}

void zvm_get_regs(void* h, uint64_t out[6]) {
  Zvm* z = (Zvm*)h;
  out[0] = z->r.pc;
  out[1] = z->r.kernel;
  out[2] = z->r.ctx;
  out[3] = z->r.stack_len;
  out[4] = z->r.gas;
  out[5] = z->clock;
}

void zvm_reset_iters(void* h) { ((Zvm*)h)->iters = 0; }

int zvm_run(void* h) { return ((Zvm*)h)->run(); }

void zvm_set_pending_end(void* h, uint8_t op) {
  ((Zvm*)h)->pending_end = 1;
  ((Zvm*)h)->pending_op = op;
}

void zvm_set_final_done(void* h) { ((Zvm*)h)->final_done = 1; }

uint64_t zvm_last_dst(void* h) { return ((Zvm*)h)->last_dst; }

void zvm_error_info(void* h, int64_t out[3]) {
  Zvm* z = (Zvm*)h;
  out[0] = z->last_err;
  out[1] = (int64_t)z->err_pc;
  out[2] = z->err_info;
}

// python-side recording during yields (PROVER_INPUT range checks, the
// final-exception trap replay)
void zvm_record_arith(void* h, uint8_t kind, const uint64_t in0[4],
                      const uint64_t in1[4], const uint64_t in2[4],
                      uint8_t opcode, const uint64_t result[4],
                      uint8_t has_result) {
  Zvm* z = (Zvm*)h;
  if (!z->record) return;
  U256 a, b, c, res;
  std::memcpy(a.w, in0, 32);
  std::memcpy(b.w, in1, 32);
  std::memcpy(c.w, in2, 32);
  std::memcpy(res.w, result, 32);
  z->rec_arith(kind, a, b, c, opcode, has_result ? &res : nullptr);
}

void zvm_record_bp(void* h, uint8_t is_read, uint64_t ctx, uint64_t seg,
                   uint64_t virt, const uint8_t* data, uint64_t len) {
  ((Zvm*)h)->rec_bp(is_read, ctx, seg, virt, data, len);
}

void zvm_record_entry(void* h, uint64_t pc, uint8_t op, uint8_t kind,
                      uint8_t exc) {
  Zvm* z = (Zvm*)h;
  if (!z->record) return;
  z->record_entry(pc, op);
  z->trace.back().kind = kind;
  z->trace.back().exc = exc;
}

uint64_t zvm_trace_len(void* h) { return ((Zvm*)h)->trace.size(); }

// meta: (n, 5) u64 = pc, op|kernel<<8|kind<<16|exc<<24, ctx, gas, stack_len
void zvm_export_trace(void* h, uint64_t* meta, uint64_t* tops) {
  Zvm* z = (Zvm*)h;
  for (size_t i = 0; i < z->trace.size(); i++) {
    const TraceMeta& m = z->trace[i];
    meta[5 * i] = m.pc;
    meta[5 * i + 1] = (uint64_t)m.op | ((uint64_t)m.kernel << 8) |
                      ((uint64_t)m.kind << 16) | ((uint64_t)m.exc << 24);
    meta[5 * i + 2] = m.ctx;
    meta[5 * i + 3] = m.gas;
    meta[5 * i + 4] = m.stack_len;
  }
  std::memcpy(tops, z->tops.data(), z->tops.size() * 32);
}

uint64_t zvm_arith_len(void* h) { return ((Zvm*)h)->arith.size(); }

// (n, 20) u64: step, kind, opcode, has_result, in0[4], in1[4], in2[4],
// result[4]
void zvm_export_arith(void* h, uint64_t* out) {
  for (const ArithRec& x : ((Zvm*)h)->arith) {
    out[0] = x.step;
    out[1] = x.kind;
    out[2] = x.opcode;
    out[3] = x.has_result;
    std::memcpy(out + 4, x.in0.w, 32);
    std::memcpy(out + 8, x.in1.w, 32);
    std::memcpy(out + 12, x.in2.w, 32);
    std::memcpy(out + 16, x.result.w, 32);
    out += 20;
  }
}

uint64_t zvm_logic_len(void* h) { return ((Zvm*)h)->logic.size(); }

void zvm_export_logic(void* h, uint64_t* out) {  // (n, 10)
  for (const LogicRec& x : ((Zvm*)h)->logic) {
    out[0] = x.step;
    out[1] = x.op;
    std::memcpy(out + 2, x.in0.w, 32);
    std::memcpy(out + 6, x.in1.w, 32);
    out += 10;
  }
}

static uint64_t byte_rec_export(const std::vector<ByteRec>& v,
                                const std::vector<uint8_t>& bytes,
                                uint64_t* out, uint8_t* data_out) {
  for (const ByteRec& x : v) {
    out[0] = x.step;
    out[1] = x.is_read;
    out[2] = x.ctx;
    out[3] = x.seg;
    out[4] = x.virt;
    out[5] = x.off;
    out[6] = x.len;
    out += 7;
  }
  if (data_out && !bytes.empty())
    std::memcpy(data_out, bytes.data(), bytes.size());
  return bytes.size();
}

uint64_t zvm_sponge_len(void* h) { return ((Zvm*)h)->sponge.size(); }
uint64_t zvm_sponge_bytes_len(void* h) {
  return ((Zvm*)h)->sponge_bytes.size();
}
void zvm_export_sponge(void* h, uint64_t* out, uint8_t* data) {
  byte_rec_export(((Zvm*)h)->sponge, ((Zvm*)h)->sponge_bytes, out, data);
}

uint64_t zvm_bp_len(void* h) { return ((Zvm*)h)->bp.size(); }
uint64_t zvm_bp_bytes_len(void* h) { return ((Zvm*)h)->bp_bytes.size(); }
void zvm_export_bp(void* h, uint64_t* out, uint8_t* data) {
  byte_rec_export(((Zvm*)h)->bp, ((Zvm*)h)->bp_bytes, out, data);
}

uint64_t zvm_stale_len(void* h) { return ((Zvm*)h)->stale.size(); }
void zvm_export_stale(void* h, uint64_t* out) {
  Zvm* z = (Zvm*)h;
  std::memcpy(out, z->stale.data(), z->stale.size() * 8);
}

uint64_t zvm_jd_len(void* h) { return ((Zvm*)h)->jd_collected.size(); }
void zvm_export_jd(void* h, uint64_t* out) {
  Zvm* z = (Zvm*)h;
  std::memcpy(out, z->jd_collected.data(), z->jd_collected.size() * 8);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CPU-table row builder (tables/cpu.py build_cpu_rows) driven directly by
// the zvm's recorded trace — skips materializing python trace entries and
// the per-row python witness filler entirely. Exact twin of the python
// builder; tests/test_zvm.py asserts bit-identical CPU traces.
// ---------------------------------------------------------------------------

extern "C" {

// idx layout (see witness/native_vm.py _cpu_idx):
// 0 CONTEXT, 1 CODE_CONTEXT, 2 PROGRAM_COUNTER, 3 STACK_LEN,
// 4 IS_KERNEL_MODE, 5 GAS, 6 OP_START, 7 N_OP_FLAGS, 8 OPCODE_BITS0,
// 9 GENERAL0, 10 CLOCK, 11 CH0, 12 CH1, 13 CH2, 14 PARTIAL,
// 15 NUM_COLUMNS, 16 STACK_SEGMENT, 17 SHIFT_TABLE_SEGMENT,
// 18 JUMPDEST_BITS_SEGMENT, 19 MAX_USER_STACK_SIZE
// flag ids follow tables/cpu_columns.OP_NAMES order; 16=syscall,
// 17=exception.
int64_t zvm_cpu_rows(void* h, uint64_t* m, uint64_t n_rows,
                     const int32_t* idx, const int8_t* flag_table,
                     const int8_t* beh_pops, const int8_t* beh_push,
                     const int8_t* beh_has, const int8_t* might_overflow,
                     uint64_t halt_pc, uint64_t final_gas,
                     uint64_t final_context, uint64_t final_stack_len,
                     uint64_t syscall_jt, uint64_t exception_jt,
                     const uint64_t* bn_limbs) {
  Zvm* z = (Zvm*)h;
  const uint64_t n_ops = z->trace.size();
  if (n_ops > n_rows) return -2;
  const int32_t CONTEXT = idx[0], CODE_CONTEXT = idx[1], PC = idx[2],
                STACK_LEN = idx[3], IS_KERNEL = idx[4], GAS = idx[5],
                OP_START = idx[6], OPCODE_BITS0 = idx[8],
                GENERAL0 = idx[9], CLOCK = idx[10];
  const int32_t CH[3] = {idx[11], idx[12], idx[13]};
  const int32_t PARTIAL = idx[14];
  const uint64_t STACK_SEG = (uint64_t)idx[16];
  const uint64_t SHIFT_SEG = (uint64_t)idx[17];
  const uint64_t JDB_SEG = (uint64_t)idx[18];
  const uint64_t MAX_STACK = (uint64_t)idx[19];
  // channel field offsets within a 13-col block:
  // used, is_read, addr_ctx, addr_seg, addr_virt, value[0..8)
  const int32_t F_USED = 0, F_ISREAD = 1, F_ACTX = 2, F_ASEG = 3,
                F_AVIRT = 4, F_VAL = 5;
  // stack/general aliases (cpu_columns.py GENERAL union)
  const int32_t JUMPS_SHOULD_JUMP = GENERAL0;
  const int32_t JUMPS_COND_SUM_PINV = GENERAL0 + 1;
  const int32_t SHIFT_HLS_INV = GENERAL0;
  const int32_t PUSH_IS_NOT_KERNEL = GENERAL0;
  const int32_t CTX_PRUNING_FLAG = GENERAL0;
  const int32_t LOGIC_DIFF_PINV = GENERAL0;  // 8 limbs
  const int32_t EXC_BITS = GENERAL0;         // 3 bits
  const int32_t STACK_INV = GENERAL0 + 4;
  const int32_t STACK_INV_AUX = GENERAL0 + 5;
  const int32_t STACK_INV_AUX_2 = GENERAL0 + 6;
  const int32_t STACK_BOUNDS_AUX = GENERAL0 + 7;

#define M(c, r) m[(uint64_t)(c)*n_rows + (r)]

  auto set_value = [&](int32_t ch, uint64_t r, const U256& v) {
    for (int j = 0; j < 4; j++) {
      M(ch + F_VAL + 2 * j, r) = v.w[j] & 0xffffffffULL;
      M(ch + F_VAL + 2 * j + 1, r) = v.w[j] >> 32;
    }
  };
  auto read_channel = [&](uint64_t r, int32_t ch, uint64_t virt,
                          const U256* value, uint64_t ctx) {
    if (r >= n_rows) return;
    M(ch + F_USED, r) = 1;
    M(ch + F_ISREAD, r) = 1;
    M(ch + F_ACTX, r) = ctx;
    M(ch + F_ASEG, r) = STACK_SEG;
    M(ch + F_AVIRT, r) = virt;
    if (value) set_value(ch, r, *value);
  };
  // stack[-k] of step r (top-17 snapshot; k in 1..17)
  auto stk = [&](uint64_t r, unsigned k) -> const U256& {
    return z->tops[r * 17 + 17 - k];
  };

  // base fills
  for (uint64_t r = 0; r < n_rows; r++) {
    M(CLOCK, r) = r + 1;
    M(IS_KERNEL, r) = 1;
    M(PC, r) = halt_pc;
  }
  for (uint64_t r = n_ops; r < n_rows; r++) {
    M(CONTEXT, r) = final_context;
    M(GAS, r) = final_gas;
    M(STACK_LEN, r) = final_stack_len;
  }

  for (uint64_t r = 0; r < n_ops; r++) {
    const TraceMeta& t = z->trace[r];
    uint8_t opcode = t.op;
    int flag;
    if (t.kind == 1)
      flag = 16;  // syscall
    else if (t.kind == 2)
      flag = 17;  // exception
    else
      flag = flag_table[(t.kernel ? 256 : 0) + opcode];
    if (flag < 0) return (int64_t)r + 1;  // no decode flag: python raises
    M(IS_KERNEL, r) = t.kernel;
    M(CONTEXT, r) = t.ctx;
    M(CODE_CONTEXT, r) = t.kernel ? 0 : t.ctx;
    M(PC, r) = t.pc;
    M(GAS, r) = t.gas;
    for (int b = 0; b < 8; b++)
      M(OPCODE_BITS0 + b, r) = (opcode >> b) & 1;
    M(OP_START + flag, r) = 1;
    if (flag == 9)  // push_prover_input
      M(PUSH_IS_NOT_KERNEL, r) = t.kernel ? 0 : 1;
    if (flag == 17)
      for (int b = 0; b < 3; b++)
        M(EXC_BITS + b, r) = (t.exc >> b) & 1;

    // ---- _fill_stack_witness ----
    const uint64_t L = t.stack_len;
    M(STACK_LEN, r) = L;
    if (L) set_value(CH[0], r, stk(r, 1));
    int8_t has = beh_has[flag];
    int pops = beh_pops[flag];
    bool pushes = beh_push[flag];
    const uint64_t ctx = t.ctx;
    if (flag == 8) {  // jumps
      unsigned jumpi = opcode & 1;
      const U256& dst = stk(r, 1);
      U256 cond_v = u256_from_u64(1);
      if (jumpi) {
        cond_v = stk(r, 2);
        read_channel(r, CH[1], L - 2, &cond_v, ctx);
      } else {
        M(CH[1] + F_VAL, r) = 1;  // pinned, unused
      }
      uint64_t should = cond_v.is_zero() ? 0 : 1;
      M(JUMPS_SHOULD_JUMP, r) = should;
      uint64_t cond_sum = 0;
      for (int j = 0; j < 4; j++)
        cond_sum += (cond_v.w[j] & 0xffffffffULL) + (cond_v.w[j] >> 32);
      cond_sum %= gl::P;
      M(JUMPS_COND_SUM_PINV, r) = gl::inv(cond_sum);
      M(CH[2] + F_VAL, r) = 1;
      M(CH[2] + F_ISREAD, r) = 1;
      M(CH[2] + F_ACTX, r) = ctx;
      M(CH[2] + F_ASEG, r) = JDB_SEG;
      M(CH[2] + F_AVIRT, r) = dst.w[0] & 0xffffffffULL;
      M(CH[2] + F_USED, r) = should * (t.kernel ? 0 : 1);
      uint64_t rem = L - 1 - jumpi;
      M(STACK_INV, r) = gl::inv(rem % gl::P);
      M(STACK_INV_AUX, r) = rem ? 1 : 0;
      if (rem) read_channel(r + 1, CH[0], rem - 1, nullptr, 0);
      continue;
    }
    if (flag == 10) {  // dup_swap
      unsigned nd = opcode & 0xF;
      if (((opcode >> 4) & 1) == 0) {  // DUP_{n+1}
        M(CH[1] + F_USED, r) = 1;
        M(CH[1] + F_ISREAD, r) = 0;
        M(CH[1] + F_ACTX, r) = ctx;
        M(CH[1] + F_ASEG, r) = STACK_SEG;
        M(CH[1] + F_AVIRT, r) = L - 1;
        set_value(CH[1], r, stk(r, 1));
        U256 v = stk(r, 1 + nd);
        read_channel(r, CH[2], L - 1 - nd, &v, ctx);
      } else {  // SWAP_{n+1}
        U256 v = stk(r, 2 + nd);
        read_channel(r, CH[1], L - 2 - nd, &v, ctx);
        M(CH[2] + F_USED, r) = 1;
        M(CH[2] + F_ISREAD, r) = 0;
        M(CH[2] + F_ACTX, r) = ctx;
        M(CH[2] + F_ASEG, r) = STACK_SEG;
        M(CH[2] + F_AVIRT, r) = L - 2 - nd;
        set_value(CH[2], r, stk(r, 1));
      }
      continue;
    }
    if (flag == 7) {  // jumpdest_keccak_general: behavior override
      has = 1;
      if ((opcode >> 1) & 1) {
        pops = 0;
        pushes = false;
      } else {
        pops = 2;
        pushes = true;
      }
    }
    if (flag == 14) {  // m_op_general
      unsigned mload = opcode & 1;
      // python-int semantics: (L - 2) % P — MLOAD_GENERAL can run with
      // only the address on the stack (L == 1, rem == -1 ≡ P - 1)
      uint64_t rem = L >= 2 ? (L - 2) % gl::P
                            : gl::P - ((2 - L) % gl::P);
      M(STACK_INV, r) = gl::inv(rem);
      M(STACK_INV_AUX, r) = rem ? 1 : 0;
      if (mload) {
        const U256& a = stk(r, 1);
        M(CH[1] + F_USED, r) = 1;
        M(CH[1] + F_ISREAD, r) = 1;
        M(CH[1] + F_ACTX, r) = a.w[1] & 0xffffffffULL;   // limb 2
        M(CH[1] + F_ASEG, r) = a.w[0] >> 32;             // limb 1
        M(CH[1] + F_AVIRT, r) = a.w[0] & 0xffffffffULL;  // limb 0
      } else {
        M(STACK_INV_AUX_2, r) = M(STACK_INV_AUX, r);
        U256 aw = stk(r, 2);
        read_channel(r, CH[1], L - 2, &aw, ctx);
        M(PARTIAL + F_USED, r) = 1;
        M(PARTIAL + F_ISREAD, r) = 0;
        M(PARTIAL + F_ACTX, r) = aw.w[1] & 0xffffffffULL;
        M(PARTIAL + F_ASEG, r) = aw.w[0] >> 32;
        M(PARTIAL + F_AVIRT, r) = aw.w[0] & 0xffffffffULL;
        if (L > 2) read_channel(r + 1, CH[0], L - 3, nullptr, 0);
      }
      continue;
    }
    if (flag == 6) {  // shift
      const U256& d = stk(r, 1);
      uint64_t hs = 0;
      hs += d.w[0] >> 32;
      for (int j = 1; j < 4; j++)
        hs += (d.w[j] & 0xffffffffULL) + (d.w[j] >> 32);
      hs %= gl::P;
      M(SHIFT_HLS_INV, r) = gl::inv(hs);
      M(CH[2] + F_ASEG, r) = SHIFT_SEG;
      M(CH[2] + F_AVIRT, r) = d.w[0] & 0xffffffffULL;
      if (hs == 0) {
        M(CH[2] + F_USED, r) = 1;
        M(CH[2] + F_ISREAD, r) = 1;
        if (d.fits_u64() && d.w[0] < 256) {
          U256 disp = u256_shl(u256_from_u64(1), (unsigned)d.w[0]);
          set_value(CH[2], r, disp);
        }
      }
      // falls through to the generic behavior
    }
    if (flag == 3) {  // eq_iszero
      unsigned iszero = opcode & 1;
      has = 1;
      pops = iszero ? 1 : 2;
      pushes = true;
      const U256& in0 = stk(r, 1);
      U256 in1 = iszero ? U256{{0, 0, 0, 0}} : stk(r, 2);
      uint64_t l0[8], l1[8];
      for (int j = 0; j < 4; j++) {
        l0[2 * j] = in0.w[j] & 0xffffffffULL;
        l0[2 * j + 1] = in0.w[j] >> 32;
        l1[2 * j] = in1.w[j] & 0xffffffffULL;
        l1[2 * j + 1] = in1.w[j] >> 32;
      }
      uint64_t n_neq = 0;
      for (int j = 0; j < 8; j++)
        if (l0[j] != l1[j]) n_neq++;
      uint64_t n_inv = gl::inv(n_neq);
      for (int j = 0; j < 8; j++) {
        uint64_t d = gl::sub(l0[j], l1[j]);
        M(LOGIC_DIFF_PINV + j, r) = d ? gl::mul(gl::inv(d), n_inv) : 0;
      }
    }
    if (flag == 5) {  // not_pop
      if (opcode & 1) {
        has = 1;
        pops = 1;
        pushes = true;
      } else {
        has = 0;
      }
      uint64_t rem = (L - 1) % gl::P;  // L >= 1 here
      M(STACK_INV, r) = (L != 1) ? gl::inv(rem) : 0;
      M(STACK_INV_AUX, r) = (L != 1) ? 1 : 0;
      if (!(opcode & 1)) {  // POP
        M(STACK_INV_AUX_2, r) = M(STACK_INV_AUX, r);
        if (L > 1) read_channel(r + 1, CH[0], L - 2, nullptr, 0);
      }
    }
    if (flag == 2) {  // fp254_op: ch2 carries BN_BASE for the CTL
      for (int j = 0; j < 8; j++)
        M(CH[2] + F_VAL + j, r) = bn_limbs[j];
    }
    if (!has) continue;
    for (int i = 1; i < pops; i++) {
      U256 v = stk(r, 1 + i);
      read_channel(r, CH[i], L - 1 - i, &v, ctx);
    }
    if (pops > 0 && !pushes) {
      uint64_t rem = (L - (uint64_t)pops) % gl::P;  // L >= pops
      M(STACK_INV, r) = (L != (uint64_t)pops) ? gl::inv(rem) : 0;
      M(STACK_INV_AUX, r) = (L != (uint64_t)pops) ? 1 : 0;
      if (L > (uint64_t)pops)
        read_channel(r + 1, CH[0], L - pops - 1, nullptr, 0);
    } else if (pops == 0 && pushes) {
      M(STACK_INV, r) = gl::inv(L % gl::P);
      M(STACK_INV_AUX, r) = L ? 1 : 0;
      if (L) {
        M(PARTIAL + F_USED, r) = 1;
        M(PARTIAL + F_ISREAD, r) = 0;
        M(PARTIAL + F_ACTX, r) = ctx;
        M(PARTIAL + F_ASEG, r) = STACK_SEG;
        M(PARTIAL + F_AVIRT, r) = L - 1;
      }
    }
  }

  // _fill_overflow_aux
  for (uint64_t r = 0; r + 1 < n_rows && r < n_ops; r++) {
    bool might = false;
    for (int f = 0; f < 18; f++)
      if (might_overflow[f] && M(OP_START + f, r)) might = true;
    if (might && M(IS_KERNEL, r + 1) == 0) {
      uint64_t diff = gl::sub(M(STACK_LEN, r + 1) % gl::P,
                              (MAX_STACK + 1) % gl::P);
      M(STACK_BOUNDS_AUX, r) = gl::inv(diff);
    }
  }

  // _fill_trap_channels
  for (uint64_t r = 0; r < n_ops; r++) {
    const TraceMeta& t = z->trace[r];
    if (t.kind != 1 && t.kind != 2) continue;
    uint64_t virt = t.kind == 1 ? syscall_jt + 3 * t.op
                                : exception_jt + 3 * t.exc;
    M(CH[1] + F_USED, r) = 0;
    M(CH[1] + F_ISREAD, r) = 1;
    M(CH[1] + F_ACTX, r) = 0;
    M(CH[1] + F_ASEG, r) = 0;
    M(CH[1] + F_AVIRT, r) = virt;
    if (r + 1 < n_ops)
      M(CH[1] + F_VAL, r) = z->trace[r + 1].pc;
    for (int j = 1; j < 8; j++) M(CH[1] + F_VAL + j, r) = 0;
  }

  // next-top reads live in the reader's own context
  for (uint64_t r = 0; r < n_rows; r++)
    if (M(CH[0] + F_USED, r)) M(CH[0] + F_ACTX, r) = M(CONTEXT, r);

  // second pass: MLOAD_GENERAL loaded value; context_op ch2 witness
  for (uint64_t r = 0; r + 1 < n_rows && r < n_ops; r++) {
    const TraceMeta& t = z->trace[r];
    if (t.op == 0xFB && t.kind == 0 && t.kernel) {
      for (int j = 0; j < 8; j++)
        M(CH[1] + F_VAL + j, r) = M(CH[0] + F_VAL + j, r + 1);
    } else if ((t.op == 0xF6 || t.op == 0xF7) && t.kind == 0 &&
               t.kernel) {
      unsigned is_set = t.op & 1;
      uint64_t nlen = M(STACK_LEN, r + 1);
      uint64_t q = nlen - (is_set ? 0 : 1);
      M(STACK_INV, r) = gl::inv(q % gl::P);
      M(STACK_INV_AUX, r) = q ? 1 : 0;
      if (is_set) {
        M(STACK_INV_AUX_2, r) = M(STACK_INV_AUX, r);
        M(CTX_PRUNING_FLAG, r) = stk(r, 1).w[0] & 1;
      }
      if (q) {
        M(CH[2] + F_USED, r) = 1;
        M(CH[2] + F_ISREAD, r) = is_set;
        M(CH[2] + F_ACTX, r) = M(CONTEXT, r + 1);
        M(CH[2] + F_ASEG, r) = STACK_SEG;
        M(CH[2] + F_AVIRT, r) = q - 1;
        if (is_set) {
          for (int j = 0; j < 8; j++)
            M(CH[2] + F_VAL + j, r) = M(CH[0] + F_VAL + j, r + 1);
        } else {
          set_value(CH[2], r, stk(r, 1));
        }
      }
    }
  }
#undef M
  return 0;
}

}  // extern "C"
