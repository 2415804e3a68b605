"""Kernel bytecode interpreter (witness-generation core).

Python twin of the reference's trace-free simulator (/root/reference/
evm_arithmetization/src/cpu/kernel/interpreter.rs) sharing the semantics of
witness/{operation,transition,memory}.rs: registers (pc, context,
is_kernel, stack_len, gas), a sparse (context, segment, virtual) memory,
the stack living in each context's Stack segment, privileged opcodes
(MLOAD/MSTORE_GENERAL, *_32BYTES, GET/SET_CONTEXT with stack-pointer
save/restore, KECCAK_GENERAL, EXIT_KERNEL, PROVER_INPUT), and halting at
0xDEADBEEF / halt_final. Used for kernel-routine unit tests (the
reference's largest suite, SURVEY.md §4.1) and, in later rounds, for
segmentation pre-runs and full trace recording.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..tables.segments import Segment
from ..native import keccak256
from .assembler import Kernel

U256_MASK = (1 << 256) - 1
SIGN_BIT = 1 << 255
DEFAULT_HALT_OFFSET = 0xDEADBEEF
CONTEXT_SCALING_FACTOR = 64

BN_BASE = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def _signed(x):
    return x - (1 << 256) if x & SIGN_BIT else x


class MemoryState:
    def __init__(self):
        self.data: dict = {}     # (context, segment) -> {virt: value}

    def get(self, ctx, seg, virt):
        return self.data.get((ctx, seg), {}).get(virt, 0)

    def set(self, ctx, seg, virt, value):
        self.data.setdefault((ctx, seg), {})[virt] = value & U256_MASK

    def read_bytes(self, ctx, seg, virt, n):
        return bytes(self.get(ctx, seg, virt + i) & 0xFF for i in range(n))


def _unpack_addr(addr):
    """(context, segment, virtual) from a packed kernel address word."""
    return addr >> 64, (addr >> 32) & 0xFFFFFFFF, addr & 0xFFFFFFFF


@dataclass
class Registers:
    program_counter: int = 0
    is_kernel: bool = True
    context: int = 0
    stack_len: int = 0
    gas_used: int = 0


class KernelPanic(Exception):
    pass


class Interpreter:
    def __init__(self, kernel: Kernel, initial_offset=0,
                 initial_stack=(), prover_inputs=None,
                 halt_offsets=None, max_cycles=10_000_000):
        self.kernel = kernel
        self.memory = MemoryState()
        self.registers = Registers(program_counter=initial_offset)
        self.clock = 0
        # (pc, opcode, is_kernel, context, stack-before) per step
        self.trace = []
        self.max_cycles = max_cycles
        self.prover_input_values = list(prover_inputs or [])
        self.halt_offsets = set(halt_offsets if halt_offsets is not None
                                else [DEFAULT_HALT_OFFSET])
        for lbl in ("halt_final", "halt"):
            if lbl in kernel.global_labels:
                self.halt_offsets.add(kernel.global_labels[lbl])
        # preload kernel code into context 0's Code segment
        for i, b in enumerate(kernel.code):
            if b:
                self.memory.set(0, Segment.Code, i, b)
        self.code = kernel.code
        # initial stack: list given bottom-first (reference convention)
        for v in initial_stack:
            self.push(v)

    # -- stack ----------------------------------------------------------
    def push(self, v):
        r = self.registers
        self.memory.set(r.context, Segment.Stack, r.stack_len, v)
        r.stack_len += 1

    def pop(self):
        r = self.registers
        assert r.stack_len > 0, "stack underflow"
        r.stack_len -= 1
        return self.memory.get(r.context, Segment.Stack, r.stack_len)

    def stack(self):
        """Bottom-first list of current stack values."""
        r = self.registers
        return [self.memory.get(r.context, Segment.Stack, i)
                for i in range(r.stack_len)]

    def peek(self, i=0):
        r = self.registers
        return self.memory.get(r.context, Segment.Stack,
                               r.stack_len - 1 - i)

    # -- run loop --------------------------------------------------------
    def run(self):
        r = self.registers
        for _ in range(self.max_cycles):
            if r.program_counter in self.halt_offsets:
                return self
            self.step()
            self.clock += 1
        raise RuntimeError("interpreter exceeded max_cycles")

    def step(self):
        r = self.registers
        pc = r.program_counter
        assert pc < len(self.code), f"pc {pc} out of code bounds"
        op = self.code[pc]
        self.trace.append((pc, op, r.is_kernel, r.context,
                           tuple(self.stack())))
        r.program_counter += 1
        self.execute(op)

    # -- opcode semantics -------------------------------------------------
    def execute(self, op):
        r = self.registers
        push = self.push
        pop = self.pop

        if 0x5F <= op <= 0x7F:                      # PUSH0..PUSH32
            n = op - 0x5F
            pc = r.program_counter
            v = int.from_bytes(self.code[pc:pc + n], "big")
            r.program_counter += n
            push(v)
        elif 0x80 <= op <= 0x8F:                    # DUP1..16
            push(self.peek(op - 0x80))
        elif 0x90 <= op <= 0x9F:                    # SWAP1..16
            d = op - 0x8F
            i0 = r.stack_len - 1
            a = self.memory.get(r.context, Segment.Stack, i0)
            b = self.memory.get(r.context, Segment.Stack, i0 - d)
            self.memory.set(r.context, Segment.Stack, i0, b)
            self.memory.set(r.context, Segment.Stack, i0 - d, a)
        elif op == 0x00:                            # STOP
            raise KernelPanic("STOP in kernel mode")
        elif op == 0x01:
            push((pop() + pop()) & U256_MASK)
        elif op == 0x02:
            push((pop() * pop()) & U256_MASK)
        elif op == 0x03:
            a, b = pop(), pop()
            push((a - b) & U256_MASK)
        elif op == 0x04:
            a, b = pop(), pop()
            push(0 if b == 0 else a // b)
        elif op == 0x05:                            # SDIV
            a, b = _signed(pop()), _signed(pop())
            if b == 0:
                push(0)
            else:
                q = abs(a) // abs(b)
                if (a < 0) != (b < 0):
                    q = -q
                push(q & U256_MASK)
        elif op == 0x06:
            a, b = pop(), pop()
            push(0 if b == 0 else a % b)
        elif op == 0x07:                            # SMOD
            a, b = _signed(pop()), _signed(pop())
            if b == 0:
                push(0)
            else:
                m = abs(a) % abs(b)
                push((-m if a < 0 else m) & U256_MASK)
        elif op == 0x08:
            a, b, n = pop(), pop(), pop()
            push(0 if n == 0 else (a + b) % n)
        elif op == 0x09:
            a, b, n = pop(), pop(), pop()
            push(0 if n == 0 else (a * b) % n)
        elif op == 0x0B:                            # SIGNEXTEND
            b, x = pop(), pop()
            if b >= 31:
                push(x)
            else:
                bit = 8 * b + 7
                if (x >> bit) & 1:
                    push((x | (U256_MASK << bit)) & U256_MASK)
                else:
                    push(x & ((1 << (bit + 1)) - 1))
        elif op == 0x0C:
            a, b = pop(), pop()
            push((a + b) % BN_BASE)
        elif op == 0x0D:
            a, b = pop(), pop()
            push((a * b) % BN_BASE)
        elif op == 0x0E:
            a, b = pop(), pop()
            push((a - b) % BN_BASE)
        elif op == 0x0F:                            # SUBMOD
            a, b, n = pop(), pop(), pop()
            push(0 if n == 0 else (a - b) % n)
        elif op == 0x10:
            push(int(pop() < pop()))
        elif op == 0x11:
            push(int(pop() > pop()))
        elif op == 0x12:                            # SLT
            push(int(_signed(pop()) < _signed(pop())))
        elif op == 0x13:                            # SGT
            push(int(_signed(pop()) > _signed(pop())))
        elif op == 0x14:
            push(int(pop() == pop()))
        elif op == 0x15:
            push(int(pop() == 0))
        elif op == 0x16:
            push(pop() & pop())
        elif op == 0x17:
            push(pop() | pop())
        elif op == 0x18:
            push(pop() ^ pop())
        elif op == 0x19:
            push(pop() ^ U256_MASK)
        elif op == 0x1A:                            # BYTE
            i, x = pop(), pop()
            push(0 if i >= 32 else (x >> (8 * (31 - i))) & 0xFF)
        elif op == 0x1B:                            # SHL
            s, x = pop(), pop()
            push((x << s) & U256_MASK if s < 256 else 0)
        elif op == 0x1C:                            # SHR
            s, x = pop(), pop()
            push(x >> s if s < 256 else 0)
        elif op == 0x1D:                            # SAR
            s, xs = pop(), _signed(pop())
            if s >= 256:
                push(U256_MASK if xs < 0 else 0)
            else:
                push((xs >> s) & U256_MASK)
        elif op == 0x21:                            # KECCAK_GENERAL
            addr, length = pop(), pop()
            ctx, seg, virt = addr >> 64, (addr >> 32) & 0xFFFFFFFF, \
                addr & 0xFFFFFFFF
            data = self.memory.read_bytes(ctx, seg, virt, length)
            push(int.from_bytes(keccak256(data), "big"))
        elif op == 0x50:
            pop()
        elif op == 0x56:                            # JUMP
            r.program_counter = pop()
        elif op == 0x57:                            # JUMPI
            dst, cond = pop(), pop()
            if cond:
                r.program_counter = dst
        elif op == 0x58:                            # PC (GETPC)
            push(r.program_counter - 1)
        elif op == 0x5A:                            # GAS
            push(0 if r.is_kernel else r.gas_used)
        elif op == 0x5B:                            # JUMPDEST
            pass
        elif op == 0xA5:                            # PANIC
            raise KernelPanic(f"kernel PANIC at pc {r.program_counter - 1}")
        elif 0xC0 <= op <= 0xDF:                    # MSTORE_32BYTES_1..32
            n = op - 0xC0 + 1
            addr, value = pop(), pop()
            ctx, seg, virt = addr >> 64, (addr >> 32) & 0xFFFFFFFF, \
                addr & 0xFFFFFFFF
            bs = (value & ((1 << (8 * n)) - 1)).to_bytes(n, "big")
            for i, b in enumerate(bs):
                self.memory.set(ctx, seg, virt + i, b)
            push(addr + n)
        elif op == 0xEE:                            # PROVER_INPUT
            path = self.kernel.prover_inputs.get(r.program_counter - 1)
            push(self.prover_input(path))
        elif op == 0xF6:                            # GET_CONTEXT
            push(r.context << CONTEXT_SCALING_FACTOR)
        elif op == 0xF7:                            # SET_CONTEXT
            ctx_scaled = pop()
            new_ctx = ctx_scaled >> CONTEXT_SCALING_FACTOR
            stack_size_field = self._ctx_meta_stack_size()
            self.memory.set(r.context, Segment.ContextMetadata,
                            stack_size_field, r.stack_len)
            new_sp = self.memory.get(new_ctx, Segment.ContextMetadata,
                                     stack_size_field)
            r.context = new_ctx
            r.stack_len = new_sp
        elif op == 0xF8:                            # MLOAD_32BYTES
            addr, length = pop(), pop()
            ctx, seg, virt = addr >> 64, (addr >> 32) & 0xFFFFFFFF, \
                addr & 0xFFFFFFFF
            data = self.memory.read_bytes(ctx, seg, virt, length)
            push(int.from_bytes(data, "big"))
        elif op == 0xF9:                            # EXIT_KERNEL
            kexit_info = pop()
            r.program_counter = kexit_info & 0xFFFFFFFF
            r.is_kernel = bool((kexit_info >> 32) & 1)
            r.gas_used = (kexit_info >> 192) & 0xFFFFFFFF
        elif op == 0xFB:                            # MLOAD_GENERAL
            addr = pop()
            ctx, seg, virt = addr >> 64, (addr >> 32) & 0xFFFFFFFF, \
                addr & 0xFFFFFFFF
            push(self.memory.get(ctx, seg, virt))
        elif op == 0xFC:                            # MSTORE_GENERAL
            value, addr = pop(), pop()
            ctx, seg, virt = addr >> 64, (addr >> 32) & 0xFFFFFFFF, \
                addr & 0xFFFFFFFF
            self.memory.set(ctx, seg, virt, value)
        elif op == 0xFE:
            raise KernelPanic("INVALID opcode")
        else:
            raise NotImplementedError(
                f"opcode {op:#x} at pc {r.program_counter - 1} "
                f"({self.kernel.offset_label(r.program_counter - 1)})")

    @staticmethod
    def _ctx_meta_stack_size():
        # ContextMetadata::StackSize unscaled index (context_metadata.rs);
        # resolved from the extracted constants.
        from .assembler import load_tables
        consts, _, _ = load_tables()
        return consts["CTX_METADATA_STACK_SIZE"] & 0xFFFFFFFF

    def prover_input(self, path):
        """Nondeterministic oracle dispatch (generation/prover_input.rs).
        Only the pure-arithmetic oracles are implemented so far."""
        if path is None:
            raise NotImplementedError("unknown PROVER_INPUT site")
        if self.prover_input_values:
            return self.prover_input_values.pop(0)
        if path[0] == "ff":
            return self._ff(path[1], path[2])
        if path[0] == "num_bits":
            return max(self.peek(0).bit_length(), 1)
        raise NotImplementedError(f"PROVER_INPUT({'::'.join(path)})")

    def _ff(self, fld, op):
        if fld == "bn254_base":
            p = BN_BASE
        elif fld == "secp256k1_base":
            p = (1 << 256) - (1 << 32) - 977
        elif fld == "secp256k1_scalar":
            p = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
        else:
            raise NotImplementedError(f"ff field {fld}")
        if op == "inverse":
            x = self.peek(0)
            return pow(x, p - 2, p)
        if op == "sqrt":
            x = self.peek(0)
            return pow(x, (p + 1) // 4, p)
        raise NotImplementedError(f"ff op {op}")


def run_kernel(kernel: Kernel, label: str, initial_stack, **kw):
    """Run a kernel routine: initial_stack is bottom-first, typically
    [0xDEADBEEF(retdest), ...args]. Returns the interpreter."""
    interp = Interpreter(kernel, kernel.global_labels[label],
                         initial_stack, **kw)
    return interp.run()
