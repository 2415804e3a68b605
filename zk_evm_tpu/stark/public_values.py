"""Public values: the statement a block-segment proof commits to.

Twin of the reference's PublicValues (/root/reference/
evm_arithmetization/src/proof.rs:70-91) with the exact Fiat-Shamir
observation encoding of get_challenges.rs:202-227 (SURVEY.md Appendix A):
trie roots before/after as 8 u32 limbs each, block metadata (beneficiary
as 5 u256 limbs, u32 scalars, u64s as two elements, 8x8 bloom limbs),
256+1 block hashes, and the extra block data. registers_before/after and
the MemBefore/MemAfter caps are NOT observed here — they bind at the
aggregation layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def h256_limbs(h) -> list[int]:
    """32-byte hash (bytes or int) -> 8 u32 limbs, low limb first."""
    v = int.from_bytes(h, "big") if isinstance(h, (bytes, bytearray)) \
        else int(h)
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(8)]


def u256_limbs(v: int) -> list[int]:
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(8)]


def _u64_pair(v: int) -> list[int]:
    assert v < (1 << 64)
    return [v & 0xFFFFFFFF, v >> 32]


def _u32(v: int) -> int:
    assert v < (1 << 32), "scalar exceeds u32 in public values"
    return v


@dataclass
class TrieRoots:
    state_root: bytes = b"\x00" * 32
    transactions_root: bytes = b"\x00" * 32
    receipts_root: bytes = b"\x00" * 32

    def to_elements(self):
        return h256_limbs(self.state_root) \
            + h256_limbs(self.transactions_root) \
            + h256_limbs(self.receipts_root)


@dataclass
class BlockMetadata:
    block_beneficiary: int = 0          # 160-bit address
    block_timestamp: int = 0
    block_number: int = 0
    block_difficulty: int = 0
    block_random: bytes = b"\x00" * 32
    block_gaslimit: int = 0
    block_chain_id: int = 1
    block_base_fee: int = 0
    block_gas_used: int = 0
    block_blob_gas_used: int = 0
    block_excess_blob_gas: int = 0
    parent_beacon_block_root: bytes = b"\x00" * 32
    block_bloom: tuple = (0,) * 8       # 8 x u256

    def to_elements(self):
        out = u256_limbs(self.block_beneficiary)[:5]
        out += [_u32(self.block_timestamp), _u32(self.block_number),
                _u32(self.block_difficulty)]
        out += h256_limbs(self.block_random)
        out += [_u32(self.block_gaslimit), _u32(self.block_chain_id)]
        out += _u64_pair(self.block_base_fee)
        out += [_u32(self.block_gas_used)]
        # eth_mainnet: blob fields + parent beacon root
        out += _u64_pair(self.block_blob_gas_used)
        out += _u64_pair(self.block_excess_blob_gas)
        out += h256_limbs(self.parent_beacon_block_root)
        for word in self.block_bloom:
            out += u256_limbs(word)
        return out


@dataclass
class BlockHashes:
    prev_hashes: tuple = (b"\x00" * 32,) * 256
    cur_hash: bytes = b"\x00" * 32

    def to_elements(self):
        out = []
        for h in self.prev_hashes:
            out += h256_limbs(h)
        out += h256_limbs(self.cur_hash)
        return out


@dataclass
class ExtraBlockData:
    checkpoint_state_trie_root: bytes = b"\x00" * 32
    checkpoint_consolidated_hash: tuple = (0, 0, 0, 0)  # 4 field elements
    txn_number_before: int = 0
    txn_number_after: int = 0
    gas_used_before: int = 0
    gas_used_after: int = 0

    def to_elements(self):
        out = h256_limbs(self.checkpoint_state_trie_root)
        out += list(self.checkpoint_consolidated_hash)
        out += [_u32(self.txn_number_before), _u32(self.txn_number_after),
                _u32(self.gas_used_before), _u32(self.gas_used_after)]
        return out


@dataclass
class RegistersData:
    """Registers at a segment boundary (bound at the aggregation layer,
    not in the segment transcript)."""
    program_counter: int = 0
    is_kernel: int = 1
    stack_len: int = 0
    stack_top: int = 0
    context: int = 0
    gas_used: int = 0

    def to_elements(self):
        return [self.program_counter, self.is_kernel, self.stack_len] \
            + u256_limbs(self.stack_top) + [self.context, self.gas_used]


@dataclass
class PublicValues:
    trie_roots_before: TrieRoots = field(default_factory=TrieRoots)
    trie_roots_after: TrieRoots = field(default_factory=TrieRoots)
    block_metadata: BlockMetadata = field(default_factory=BlockMetadata)
    block_hashes: BlockHashes = field(default_factory=BlockHashes)
    extra_block_data: ExtraBlockData = field(default_factory=ExtraBlockData)
    registers_before: RegistersData = field(default_factory=RegistersData)
    registers_after: RegistersData = field(default_factory=RegistersData)

    def to_elements(self):
        """Transcript encoding (Appendix A order); registers and memory
        caps excluded by design."""
        return self.trie_roots_before.to_elements() \
            + self.trie_roots_after.to_elements() \
            + self.block_metadata.to_elements() \
            + self.block_hashes.to_elements() \
            + self.extra_block_data.to_elements()

    def observe(self, challenger):
        challenger.observe_elements(self.to_elements())
