"""Test fixtures: beacon-roots (EIP-4788) preinitialized state.

Twin of /root/reference/evm_arithmetization/src/testing_utils.rs:87-151
and cpu/kernel/constants/mod.rs:436-466 (cancun constants).
"""

from __future__ import annotations

from ..mpt.trie import Trie, Nibbles
from ..mpt.rlp import rlp_encode
from ..mpt.world import Account
from ..native import keccak256

HISTORY_BUFFER_LENGTH = 8191

BEACON_ROOTS_CONTRACT_ADDRESS = bytes.fromhex(
    "000F3df6D732807Ef1319fB7B8bB8522d0Beac02".lower())
BEACON_ROOTS_CONTRACT_ADDRESS_HASHED = bytes.fromhex(
    "37d65eaa92c6bc4c13a5ec45527f0c18ea8932588728769ec7aecfe6d9f32e42")
BEACON_ROOTS_CONTRACT_CODE = bytes.fromhex(
    "3373fffffffffffffffffffffffffffffffffffffffe14604d57602036146024"
    "575f5ffd5b5f35801560495762001fff810690815414603c575f5ffd5b62001f"
    "ff01545f5260205ff35b5f5ffd5b62001fff42064281555f359062001fff0155"
    "00")
BEACON_ROOTS_CONTRACT_CODE_HASH = bytes.fromhex(
    "f57acd40259872606d76197ef052f3d35588dadf919ee1f0e3cb9b62d3f4b02c")

BEACON_ROOTS_ACCOUNT = Account(
    nonce=0, balance=0,
    storage_root=bytes.fromhex(
        "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421"),
    code_hash=BEACON_ROOTS_CONTRACT_CODE_HASH)


def insert_storage(trie: Trie, slot: int, value: int) -> None:
    """testing_utils.rs:87-99."""
    key = keccak256(slot.to_bytes(32, "big"))
    nibs = Nibbles.from_bytes(key)
    if value == 0:
        trie.delete(nibs)
    else:
        trie.insert(nibs, rlp_encode(value))


def update_beacon_roots_account_storage(storage: Trie, timestamp: int,
                                        parent_root: bytes) -> None:
    """testing_utils.rs:113-123."""
    timestamp_idx = timestamp % HISTORY_BUFFER_LENGTH
    root_idx = timestamp_idx + HISTORY_BUFFER_LENGTH
    insert_storage(storage, timestamp_idx, timestamp)
    insert_storage(storage, root_idx, int.from_bytes(parent_root, "big"))


def beacon_roots_contract_from_storage(storage: Trie) -> Account:
    return Account(nonce=0, balance=0,
                   storage_root=storage.root_hash(),
                   code_hash=BEACON_ROOTS_CONTRACT_CODE_HASH)


def beacon_roots_account_nibbles() -> Nibbles:
    return Nibbles.from_bytes(BEACON_ROOTS_CONTRACT_ADDRESS_HASHED)


def preinitialized_state_and_storage_tries():
    """testing_utils.rs:135-146: (state trie, {hashed_addr: storage})."""
    state = Trie()
    state.insert(beacon_roots_account_nibbles(),
                 BEACON_ROOTS_ACCOUNT.rlp())
    return state, {BEACON_ROOTS_CONTRACT_ADDRESS_HASHED: Trie()}
