"""L2 recursion: the verifier-AIR proof system (stark/DESIGN.md roadmap
step 2) — a straight-line verification VM (vm.py) with a RAM argument
(ram.py) and Poseidon-table hashing, whose program is bound by
verifier-recomputed known-column openings (known.py)."""

from .vm import Tape, RvmStark, Cell
from .ram import RvmMemStark
from .system import prove_system, verify_system, system_ctls
from .verify_tape import verify_stark_tape, verify_all_tape
from .aggregate import wrap_segment_chain

__all__ = ["Tape", "RvmStark", "Cell", "RvmMemStark",
           "prove_system", "verify_system", "system_ctls",
           "verify_stark_tape", "verify_all_tape", "wrap_segment_chain"]
