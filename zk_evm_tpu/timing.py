"""Hierarchical phase timers — the reference's plonky2 TimingTree
(used at evm_arithmetization/src/prover.rs:48-161: every prove phase is
wrapped in `timed!(timing, "...")` and the tree is printed per proof).

Usage:
    tree = TimingTree()
    with tree.scope("prove cpu"):
        with tree.scope("commit trace"):
            ...
    tree.print()          # indented tree with durations

`timed(name)` is the ambient form: modules time their phases without
threading a tree through every call; scopes are no-ops unless a tree is
active (activated by `TimingTree.activate()` or used as a context
manager)."""

from __future__ import annotations

import contextlib
import contextvars
import sys
import time
from dataclasses import dataclass, field


@dataclass
class _Node:
    name: str
    start: float
    elapsed: float = 0.0
    children: list = field(default_factory=list)


class TimingTree:
    def __init__(self, name: str = "root"):
        self.root = _Node(name, time.perf_counter())
        self._stack = [self.root]
        self._token = None

    @contextlib.contextmanager
    def scope(self, name: str):
        node = _Node(name, time.perf_counter())
        self._stack[-1].children.append(node)
        self._stack.append(node)
        try:
            yield node
        finally:
            node.elapsed = time.perf_counter() - node.start
            self._stack.pop()

    # -- ambient activation ------------------------------------------------
    def __enter__(self):
        self._token = _ACTIVE.set(self)
        return self

    def __exit__(self, *exc):
        self.root.elapsed = time.perf_counter() - self.root.start
        _ACTIVE.reset(self._token)
        return False

    def print(self, out=None, min_fraction: float = 0.0):
        out = out or sys.stderr
        if not self.root.elapsed:
            self.root.elapsed = time.perf_counter() - self.root.start
        total = self.root.elapsed

        def walk(node, depth):
            if node.elapsed < min_fraction * total:
                return
            print(f"{'  ' * depth}{node.elapsed:8.3f}s  {node.name}",
                  file=out)
            for c in node.children:
                walk(c, depth + 1)

        walk(self.root, 0)


_ACTIVE: contextvars.ContextVar[TimingTree | None] = \
    contextvars.ContextVar("zk_evm_tpu_timing", default=None)


@contextlib.contextmanager
def timed(name: str):
    """Time a phase under the ambient TimingTree, if one is active, and
    feed the process-wide metrics registry either way (metrics.py).
    Phases also log incrementally at info level so long proving runs
    are observable while in flight (the reference logs every timed!
    scope through env_logger as it closes)."""
    import logging
    from . import metrics
    log = logging.getLogger("zk_evm_tpu")
    tree = _ACTIVE.get()
    t0 = time.perf_counter()
    try:
        if tree is None:
            yield None
        else:
            with tree.scope(name) as node:
                yield node
    finally:
        dt = time.perf_counter() - t0
        metrics.observe(f"phase.{name}", dt)
        log.info("phase %-40s %8.2fs", name, dt)
