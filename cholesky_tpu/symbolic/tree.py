"""Separator (elimination) tree.

Mirrors the reference's tree conventions exactly (build_separator_tree,
mmat.rg:835-849): separators are numbered 1..num_separators with the root
receiving the highest number; the tree is a complete binary heap where heap
index h (1-based, root h=1) holds node `num_separators - h + 1`, so
level(h) = floor(log2(h)) and parent(h) = h // 2.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass(frozen=True)
class SeparatorTree:
    levels: int
    num_separators: int

    def __post_init__(self):
        if self.num_separators != (1 << self.levels) - 1:
            raise ValueError(
                f"complete binary separator tree requires 2^levels-1 separators; "
                f"got levels={self.levels}, num_separators={self.num_separators}")

    # -- node <-> heap-index maps ------------------------------------------
    def heap_of(self, sep: int) -> int:
        return self.num_separators - sep + 1

    def sep_of(self, heap: int) -> int:
        return self.num_separators - heap + 1

    def level_of(self, sep: int) -> int:
        return int(self.heap_of(sep)).bit_length() - 1

    def slot_of(self, sep: int) -> int:
        """Position of `sep` within its level (0-based, heap order)."""
        h = self.heap_of(sep)
        return h - (1 << self.level_of(sep))

    def sep_at(self, level: int, slot: int) -> int:
        return self.sep_of((1 << level) + slot)

    def level_seps(self, level: int) -> List[int]:
        """Separators at `level` in slot order (node numbers descend —
        matching the reference's index-launch iteration order)."""
        return [self.sep_at(level, t) for t in range(1 << level)]

    def parent(self, sep: int) -> int:
        h = self.heap_of(sep)
        if h == 1:
            raise ValueError("root has no parent")
        return self.sep_of(h // 2)

    def ancestors(self, sep: int) -> List[int]:
        """Proper ancestors of `sep`, immediate parent first, root last
        (the order the reference walks par_idx//2 chains, mmat.rg:1265-1270)."""
        out = []
        h = self.heap_of(sep) // 2
        while h >= 1:
            out.append(self.sep_of(h))
            h //= 2
        return out

    def ancestor_at(self, sep: int, level: int) -> int:
        """The ancestor of `sep` living at `level` (level must be <= level_of(sep))."""
        h = self.heap_of(sep)
        shift = self.level_of(sep) - level
        if shift < 0:
            raise ValueError("ancestor level deeper than sep level")
        return self.sep_of(h >> shift)

    def descendants(self, sep: int) -> List[int]:
        """All proper descendants (the backward-solve fan-out, mmat.rg:1455-1457)."""
        out = []
        lvl = self.level_of(sep)
        slot = self.slot_of(sep)
        for clvl in range(lvl + 1, self.levels):
            width = 1 << (clvl - lvl)
            for t in range(slot * width, (slot + 1) * width):
                out.append(self.sep_at(clvl, t))
        return out

    def level_slots(self, level: int) -> np.ndarray:
        return np.arange(1 << level, dtype=np.int64)
