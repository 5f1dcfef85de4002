"""Geometry point index (reference: cpp_src/core/index/rtree/).

The reference builds an R-tree over 2-D points to serve DWithin. TPU-first
re-design: points live in a dense [N, 2] float64 column and DWithin is a
single vectorized distance computation over all rows — the batched analog of
an R-tree range descent, which for in-memory sizes is bandwidth-bound and
branch-free. (A grid-bucketed variant can replace the full scan if bases get
very large.)
"""
from __future__ import annotations

from typing import Any

import numpy as np

from ..core.errors import QueryError
from ..core.payload import IndexDef
from ..core.type_consts import CondType
from .base import Index, SelectKeyResult


class RTreeIndex(Index):
    def __init__(self, definition: IndexDef):
        super().__init__(definition)
        self._pts = np.zeros((64, 2), dtype=np.float64)
        self._valid = np.zeros(64, dtype=np.bool_)
        self._size = 0

    def _grow(self, need: int) -> None:
        if need <= len(self._pts):
            return
        cap = max(need, len(self._pts) * 2)
        pts = np.zeros((cap, 2), dtype=np.float64)
        pts[: self._size] = self._pts[: self._size]
        valid = np.zeros(cap, dtype=np.bool_)
        valid[: self._size] = self._valid[: self._size]
        self._pts, self._valid = pts, valid

    def upsert(self, row_id: int, values: Any) -> None:
        self._grow(row_id + 1)
        self._size = max(self._size, row_id + 1)
        if values is None:
            self._valid[row_id] = False
            return
        pt = np.asarray(values, dtype=np.float64).reshape(-1)
        if pt.shape[0] != 2:
            raise QueryError("rtree point must have exactly 2 coordinates")
        self._pts[row_id] = pt
        self._valid[row_id] = True

    def delete(self, row_id: int, values: Any) -> None:
        if row_id < self._size:
            self._valid[row_id] = False

    def supports(self, condition: CondType) -> bool:
        return condition in (CondType.DWITHIN, CondType.ANY, CondType.EMPTY)

    def select_key(self, condition: CondType, values: tuple, **kw) -> SelectKeyResult:
        if condition == CondType.DWITHIN:
            (point, distance) = values
            center = np.asarray(point, dtype=np.float64).reshape(-1)
            d2 = np.sum((self._pts[: self._size] - center[None, :]) ** 2, axis=1)
            mask = self._valid[: self._size] & (d2 <= float(distance) ** 2)
            return SelectKeyResult(np.flatnonzero(mask).astype(np.int64))
        if condition == CondType.ANY:
            return SelectKeyResult(
                np.flatnonzero(self._valid[: self._size]).astype(np.int64))
        if condition == CondType.EMPTY:
            return SelectKeyResult(
                np.flatnonzero(~self._valid[: self._size]).astype(np.int64))
        return SelectKeyResult.fallthrough()

    def clear(self) -> None:
        self._valid[:] = False
        self._size = 0

    def memstat(self) -> dict:
        return {"name": self.name,
                "unique_keys_count": int(self._valid[: self._size].sum()),
                "data_size": int(self._size * 16)}
