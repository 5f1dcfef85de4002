"""Full-text index adapter.

Semantic equivalent of the reference `IndexText`/`FastIndexText`
(cpp_src/core/index/indextext/indextext.h:171-186, indextext.cc:677-825):
documents only store their text on upsert (cheap write path); the first FT
query triggers the lazy commit that builds the posting store
(reference: CommitFulltext -> DataProcessor::Process; here ->
FtDataHolder.build). Query results are LRU-cached per DSL string
(reference: FtIdSetCache, indextext.cc:766) and invalidated on any mutation.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Any, Optional

import numpy as np

from ..core.errors import QueryError
from ..core.payload import IndexDef
from ..core.type_consts import CondType, RankOrdering
from ..ft.config import FtFastConfig
from ..ft.dataholder import FtDataHolder
from ..ft.selector import FtSelector
from .base import Index, SelectKeyResult

_CACHE_SIZE = 256


class FullTextIndex(Index):
    def __init__(self, definition: IndexDef):
        super().__init__(definition)
        self.cfg = FtFastConfig.from_dict(definition.ft_config)
        self.field_names = list(definition.json_paths)
        self.holder = FtDataHolder(self.cfg, self.field_names)
        self.docs: dict[int, list[str]] = {}   # row -> text per ft field
        self.dirty = True
        self._cache: OrderedDict[str, SelectKeyResult] = OrderedDict()
        self._rows_capacity = 0

    # --- mutation (write path stays cheap: just store text) -------------
    def upsert(self, row_id: int, values: Any) -> None:
        texts = self._to_texts(values)
        self.docs[row_id] = texts
        self._rows_capacity = max(self._rows_capacity, row_id + 1)
        self._invalidate()

    def delete(self, row_id: int, values: Any) -> None:
        if self.docs.pop(row_id, None) is not None:
            self._invalidate()

    def _to_texts(self, values: Any) -> list[str]:
        if values is None:
            return [""] * len(self.field_names)
        if isinstance(values, (list, tuple)):
            out = []
            for v in values:
                if isinstance(v, (list, tuple)):
                    out.append(" ".join(str(x) for x in v if x is not None))
                else:
                    out.append("" if v is None else str(v))
            # pad/trim to field count
            out = out[: len(self.field_names)]
            out += [""] * (len(self.field_names) - len(out))
            return out
        return [str(values)] + [""] * (len(self.field_names) - 1)

    def _invalidate(self) -> None:
        self.dirty = True
        self._cache.clear()

    # --- lazy commit (reference: IndexText::commitFulltextImpl) ---------
    def commit(self) -> None:
        if not self.dirty:
            return
        self.holder = FtDataHolder(self.cfg, self.field_names)
        self.holder.build(
            ((row, texts) for row, texts in self.docs.items()),
            self._rows_capacity)
        self.dirty = False

    # --- query ----------------------------------------------------------
    def supports(self, condition: CondType) -> bool:
        return condition in (CondType.EQ, CondType.SET, CondType.ANY,
                             CondType.EMPTY, CondType.LIKE)

    def select_key(self, condition: CondType, values: tuple,
                   **kw) -> SelectKeyResult:
        if condition in (CondType.ANY, CondType.EMPTY):
            has = np.asarray(
                [r for r, t in self.docs.items() if any(t)], dtype=np.int64)
            if condition == CondType.ANY:
                return SelectKeyResult(np.sort(has))
            allr = np.asarray(sorted(self.docs.keys()), dtype=np.int64)
            return SelectKeyResult(np.setdiff1d(allr, has))
        if not values:
            raise QueryError("full-text condition requires a query string")
        dsl = str(values[0])
        cached = self._cache.get(dsl)
        if cached is not None:
            self._cache.move_to_end(dsl)
            return cached
        self.commit()
        sel = FtSelector(self.holder, self.cfg)
        res = sel.process(dsl)
        out = SelectKeyResult(res.ids, res.ranks, RankOrdering.DESC)
        out.aux = {"matched_words": res.matched_words}
        self._cache[dsl] = out
        while len(self._cache) > _CACHE_SIZE:
            self._cache.popitem(last=False)
        return out

    def clear(self) -> None:
        self.docs.clear()
        self._rows_capacity = 0
        self.holder = FtDataHolder(self.cfg, self.field_names)
        self._invalidate()

    def memstat(self) -> dict:
        st = self.holder.memstat()
        st["name"] = self.name
        st["unique_keys_count"] = st.pop("words_count", 0)
        st["is_built"] = not self.dirty
        return st

    def state_dict(self) -> dict:
        return {"docs": {int(k): list(v) for k, v in self.docs.items()},
                "rows_capacity": self._rows_capacity}

    def load_state_dict(self, state: dict) -> None:
        self.clear()
        self.docs = {int(k): list(v) for k, v in state.get("docs", {}).items()}
        self._rows_capacity = int(state.get("rows_capacity", 0))
        self._invalidate()
