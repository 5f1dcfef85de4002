"""Full-text index adapter.

Semantic equivalent of the reference `IndexText`/`FastIndexText`
(cpp_src/core/index/indextext/indextext.h:171-186, indextext.cc:677-825):
documents only store their text on upsert (cheap write path); the first FT
query triggers the lazy commit that builds the posting store
(reference: CommitFulltext -> DataProcessor::Process; here ->
FtDataHolder.build).

Incremental commits mirror the reference's build "steps"
(ft_fast/dataholder.h:73,101-105 — only the last step rebuilds unless
maxRebuildSteps/maxStepSize force a full rebuild): mutations since the last
full build go into a small *delta* holder; queries run against both holders,
main-holder hits of overridden rows are masked, raw scores merge and
normalize once. When the delta exceeds max_step_size (default 4000) the
main holder rebuilds fully.

Query results are LRU-cached per DSL string (reference: FtIdSetCache,
indextext.cc:766) and invalidated on any mutation.
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
from ..ft.selector import FtSelector, normalize_ranks
from .base import Index, SelectKeyResult

_CACHE_SIZE = 256


class FullTextIndex(Index):
    def __init__(self, definition: IndexDef):
        super().__init__(definition)
        self.cfg = FtFastConfig.from_dict(definition.ft_config)
        self.field_names = list(definition.json_paths)
        self.holder = FtDataHolder(self.cfg, self.field_names)
        self.docs: dict[int, list[str]] = {}   # row -> text per ft field
        self._full_dirty = True
        # incremental step state
        self._delta_docs: dict[int, list[str]] = {}
        self._overridden: set[int] = set()
        self._delta_holder: Optional[FtDataHolder] = None
        self._cache: OrderedDict[str, SelectKeyResult] = OrderedDict()
        self._rows_capacity = 0
        self._selector: Optional[FtSelector] = None
        self._delta_selector: Optional[FtSelector] = None
        self._mesh_ctx = None   # engine-integrated sharding (attach_mesh)

    def attach_mesh(self, ctx) -> None:
        """Mesh-resident mode: selectors run the doc-sharded BM25 path
        (parallel/sharded_ft.py) behind the same select_key API — the
        ShardingProxy analog for full-text (core/shardingproxy.cc)."""
        if ctx is None or ctx.n_shards <= 1:
            return
        self._mesh_ctx = ctx
        self._selector = None
        self._delta_selector = None

    # --- mutation (write path stays cheap: just store text) -------------
    def upsert(self, row_id: int, values: Any) -> None:
        texts = self._to_texts(values)
        self.docs[row_id] = texts
        self._rows_capacity = max(self._rows_capacity, row_id + 1)
        self._mutate(row_id, texts)

    def delete(self, row_id: int, values: Any) -> None:
        if self.docs.pop(row_id, None) is not None:
            self._mutate(row_id, None)

    def _mutate(self, row_id: int, texts: Optional[list[str]]) -> None:
        self._cache.clear()
        if self._full_dirty:
            return
        # step-based incremental path
        self._overridden.add(row_id)
        if texts is None:
            self._delta_docs.pop(row_id, None)
        else:
            self._delta_docs[row_id] = texts
        self._delta_holder = None
        if len(self._overridden) > self.cfg.max_step_size:
            self._full_dirty = True

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

    # --- lazy commit (reference: IndexText::commitFulltextImpl) ---------
    @property
    def dirty(self) -> bool:
        return self._full_dirty or (bool(self._delta_docs)
                                    and self._delta_holder is None)

    def commit(self) -> None:
        if self._full_dirty:
            self.holder = FtDataHolder(self.cfg, self.field_names)
            self.holder.build(
                ((row, texts) for row, texts in self.docs.items()),
                self._rows_capacity)
            self._full_dirty = False
            self._delta_docs.clear()
            self._overridden.clear()
            self._delta_holder = None
            self._selector = FtSelector(self.holder, self.cfg, self._mesh_ctx)
            self._delta_selector = None
            return
        if self._delta_docs and self._delta_holder is None:
            self._delta_holder = FtDataHolder(self.cfg, self.field_names)
            self._delta_holder.build(
                ((row, texts) for row, texts in self._delta_docs.items()),
                self._rows_capacity)
            self._delta_selector = FtSelector(self._delta_holder,
                                              self.cfg,
                                              self._mesh_ctx)

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
        if self._selector is None:
            self._selector = FtSelector(self.holder, self.cfg, self._mesh_ctx)
        # steady state (no delta holder to merge, no overridden rows):
        # let the selector normalize — that unlocks the device-dense
        # packed download (rank byte | doc in one i32, half the tunnel
        # bytes; device_dense.py) for frequent-word queries
        if self._delta_holder is None and not self._overridden \
                and not self._delta_docs:
            res = self._selector.process(dsl)
            out = SelectKeyResult(res.ids, res.ranks, RankOrdering.DESC)
            out.aux = {"matched_words": res.matched_words,
                       "area_sources": [(self.holder, res.matched_wids,
                                         res.searched_fields)]}
            self._cache[dsl] = out
            while len(self._cache) > _CACHE_SIZE:
                self._cache.popitem(last=False)
            return out
        res = self._selector.process(dsl, normalize=False)
        ids, scores, matched = res.ids, res.ranks, res.matched_words
        # source-offset area resolvers (reference: areaholder.h): each
        # (holder, matched word ids) pair maps a rendered doc + field to
        # the token positions that actually matched
        area_sources = [(self.holder, res.matched_wids,
                         res.searched_fields)]
        if self._overridden:
            keep = np.asarray([int(i) not in self._overridden for i in ids],
                              dtype=bool)
            ids, scores = ids[keep], scores[keep]
        if self._delta_holder is not None:
            if self._delta_selector is None:
                self._delta_selector = FtSelector(self._delta_holder,
                                                  self.cfg,
                                                  self._mesh_ctx)
            d = self._delta_selector.process(dsl, normalize=False)
            ids = np.concatenate([ids, d.ids])
            scores = np.concatenate([scores, d.ranks])
            matched = matched | d.matched_words
            area_sources.append((self._delta_holder, d.matched_wids,
                                 d.searched_fields))
            order = np.argsort(-scores, kind="stable")
            ids, scores = ids[order], scores[order]
        ids, ranks = normalize_ranks(ids, scores, self.cfg.min_rank)
        out = SelectKeyResult(ids, ranks, RankOrdering.DESC)
        out.aux = {"matched_words": matched, "area_sources": area_sources}
        self._cache[dsl] = out
        while len(self._cache) > _CACHE_SIZE:
            self._cache.popitem(last=False)
        return out

    def clear(self) -> None:
        self.docs.clear()
        self._rows_capacity = 0
        self.holder = FtDataHolder(self.cfg, self.field_names)
        self._full_dirty = True
        self._delta_docs.clear()
        self._overridden.clear()
        self._delta_holder = None
        self._cache.clear()

    def memstat(self) -> dict:
        st = self.holder.memstat()
        st["name"] = self.name
        st["unique_keys_count"] = st.pop("words_count", 0)
        st["is_built"] = not self._full_dirty
        st["delta_docs"] = len(self._delta_docs)
        return st

    def state_dict(self) -> dict:
        return {"docs": {int(k): list(v) for k, v in self.docs.items()},
                "rows_capacity": self._rows_capacity}

    def load_state_dict(self, state: dict) -> None:
        self.clear()
        self.docs = {int(k): list(v) for k, v in state.get("docs", {}).items()}
        self._rows_capacity = int(state.get("rows_capacity", 0))
