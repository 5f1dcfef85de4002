"""HNSW vector index — batched beam search over padded neighbor tables.

TPU-native re-design of the reference HNSW stack
(cpp_src/core/index/float_vector/hnswlib/hnswalg.h + hnsw_index.cc adapter):

- graph layout: layer 0 is a device-resident int32[cap, 2M] neighbor table,
  upper layers a top-first stacked int32[Lu, cap, M] (hnswlib maxM0 = 2*M,
  hnswalg.h); -1 marks empty slots. Device tables are updated with row
  scatters, never full re-uploads.
- search (reference SearchKnn, hnswalg.h:1988): one `greedy_descend` device
  program walks all upper layers, one `beam_search_layer` program runs the
  ef-beam on layer 0 — batched over queries (ops/hnsw_kernels.py).
- insertion (reference addPoint hnswalg.h:1402 + the namespace's
  multithreaded tx inserter, tx_concurrent_inserter.h:160): points queue on
  upsert and commit in growing batches; each batch beam-searches the current
  graph for efConstruction candidates (device), selects M neighbors with the
  batched heuristic kernel (reference getNeighborsByHeuristic2,
  hnswalg.h:978), then links bidirectionally on host; reverse overflow keeps
  the M closest links (a simplification of the reference's reverse-edge
  heuristic re-run — recall validated against the BF oracle in tests).
- deletes are mark-delete (hnswalg.h markDelete): traversal continues through
  deleted nodes; results filter them out.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...core.errors import ParamsError
from ...core.payload import IndexDef
from ...core.type_consts import VectorMetric
from ...ops.distance import normalize_rows, scores_to_ranks
from ...ops.hnsw_kernels import DataPack, beam_search_layer, \
    exact_build_layer, greedy_descend
from ..base import SelectKeyResult
from .base import FloatVectorIndexBase
from .params import KnnSearchParams

_Q_BUCKET = 8
_CHUNK_START = 32
_CHUNK_MAX = 1024

_HNSW_NATIVE = None
_HNSW_NATIVE_TRIED = False


def _hnsw_native_module():
    """Lazy-built C++ link maintenance (csrc/hnsw_native.cpp)."""
    global _HNSW_NATIVE, _HNSW_NATIVE_TRIED
    if not _HNSW_NATIVE_TRIED:
        _HNSW_NATIVE_TRIED = True
        import os
        if os.environ.get("RX_TPU_DISABLE_NATIVE", "") not in ("1", "true"):
            from ...csrc import load
            _HNSW_NATIVE = load("_hnsw_native", "hnsw_native.cpp")
    return _HNSW_NATIVE


def _pow2(n: int, floor: int = 8) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


# jitted dirty-row mirror updates: one compiled program per pow2 shape
# bucket (see _pad_dirty) instead of a fresh eager-scatter compile per
# distinct dirty count
@jax.jit
def _scatter_rows(table, rows, vals):
    return table.at[rows].set(vals)


@jax.jit
def _scatter_layer_rows(stack, li, rows, vals):
    return stack.at[li, rows].set(vals)


@jax.jit
def _scatter_rows_drop(table, rows, vals):
    """Row scatter where rows == -1 means 'skip' (out-of-bounds drop)."""
    return table.at[rows].set(vals, mode="drop")


class HnswIndex(FloatVectorIndexBase):
    def __init__(self, definition: IndexDef):
        super().__init__(definition)
        vo = definition.vector_opts
        self.m = max(int(vo.m), 2)
        self.m0 = 2 * self.m
        self.ef_construction = max(int(vo.ef_construction), self.m)
        self._mult = 1.0 / math.log(self.m)
        # ablation knob: forward selection without diversity pruning (plain
        # top-m closest); measurement use only — see docs/performance.md
        import os as _os
        self._use_heuristic = _os.environ.get(
            "RX_HNSW_NO_HEURISTIC", "0") not in ("1", "true")
        self._rng = np.random.default_rng(0xC0FFEE)
        cap = self.keeper.capacity
        self._levels = np.full(cap, -1, dtype=np.int32)
        self._deleted = np.zeros(cap, dtype=np.bool_)
        self._links0 = np.full((cap, self.m0), -1, dtype=np.int32)
        self._upper: list[np.ndarray] = []   # top-first, each [cap, m]
        self._host_vecs = np.zeros((cap, self.dims), dtype=np.float32)
        self._entry = -1
        self._max_level = -1
        self._pending: dict[int, np.ndarray] = {}
        # device mirrors + dirty row tracking
        self._d_links0: Optional[jnp.ndarray] = None
        self._d_upper: Optional[jnp.ndarray] = None   # [Lu, cap, m]
        self._dirty0: set[int] = set()
        self._dirty_upper: dict[int, set[int]] = {}   # layer idx -> rows
        self._full_sync = True
        qc = vo.quantization
        self._quant = None
        if qc.enabled:
            from .quantization import QuantizedStore
            self._quant = QuantizedStore(qc.left_quantile, qc.right_quantile,
                                         qc.min_elements)
        # engine-integrated sharding (attach_mesh): per-shard subgraphs
        self._mesh_shards: Optional[list["HnswIndex"]] = None
        self._mesh_packed = None
        self._mesh_fns: dict = {}

    # ------------------------------------------------------------------
    # mesh-resident mode (the ShardingProxy analog, VERDICT r3 #3):
    # the row space round-robins over S per-shard subgraphs (the
    # reference's per-shard namespaces, core/shardingproxy.cc) — shard
    # s owns namespace rows {r : r % S == s} as local rows r // S. Each
    # shard's keeper is PINNED to its own device so builds dispatch in
    # parallel; searches pack the subgraphs into mesh-sharded tables and
    # beam all shards simultaneously inside shard_map with one
    # all_gather + top_k merge (parallel/sharded_hnsw.py).
    # ------------------------------------------------------------------
    def attach_mesh(self, ctx) -> None:
        if ctx is None or ctx.n_shards <= 1:
            return
        self._mesh_ctx = ctx
        devs = list(ctx.mesh.devices.reshape(-1))
        shards = []
        for s in range(ctx.n_shards):
            sub = HnswIndex(self.definition)
            sub.keeper.device = devs[s % len(devs)]
            sub.keeper._replace()
            shards.append(sub)
        self._mesh_shards = shards

    def _mesh_route(self, row_id: int) -> tuple["HnswIndex", int]:
        S = len(self._mesh_shards)
        return self._mesh_shards[row_id % S], row_id // S

    # ------------------------------------------------------------------
    # mutation
    # ------------------------------------------------------------------
    def upsert(self, row_id: int, values) -> None:
        if self._mesh_shards is not None:
            sub, local = self._mesh_route(row_id)
            sub.upsert(local, values)
            self._mesh_packed = None
            return
        super().upsert(row_id, values)   # keeper bookkeeping
        if values is None or (hasattr(values, "__len__") and len(values) == 0):
            self._pending.pop(row_id, None)
            if row_id < len(self._levels) and self._levels[row_id] >= 0:
                self._deleted[row_id] = True
            return
        vec = np.asarray(values, dtype=np.float32).reshape(-1)
        if self.metric == VectorMetric.COSINE:
            vec = normalize_rows(vec[None, :])[0]
        if row_id < len(self._levels) and self._levels[row_id] >= 0:
            # vector update of an existing node: unlink and re-insert so the
            # graph reflects the new position (reference: updatePoint link
            # repair, hnswalg.h)
            self._grow(row_id + 1)
            self._host_vecs[row_id] = vec
            self._deleted[row_id] = False
            self._unlink(row_id)
        self._pending[row_id] = vec

    def delete(self, row_id: int, values) -> None:
        if self._mesh_shards is not None:
            sub, local = self._mesh_route(row_id)
            sub.delete(local, values)
            self._mesh_packed = None
            return
        super().delete(row_id, values)
        self._pending.pop(row_id, None)
        if row_id < len(self._levels) and self._levels[row_id] >= 0:
            self._deleted[row_id] = True
            if row_id == self._entry:
                self._reassign_entry()

    def _unlink(self, row: int) -> None:
        """Detach a node from every layer (incoming + outgoing edges) so it
        can be re-inserted at its new position."""
        if row == self._entry:
            prev_level = self._levels[row]
            self._levels[row] = -1
            self._reassign_entry()
            self._levels[row] = prev_level
        layers = [(0, self._links0)] + [
            (len(self._upper) - li, u) for li, u in enumerate(self._upper)]
        for layer, links in layers:
            dirty = self._dirty0 if layer == 0 else \
                self._dirty_upper.setdefault(layer, set())
            # outgoing
            nbrs = links[row][links[row] >= 0]
            links[row, :] = -1
            dirty.add(row)
            # incoming from former neighbors (HNSW edges are near-symmetric;
            # scan the ex-neighbors' lists)
            for s in nbrs:
                srow = links[s]
                hit = srow == row
                if hit.any():
                    kept = srow[(srow >= 0) & ~hit]
                    links[s, :] = -1
                    links[s, : len(kept)] = kept
                    dirty.add(int(s))
            # repair: bridge the ex-neighbors pairwise so removing the node
            # cannot disconnect the graph (diversity-pruned graphs keep no
            # redundant long edges; the reference repairs the neighborhood
            # on updates the same way, hnswalg.h updatePoint ->
            # repairConnectionsForUpdate)
            for a in nbrs:
                arow = links[a]
                have = set(int(x) for x in arow[arow >= 0])
                for b in nbrs:
                    if a == b or int(b) in have:
                        continue
                    free = np.flatnonzero(arow < 0)
                    if not len(free):
                        break
                    links[a, free[0]] = b
                    have.add(int(b))
                    dirty.add(int(a))
        self._levels[row] = -1

    def _reassign_entry(self) -> None:
        for lvl in range(self._max_level, -1, -1):
            cand = np.flatnonzero((self._levels >= lvl) & ~self._deleted)
            if len(cand):
                self._entry = int(cand[0])
                self._max_level = int(self._levels[self._entry])
                return
        self._entry = -1
        self._max_level = -1

    def clear(self) -> None:
        if self._mesh_shards is not None:
            for sh in self._mesh_shards:
                sh.clear()
            self._mesh_packed = None
            return
        super().clear()
        cap = self.keeper.capacity
        self._levels = np.full(cap, -1, dtype=np.int32)
        self._deleted = np.zeros(cap, dtype=np.bool_)
        self._links0 = np.full((cap, self.m0), -1, dtype=np.int32)
        self._upper = []
        self._host_vecs = np.zeros((cap, self.dims), dtype=np.float32)
        self._entry = -1
        self._max_level = -1
        self._pending.clear()
        self._d_links0 = self._d_upper = None
        self._full_sync = True

    # ------------------------------------------------------------------
    # capacity
    # ------------------------------------------------------------------
    def _grow(self, need: int) -> None:
        cap = len(self._levels)
        if need <= cap:
            return
        new_cap = cap
        while new_cap < need:
            new_cap *= 2

        def pad(a, fill):
            shape = (new_cap - cap,) + a.shape[1:]
            return np.concatenate([a, np.full(shape, fill, dtype=a.dtype)])

        self._levels = pad(self._levels, -1)
        self._deleted = pad(self._deleted, False)
        self._links0 = pad(self._links0, -1)
        self._upper = [pad(u, -1) for u in self._upper]
        self._host_vecs = pad(self._host_vecs, 0.0)
        self._full_sync = True

    # ------------------------------------------------------------------
    # commit: batched insertion
    # ------------------------------------------------------------------
    def commit(self) -> None:
        self._commit()

    def _commit(self) -> None:
        if self._mesh_shards is not None:
            for sh in self._mesh_shards:
                sh._commit()
            return
        self.keeper.flush()
        if not self._pending:
            return
        rows = sorted(self._pending.keys())
        self._grow(max(rows) + 1)
        for r in rows:
            self._host_vecs[r] = self._pending[r]
            self._deleted[r] = False
        chunk = _CHUNK_START
        i = 0
        plans: list[list[int]] = []
        while i < len(rows):
            plans.append(rows[i: i + chunk])
            i += chunk
            chunk = min(chunk * 2, _CHUNK_MAX)
        staged = self._dispatch_chunks(plans)
        for batch, levels, layer_out in staged:
            self._link_chunk(batch, levels, layer_out)
        self._pending.clear()

    def _pack(self, for_search: bool) -> DataPack:
        """Vector storage for the graph kernels. Searches use the SQ8 codes
        when quantization is active (reference: quantized HNSW storage,
        hnswalg.h uint8 template + float_vector.md:296+); inserts always use
        the exact fp32 rows."""
        if for_search and self._quant is not None:
            if self._quant.need_requantize(self.keeper.count,
                                           self.keeper.capacity):
                self._quant.quantize(self.keeper)
            elif self._quant.need_refresh(self.keeper.count):
                self._quant.refresh(self.keeper)
            if self._quant.active:
                return DataPack(self._quant.codes, self.keeper.sq,
                                self._quant.lo, self._quant.alpha)
        return DataPack(self.keeper.data, self.keeper.sq)

    def _sample_level(self) -> int:
        return int(-math.log(max(self._rng.random(), 1e-12)) * self._mult)

    def _dispatch_chunks(self, plans: list[list[int]]):
        """Phase 1 of the pipelined build: sample levels for every chunk and
        dispatch ALL candidate scans asynchronously before any host linking.

        The exact-scan build never reads the link tables — each chunk's
        candidates depend only on which rows precede it in the insertion
        order (planned levels), which is known upfront. Dispatching every
        chunk's device program before blocking on any result turns the
        per-chunk tunnel round-trip (~30-200ms each) into one pipelined
        stream (the TPU analog of the reference's concurrent inserter
        pipelining, tx_concurrent_inserter.h:160).

        Returns [(rows, levels, [(layer, connect_here, sel_device)])]."""
        staged = []
        if not plans:
            return staged
        if self._entry < 0:
            # bootstrap: first point becomes the entry
            r0 = plans[0][0]
            lvl = self._sample_level()
            self._set_level(r0, lvl)
            self._entry, self._max_level = r0, lvl
            plans = [plans[0][1:]] + plans[1:]
        pack = self._pack(for_search=False)
        levels_plan = self._levels.copy()
        run_max = self._max_level
        # device-resident build state, maintained as a MIRROR across
        # commits (a fresh int32[N]+bool[N] upload per commit is ~5MB of
        # tunnel traffic at 1M rows; the mirror diffs against a host
        # snapshot and scatters only changed rows). The kernel computes
        # per-layer validity itself (levels >= lc & ~deleted).
        levels_dev, deleted_dev = self._build_state_device()
        efc_k = _pow2(min(self.ef_construction,
                          max(self.keeper.capacity // 2, 8)), 8)
        # ONE program shape on accelerators: every chunk pads to _CHUNK_MAX
        # so the whole build (any commit size, any chunk of the growth
        # schedule) compiles exactly one exact_build_layer program per
        # capacity. Remote compiles through the device tunnel cost seconds
        # to MINUTES each; the padded rows cost microseconds of MXU time.
        # CPU (tests) keeps tight pow2 buckets — a [1024, cap] scan per
        # 2-row commit is real time on one host core.
        fixed_q = jax.default_backend() != "cpu"
        for rows in plans:
            if not rows:
                continue
            levels = np.asarray([self._sample_level() for _ in rows],
                                dtype=np.int32)
            B = len(rows)
            qpad = _CHUNK_MAX if fixed_q else _pow2(B)
            q = np.zeros((qpad, self.dims), dtype=np.float32)
            q[:B] = self._host_vecs[rows]
            qd = jnp.asarray(q)

            # TPU-native build: instead of walking the graph per point
            # (reference addPoint beam, hnswalg.h:1402 — scatter-gather-
            # heavy on TPU: each beam iteration gathers expand*M neighbor
            # vectors per query), the efConstruction candidates come from
            # an EXACT fused top-k scan of the current layer population on
            # the MXU. Candidate quality is >= the reference's approximate
            # beam; the heuristic prune and reverse linking stay
            # reference-faithful.
            row_arr = np.full(qpad, -1, dtype=np.int32)
            row_arr[:B] = rows
            # fixed kc on accelerators for the same single-program reason
            # (row_arr == -1 masks padding out of the chunk-internal KNN)
            kc = _pow2(self.m0, 8) if fixed_q else (
                _pow2(min(B - 1, self.m0), 8) if B > 1 else 0)
            row_d = jnp.asarray(row_arr)
            top_batch = int(levels.max())
            layer_out = []
            for lc in range(min(top_batch, run_max), -1, -1):
                connect_here = np.flatnonzero(levels >= lc) if lc > 0 else \
                    np.arange(B)
                if len(connect_here) == 0:
                    continue
                lvl_ok = np.zeros(qpad, dtype=np.bool_)
                lvl_ok[:B] = levels >= lc
                sel = exact_build_layer(
                    qd, pack, levels_dev, deleted_dev, jnp.int32(lc),
                    row_d, jnp.asarray(lvl_ok),
                    k=efc_k, kc=kc, m=self.m, metric=self.metric,
                    use_heuristic=self._use_heuristic)
                layer_out.append((lc, connect_here, sel))
            staged.append((rows, levels, layer_out))
            # mark this chunk in-graph for the next chunk's scan
            lv = np.full(qpad, -1, dtype=np.int32)
            lv[:B] = levels
            levels_dev = _scatter_rows_drop(levels_dev, row_d,
                                            jnp.asarray(lv))
            levels_plan[rows] = levels
            run_max = max(run_max, top_batch)
        # the device mirror now holds the fully-planned levels (phase 2
        # sets self._levels to the same values row by row)
        self._d_levels = levels_dev
        self._lv_snap = levels_plan
        return staged

    def _build_state_device(self):
        """Device mirrors of (levels, deleted), diffed against host
        snapshots so incremental commits scatter only changed rows."""
        cap = len(self._levels)
        if getattr(self, "_d_levels", None) is None \
                or self._d_levels.shape[0] != cap:
            self._d_levels = jnp.asarray(self._levels)
            self._lv_snap = self._levels.copy()
            self._d_deleted = jnp.asarray(self._deleted)
            self._del_snap = self._deleted.copy()
            return self._d_levels, self._d_deleted
        diff = np.flatnonzero(self._levels != self._lv_snap)
        if len(diff):
            r, v = self._pad_dirty(diff.astype(np.int32),
                                   self._levels[diff])
            self._d_levels = _scatter_rows(self._d_levels, jnp.asarray(r),
                                           jnp.asarray(v))
            self._lv_snap[diff] = self._levels[diff]
        diffd = np.flatnonzero(self._deleted != self._del_snap)
        if len(diffd):
            r, v = self._pad_dirty(diffd.astype(np.int32),
                                   self._deleted[diffd])
            self._d_deleted = _scatter_rows(self._d_deleted,
                                            jnp.asarray(r), jnp.asarray(v))
            self._del_snap[diffd] = self._deleted[diffd]
        return self._d_levels, self._d_deleted

    def _link_chunk(self, rows: list[int], levels: np.ndarray,
                    layer_out) -> None:
        """Phase 2: host linking of one chunk from its device-selected
        neighbors (blocks on the chunk's scan results)."""
        B = len(rows)
        for lc, connect_here, sel in layer_out:
            sel_np = np.asarray(sel)[:B][connect_here]
            self._connect_selected(lc, [rows[j] for j in connect_here],
                                   sel_np)
        for j, r in enumerate(rows):
            self._set_level(r, int(levels[j]))
        top = int(levels.max()) if B else -1
        if top > self._max_level:
            self._entry = rows[int(np.argmax(levels))]
            self._max_level = top

    def _set_level(self, row: int, lvl: int) -> None:
        self._levels[row] = lvl
        while len(self._upper) < lvl:
            self._upper.insert(0, np.full((len(self._levels), self.m), -1,
                                          dtype=np.int32))
            self._full_sync = True

    def _connect_selected(self, layer: int, rows: list[int],
                          sel: np.ndarray) -> None:
        """Link `rows` into `layer` given their heuristic-selected neighbors
        (sel int32[B, m], -1 padded)."""
        m_l = self.m0 if layer == 0 else self.m
        links = self._links0 if layer == 0 else self._upper[
            len(self._upper) - layer]
        dirty = self._dirty0 if layer == 0 else \
            self._dirty_upper.setdefault(layer, set())

        native = _hnsw_native_module()
        if native is not None:
            # C++ link-maintenance hot loop (csrc/hnsw_native.cpp)
            touched = native.connect_batch(
                links, self._host_vecs,
                np.asarray(rows, dtype=np.int32),
                np.ascontiguousarray(sel, dtype=np.int32), m_l,
                0 if self.metric == VectorMetric.L2 else 1)
            dirty.update(touched)
            return

        for j, row in enumerate(rows):
            nbrs = sel[j][sel[j] >= 0]
            nbrs = nbrs[nbrs != row][: m_l]
            links[row, :] = -1
            links[row, : len(nbrs)] = nbrs
            dirty.add(row)
            # reverse edges: free slot, else re-run the selection heuristic
            # over (existing + new) relative to s (reference:
            # mutuallyConnectNewElement, hnswalg.h:1043)
            for s in nbrs:
                srow = links[s]
                free = np.flatnonzero(srow < 0)
                if len(free):
                    links[s, free[0]] = row
                else:
                    cand = np.concatenate([srow, [row]])
                    d = self._host_dists(int(s), cand)
                    order = np.argsort(d, kind="stable")
                    kept: list[int] = []
                    for ci in order:
                        if len(kept) >= m_l:
                            break
                        c = int(cand[ci])
                        dq = d[ci]
                        dc = self._host_dists(c, np.asarray(kept,
                                                            dtype=np.int64)) \
                            if kept else np.empty(0)
                        if not len(dc) or (dc >= dq).all():
                            kept.append(c)
                    links[s, :] = -1
                    links[s, : len(kept)] = kept
                dirty.add(int(s))

    def _host_dists(self, center: int, ids: np.ndarray) -> np.ndarray:
        c = self._host_vecs[center]
        v = self._host_vecs[ids]
        if self.metric == VectorMetric.L2:
            return np.sum((v - c) ** 2, axis=1)
        return -v @ c

    # ------------------------------------------------------------------
    # device mirrors
    # ------------------------------------------------------------------
    @staticmethod
    def _pad_dirty(rows: np.ndarray, vals: np.ndarray,
                   ) -> tuple[np.ndarray, np.ndarray]:
        """Pow2-pad a dirty-row update so the jitted scatter compiles for a
        handful of shape buckets instead of one program per distinct count
        (eager `.at[].set` costs a multi-second remote compile per new shape
        through the device tunnel). Padding repeats row 0 with identical
        values — duplicate scatter writes of the same value are benign."""
        p2 = _pow2(len(rows))
        if p2 == len(rows):
            return rows, vals
        pr = np.full(p2, rows[0], dtype=rows.dtype)
        pv = np.broadcast_to(vals[0], (p2,) + vals.shape[1:]).copy()
        pr[: len(rows)] = rows
        pv[: len(rows)] = vals
        return pr, pv

    def _sync_device(self) -> None:
        if self._full_sync or self._d_links0 is None \
                or self._d_links0.shape[0] != len(self._levels):
            self._d_links0 = jnp.asarray(self._links0)
            self._d_upper = (jnp.asarray(np.stack(self._upper))
                             if self._upper else None)
            self._dirty0.clear()
            self._dirty_upper.clear()
            self._full_sync = False
            return
        if self._dirty0:
            r = np.fromiter(self._dirty0, dtype=np.int32,
                            count=len(self._dirty0))
            r, v = self._pad_dirty(r, self._links0[r])
            self._d_links0 = _scatter_rows(
                self._d_links0, jnp.asarray(r), jnp.asarray(v))
            self._dirty0.clear()
        if self._dirty_upper:
            if self._d_upper is None or \
                    self._d_upper.shape[0] != len(self._upper):
                self._d_upper = (jnp.asarray(np.stack(self._upper))
                                 if self._upper else None)
            else:
                for layer, rows in self._dirty_upper.items():
                    li = len(self._upper) - layer
                    r = np.fromiter(rows, dtype=np.int32, count=len(rows))
                    r, v = self._pad_dirty(r, self._upper[li][r])
                    self._d_upper = _scatter_layer_rows(
                        self._d_upper, jnp.int32(li), jnp.asarray(r),
                        jnp.asarray(v))
            self._dirty_upper.clear()

    def _device_layer(self, layer: int) -> jnp.ndarray:
        if layer == 0:
            return self._d_links0
        return self._d_upper[len(self._upper) - layer]

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------
    def _has_entry(self) -> bool:
        if self._mesh_shards is not None:
            return any(sh._entry >= 0 for sh in self._mesh_shards)
        return self._entry >= 0

    def _mesh_pack_state(self):
        """Pack the per-shard subgraphs into mesh-sharded search tables
        (cached; invalidated by any mutation). Also snapshots the global
        deleted matrix for drain-time filtering (same mark-delete
        semantics as the single-device drain)."""
        if self._mesh_packed is None:
            from ...parallel.sharded_hnsw import shard_hnsw_state
            for sh in self._mesh_shards:
                sh._commit()
            cap = max(sh.keeper.capacity for sh in self._mesh_shards)
            packed = shard_hnsw_state(self._mesh_ctx.mesh,
                                      self._mesh_shards, cap,
                                      shard_axis=self._mesh_ctx.shard_axis)
            S = len(self._mesh_shards)
            del_mat = np.zeros((S, cap), dtype=np.bool_)
            for s, sh in enumerate(self._mesh_shards):
                del_mat[s, : len(sh._deleted)] = sh._deleted
            self._mesh_packed = packed + (cap, del_mat)
        return self._mesh_packed

    def _mesh_search_async(self, queries: np.ndarray, ef: int):
        from ...parallel.sharded_hnsw import build_sharded_hnsw
        (data, sq, links0, upper, entries, n_upper, cap,
         del_mat) = self._mesh_pack_state()
        Q = queries.shape[0]
        qpad = _pow2(Q, _Q_BUCKET)
        q = np.zeros((qpad, self.dims), dtype=np.float32)
        q[:Q] = queries
        ef_pad = _pow2(ef, 16)
        key = (ef_pad, n_upper)
        fn = self._mesh_fns.get(key)
        if fn is None:
            fn = build_sharded_hnsw(self._mesh_ctx.mesh, ef_pad, 2,
                                    self.metric, n_upper,
                                    shard_axis=self._mesh_ctx.shard_axis)
            self._mesh_fns[key] = fn
        bs, bi = fn(jnp.asarray(q), data, sq, links0, upper, entries)
        S = len(self._mesh_shards)

        def drain() -> tuple[np.ndarray, np.ndarray]:
            s, i = jax.device_get((bs, bi))
            s, i = np.asarray(s)[:Q], np.asarray(i)[:Q]
            shard = np.where(i >= 0, i // cap, 0)
            local = np.where(i >= 0, i % cap, 0)
            bad = (i < 0) | del_mat[shard, local]
            rows = local * S + shard       # packed id -> namespace row
            s = np.where(bad, -np.inf, s)
            i = np.where(bad, -1, rows)
            order = np.argsort(-s, axis=1, kind="stable")
            return (np.take_along_axis(s, order, axis=1)[:, :ef],
                    np.take_along_axis(i, order, axis=1)[:, :ef])

        return drain

    def select_async(self, query: np.ndarray, params: KnnSearchParams):
        self._commit()
        if not self._has_entry():
            return lambda: SelectKeyResult.empty()
        k = params.k
        ef = getattr(params, "ef", None) or max(k or 10, 10)
        if k is not None:
            ef = max(ef, k)
        search_drain = self._search_batch_async(
            self.keeper.prepare_query(query)[None, :], ef)

        def drain() -> SelectKeyResult:
            scores, ids = search_drain()
            scores, ids = scores[0], ids[0]
            keep = ids >= 0
            scores, ids = scores[keep], ids[keep]
            if k is not None:
                scores, ids = scores[:k], ids[:k]
            ranks = np.asarray(scores_to_ranks(scores, self.metric))
            ranks, ids2 = self._apply_radius(ranks, ids, params.radius)
            return SelectKeyResult(ids2.astype(np.int64),
                                   ranks.astype(np.float32), self.ordering)

        return drain

    def select(self, query: np.ndarray, params: KnnSearchParams,
               ) -> SelectKeyResult:
        return self.select_async(query, params)()

    def _search_batch_async(self, queries: np.ndarray, ef: int):
        """Dispatch the batched HNSW search (descent + beam, all device
        arrays chained with zero host round-trips) and return a drain
        closure producing (scores, ids) [Q, ef]. Dispatch runs under the
        caller's namespace lock; the drain (one blocking readback + host
        filtering) runs outside it, so concurrent clients overlap their
        tunnel RTTs — ~17 ms device time inside a ~47 ms wall at 1M
        (CLAUDE.md), i.e. pipelined serving sustains ~3x blocking qps."""
        if self._mesh_shards is not None:
            return self._mesh_search_async(queries, ef)
        self._commit()
        self._sync_device()
        Q = queries.shape[0]
        qpad = _pow2(Q, _Q_BUCKET)
        q = np.zeros((qpad, self.dims), dtype=np.float32)
        q[:Q] = queries
        qd = jnp.asarray(q)
        pack = self._pack(for_search=True)

        # zero host round-trips between stages: descent output feeds the
        # beam as a device array, and BOTH results come back in one
        # blocking readback (each extra np.asarray costs a full tunnel
        # RTT, ~30ms — measured 2x single-query serving, hybrid profile)
        ents_d = jnp.asarray(np.full(qpad, self._entry, dtype=np.int32))
        if self._max_level > 0 and self._d_upper is not None:
            ents_d = greedy_descend(qd, pack, self._d_upper, ents_d,
                                    self.metric)
        ef_pad = _pow2(ef, 16)
        bs, bi = beam_search_layer(
            qd, pack, self._d_links0, ents_d[:, None],
            ef=ef_pad, expand=2, max_iters=2 * ef_pad, metric=self.metric)
        if pack.quantized:
            # exact fp32 re-rank of the quantized beam's results
            from ...ops.hnsw_kernels import exact_rescore
            bs, bi = exact_rescore(qd, self.keeper.data, self.keeper.sq,
                                   bi, bs, self.metric)
        deleted = self._deleted      # snapshot under the caller's lock

        def drain() -> tuple[np.ndarray, np.ndarray]:
            s, i = jax.device_get((bs, bi))
            s = np.asarray(s)[:Q]
            i = np.asarray(i)[:Q]
            # filter deleted / invalid
            safe = np.where(i >= 0, i, 0)
            bad = (i < 0) | deleted[safe]
            s = np.where(bad, -np.inf, s)
            i = np.where(bad, -1, i)
            # re-sort after filtering
            order = np.argsort(-s, axis=1, kind="stable")
            return (np.take_along_axis(s, order, axis=1)[:, :ef],
                    np.take_along_axis(i, order, axis=1)[:, :ef])

        return drain

    def _search_batch(self, queries: np.ndarray, ef: int,
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Batched HNSW search; returns (scores, ids) [Q, ef] best-first with
        deleted/invalid rows filtered out (-inf/-1)."""
        return self._search_batch_async(queries, ef)()

    def select_batch_async(self, queries: np.ndarray,
                           params: KnnSearchParams):
        """Batched beam search dispatch (descent + layer-0 beam share two
        device programs); returns the drain closure."""
        self._commit()
        queries = np.asarray(queries, dtype=np.float32)
        if not self._has_entry():
            res = [SelectKeyResult.empty() for _ in queries]
            return lambda: res
        k = params.k
        ef = getattr(params, "ef", None) or max(k or 10, 10)
        if k is not None:
            ef = max(ef, k)
        q = np.stack([self.keeper.prepare_query(v) for v in queries])
        search_drain = self._search_batch_async(q, ef)

        def drain() -> list[SelectKeyResult]:
            scores, ids = search_drain()
            out = []
            for b in range(len(queries)):
                s, i = scores[b], ids[b]
                keep = i >= 0
                s, i = s[keep], i[keep]
                if k is not None:
                    s, i = s[:k], i[:k]
                ranks = np.asarray(scores_to_ranks(s, self.metric))
                ranks, i = self._apply_radius(ranks, i, params.radius)
                out.append(SelectKeyResult(i.astype(np.int64),
                                           ranks.astype(np.float32),
                                           self.ordering))
            return out

        return drain

    def select_batch(self, queries: np.ndarray, params: KnnSearchParams,
                     ) -> list[SelectKeyResult]:
        return self.select_batch_async(queries, params)()

    # ------------------------------------------------------------------
    def select_key(self, condition, values: tuple, **kw) -> SelectKeyResult:
        if self._mesh_shards is not None:
            from ...core.type_consts import CondType as _CT
            if condition in (_CT.ANY, _CT.EMPTY):
                S = len(self._mesh_shards)
                parts = []
                for s, sh in enumerate(self._mesh_shards):
                    sh.keeper.flush()
                    v = np.asarray(sh.keeper.valid)
                    loc = np.flatnonzero(v if condition == _CT.ANY else ~v)
                    parts.append(loc.astype(np.int64) * S + s)
                ids = np.sort(np.concatenate(parts)) if parts else \
                    np.empty(0, dtype=np.int64)
                return SelectKeyResult(ids)
        return super().select_key(condition, values, **kw)

    def memstat(self) -> dict:
        if self._mesh_shards is not None:
            st = {"name": self.name, "vectors": 0, "capacity": 0,
                  "data_size": 0, "levels": -1, "shards": 0}
            for sh in self._mesh_shards:
                sub = sh.memstat()
                st["vectors"] += sub["vectors"]
                st["capacity"] += sub["capacity"]
                st["data_size"] += sub["data_size"]
                st["levels"] = max(st["levels"], sub["levels"])
                st["shards"] += 1
            st["unique_keys_count"] = st["vectors"]
            return st
        st = super().memstat()
        st["levels"] = int(self._max_level)
        st["data_size"] += int(self._links0.nbytes
                               + sum(u.nbytes for u in self._upper))
        return st

    def state_dict(self) -> dict:
        if self._mesh_shards is not None:
            return {"mesh_shards": [sh.state_dict()
                                    for sh in self._mesh_shards]}
        self._commit()
        n = len(self._levels)
        return {
            "keeper": self.keeper.state_dict(),
            "levels": self._levels.copy(),
            "deleted": self._deleted.copy(),
            "links0": self._links0.copy(),
            "upper": [u.copy() for u in self._upper],
            "host_vecs": self._host_vecs.copy(),
            "entry": self._entry,
            "max_level": self._max_level,
        }

    def load_state_dict(self, state: dict) -> None:
        if "mesh_shards" in state:
            if self._mesh_shards is None or \
                    len(self._mesh_shards) != len(state["mesh_shards"]):
                raise ParamsError(
                    "mesh HNSW snapshot needs the same mesh attached "
                    f"({len(state['mesh_shards'])} shards)")
            for sh, st in zip(self._mesh_shards, state["mesh_shards"]):
                sh.load_state_dict(st)
            self._mesh_packed = None
            return
        self.clear()
        self.keeper.load_state_dict(state["keeper"])
        self._levels = np.asarray(state["levels"], dtype=np.int32)
        self._deleted = np.asarray(state["deleted"], dtype=np.bool_)
        self._links0 = np.asarray(state["links0"], dtype=np.int32)
        self._upper = [np.asarray(u, dtype=np.int32)
                       for u in state["upper"]]
        self._host_vecs = np.asarray(state["host_vecs"], dtype=np.float32)
        self._entry = int(state["entry"])
        self._max_level = int(state["max_level"])
        self._full_sync = True
