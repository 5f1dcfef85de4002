"""Device-resident vector storage with capacity doubling.

The TPU analog of the reference's vector data holder
(cpp_src/core/keyvalue/float_vectors_keeper.cc + hnswlib's data_level0
storage): vectors live in one [capacity, dims] fp32 device array indexed by
namespace row id, with a validity mask for empty/deleted vectors (reference:
FloatVectorIndex empty-vector bookkeeping, float_vector_index.h:45) and a
precomputed |b|^2 column for L2. Capacity doubles like the reference's
ResizeIndex (hnswalg.h:1197).

Mutations buffer on host and flush to device in bucketed batched scatters so
jit re-traces stay bounded (power-of-2 padded batch shapes).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.errors import ParamsError
from ...core.type_consts import VectorMetric
from ...ops.distance import normalize_rows

_MIN_CAPACITY = 2048
_MAX_SCATTER_BUCKET = 8192


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter(data, valid, sq, rows, vals, val_flags, val_sq):
    data = data.at[rows].set(vals, mode="drop")
    valid = valid.at[rows].set(val_flags, mode="drop")
    sq = sq.at[rows].set(val_sq, mode="drop")
    return data, valid, sq


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_invalidate(valid, rows):
    return valid.at[rows].set(False, mode="drop")


@functools.partial(jax.jit, static_argnames=("l2", "big"))
def _sq_eff_jit(valid, sq, l2, big):
    base = sq if l2 else jnp.zeros_like(sq)
    return jnp.where(valid, base, jnp.float32(big))


def _bucket(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return min(b, _MAX_SCATTER_BUCKET)


class VectorKeeper:
    def __init__(self, dims: int, metric: VectorMetric,
                 start_size: int = _MIN_CAPACITY,
                 zero_on_remove: bool = False):
        """zero_on_remove=True additionally ZEROES removed rows' data+sq —
        the invariant the Pallas fused scan requires (ops/pallas_scan.py
        treats sumsq==0 rows as invalid). Graph indexes keep stale data
        instead (mark-deleted nodes stay traversable, hnswalg.h markDelete).
        """
        if dims <= 0:
            raise ParamsError("vector dims must be > 0")
        self.dims = dims
        self.metric = metric
        self.zero_on_remove = zero_on_remove
        cap = _MIN_CAPACITY
        while cap < start_size:
            cap *= 2
        self.capacity = cap
        self.data = jnp.zeros((cap, dims), dtype=jnp.float32)
        self.valid = jnp.zeros((cap,), dtype=jnp.bool_)
        self.sq = jnp.zeros((cap,), dtype=jnp.float32)
        self.count = 0  # number of valid vectors (maintained incrementally)
        self._pending: dict[int, Optional[np.ndarray]] = {}
        self.upload_bf16 = False
        self._max_row = -1
        self._sq_eff = None   # (key, array) cache for sq_eff()
        # engine-integrated sharding (parallel/context.MeshContext): when
        # attached, the device arrays stay ROW-SHARDED over the mesh so
        # mesh-aware scans run shard_map programs over resident partitions
        self.mesh_ctx = None
        # optional single-device pin (per-shard sub-indexes place their
        # keeper on their own chip so builds dispatch in parallel)
        self.device = None

    # --- placement (engine-integrated P8 sharding) -----------------------
    def attach_mesh(self, ctx) -> None:
        """Row-shard the device arrays over the mesh. Capacities are pow2
        (>= 2048), so any pow2 shard count divides every capacity."""
        if ctx is None or ctx.n_shards <= 1:
            return
        if self.capacity % ctx.n_shards:
            raise ParamsError(
                f"mesh shard count {ctx.n_shards} must divide the keeper "
                f"capacity {self.capacity} (use a power-of-two mesh)")
        self.mesh_ctx = ctx
        self._replace()

    def _replace(self) -> None:
        """Re-apply the configured placement (mesh row-sharding or a
        single-device pin) after a fresh full-array upload. Scattered
        updates keep their operands' placement, so this is cheap for the
        incremental paths and a real reshard only after rebuilds."""
        if self.mesh_ctx is not None:
            self.data = self.mesh_ctx.shard_rows(self.data)
            self.valid = self.mesh_ctx.shard_rows(self.valid)
            self.sq = self.mesh_ctx.shard_rows(self.sq)
            self._sq_eff = None
        elif self.device is not None:
            self.data = jax.device_put(self.data, self.device)
            self.valid = jax.device_put(self.valid, self.device)
            self.sq = jax.device_put(self.sq, self.device)
            self._sq_eff = None

    # --- mutation -------------------------------------------------------
    def set(self, row_id: int, vec: Optional[np.ndarray]) -> None:
        """Upsert a vector (None => empty vector, excluded from KNN)."""
        if vec is not None:
            vec = np.asarray(vec, dtype=np.float32).reshape(-1)
            if vec.shape[0] != self.dims:
                raise ParamsError(
                    f"vector dims mismatch: got {vec.shape[0]}, index has {self.dims}")
            if self.metric == VectorMetric.COSINE:
                vec = normalize_rows(vec[None, :])[0]
            if self.zero_on_remove and not vec.any():
                # an exactly-zero vector would read as "removed" to the
                # fused scan; nudge one component by a denormal-scale value
                # (score impact ~1e-30, far below fp32 rounding)
                vec = vec.copy()
                vec[0] = 1e-30
        self._pending[row_id] = vec
        self._max_row = max(self._max_row, row_id)

    def remove(self, row_id: int) -> None:
        self._pending[row_id] = None
        self._max_row = max(self._max_row, row_id)

    # --- device sync ----------------------------------------------------
    def _grow_to(self, need: int) -> None:
        if need <= self.capacity:
            return
        cap = self.capacity
        while cap < need:
            cap *= 2
        pad_rows = cap - self.capacity
        self.data = jnp.concatenate(
            [self.data, jnp.zeros((pad_rows, self.dims), dtype=jnp.float32)])
        self.valid = jnp.concatenate(
            [self.valid, jnp.zeros((pad_rows,), dtype=jnp.bool_)])
        self.sq = jnp.concatenate(
            [self.sq, jnp.zeros((pad_rows,), dtype=jnp.float32)])
        self.capacity = cap
        self._replace()

    def flush(self) -> None:
        """Apply pending host mutations to the device arrays.

        Removed rows only clear the `valid` flag — the stale vector data is
        kept so graph indexes can keep traversing mark-deleted nodes
        (reference: hnswlib mark-delete keeps the point's data,
        hnswalg.h markDelete)."""
        if not self._pending:
            return
        self._grow_to(self._max_row + 1)
        items = sorted(self._pending.items())
        self._pending.clear()
        set_items = [(r, v) for r, v in items if v is not None]
        del_rows = np.asarray([r for r, v in items if v is None],
                              dtype=np.int32)
        fresh = self.count == 0
        if fresh:
            prev_valid_sum = 0
        else:
            all_rows = np.fromiter((r for r, _ in items), dtype=np.int32,
                                   count=len(items))
            prev_valid_sum = int(np.asarray(self.valid)[all_rows].sum())
        self.count += len(set_items) - prev_valid_sum

        if fresh and set_items:
            # initial build: compose on host, upload once — no scatter
            # programs at all (an unbucketed scatter shape costs a
            # multi-minute remote compile per distinct size)
            rows = np.fromiter((r for r, _ in set_items), dtype=np.int32,
                               count=len(set_items))
            data = np.zeros((self.capacity, self.dims), dtype=np.float32)
            valid = np.zeros((self.capacity,), dtype=np.bool_)
            data[rows] = np.stack([v for _, v in set_items])
            valid[rows] = True
            self.data = jnp.asarray(data)
            self.valid = jnp.asarray(valid)
            self.sq = jnp.asarray(np.sum(data * data, axis=1,
                                         dtype=np.float32))
            self._replace()
            return

        if len(del_rows):
            bucket = _bucket(len(del_rows))
            if bucket > len(del_rows):
                del_rows = np.concatenate(
                    [del_rows, np.repeat(del_rows[:1], bucket - len(del_rows))])
            if self.zero_on_remove:
                z = np.zeros((len(del_rows), self.dims), dtype=np.float32)
                self.data, self.valid, self.sq = _scatter(
                    self.data, self.valid, self.sq, jnp.asarray(del_rows),
                    jnp.asarray(z),
                    jnp.zeros(len(del_rows), dtype=jnp.bool_),
                    jnp.zeros(len(del_rows), dtype=jnp.float32))
            else:
                self.valid = _scatter_invalidate(self.valid,
                                                 jnp.asarray(del_rows))
        if set_items:
            rows = np.fromiter((r for r, _ in set_items), dtype=np.int32,
                               count=len(set_items))
            vals = np.stack([v for _, v in set_items]).astype(np.float32)
            # chunked pow2-bucketed scatters: shapes stay in a small warm
            # set regardless of how many rows a flush carries
            for i in range(0, len(rows), _MAX_SCATTER_BUCKET):
                r = rows[i: i + _MAX_SCATTER_BUCKET]
                v = vals[i: i + _MAX_SCATTER_BUCKET]
                f = np.ones((len(r),), dtype=np.bool_)
                bucket = _bucket(len(r))
                if bucket > len(r):
                    pad = bucket - len(r)
                    r = np.concatenate([r, np.repeat(r[:1], pad)])
                    v = np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
                    f = np.concatenate([f, np.repeat(f[:1], pad)])
                sq = np.sum(v * v, axis=1, dtype=np.float32)
                self.data, self.valid, self.sq = _scatter(
                    self.data, self.valid, self.sq,
                    jnp.asarray(r), jnp.asarray(v), jnp.asarray(f),
                    jnp.asarray(sq))

    def clear(self) -> None:
        self._pending.clear()
        self._max_row = -1
        self.count = 0
        self.data = jnp.zeros((self.capacity, self.dims), dtype=jnp.float32)
        self.valid = jnp.zeros((self.capacity,), dtype=jnp.bool_)
        self.sq = jnp.zeros((self.capacity,), dtype=jnp.float32)
        self._replace()

    def bulk_load(self, matrix: np.ndarray, start_row: int = 0) -> None:
        """Bulk ingest a [N, dims] block in one device transfer — the fast
        path for loaders/benchmarks (the per-row set() path exists for the
        normal modify pipeline)."""
        matrix = np.ascontiguousarray(matrix, dtype=np.float32)
        if matrix.ndim != 2 or matrix.shape[1] != self.dims:
            raise ParamsError("bulk_load expects [N, dims] float32")
        if self.metric == VectorMetric.COSINE:
            matrix = normalize_rows(matrix)
        n = matrix.shape[0]
        self.flush()
        self._grow_to(start_row + n)
        if self.count == 0:
            # fresh keeper: compose on host, upload once — zero device
            # compiles (eager slice-sets cost a remote compile per distinct
            # shape through the tunnel)
            data = np.zeros((self.capacity, self.dims), dtype=np.float32)
            valid = np.zeros((self.capacity,), dtype=np.bool_)
            data[start_row: start_row + n] = matrix
            valid[start_row: start_row + n] = True
            if self.upload_bf16:
                # halve the host->device transfer for approximate indexes
                # (IVF sets this: a 1M x 768 fp32 base is a 3 GB upload
                # through the tunnel, dominating training time): ship bf16,
                # widen on device; sq below comes from the ROUNDED data so
                # stored vectors and cached norms stay consistent
                import ml_dtypes
                data = np.asarray(
                    data.astype(ml_dtypes.bfloat16).astype(np.float32))
                self.data = jnp.asarray(
                    data.astype(ml_dtypes.bfloat16)).astype(jnp.float32)
            else:
                self.data = jnp.asarray(data)
            self.valid = jnp.asarray(valid)
            self.sq = jnp.asarray(
                np.sum(data * data, axis=1, dtype=np.float32))
            self.count = n
            self._max_row = max(self._max_row, start_row + n - 1)
            self._replace()
            return
        prev_valid = int(np.asarray(self.valid[start_row: start_row + n]).sum())
        self.data = self.data.at[start_row: start_row + n].set(
            jnp.asarray(matrix))
        self.valid = self.valid.at[start_row: start_row + n].set(True)
        self.sq = self.sq.at[start_row: start_row + n].set(
            jnp.asarray(np.sum(matrix * matrix, axis=1, dtype=np.float32)))
        self.count += n - prev_valid
        self._max_row = max(self._max_row, start_row + n - 1)

    def sq_eff(self) -> jnp.ndarray:
        """f32[capacity]: |b|^2 (L2) or 0 (IP/cosine) for valid rows,
        +SQ_EFF_BIG for invalid — the score-correction input of the fused
        scan (ops/pallas_scan.py). Cached per device-array identity."""
        from ...ops.pallas_scan import SQ_EFF_BIG
        key = (id(self.valid), id(self.sq))
        if self._sq_eff is None or self._sq_eff[0] != key:
            self._sq_eff = (key, _sq_eff_jit(self.valid, self.sq,
                                             self.metric == VectorMetric.L2,
                                             SQ_EFF_BIG))
        return self._sq_eff[1]

    # --- access ---------------------------------------------------------
    def prepare_query(self, vec: np.ndarray) -> np.ndarray:
        vec = np.asarray(vec, dtype=np.float32).reshape(-1)
        if vec.shape[0] != self.dims:
            raise ParamsError(
                f"query vector dims mismatch: got {vec.shape[0]}, index has {self.dims}")
        if self.metric == VectorMetric.COSINE:
            vec = normalize_rows(vec[None, :])[0]
        return vec

    def get_host(self, row_id: int) -> Optional[np.ndarray]:
        if row_id in self._pending:
            v = self._pending[row_id]
            return None if v is None else v.copy()
        if row_id >= self.capacity:
            return None
        if not bool(self.valid[row_id]):
            return None
        return np.asarray(self.data[row_id])

    def memstat(self) -> dict:
        return {
            "vectors": self.count,
            "capacity": self.capacity,
            "data_size": int(self.capacity * self.dims * 4),
        }

    def state_dict(self) -> dict:
        self.flush()
        return {
            "data": np.asarray(self.data[: self._max_row + 1]),
            "valid": np.asarray(self.valid[: self._max_row + 1]),
        }

    def load_state_dict(self, state: dict) -> None:
        data = np.asarray(state["data"], dtype=np.float32)
        valid = np.asarray(state["valid"], dtype=np.bool_)
        self.clear()
        self._grow_to(data.shape[0])
        n = data.shape[0]
        if n:
            # restart path: compose on host, upload once (no device compiles)
            full = np.zeros((self.capacity, self.dims), dtype=np.float32)
            vfull = np.zeros((self.capacity,), dtype=np.bool_)
            full[:n] = data
            vfull[:n] = valid
            if self.zero_on_remove:
                full[:n][~valid] = 0.0
            self.data = jnp.asarray(full)
            self.valid = jnp.asarray(vfull)
            self.sq = jnp.asarray(
                np.sum(full * full, axis=1, dtype=np.float32))
            self.count = int(valid.sum())
            self._max_row = n - 1
            self._replace()
