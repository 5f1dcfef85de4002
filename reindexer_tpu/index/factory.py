"""Index factory (reference: Index::New switch, cpp_src/core/index/index.cc:80-115)."""
from __future__ import annotations

from ..core.errors import ParamsError
from ..core.payload import IndexDef
from ..core.type_consts import FieldType, IndexType
from .base import Index
from .scalar import (CompositeIndex, HashIndex, StoreIndex, TreeIndex,
                     TtlIndex, UuidIndex)


def create_index(idef: IndexDef, mesh_ctx=None) -> Index:
    """mesh_ctx (parallel/context.MeshContext): when the database runs on a
    device mesh, every mesh-aware index (vector engines, full-text) is
    switched into mesh-resident mode at creation — the ShardingProxy analog
    (reference: core/shardingproxy.cc wraps every index behind the proxy)."""
    idx = _create(idef)
    if mesh_ctx is not None and hasattr(idx, "attach_mesh"):
        idx.attach_mesh(mesh_ctx)
    return idx


def _create(idef: IndexDef) -> Index:
    if idef.is_composite:
        return CompositeIndex(idef, ordered=idef.index_type == IndexType.TREE)
    if idef.index_type == IndexType.HASH:
        if idef.field_type == FieldType.UUID:
            # dedicated 128-bit-key UUID index (uuid_index.cc)
            return UuidIndex(idef)
        return HashIndex(idef)
    if idef.index_type == IndexType.TREE:
        return TreeIndex(idef)
    if idef.index_type == IndexType.STORE:
        return StoreIndex(idef)
    if idef.index_type == IndexType.TTL:
        if idef.opts.expire_after <= 0:
            raise ParamsError("ttl index requires opts.expire_after > 0")
        return TtlIndex(idef)
    if idef.index_type == IndexType.RTREE:
        from .rtree import RTreeIndex
        return RTreeIndex(idef)
    if idef.index_type == IndexType.TEXT:
        from .text import FullTextIndex
        return FullTextIndex(idef)
    if idef.index_type in (IndexType.VEC_BF, IndexType.HNSW, IndexType.IVF):
        if idef.index_type == IndexType.VEC_BF:
            from .vector.brute_force import BruteForceIndex
            inner = BruteForceIndex(idef)
        elif idef.index_type == IndexType.HNSW:
            from .vector.hnsw import HnswIndex
            inner = HnswIndex(idef)
        else:
            from .vector.ivf import IvfIndex
            inner = IvfIndex(idef)
        if idef.opts.is_array:
            # multiple vectors per document with per-doc dedup
            # (reference: float_vector.md:624-630 array vector indexes)
            from .vector.array_adapter import ArrayVectorIndex
            return ArrayVectorIndex(idef, inner)
        return inner
    raise ParamsError(f"unknown index type: {idef.index_type}")
