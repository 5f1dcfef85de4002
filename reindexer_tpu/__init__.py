"""reindexer_tpu — a TPU-native index-and-query engine.

A ground-up re-design of the capabilities of Restream/reindexer (an
embeddable document database with secondary indexes, BM25 full-text search,
vector KNN indexes and hybrid fusion) for TPU hardware: the search core runs
as device-resident batched JAX/XLA/Pallas kernels, sharded across chips with
collective top-k merges.

Public API mirrors the reference's embedded engine (core/reindexer.h) and Go
builder (query.go):

    from reindexer_tpu import Reindexer, Query, IndexDef, IndexOpts
    db = Reindexer()
    db.open_namespace("items", [IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    db.upsert("items", {"id": 1, "vec": [0.1] * 128})
    res = db.select(Query("items").where_knn("vec", qvec, HnswSearchParams(k=10, ef=50)))
"""
import os as _os

if _os.environ.get("RX_TPU_COMPILE_CACHE", "1") not in ("0", "false"):
    # persistent XLA compile cache: restarts reuse compiled search kernels
    # (multi-minute remote compiles otherwise; see CLAUDE.md). Safe no-op if
    # jax is configured already.
    try:
        import jax as _jax
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .core.database import Reindexer
from .core.errors import (ConflictError, LogicError, NotFoundError, ParamsError,
                          QueryCanceledError, QueryError, QueryTimeoutError,
                          ReindexerError, StorageError)
from .core.rdxcontext import RdxContext
from .core import rdxcontext
from .core.payload import (EmbeddingConfig, FloatVectorOpts, IndexDef, IndexOpts,
                           QuantizationConfig)
from .core.transaction import Transaction
from .core.type_consts import (AggType, CondType, FieldType, IndexType, OpType,
                               StrictMode, VectorMetric)
from .index.vector.params import (BruteForceSearchParams, HnswSearchParams,
                                  IvfSearchParams, KnnSearchParams)
from .query.query import JoinType, Query, SortingEntry
from .query.results import QueryResults, ResultItem

__version__ = "0.1.0"

__all__ = [
    "Reindexer", "Query", "QueryResults", "ResultItem", "Transaction",
    "IndexDef", "IndexOpts", "FloatVectorOpts", "QuantizationConfig",
    "EmbeddingConfig", "KnnSearchParams", "BruteForceSearchParams",
    "HnswSearchParams", "IvfSearchParams", "JoinType", "SortingEntry",
    "CondType", "OpType", "IndexType", "FieldType", "AggType", "VectorMetric",
    "StrictMode", "ReindexerError", "QueryError", "ParamsError",
    "NotFoundError", "ConflictError", "LogicError", "StorageError",
    "QueryCanceledError", "QueryTimeoutError", "RdxContext", "rdxcontext",
]
