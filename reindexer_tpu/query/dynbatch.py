"""Dynamic (continuous) batching for concurrent KNN serving.

TPU-first design, no reference analog: the reference answers each query on
its own CPU threads, but on a TPU one brute-force/beam scan serves 64
queries for nearly the price of one (the scan streams the whole base from
HBM regardless of the query count — see docs/performance.md). Under
concurrent serving, per-connection single-query dispatches waste that
batch dimension; this module coalesces them.

Zero-added-latency policy: a request never waits on a timer. The first
request through an idle batcher dispatches immediately (exactly the old
single-query path, leading a batch of 1 plus anything already queued);
requests arriving while a dispatch is in flight queue up and the next
elected leader ships them all in ONE device program. Throughput scales
with concurrency; the single-stream latency is unchanged.

Only requests with identical search parameters (and no extra per-query
state) coalesce — the queue is keyed by a params fingerprint.

Kill switch: RX_TPU_DYNAMIC_BATCH=0.
"""
from __future__ import annotations

import os
import threading
from typing import Any, Optional

MAX_BATCH = 64          # queries per coalesced dispatch

# concurrent leader rounds: keeps the RTT pipeline full at low concurrency
# (solo dispatches overlap like the pre-batching design) while arrivals
# beyond the window coalesce into batches. 8 measured best at 16 conns on
# the tunnel rig: knn 325 qps vs 254 at 4 vs 194 uncoalesced (BF 65k).
MAX_INFLIGHT = int(os.environ.get("RX_TPU_DYNBATCH_INFLIGHT", "8"))

# program-shape buckets: every coalesced dispatch pads its query count to
# one of these so the tunnel compiles at most 3 shapes per params key
# (remote compiles cost 30-300s and do NOT reliably cache across
# processes — CLAUDE.md)
BUCKETS = (1, 8, MAX_BATCH)


def bucket_of(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return BUCKETS[-1]


def enabled() -> bool:
    return os.environ.get("RX_TPU_DYNAMIC_BATCH", "1") not in ("0", "false")


class PendingQuery:
    __slots__ = ("query", "result", "error", "done")

    def __init__(self, query):
        self.query = query
        self.result = None
        self.error: Optional[BaseException] = None
        self.done = False


class KnnBatcher:
    """One per (namespace, index). Threads call `join`; exactly one is
    elected leader per round and runs the device dispatch for the whole
    matching queue."""

    def __init__(self):
        self._cv = threading.Condition()
        self._queue: dict[Any, list[PendingQuery]] = {}
        self._inflight = 0
        # serving stats (exposed via #perfstats-style introspection/tests)
        self.batches = 0
        self.queries = 0
        self.max_batch = 0

    def join(self, key, p: PendingQuery, timeout: float = 30.0):
        """Enqueue `p`; block until it is resolved by another leader
        (returns None) or this thread is elected leader (returns the
        batch it must run, `p` included). MUST be called without holding
        the namespace lock (waiters park here)."""
        with self._cv:
            self._queue.setdefault(key, []).append(p)
            while True:
                if p.done:
                    return None
                if self._inflight < MAX_INFLIGHT:
                    q = self._queue.get(key, [])
                    if p in q:
                        self._inflight += 1
                        batch = q[:MAX_BATCH]
                        rest = q[MAX_BATCH:]
                        if rest:
                            self._queue[key] = rest
                        else:
                            self._queue.pop(key, None)
                        return batch
                if not self._cv.wait(timeout=timeout):
                    # stuck leader (device wedged): abandon coalescing
                    q = self._queue.get(key)
                    if q and p in q:
                        q.remove(p)
                    raise TimeoutError(
                        "dynamic batch leader did not complete")

    def finish(self, batch: list[PendingQuery], results,
               error: Optional[BaseException] = None) -> None:
        """Leader: publish results (or the error) and release leadership."""
        with self._cv:
            for i, p in enumerate(batch):
                if error is not None:
                    p.error = error
                else:
                    p.result = results[i]
                p.done = True
            self._inflight -= 1
            self.batches += 1
            self.queries += len(batch)
            self.max_batch = max(self.max_batch, len(batch))
            self._cv.notify_all()
