"""HNSW vector index — batched beam search over a padded neighbor table.

(Temporary scaffold: currently answers via the exact brute-force engine so
behavior is correct end-to-end; the device graph engine lands in
ops/hnsw_kernels.py — see SURVEY.md §7 stage 4.)
"""
from __future__ import annotations

from .brute_force import BruteForceIndex


class HnswIndex(BruteForceIndex):
    pass
