"""IVF vector index — two-stage matmul (centroid scan -> list scan).

(Temporary scaffold: currently answers via the exact brute-force engine so
behavior is correct end-to-end; the device k-means + nprobe engine lands in
ops/ivf_kernels.py — see SURVEY.md §7 stage 4.)
"""
from __future__ import annotations

from .brute_force import BruteForceIndex


class IvfIndex(BruteForceIndex):
    pass
