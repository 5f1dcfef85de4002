"""Native (C++) host components, built on demand with the system compiler.

The reference implements its host hot paths in C++ (SURVEY.md §2.2); this
package holds the TPU build's native equivalents. Modules compile lazily on
first use into __pycache__ of this directory; import failures degrade to the
pure-Python implementations (same semantics, slower).
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
import threading

_BUILD_LOCK = threading.Lock()
_DIR = os.path.dirname(os.path.abspath(__file__))


def _so_path(name: str) -> str:
    tag = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_DIR, "__pycache__", name + tag)


def _build(name: str, source: str) -> str:
    out = _so_path(name)
    src = os.path.join(_DIR, source)
    if os.path.isfile(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-march=native",
        "-funroll-loops", "-fPIC", "-shared",
        "-std=c++17", f"-I{include}", src, "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load(name: str, source: str):
    """Compile (if needed) and import a native module; returns the module or
    None when no compiler is available."""
    with _BUILD_LOCK:
        try:
            path = _build(name, source)
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            return None
        spec = importlib.util.spec_from_file_location(name, path)
        if spec is None or spec.loader is None:
            return None
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
        except ImportError:
            return None
        return mod
