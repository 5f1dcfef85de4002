"""bench.py must never crash in the driver capture (VERDICT r3 #2: a
NameError in a branchy extra silently dropped the round's SQ8 record).

Two layers of defense:
  1. an AST undefined-name check over every function in bench.py and
     __graft_entry__.py — catches missing imports in branches that only
     trace on real TPU hardware (pyflakes is not in the image);
  2. CPU-mode execution smokes that run each cheap bench function
     end-to-end (the XLA fallback branches).
"""
import ast
import builtins
import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _bound_names(node):
    """All names bound anywhere inside `node` (over-approximation: ignores
    use-before-assign ordering — we only hunt globally-undefined names)."""
    bound = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Name) and isinstance(n.ctx, (ast.Store, ast.Del)):
            bound.add(n.id)
        elif isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
            bound.add(n.name)
            a = n.args
            for arg in (a.posonlyargs + a.args + a.kwonlyargs
                        + ([a.vararg] if a.vararg else [])
                        + ([a.kwarg] if a.kwarg else [])):
                bound.add(arg.arg)
        elif isinstance(n, ast.Lambda):
            a = n.args
            for arg in (a.posonlyargs + a.args + a.kwonlyargs
                        + ([a.vararg] if a.vararg else [])
                        + ([a.kwarg] if a.kwarg else [])):
                bound.add(arg.arg)
        elif isinstance(n, ast.ClassDef):
            bound.add(n.name)
        elif isinstance(n, (ast.Import, ast.ImportFrom)):
            for alias in n.names:
                name = alias.asname or alias.name.split(".")[0]
                bound.add(name)
        elif isinstance(n, ast.ExceptHandler) and n.name:
            bound.add(n.name)
        elif isinstance(n, ast.MatchAs) and n.name:
            bound.add(n.name)
    return bound


def _undefined_names(path):
    tree = ast.parse(path.read_text())
    module_bound = _bound_names(tree) | set(dir(builtins)) | {"__file__",
                                                              "__name__"}
    problems = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        visible = module_bound | _bound_names(fn)
        for n in ast.walk(fn):
            if (isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
                    and n.id not in visible):
                problems.append(f"{path.name}:{n.lineno} function "
                                f"{fn.name}: undefined name '{n.id}'")
    return problems


@pytest.mark.parametrize("fname", ["bench.py", "__graft_entry__.py"])
def test_no_undefined_names(fname):
    problems = _undefined_names(ROOT / fname)
    assert not problems, "\n".join(problems)


@pytest.fixture(scope="module")
def bench():
    sys.path.insert(0, str(ROOT))
    import bench as mod
    yield mod
    sys.path.remove(str(ROOT))


def test_bench_bf_smoke_cpu(bench):
    out = bench.bench_bf(smoke=True)
    assert out["value"] > 0
    assert out["metric"].startswith("bf_knn")


def test_bench_bf_quantized_smoke_cpu(bench):
    bench.bench_bf_quantized(smoke=True)     # must not raise (VERDICT r3 #2)


def test_bench_ft_smoke_cpu(bench):
    bench.bench_ft(smoke=True)


def test_bench_hnsw_smoke_cpu(bench):
    bench.bench_hnsw(smoke=True)
