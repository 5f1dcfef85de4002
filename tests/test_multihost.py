"""Multi-host mesh test (SURVEY §4 implication (d)): two OS processes, each
with 4 virtual CPU devices, joined by jax.distributed into one 8-device
runtime; the sharded KNN select and a distributed BM25 psum leg run over the
process-spanning mesh. This is the same code path a multi-host TPU pod uses
(reference analog: cross-node cproto movement, core/shardingproxy.cc)."""
import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_ROOT, "tools", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_mesh():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    # plain PYTHONPATH: site hooks (e.g. the axon tunnel's sitecustomize)
    # would initialize the XLA backend before jax.distributed.initialize
    env["PYTHONPATH"] = _ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(pid), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]
