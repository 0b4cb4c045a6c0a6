"""Multi-host (DCN) path: a REAL 2-process jax.distributed CPU cluster.

The reference's multi-machine story is a Ray cluster (SURVEY.md §2.4);
ours is jax.distributed + a global mesh.  This test forms an actual
2-process cluster (4 virtual CPU devices per process -> 8 global), builds
the framework's ("data","model") mesh across hosts, and runs a sharded
computation whose collective spans the process boundary — validating the
documented growth path mechanically, not just in prose
(videosd_tpu/parallel/mesh.py:init_distributed).
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from videosd_tpu.parallel.mesh import init_distributed, make_mesh

coord, pid = sys.argv[1], int(sys.argv[2])
n = init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert n == 8, f"global devices {n}"
assert len(jax.local_devices()) == 4

mesh = make_mesh(8, model_parallel=2)
assert mesh.shape == {"data": 4, "model": 2}

# a data-sharded global batch reduced over the data axis: the psum crosses
# the process boundary (hosts hold disjoint device subsets)
from jax import shard_map

full = np.arange(8.0, dtype=np.float32)
xs = jax.make_array_from_callback(
    (8,), NamedSharding(mesh, P("data")), lambda idx: full[idx]
)

def f(x):
    return jax.lax.psum(x, axis_name="data")

y = jax.jit(
    shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P()),
)(xs)
got = np.asarray(jax.device_get(y))
# psum over data groups of the [8] vector reshaped to (4 data, 2 model):
# each data column sums elements {k, k+2, k+4, k+6}
expected = np.array([0 + 2 + 4 + 6, 1 + 3 + 5 + 7], np.float32)
np.testing.assert_allclose(got, expected)
print("MULTIHOST_OK", pid)
"""


def test_two_process_cpu_cluster(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=280)
            outs.append(out.decode())
    finally:
        # a TimeoutExpired above must not leak worker processes (a hung
        # jax.distributed pair would otherwise outlive the test run)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i}" in out, out
