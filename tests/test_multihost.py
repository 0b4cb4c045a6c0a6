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

import pytest

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


_SERVE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from videosd_tpu.parallel.mesh import init_distributed, make_mesh, shard_params
from videosd_tpu.parallel.serving import shard_program
from videosd_tpu.pipelines.lcm_img2img import (
    FrameSpec, ModelBundle, build_frame_program, build_prompt_encoder,
)

coord, pid = sys.argv[1], int(sys.argv[2])
n = init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert n == 8

# the ENGINE's serving-program path over a cross-host mesh: programs come
# from build_frame_program + shard_program exactly as Engine._get_program
# wires them (runtime/engine_programs.py); batch rows split over a data
# axis that spans the DCN process boundary
bundle = ModelBundle.random("tiny", dtype=jnp.float32)
mesh = make_mesh(8, model_parallel=2)
params = shard_params(bundle.params, mesh)

spec = FrameSpec(batch=4, height=64, width=64, steps=2)
prog = shard_program(build_frame_program(bundle, spec), mesh)

enc = build_prompt_encoder(bundle)
ids = jnp.asarray(bundle.tokenizer(["a cat"]), jnp.int32)
ctx, _ = enc(bundle.params, ids)
embeds = jnp.concatenate([ctx] * 4, axis=0)
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8))
args = (
    jnp.full((4,), 0.6, jnp.float32),
    jnp.full((4,), 5.0, jnp.float32),
    jnp.full((4,), 2.0, jnp.float32),
    jnp.arange(4, dtype=jnp.int32),
)
out, lat = prog(params, frames, embeds, *args)

# single-device reference on the same process (identical math modulo
# partitioning; fp32 => exact row equality expected, matching the
# dp-serving equality tests in tests/test_parallel.py)
ref_out, _ = build_frame_program(bundle, spec)(bundle.params, frames, embeds, *args)
local = [s for s in out.addressable_shards]
for s in local:
    rows = np.asarray(s.data)
    want = np.asarray(ref_out[s.index])
    np.testing.assert_array_equal(rows, want)
assert len(local) > 0
print("MULTIHOST_SERVE_OK", pid)
"""


@pytest.mark.slow
def test_two_process_serving_program(tmp_path):
    """The documented DCN growth path covers SERVING, not just
    collectives/training: one sharded frame-program batch executes across
    a 2-process jax.distributed CPU cluster with per-shard outputs equal
    to the single-device program (VERDICT r4 next #8)."""
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SERVE_WORKER, addr, str(i)],
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
            out, _ = p.communicate(timeout=560)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MULTIHOST_SERVE_OK {i}" in out, out
