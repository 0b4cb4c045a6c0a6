"""Device mesh + sharding rules — the TPU replacement for Ray actors.

The reference scales by replicating the whole model into one Ray actor per
GPU and RPC-ing frames at them (diffusert/videopipeline.py:11,
server.py:317-321).  Here scaling is a ``jax.sharding.Mesh`` with axes
``("data", "model")``:

* ``data``  — batch dimension of the frame program / train step (the
  analog of the reference's frame-level data parallelism, but within ONE
  jitted program so XLA rides ICI, not host RPC),
* ``model`` — tensor parallelism over attention heads and MLP hidden dims
  for configs that don't fit or need lower latency (SDXL 1024²).

Pipeline parallelism lives in parallel/pipe.py (a 2-stage UNet waist
split over disjoint submeshes — the capacity lever for SDXL-1024²-class
configs; config ``mesh_pipe``).  Sequence/expert parallelism are
intentionally absent, matching the reference's inventory (SURVEY.md
§2.4): its max sequence is 77 text tokens (the spatial analog is VAE
tiling, ops/tiling.py).
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed",
    "make_mesh",
    "PARAM_RULES",
    "param_spec",
    "shard_params",
    "data_sharding",
    "replicated",
]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Multi-host (DCN) initialization via jax.distributed.

    Single-host slices (v5e-8) need none of this — one process drives all
    chips over ICI.  For multi-host scale-out call this once per host
    before building meshes (args default from the TPU environment).
    Returns the global device count.  This is the entire replacement for
    the reference's Ray cluster bring-up (SURVEY.md §2.4 comm backend).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return len(jax.devices())


def make_mesh(
    n_devices: int | None = None, *, model_parallel: int = 1, devices=None
) -> Mesh:
    """Mesh with ("data","model") axes; data = n_devices // model_parallel."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


# Param-path regex -> PartitionSpec for tensor parallelism.  Matmul-heavy
# params shard over "model"; convs/norms/embeddings replicate (conv channel
# sharding buys little for SD-scale convs and costs halo exchanges).
# Kernel layouts: linear kernels are [in, out]; shard attention QKV + FF-in
# on the OUT dim and attention-out + FF-out on the IN dim so each pair
# (column-parallel then row-parallel) needs a single psum at block end —
# the Megatron layout expressed as shardings, XLA inserts the collectives.
PARAM_RULES: list[tuple[str, P]] = [
    (r"(to_q|to_k|to_v|q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    # pre-concatenated QKV/KV weights (unet.precat_attention_weights):
    # column-parallel like their components — GSPMD handles the traced
    # split on the sharded concat dim
    (r"(wqkv|wkv)$", P(None, "model")),
    (r"(to_out|out_proj)/kernel$", P("model", None)),
    (r"ff/proj/kernel$", P(None, "model")),
    (r"ff/out/kernel$", P("model", None)),
    (r"mlp/fc1/kernel$", P(None, "model")),
    (r"mlp/fc2/kernel$", P("model", None)),
    (r"token_embedding$", P(None, None)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_spec(path, leaf) -> P:
    s = _path_str(path)
    for pat, spec in PARAM_RULES:
        if re.search(pat, s):
            # only shard if the dim divides evenly; fall back to replicate
            return spec
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh per PARAM_RULES (replicate rest)."""
    msize = mesh.shape["model"]

    def place(path, leaf):
        spec = param_spec(path, leaf)
        # drop sharding on dims that don't divide evenly
        fixed = []
        for ax, name in enumerate(spec):
            if name == "model" and leaf.shape[ax] % msize != 0:
                name = None
            fixed.append(name)
        fixed = fixed + [None] * (leaf.ndim - len(fixed))
        sharding = NamedSharding(mesh, P(*fixed[: leaf.ndim]))
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map_with_path(place, params)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-dim sharding over the data axis for an ndim-rank array."""
    return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
