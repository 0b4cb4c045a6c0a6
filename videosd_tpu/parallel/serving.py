"""Multi-chip serving: the frame program sharded over a device mesh.

The reference scales serving by adding Ray actors (1 process per GPU,
diffusert/server.py:317-321); here the SAME jitted frame program spans the
mesh: the frame batch shards over the ``data`` axis (each chip denoises
its share of concurrent streams) and params either replicate (SD1.5-scale)
or tensor-shard over ``model`` (SDXL 1024²) per parallel.mesh.PARAM_RULES.
XLA places the collectives on ICI; the host never touches a frame between
stages.

:func:`shard_program` is the integration point the serving Engine uses
(runtime/engine.py builds it into its per-bucket program cache when
``config.gpus > 1``); :class:`ShardedFrameEngine` is the standalone
wrapper for scripts/offline use.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from videosd_tpu.parallel.mesh import make_mesh, shard_params
from videosd_tpu.pipelines.lcm_img2img import (
    FrameSpec,
    ModelBundle,
    build_frame_program,
)

__all__ = ["ShardedFrameEngine", "shard_program"]


def shard_program(base, mesh):
    """Wrap a jitted frame program so every batch-leading input is placed
    batch-sharded over the mesh's ``data`` axis before the call.

    ``params`` (first positional) must already be mesh-placed (see
    parallel.mesh.shard_params); everything else — frames, embeds,
    per-element sliders, seeds, warm latents, source boxes — is [B, ...]
    with B a multiple of the data-axis size, so a P("data") placement
    splits rows across chips and XLA partitions the whole program (GSPMD).
    The underlying jit function stays reachable as ``.base`` / ``._base``
    for AOT relowering (hlo symbolization).
    """
    data = NamedSharding(mesh, P("data"))

    def put(x):
        return None if x is None else jax.device_put(x, data)

    def sharded(params, *batch_args, **batch_kwargs):
        return base(
            params,
            *[put(a) for a in batch_args],
            **{k: put(v) for k, v in batch_kwargs.items()},
        )

    sharded._base = base
    sharded.base = base
    return sharded


class ShardedFrameEngine:
    """Owns mesh-placed params + per-bucket sharded frame programs.

    batch sizes must be multiples of the data-axis size so each chip gets
    equal work (the engine's bucket table should be built accordingly).
    """

    def __init__(
        self,
        bundle: ModelBundle,
        *,
        n_devices: int | None = None,
        model_parallel: int = 1,
    ):
        self.bundle = bundle
        self.mesh = make_mesh(n_devices, model_parallel=model_parallel)
        self.params = shard_params(bundle.params, self.mesh)
        self._programs: dict[FrameSpec, object] = {}

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    def program(self, spec: FrameSpec):
        if spec.batch % self.data_size:
            raise ValueError(
                f"batch {spec.batch} must be a multiple of data axis {self.data_size}"
            )
        prog = self._programs.get(spec)
        if prog is None:
            prog = shard_program(build_frame_program(self.bundle, spec), self.mesh)
            self._programs[spec] = prog
        return prog

    def run(self, spec: FrameSpec, frame_u8, embeds, strength, guidance, cn, seed, **kw):
        """kw: warm_latents/warm_alpha (temporal warm-start), pooled_embeds
        (SDXL text_time), src_box (true camera extents), all sharded over
        the data axis."""
        return self.program(spec)(
            self.params, frame_u8, embeds, strength, guidance, cn, seed, **kw
        )
