"""Multi-chip serving: the frame program sharded over a device mesh.

The reference scales serving by adding Ray actors (1 process per GPU,
diffusert/server.py:317-321); here the SAME jitted frame program spans the
mesh: the frame batch shards over the ``data`` axis (each chip denoises
its share of concurrent streams) and params either replicate (SD1.5-scale)
or tensor-shard over ``model`` (SDXL 1024²) per parallel.mesh.PARAM_RULES.
XLA places the collectives on ICI; the host never touches a frame between
stages.
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

__all__ = ["ShardedFrameEngine"]


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

    def _in_shardings(self):
        mesh = self.mesh
        batch = NamedSharding(mesh, P("data"))
        return batch

    def program(self, spec: FrameSpec):
        if spec.batch % self.data_size:
            raise ValueError(
                f"batch {spec.batch} must be a multiple of data axis {self.data_size}"
            )
        prog = self._programs.get(spec)
        if prog is None:
            base = build_frame_program(self.bundle, spec)
            mesh = self.mesh
            data = NamedSharding(mesh, P("data"))

            def sharded(
                params,
                frame_u8,
                embeds,
                strength,
                guidance,
                cn,
                seed,
                warm_latents=None,
                warm_alpha=None,
                pooled_embeds=None,
            ):
                put = lambda x: None if x is None else jax.device_put(x, data)  # noqa: E731
                return base(
                    params,
                    put(frame_u8),
                    put(embeds),
                    put(strength),
                    put(guidance),
                    put(cn),
                    put(seed),
                    warm_latents=put(warm_latents),
                    warm_alpha=put(warm_alpha),
                    pooled_embeds=put(pooled_embeds),
                )

            self._programs[spec] = sharded
            prog = sharded
        return prog

    def run(self, spec: FrameSpec, frame_u8, embeds, strength, guidance, cn, seed, **kw):
        """kw: warm_latents/warm_alpha (temporal warm-start) and
        pooled_embeds (SDXL text_time), all sharded over the data axis."""
        return self.program(spec)(
            self.params, frame_u8, embeds, strength, guidance, cn, seed, **kw
        )
