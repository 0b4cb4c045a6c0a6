"""Engine: compiled-program cache + async multi-stream micro-batcher.

This replaces the reference's L2+L3 (Ray actor pool + busy-flag scheduler,
diffusert/server.py:132-137 / videopipeline.py:11): instead of one
process+model per GPU and per-frame RPC, ONE process drives the chips with
a bucketed cache of jitted frame programs, and an asyncio batching loop
that coalesces the freshest frame of every active stream into a single
padded batch per tick.

Scheduling semantics preserved from the reference:
* latest-frame-wins per stream (frame dropping == passthrough of the last
  output, server.py:140-143) via the native FrameQueue mailboxes,
* generation-time EMA + admission pacing (server.py:96,113,134) — kept as
  telemetry and used for deadline-based batch cuts,
* per-stream live options dict mutated by the data channel with no
  restart (server.py:194-195).

TPU-native additions: fixed batch buckets (1/2/4/8...) to bound compile
count, deadline-based batch cut (default 10 ms), prompt-embedding cache,
device-resident params.
"""

from __future__ import annotations

import asyncio
import collections
import logging
import threading
import time
from typing import Any

import numpy as np

from videosd_tpu.config import ServerConfig, default_options
from videosd_tpu.runtime.framequeue import FrameQueue
from videosd_tpu.runtime.telemetry import Telemetry

__all__ = ["Engine", "StreamState"]


class StreamState:
    """Per-stream mutable state (the reference's VideoSDTrack fields:
    options dict, ref frame, last output — server.py:86-102)."""

    def __init__(self, stream_id: int, options: dict[str, Any]):
        self.stream_id = stream_id
        self.options = dict(default_options())
        self.options.update(options or {})
        self.last_output: np.ndarray | None = None
        self.last_latents = None
        # temporal DeepCache state (option "deepcache_temporal" = N):
        # device-resident per-step trunk features [S, h', w', c'] from the
        # last produce frame, the bucket key they were produced under, and
        # frames generated since (refresh when age >= N)
        self.deep_rows = None
        self.deep_rows_key = None
        self.temporal_age = 0
        self.ref_frame: np.ndarray | None = None
        self.last_input: np.ndarray | None = None
        # true (h, w) of the latest camera frame inside the mailbox — the
        # on-device crop must see the REAL extent, not the mailbox shape
        self.in_hw: tuple[int, int] | None = None
        # true extent of ref_frame when it came from a camera frame that
        # already fills the mailbox; None = derive from ref_frame.shape
        self.ref_hw: tuple[int, int] | None = None
        self.last_submit: float = 0.0  # monotonic ts of the latest frame
        self.last_reply: float = 0.0  # monotonic ts of the latest resolve
        self.waiters: list[asyncio.Future] = []
        self.active = True
        # prompt-interpolation state: crossfade in embedding space when the
        # prompt changes (BASELINE config 5; option "prompt_blend_frames")
        self.current_emb = None  # (context, pooled) actually used last tick
        self.blend_from = None  # host-numpy snapshot taken at fade start
        self.blend_left = 0
        self.blend_total = 0  # captured at fade start: a live change to
        # prompt_blend_frames mid-fade must not jump the interpolant
        self._last_prompt: tuple | None = None  # (model, prompt) fade key

    def similar_to_last(self, frame: np.ndarray, threshold: float) -> bool:
        """Stochastic-similarity-style skip (StreamDiffusion idea): when the
        incoming frame barely differs from the last diffused input, reuse
        the last output instead of burning a generation.  ``threshold`` is
        mean |delta| in [0,1] units; 0 disables (default)."""
        if threshold <= 0 or self.last_input is None:
            return False
        if frame.shape != self.last_input.shape:
            return False
        # subsampled mean abs diff — O(pixels/64), negligible host cost
        a = frame[::8, ::8].astype(np.int16)
        b = self.last_input[::8, ::8].astype(np.int16)
        return float(np.abs(a - b).mean()) / 255.0 < threshold


class Engine:
    def __init__(
        self,
        config: ServerConfig | None = None,
        *,
        bundle=None,
        max_streams: int = 16,
        max_batch: int = 8,
        deadline_ms: float | None = None,
        frame_hw: tuple[int, int] | None = None,
    ):
        self.config = config or ServerConfig()
        # durable XLA compile cache: frame programs are multi-minute
        # compiles; also makes hlo_symbols()' AOT relower a cache hit
        from videosd_tpu.compile_cache import setup as _setup_compile_cache

        _setup_compile_cache()
        self._bundle = bundle
        # provenance of the serving weights (None = random init); set by
        # the bundle resolver and swap_params, surfaced via /stats
        self.weights_source: dict | str | None = None
        self.max_streams = max_streams
        self.max_batch = max_batch
        self.deadline_s = (
            (deadline_ms if deadline_ms is not None else self.config.batch_deadline_ms)
            / 1e3
        )
        # mailbox geometry is config-driven (reference crops at full camera
        # resolution; the mailbox must fit the negotiated camera size)
        self.frame_hw = tuple(frame_hw or self.config.frame_hw)
        # camera-frame upload layout (config input_format): "i420" keeps
        # mailboxes/uploads packed planar 4:2:0 — half the host->device
        # bytes; the frame program unpacks on device (ops.i420_to_rgb255)
        self.input_format = str(
            getattr(self.config, "input_format", "rgb") or "rgb"
        ).lower()
        if self.input_format == "i420" and (
            self.frame_hw[0] % 4 or self.frame_hw[1] % 2
        ):
            raise ValueError(
                f"input_format=i420 needs frame_hw H%4==0 and W%2==0, "
                f"got {self.frame_hw}"
            )
        self.telemetry = Telemetry()
        # slots sized for RGB (the larger layout) so input_format can flip
        # at runtime (ops A/B via /debug/engine): packed i420 puts/takes
        # use fewer bytes of the same slot
        self.queue = FrameQueue(
            max_streams, self.frame_hw[0] * self.frame_hw[1] * 3
        )
        self.streams: dict[int, StreamState] = {}
        # mailbox slots are a fixed pool; closed streams recycle their slot
        # (a monotonically increasing id would refuse new sessions after
        # max_streams TOTAL connections over the server's lifetime)
        self._free_slots = list(range(max_streams))
        self._programs: dict[Any, Any] = {}
        # multi-chip serving: a ("data","model") jax.sharding.Mesh built
        # from config.gpus/mesh_model (the reference's actor-pool scaling,
        # server.py:317-321, as ONE sharded program over ICI).  Lazy: the
        # first program build resolves it so engines on 1 chip pay nothing.
        self._mesh = None
        self._mesh_checked = False
        self._mesh_params = None
        # pipeline-parallel serving (config mesh_pipe=2, parallel/pipe.py):
        # the UNet stage-split over two disjoint submeshes.  Mutually
        # exclusive with the flat mesh above — when active, `mesh` stays
        # None and programs come from PipelinedFrameEngine.serving_program
        self._pipe_engine = None
        self._pipe_checked = False
        # abstract (args, kwargs) shapes per program key, captured at first
        # dispatch — lets /profile AOT-relower the program to symbolize HLO
        # fusion names back to model blocks (hlo_symbols)
        self._program_shapes: dict[Any, Any] = {}
        # compile-stall avoidance: (spec, ref_mode) keys that have completed
        # at least one run (their executable exists), and keys currently
        # compiling in the background.  A live option change that lands in a
        # fresh bucket (e.g. the steps slider) is served with the NEAREST
        # ready program while its own compiles in the background — the
        # eager-GPU reference never stalls on sliders (server.py:171-187)
        # and neither should the XLA build.
        self._ready_specs: set = set()
        # temporal DeepCache specs compile TWO jit variants of one program
        # (produce / reuse — the deep_caches kwarg changes the trace).
        # _ready_specs covers produce; this set records (spec, ref_mode)
        # keys whose REUSE variant has also completed a run.  A reuse batch
        # whose variant is still cold is downgraded to produce (parity
        # output, refreshes rows) instead of cold-compiling on the single
        # dispatch worker and stalling every stream.
        self._ready_reuse: set = set()
        self._compiling: set = set()
        # bound CONCURRENT background compiles (config compile_concurrency):
        # N parallel XLA compiles starve small serving hosts
        self._compile_sem = threading.Semaphore(
            max(1, int(getattr(self.config, "compile_concurrency", 2) or 2))
        )
        # device-side output pack (config output_format: "i420"): batches
        # leave the chip as packed planar 4:2:0 — half the D2H bytes, and
        # the exact layout libjpeg raw-data / VP8 encoders consume.  The
        # jit caches one tiny program per output shape.
        self.output_format = str(
            getattr(self.config, "output_format", "rgb") or "rgb"
        ).lower()
        self._i420_pack = None
        self._dispatch_threads: dict[str, int] = {}
        # LRU: hits re-insert at the end, eviction pops the oldest entry one
        # at a time — a wholesale clear() would drop every active stream's
        # embeddings at once and trigger a re-encode burst on the dispatch
        # thread
        self._prompt_cache: collections.OrderedDict[tuple, Any] = (
            collections.OrderedDict()
        )
        self._prompt_cache_max = 256
        # named EXTRA checkpoints (config `models:`) served alongside the
        # default bundle.  Same family/dtype -> identical param-tree
        # structure -> every compiled program is shared (params are an
        # argument); batches group per model (see _batch_loop).  Lazy:
        # loaded on first use or via load_models() at startup.
        self._extra_bundles: dict[str, Any] = {}
        self._extra_mesh_params: dict[str, Any] = {}
        self._extra_lock = threading.Lock()
        self._encoder = None
        self._loop_task: asyncio.Task | None = None
        # all hot-path program executions go through ONE dispatch thread:
        # the remote-TPU client leaks ~1 MB/frame (and is ~40% slower)
        # with executions in flight from multiple threads (PERF.md);
        # created lazily so engines that never run don't spawn threads
        self._dispatcher = None
        self._stopped = asyncio.Event()
        self._wake = asyncio.Event()
        self._inflight: set[asyncio.Task] = set()
        # background compiles run on dedicated daemon threads, NOT the
        # event loop's default executor: asyncio.run() joins the default
        # executor at teardown, so an uncancellable multi-minute XLA compile
        # there would hang a graceful shutdown until it finished
        self._bg_threads: set[threading.Thread] = set()

    # ------------------------------------------------------------ lifecycle

    @property
    def bundle(self):
        if self._bundle is None:
            import jax.numpy as jnp

            from videosd_tpu.pipelines.lcm_img2img import ModelBundle

            log = logging.getLogger("videosd_tpu.engine")
            family = self.config.family
            dtype = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
            # config `weights` (reference loads at actor start,
            # videopipeline.py:49-72): "auto" discovers the configured
            # repos in the local HF cache, a path/repo-id is an explicit
            # ask, "random" skips.  Auto falls back to random init LOUDLY.
            resolved = None
            setting = str(getattr(self.config, "weights", "random") or "random")
            if setting.lower() != "random" and not family.startswith("tiny"):
                from videosd_tpu.io.discovery import resolve_weights

                resolved = resolve_weights(
                    getattr(self.config, "model", None),
                    controlnet=getattr(self.config, "controlnet", None),
                    setting=setting,
                )
            if resolved is not None:
                log.info(
                    "loading checkpoint: model=%s controlnet=%s taesd=%s",
                    resolved["model_dir"],
                    resolved["controlnet_dir"],
                    resolved["taesd_dir"],
                )
                self._bundle = ModelBundle.from_pretrained(
                    resolved["model_dir"],
                    family=family,
                    controlnet_dir=resolved["controlnet_dir"],
                    taesd_dir=resolved["taesd_dir"],
                    dtype=dtype,
                    with_controlnet=True,
                )
                self.weights_source = resolved
            else:
                if setting.lower() == "auto":
                    log.info(
                        "weights: auto found no cached snapshot of %r — "
                        "serving RANDOM-INIT weights",
                        getattr(self.config, "model", None),
                    )
                self._bundle = ModelBundle.random(family, dtype=dtype)
                self.weights_source = None
            loras = getattr(self.config, "lora", None) or []
            quant = str(getattr(self.config, "quant", "none")).lower() == "int8"
            safety = bool(getattr(self.config, "safety", False))
            if bool(getattr(self.config, "taesd_packed", False)):
                import dataclasses as _dc

                self._bundle = _dc.replace(
                    self._bundle,
                    taesd_cfg=_dc.replace(
                        self._bundle.taesd_cfg, packed_convs=True
                    ),
                )
                log.info("taesd: pixel-pair-packed conv layout enabled")
            if bool(getattr(self.config, "taesd_pallas", False)):
                import dataclasses as _dc

                import jax

                if jax.default_backend() == "cpu":
                    log.warning(
                        "taesd_pallas requested on the CPU backend — "
                        "ignored (Mosaic kernels are TPU-only)"
                    )
                else:
                    self._bundle = _dc.replace(
                        self._bundle,
                        taesd_cfg=_dc.replace(
                            self._bundle.taesd_cfg, pallas_convs=True
                        ),
                    )
                    log.info("taesd: Pallas packed-conv kernel enabled")
            if loras or quant or safety:
                # ModelBundle.random is cached/shared across callers —
                # copy before rebinding params so the cache stays pristine
                import dataclasses as _dc

                self._bundle = _dc.replace(self._bundle)
            if safety:
                # baked into every compiled frame program; registry models
                # run as params through the same programs, so the hook
                # covers them too
                from videosd_tpu.pipelines.safety import default_safety_hook

                self._bundle.safety_hook = default_safety_hook(
                    float(getattr(self.config, "safety_threshold", 0.5))
                )
                log.info("safety: skin-stats blackout hook enabled")
            if loras:
                # LoRA fuses BEFORE quant: deltas add to bf16 kernels,
                # then the fused result quantizes (io/lora.py module doc)
                from videosd_tpu.io.lora import fuse_bundle_loras

                stats = fuse_bundle_loras(self._bundle, loras)
                log.info("lora: fused modules per tower: %s", stats)
            if quant:
                from videosd_tpu.ops.quant import quantize_bundle_params

                self._bundle.params = quantize_bundle_params(self._bundle.params)
                log.info("quant: int8 w8a8 applied to unet/controlnet linears")
        return self._bundle

    def swap_params(self, params: dict, *, source: str | None = None) -> None:
        """Atomically swap model params under live serving — zero dropped
        frames, zero recompiles (beyond the reference, whose actors must
        restart to change checkpoints).

        The new tree must match the serving bundle exactly in structure,
        shapes and dtypes — programs are keyed by spec and take params as
        an argument, so a same-shape swap is safe by construction: the
        in-flight batch finishes on the old weights, the next packed batch
        reads the new dict.  The prompt cache clears (the text tower
        changed) and per-stream fades reset; streams re-encode their
        prompts on the next tick via the dispatcher pre-encode path.
        """
        import jax

        loras = getattr(self.config, "lora", None) or []
        if loras:
            # the serving bundle carries the configured adapters; fuse the
            # same ones into the incoming base checkpoint (before quant)
            import dataclasses as _dc

            from videosd_tpu.io.lora import fuse_bundle_loras

            shim = _dc.replace(self.bundle)
            shim.params = params
            fuse_bundle_loras(shim, loras)
            params = shim.params

        if str(getattr(self.config, "quant", "none")).lower() == "int8":
            # the serving tree is quantized; apply the same deterministic
            # transform to the incoming checkpoint so paths/dtypes line up
            from videosd_tpu.ops.quant import quantize_bundle_params

            params = quantize_bundle_params(params)

        params = self._graft_like_serving(params)
        if self.mesh is not None:
            from videosd_tpu.parallel.mesh import shard_params

            # device_put transfer only (no executions): placing the new
            # params before publishing keeps self.params always consistent
            self._mesh_params = shard_params(params, self.mesh)
        self.bundle.params = params
        if self.pipe_engine is not None:
            # re-place stage params (device_put transfers only; the stage
            # executables take params as arguments, so no recompiles)
            self.pipe_engine.refresh_params()
        self._prompt_cache.clear()
        for st in self.streams.values():
            st.current_emb = None
            st.blend_from = None
            st.blend_left = 0
            st._last_prompt = None
        self.weights_source = source

    @property
    def mesh(self):
        """("data","model") device mesh when config asks for >1 device
        (config.yaml ``gpus``/``mesh_model`` — the reference's gpus key,
        config.yaml:3), else None.  Falls back with a warning when fewer
        devices exist than requested (the reference would crash its Ray
        actor pool in that case; degrading loudly is kinder)."""
        if not self._mesh_checked:
            self._mesh_checked = True
            n = int(self.config.gpus or 1)
            if self.pipe_engine is not None:
                n = 1  # PP owns the devices; no flat mesh
            if n > 1:
                import jax

                from videosd_tpu.parallel.mesh import make_mesh

                mp = max(1, int(self.config.mesh_model or 1))
                avail = len(jax.devices())
                if avail < n:
                    n_eff = max(1, (avail // mp) * mp)
                    logging.getLogger("videosd_tpu.engine").warning(
                        "config requests gpus=%d but only %d device(s) "
                        "exist; serving on %d", n, avail, n_eff,
                    )
                    n = n_eff
                if n > 1:
                    self._mesh = make_mesh(n, model_parallel=mp)
        return self._mesh

    @property
    def pipe_engine(self):
        """PipelinedFrameEngine when config asks for pipeline-parallel
        serving (mesh_pipe=2), else None.  Degrades loudly to single-device
        serving when the device count can't satisfy 2 x mesh_model."""
        if not self._pipe_checked:
            self._pipe_checked = True
            pipe = max(1, int(getattr(self.config, "mesh_pipe", 1) or 1))
            if pipe > 1:
                import jax

                n = int(self.config.gpus or 1)
                mp = max(1, int(self.config.mesh_model or 1))
                avail = len(jax.devices())
                if avail < n or n % (pipe * mp):
                    logging.getLogger("videosd_tpu.engine").warning(
                        "mesh_pipe=%d x mesh_model=%d needs gpus=%d devices "
                        "(%d available); serving unpipelined", pipe, mp, n, avail,
                    )
                else:
                    from videosd_tpu.parallel.pipe import PipelinedFrameEngine

                    self._pipe_engine = PipelinedFrameEngine(
                        self.bundle,
                        devices=jax.devices()[:n],
                        model_parallel=mp,
                    )
        return self._pipe_engine

    @property
    def data_axis(self) -> int:
        """Batch buckets must be multiples of this (rows shard evenly)."""
        if self.pipe_engine is not None:
            return self.pipe_engine.data_size
        return self.mesh.shape["data"] if self.mesh is not None else 1

    @property
    def params(self):
        """Model params, mesh-placed per PARAM_RULES when serving sharded
        (replicate SD1.5-scale, tensor-shard attention/FF for SDXL)."""
        if self.mesh is not None:
            if self._mesh_params is None:
                from videosd_tpu.parallel.mesh import shard_params

                self._mesh_params = shard_params(self.bundle.params, self.mesh)
            return self._mesh_params
        return self.bundle.params

    # ------------------------------------------------ multi-model registry

    def _graft_like_serving(self, params: dict) -> dict:
        """Validate + graft a param tree into the SERVING treedef by leaf
        path: programs were traced against the serving tree's structure, so
        any tree they run with must keep it exactly (jit caches on pytree
        structure) — and converted checkpoints legitimately omit keys that
        random init creates structurally empty (see io/weights.py note), so
        matching leaves-by-path is the correct equivalence, not treedef
        equality.  Raises ValueError on any structural/shape/dtype drift."""
        import jax

        cur_paths = jax.tree_util.tree_flatten_with_path(self.bundle.params)[0]
        cur_def = jax.tree_util.tree_structure(self.bundle.params)
        new_by_path = dict(jax.tree_util.tree_flatten_with_path(params)[0])
        missing = [p for p, _ in cur_paths if p not in new_by_path]
        extra = set(new_by_path) - {p for p, _ in cur_paths}
        if missing or extra:
            raise ValueError(
                f"param tree differs from the serving bundle: "
                f"{len(missing)} serving tensors missing from the new tree "
                f"(first: {missing[:2]}), {len(extra)} unknown"
            )
        bad = [
            p
            for p, a in cur_paths
            if tuple(a.shape) != tuple(new_by_path[p].shape)
            or str(a.dtype) != str(new_by_path[p].dtype)
        ]
        if bad:
            raise ValueError(
                f"{len(bad)}/{len(cur_paths)} tensors differ in shape/dtype "
                f"from the serving bundle (first: {bad[:2]}; same family + "
                "dtype required for a zero-recompile swap)"
            )
        return jax.tree_util.tree_unflatten(
            cur_def, [new_by_path[p] for p, _ in cur_paths]
        )

    @property
    def model_names(self) -> list[str]:
        """Registry names a stream's "model" option may select ("" is the
        config default checkpoint and always valid)."""
        return sorted((getattr(self.config, "models", None) or {}).keys())

    def load_models(self) -> None:
        """Eagerly resolve every configured extra checkpoint (server
        startup calls this so the first stream that asks for one doesn't
        pay the load)."""
        for name in self.model_names:
            self._extra_bundle(name)

    def _extra_bundle(self, name: str):
        """Bundle for a named registry entry, loaded once.  Weight
        resolution mirrors the default bundle (local HF cache via
        io/discovery, LOUD random-init fallback — each entry gets a
        distinct init seed so even weightless A/Bs differ); the tree is
        grafted into the serving treedef so every compiled program can run
        it as a drop-in params argument."""
        entry = (getattr(self.config, "models", None) or {}).get(name)
        if entry is None:
            raise KeyError(f"unknown model {name!r}; configured: "
                           f"{self.model_names}")
        with self._extra_lock:
            bundle = self._extra_bundles.get(name)
            if bundle is not None:
                return bundle
            import dataclasses as _dc
            import zlib

            import jax.numpy as jnp

            from videosd_tpu.pipelines.lcm_img2img import ModelBundle

            log = logging.getLogger("videosd_tpu.engine")
            family = self.config.family
            dtype = (
                jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
            )
            resolved = None
            setting = str(getattr(self.config, "weights", "random") or "random")
            if setting.lower() != "random" and not family.startswith("tiny"):
                from videosd_tpu.io.discovery import resolve_weights

                # named entries resolve their own repos; "auto" discovery
                # only (an explicit path in `weights` means the DEFAULT
                # checkpoint, not every registry entry)
                resolved = resolve_weights(
                    entry["model"], controlnet=entry["controlnet"], setting="auto"
                )
            if resolved is not None:
                log.info("models[%s]: loading %s", name, resolved["model_dir"])
                bundle = ModelBundle.from_pretrained(
                    resolved["model_dir"],
                    family=family,
                    controlnet_dir=resolved["controlnet_dir"],
                    taesd_dir=resolved["taesd_dir"],
                    dtype=dtype,
                    with_controlnet=True,
                )
            else:
                log.info(
                    "models[%s]: no cached snapshot of %r — RANDOM-INIT "
                    "weights (distinct per-entry seed)",
                    name,
                    entry["model"],
                )
                bundle = ModelBundle.random(
                    family,
                    dtype=dtype,
                    seed=1 + (zlib.crc32(name.encode()) & 0x7FFFFFFF),
                )
            bundle = _dc.replace(bundle)  # never mutate the shared cache
            if entry.get("lora"):
                from videosd_tpu.io.lora import fuse_bundle_loras

                fuse_bundle_loras(bundle, entry["lora"])
            if str(getattr(self.config, "quant", "none")).lower() == "int8":
                from videosd_tpu.ops.quant import quantize_bundle_params

                bundle.params = quantize_bundle_params(bundle.params)
            bundle.params = self._graft_like_serving(bundle.params)
            self._extra_bundles[name] = bundle
            return bundle

    def params_for(self, model: str):
        """Params argument for a batch: "" (or unknown, which the group key
        never produces) -> the default serving params; a registry name ->
        that entry's tree, mesh-placed like the default when sharded."""
        if not model:
            return self.params
        bundle = self._extra_bundle(model)
        if self.mesh is not None:
            placed = self._extra_mesh_params.get(model)
            if placed is None:
                from videosd_tpu.parallel.mesh import shard_params

                placed = shard_params(bundle.params, self.mesh)
                self._extra_mesh_params[model] = placed
            return placed
        return bundle.params

    def _stream_model(self, st: StreamState) -> str:
        """The validated registry name for a stream ("" = default).  An
        unknown name serves the default checkpoint rather than erroring
        mid-stream (the data channel ignores junk like the reference's
        generic option merge, server.py:194-195)."""
        name = str(st.options.get("model") or "")
        if name and name not in (getattr(self.config, "models", None) or {}):
            return ""
        return name

    def start(self):
        if self._loop_task is None:
            self._loop_task = asyncio.get_running_loop().create_task(self._batch_loop())

    def _get_dispatcher(self):
        if self._dispatcher is None:
            from videosd_tpu.runtime.dispatch import DispatchWorker

            self._dispatcher = DispatchWorker(depth=2)
        return self._dispatcher

    async def stop(self):
        self._stopped.set()
        self._wake.set()
        if self._loop_task is not None:
            await self._loop_task
            self._loop_task = None
        if self._dispatcher is not None:
            await asyncio.get_running_loop().run_in_executor(
                None, self._dispatcher.stop
            )
            self._dispatcher = None
        # bounded drain of background compiles: their results are
        # discardable, so shutdown must never hang behind an XLA compile —
        # daemon threads that outlive the deadline just finish on their own
        threads = [t for t in self._bg_threads if t.is_alive()]
        if threads:

            def drain():
                deadline = time.monotonic() + 10.0
                for t in threads:
                    t.join(timeout=max(0.0, deadline - time.monotonic()))
                return sum(t.is_alive() for t in threads)

            leftover = await asyncio.get_running_loop().run_in_executor(
                None, drain
            )
            if leftover:
                logging.getLogger("videosd_tpu.engine").warning(
                    "%d background compile(s) still running at shutdown "
                    "(abandoned)", leftover,
                )
        self._bg_threads.clear()

    # ------------------------------------------------------------ streams

    def open_stream(self, options: dict[str, Any] | None = None) -> StreamState:
        if not self._free_slots:
            raise RuntimeError("max_streams exceeded")
        sid = self._free_slots.pop(0)
        # deployment-level default overrides (config option_defaults) sit
        # under the client's init options, which keep priority
        cfg_defaults = getattr(self.config, "option_defaults", None) or {}
        st = StreamState(sid, {**cfg_defaults, **(options or {})})
        self.streams[sid] = st
        return st

    def close_stream(self, sid: int):
        st = self.streams.pop(sid, None)
        if st:
            st.active = False
            for w in st.waiters:
                if not w.done():
                    w.cancel()
            # drain any frame left in the mailbox so the next occupant of
            # this slot doesn't inherit a stale frame, then recycle
            if self.queue.has_fresh(sid):
                buf = np.empty(self._mailbox_shape(), np.uint8)
                self.queue.take(sid, buf)
            self._free_slots.append(sid)

    def update_options(self, sid: int, message: dict[str, Any]):
        """Data-channel option merge with the reference coercion table
        (server.py:167-197), including the set_ref trigger."""
        from videosd_tpu.config import coerce_options

        st = self.streams[sid]
        msg = coerce_options(message)
        if "set_ref" in msg:
            if st.last_output is not None:
                st.ref_frame = self._as_rgb(st.last_output).copy()
                st.ref_hw = None  # derive extent from the output's shape
            msg.pop("set_ref")
        st.options.update(msg)

    # ------------------------------------------------------------ frames

    async def submit_frame(self, sid: int, frame: np.ndarray) -> np.ndarray:
        """Submit a camera frame; resolves with the freshest generated
        output (which may be an older generation if this frame was dropped
        — output-fps == input-fps decoupling, server.py:140-143)."""
        st = self.streams[sid]
        self.telemetry.frames_in += 1
        frame, st.in_hw = self._fit_frame(frame)
        sim_thresh = float(st.options.get("similarity_threshold", 0.0) or 0.0)
        if st.last_output is not None and st.similar_to_last(frame, sim_thresh):
            self.telemetry.frames_dropped += 1
            return st.last_output
        # recency is stamped only when a frame actually enqueues: a
        # similarity-skipped stream (static scene) must not count toward
        # the batch-cut cohort — it will not deliver a frame
        st.last_submit = time.monotonic()
        self.queue.put(sid, frame)
        self._wake.set()
        if st.last_output is None:
            # first frame: black init frame, reference server.py:99,122
            h, w = int(st.options["height"]), int(st.options["width"])
            st.last_output = self._black_output(h, w)
            st.ref_frame = self._as_rgb(frame)
            st.ref_hw = st.in_hw
        fut = asyncio.get_running_loop().create_future()
        st.waiters.append(fut)
        try:
            return await fut
        except asyncio.CancelledError:
            return st.last_output

    def _mailbox_shape(self) -> tuple[int, ...]:
        h, w = self.frame_hw
        if self.input_format == "i420":
            return (h * 3 // 2, w)
        return (h, w, 3)

    def _mailbox_nbytes(self) -> int:
        return int(np.prod(self._mailbox_shape()))

    def set_input_format(self, fmt: str):
        """Flip the camera-upload layout live (ops A/B via /debug/engine).

        Mailbox slots are allocated at RGB size so both layouts fit; the
        drain discards frames stored in the OLD layout (one dropped frame
        per active stream at most — streams resubmit immediately).  The
        first bucket in the new layout is a fresh program spec: the
        compile-stall-avoidance path serves passthrough frames while it
        background-compiles, exactly like any cold bucket."""
        fmt = str(fmt).lower()
        if fmt not in ("rgb", "i420"):
            raise ValueError(f"input_format must be rgb|i420, got {fmt!r}")
        if fmt == "i420" and (self.frame_hw[0] % 4 or self.frame_hw[1] % 2):
            raise ValueError(
                f"input_format=i420 needs frame_hw H%4==0 W%2==0, "
                f"got {self.frame_hw}"
            )
        if fmt == self.input_format:
            return
        self.input_format = fmt
        buf = np.empty(self._mailbox_shape(), np.uint8)
        for sid, st in self.streams.items():
            if self.queue.has_fresh(sid):
                self.queue.take(sid, buf)
            st.last_input = None  # old-layout frame: similarity reset

    def _fit_frame(self, frame: np.ndarray) -> tuple[np.ndarray, tuple[int, int]]:
        """Mailboxes are fixed-size; place the camera frame top-left and
        return (mailbox_frame, true_extent).  The true extent rides to the
        device as a traced source box, so the on-device center-crop sees
        the REAL camera geometry (reference crops at full camera
        resolution, videopipeline.py:91-107).  Frames LARGER than the
        mailbox (out-of-contract: the client negotiates <= 768) are
        host-center-cropped — centered, never top-left.

        An i420-input engine fits per PLANE (Y top-left in the Y region,
        U/V in their subplane grids); RGB frames submitted to it are
        host-packed first, so callers may submit either layout."""
        if self.input_format == "i420":
            if frame.ndim == 3:
                from videosd_tpu.ops.preprocess import rgb_to_i420_host

                fh, fw = frame.shape[:2]
                frame = rgb_to_i420_host(
                    frame[: fh - fh % 4, : fw - fw % 2, :3]
                )
            return self._fit_frame_i420(frame)
        return self._fit_frame_rgb(frame)

    def _fit_frame_rgb(
        self, frame: np.ndarray
    ) -> tuple[np.ndarray, tuple[int, int]]:
        """RGB mailbox fit — also used for ref frames on an i420-input
        engine (style references upload as RGB regardless of the camera
        layout; they change once per set_ref, not per frame)."""
        h, w = self.frame_hw
        fh, fw = frame.shape[:2]
        if (fh, fw) == (h, w):
            return frame, (fh, fw)
        ch, cw = min(h, fh), min(w, fw)
        y0, x0 = (fh - ch) // 2, (fw - cw) // 2
        out = np.zeros((h, w, 3), np.uint8)
        out[:ch, :cw] = frame[y0 : y0 + ch, x0 : x0 + cw, :3]
        return out, (ch, cw)

    def _fit_frame_i420(
        self, packed: np.ndarray
    ) -> tuple[np.ndarray, tuple[int, int]]:
        """Packed-plane analog of :meth:`_fit_frame`: copy Y/U/V subplanes
        top-left into the mailbox's plane regions (even-aligned so the
        chroma grid stays 2x2-consistent); padding is Y=0 / chroma=128
        (black), which the traced source box keeps out of the crop."""
        h, w = self.frame_hw
        fh, fw = (packed.shape[0] * 2) // 3, packed.shape[1]
        if (fh, fw) == (h, w):
            return packed, (fh, fw)
        ch, cw = min(h, fh) & ~1, min(w, fw) & ~1
        y0, x0 = ((fh - ch) // 2) & ~1, ((fw - cw) // 2) & ~1
        out = np.full((h * 3 // 2, w), 128, np.uint8)
        out[:h] = 0
        out[:ch, :cw] = packed[y0 : y0 + ch, x0 : x0 + cw]
        src_u = packed[fh : fh + fh // 4].reshape(fh // 2, fw // 2)
        src_v = packed[fh + fh // 4 :].reshape(fh // 2, fw // 2)
        dst_u = out[h : h + h // 4].reshape(h // 2, w // 2)
        dst_v = out[h + h // 4 :].reshape(h // 2, w // 2)
        dst_u[: ch // 2, : cw // 2] = src_u[
            y0 // 2 : (y0 + ch) // 2, x0 // 2 : (x0 + cw) // 2
        ]
        dst_v[: ch // 2, : cw // 2] = src_v[
            y0 // 2 : (y0 + ch) // 2, x0 // 2 : (x0 + cw) // 2
        ]
        return out, (ch, cw)

    def _src_box(self, in_hw, out_h: int, out_w: int) -> tuple[int, int, int, int]:
        """(top, left, height, width) center-crop of the true camera
        extent matching the target aspect ratio — host-computed with the
        SAME geometry function as the static path (ops.center_crop_box),
        handed to the program as traced data."""
        from videosd_tpu.ops import center_crop_box

        ih, iw = in_hw or self.frame_hw
        left, top, right, bottom = center_crop_box(iw, ih, out_w, out_h)
        return (top, left, bottom - top, right - left)

    # ------------------------------------------------------------ programs

    def _get_program(self, spec, *, ref_mode: bool = False):
        key = (spec, ref_mode)
        prog = self._programs.get(key)
        if prog is None:
            if ref_mode:
                from videosd_tpu.pipelines.reference_attn import (
                    build_reference_program,
                )

                prog = build_reference_program(self.bundle, spec)
                if self.pipe_engine is not None:
                    # the double-pass banked-attention program has no stage
                    # split; it serves unsharded on the default device —
                    # loud, once per spec, so ops can see the gap
                    logging.getLogger("videosd_tpu.engine").warning(
                        "ref_mode bucket %s serves UNPIPELINED under "
                        "mesh_pipe (reference-attention has no stage split)",
                        spec,
                    )
            elif self.pipe_engine is not None:
                prog = self.pipe_engine.serving_program(spec)
            else:
                from videosd_tpu.pipelines.lcm_img2img import build_frame_program

                prog = build_frame_program(self.bundle, spec)
            if self.mesh is not None:
                from videosd_tpu.parallel.serving import shard_program

                prog = shard_program(prog, self.mesh)
            self._programs[key] = prog
        return prog

    def _capture_shapes(self, key, args, kwargs):
        """Remember the abstract (args, kwargs) of a program's first call so
        hlo_symbols() can AOT-relower it later without holding live buffers."""
        if key in self._program_shapes:
            return
        import jax

        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (args, dict(kwargs))
        )
        self._program_shapes[key] = abstract

    def hlo_symbols(self) -> dict[str, str]:
        """{hlo_instruction_name: model_scope_path} over all compiled programs.

        Relowers each dispatched program from its captured abstract shapes
        and parses ``metadata={op_name="jit(..)/unet/down0/..."}`` out of the
        optimized HLO.  The XLA compile is a persistent-cache hit (the same
        program was already compiled), so this is IO-bound, not compute-bound.
        Collisions across programs (same %fusion.N name) keep the first
        mapping and mark it ambiguous with a trailing '*'.
        """
        from videosd_tpu.runtime.telemetry import parse_hlo_symbols

        symbols: dict[str, str] = {}
        # list() snapshot: background compiles insert into _programs
        for key, prog in list(self._programs.items()):
            shapes = self._program_shapes.get(key)
            if shapes is None:
                continue
            args, kwargs = shapes
            try:
                # sharded wrappers carry the underlying jit fn as ._base
                base = getattr(prog, "_base", prog)
                txt = base.lower(*args, **kwargs).compile().as_text()
            except Exception:  # pragma: no cover - backend-specific
                continue
            parse_hlo_symbols(txt, symbols)
        return symbols

    def _encode_prompt(self, prompt: str, model: str = ""):
        """-> (context_embeds, pooled_embeds), cached per (model, prompt):
        the text tower's weights differ per checkpoint, so each registry
        entry gets its own cache rows (the encoder PROGRAM is shared —
        params are an argument).

        pooled is only consumed by SDXL-family programs (text_time
        micro-conditioning) but is cached unconditionally — it's a free
        byproduct of the encoder call."""
        ck = (model, prompt)
        cached = self._prompt_cache.get(ck)
        if cached is None:
            import jax.numpy as jnp

            from videosd_tpu.pipelines.lcm_img2img import build_prompt_encoder

            if self._encoder is None:
                self._encoder = build_prompt_encoder(self.bundle)
            bundle = self._extra_bundle(model) if model else self.bundle
            ids = jnp.asarray(bundle.tokenizer([prompt]), jnp.int32)
            cached = self._encoder(self.params_for(model), ids)
            while len(self._prompt_cache) >= self._prompt_cache_max:
                self._prompt_cache.popitem(last=False)  # LRU-evict oldest
            self._prompt_cache[ck] = cached
        else:
            self._prompt_cache.move_to_end(ck)
        return cached

    def _stream_embeds(self, st: StreamState):
        """Prompt embeddings for one stream, crossfaded in embedding space
        when the prompt changes and "prompt_blend_frames" > 0 — a smooth
        live-prompt interpolation instead of a hard cut.

        Runs on the EVENT LOOP thread: must not issue device computations
        (single-dispatch-thread invariant, runtime/dispatch.py).  Cache
        lookups only; the crossfade math runs in host numpy on snapshots."""
        prompt = str(st.options["prompt"])
        ck = (self._stream_model(st), prompt)
        target = self._prompt_cache.get(ck)
        if target is not None:
            self._prompt_cache.move_to_end(ck)
        elif st.current_emb is not None:
            # prompt mutated between the dispatcher pre-encode and this
            # pack (rare): serve the previous embedding this tick instead
            # of running the encoder on the event loop; the next tick's
            # pre-encode warms the cache and the fade starts then.
            return st.current_emb
        else:
            # brand-new stream whose prompt mutated inside the same window
            # — nothing older to serve; one-off encode.
            target = self._encode_prompt(prompt, ck[0])
        blend = int(st.options.get("prompt_blend_frames", 0) or 0)
        # fade key = (model, prompt): a live model switch crossfades in
        # embedding space exactly like a prompt change
        if st._last_prompt is not None and ck != st._last_prompt and blend > 0:
            prev = st.current_emb if st.current_emb is not None else target
            # host snapshot at fade start (bounded D2H; fades are rare)
            st.blend_from = tuple(
                None if a is None else np.asarray(a) for a in prev
            )
            st.blend_total = blend  # capture: live slider moves mid-fade
            st.blend_left = blend  # must not jump the interpolant
        st._last_prompt = ck
        if st.blend_left > 0 and st.blend_from is not None and st.blend_total:
            t = 1.0 - st.blend_left / st.blend_total
            st.blend_left -= 1
            tgt = tuple(None if a is None else np.asarray(a) for a in target)
            emb = tuple(
                None
                if b is None
                else ((1.0 - t) * a.astype(np.float32) + t * b.astype(np.float32)).astype(b.dtype)
                for a, b in zip(st.blend_from, tgt)
            )
        else:
            emb = target
        st.current_emb = emb
        return emb

    def warmup(
        self, batch_sizes=(1,), steps=(4,), height=512, width=512,
        cn_interval: int | None = None, dc_interval: int | None = None,
        refresh_last: bool | None = None, temporal: bool | None = None,
    ):
        """Ahead-of-time compile the hot buckets (SURVEY.md §7 "hard parts":
        compile stalls kill p50).  batch_sizes are per-data-shard: the
        compiled batch is b * data_axis so sharded rows stay even.
        ``cn_interval``/``dc_interval`` default to the config's
        option_defaults values so the warmed programs match what new
        streams will actually request."""
        from videosd_tpu.pipelines.lcm_img2img import FrameSpec

        defaults = getattr(self.config, "option_defaults", None) or {}
        if cn_interval is None:
            cn_interval = int(defaults.get("controlnet_interval", 1) or 1)
        if dc_interval is None:
            dc_interval = int(defaults.get("deepcache_interval", 1) or 1)
        if refresh_last is None:
            refresh_last = bool(defaults.get("interval_refresh_last", False))
        if temporal is None:
            temporal = int(defaults.get("deepcache_temporal", 0) or 0) > 0
        if self.pipe_engine is not None:
            # pipelined serving is parity-only; warm what will be served
            cn_interval = dc_interval = 1
            temporal = False
        if temporal:
            dc_interval = 1  # mutually exclusive; temporal wins (batcher rule)
        refresh_last = refresh_last and (
            max(1, cn_interval) > 1 or max(1, dc_interval) > 1
        )
        ih, iw = self.frame_hw
        for b in batch_sizes:
            for s in steps:
                spec = FrameSpec(
                    batch=b * self.data_axis, height=height, width=width,
                    in_height=ih, in_width=iw, steps=s,
                    in_format=self.input_format,
                    controlnet_interval=max(1, cn_interval),
                    deepcache_interval=max(1, dc_interval),
                    interval_refresh_last=refresh_last,
                    deepcache_temporal=temporal,
                )
                self._warm_spec(spec, ref_mode=False)

    def _warm_spec(self, spec, *, ref_mode: bool):
        """Compile + one dummy run of a spec, matching the batcher's EXACT
        call signature (it always passes warm arrays in non-ref mode) — a
        warmup with a different signature compiles a different program and
        the first real batch stalls anyway.  Used by both startup warmup
        and background bucket compiles."""
        frames, embeds, strength, guidance, cn, seed, pooled = self._dummy_batch(
            spec
        )
        warm_lat = np.zeros(
            (spec.batch, spec.height // 8, spec.width // 8, 4), np.float32
        )
        warm_alpha = np.zeros((spec.batch,), np.float32)
        box = np.tile(
            np.asarray(
                self._src_box(None, spec.height, spec.width), np.int32
            ),
            (spec.batch, 1),
        )
        if ref_mode:
            # serving packs a [B, 2] (attn, adain) fidelity pair in ref
            # mode — warm with the same signature
            cn = np.ones((spec.batch, 2), np.float32)
        res = self._run_bucket_sync(
            spec, ref_mode, frames, frames, embeds, strength, guidance, cn, seed,
            None if ref_mode else warm_lat,
            None if ref_mode else warm_alpha,
            pooled,
            box,
            box if ref_mode else None,
        )
        if not ref_mode and spec.deepcache_temporal and len(res) > 2:
            # temporal buckets serve TWO jit variants (produce / reuse);
            # warm the reuse one with the rows the produce run just made,
            # or the first reuse batch stalls on a cold compile
            self._run_bucket_sync(
                spec, ref_mode, frames, frames, embeds, strength, guidance,
                cn, seed, warm_lat, warm_alpha, pooled, box, None,
                deep_caches=res[2],
            )

    def _nearest_ready_spec(self, spec, ref_mode: bool):
        """A ready program differing from ``spec`` only in steps, output
        resolution, ControlNet interval, and/or DeepCache interval, or
        None if no compiled variant can stand in.

        Ranking: same resolution beats same steps (a transitional ladder
        change is invisible; a transitional size change the client just
        renders at the reply's dimensions), then nearest steps, then
        nearest area, then nearest ControlNet/DeepCache interval (a
        transitional interval change only alters residual/trunk
        freshness)."""
        import dataclasses

        def normalize(s):
            return dataclasses.replace(
                s, steps=spec.steps, height=spec.height, width=spec.width,
                controlnet_interval=spec.controlnet_interval,
                deepcache_interval=spec.deepcache_interval,
                deepcache_temporal=spec.deepcache_temporal,
            )

        # list() snapshot: executor threads add to _ready_specs concurrently
        candidates = [
            s
            for s, rm in list(self._ready_specs)
            if rm == ref_mode and normalize(s) == spec
        ]
        if not candidates:
            return None
        return min(
            candidates,
            key=lambda s: (
                (s.height, s.width) != (spec.height, spec.width),
                abs(s.steps - spec.steps),
                abs(s.height * s.width - spec.height * spec.width),
                abs(s.controlnet_interval - spec.controlnet_interval),
                abs(s.deepcache_interval - spec.deepcache_interval),
                # a temporal stand-in without caches runs produce mode
                # (parity outputs); prefer same-flag variants anyway
                s.deepcache_temporal != spec.deepcache_temporal,
            ),
        )

    def _load_model_background(self, name: str):
        """Resolve a cold `models:` registry entry off the serving loop
        (host-side checkpoint conversion can take minutes); batches that
        ask for it meanwhile serve the default params — the model-load
        analog of a cold bucket's nearest-ready fallback."""
        marker = ("model-load", name)
        if marker in self._compiling:
            return
        self._compiling.add(marker)
        logging.getLogger("videosd_tpu.engine").info(
            "loading models[%s] in background (serving default checkpoint "
            "meanwhile)", name,
        )

        def work():
            try:
                self._extra_bundle(name)
            except Exception:
                logging.getLogger("videosd_tpu.engine").exception(
                    "background model load failed for %r", name
                )
            finally:
                self._compiling.discard(marker)

        t = threading.Thread(target=work, name="model-load", daemon=True)
        self._bg_threads = {th for th in self._bg_threads if th.is_alive()}
        self._bg_threads.add(t)
        t.start()

    def _compile_spec_background(self, loop, spec, ref_mode: bool):
        """Warm (compile + one dummy run of) a spec off the dispatch path."""
        key = (spec, ref_mode)
        if key in self._compiling:
            return

        self._compiling.add(key)
        logging.getLogger("videosd_tpu.engine").info(
            "background-compiling bucket %s (serving nearest ready variant "
            "meanwhile)", spec,
        )

        def work():
            try:
                # bounded concurrency: parallel XLA compiles starve small
                # hosts (config compile_concurrency); waiting threads are
                # idle and the spec stays in _compiling for dedup
                with self._compile_sem:
                    if getattr(self.config, "compile_subprocess", False):
                        # cold trace/lower/compile holds the GIL in long
                        # C-extension calls and starves the event loop
                        # (measured 60-80 s HTTP stalls) — warm the
                        # persistent cache from an isolated interpreter
                        # first; the in-process compile below then runs
                        # from cache.  Failure falls through: the
                        # in-process path is always correct, just slower.
                        self._warm_spec_subprocess(spec, ref_mode=ref_mode)
                    self._warm_spec(spec, ref_mode=ref_mode)
            except Exception:
                logging.getLogger("videosd_tpu.engine").exception(
                    "background compile failed for %s", spec
                )
            finally:
                self._compiling.discard(key)

        # dedicated daemon thread, NOT loop.run_in_executor: asyncio.run()
        # joins the default executor at teardown, which would block a
        # graceful shutdown behind an uncancellable XLA compile
        t = threading.Thread(target=work, name="bucket-compile", daemon=True)
        self._bg_threads = {th for th in self._bg_threads if th.is_alive()}
        self._bg_threads.add(t)
        t.start()

    def _warm_spec_subprocess(self, spec, *, ref_mode: bool) -> bool:
        """Trace + compile ``spec`` into the shared persistent cache from
        an isolated interpreter (tools/warm_spec.py), so the in-process
        compile that follows is a cache hit.  See config
        ``compile_subprocess`` for when this is safe.  Returns True when
        the subprocess exited clean; failures only cost the fallthrough
        to the (always-correct) in-process cold compile."""
        import dataclasses
        import json
        import subprocess
        import sys
        import tempfile

        log = logging.getLogger("videosd_tpu.engine")
        cfg = dataclasses.asdict(self.config)
        # runtime state that may have diverged from the config file but
        # participates in the program's identity
        cfg["input_format"] = self.input_format
        cfg["output_format"] = self.output_format
        cfg["frame_hw"] = list(self.frame_hw)
        cfg["compile"] = False  # the child warms exactly one spec
        cfg["compile_subprocess"] = False
        req = {
            "cfg": cfg,
            "spec": dataclasses.asdict(spec),
            "ref_mode": ref_mode,
        }
        with tempfile.NamedTemporaryFile(
            "w", suffix=".json", prefix="warm_spec_", delete=False
        ) as f:
            json.dump(req, f)
            path = f.name
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "videosd_tpu.tools.warm_spec",
                 "--json", path],
                capture_output=True, text=True, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            log.warning("subprocess warm of %s timed out (1 h)", spec)
            return False
        finally:
            try:
                import os as _os

                _os.unlink(path)
            except OSError:
                pass
        if proc.returncode != 0:
            log.warning(
                "subprocess warm of %s failed rc=%d: %s",
                spec, proc.returncode, (proc.stderr or "")[-2000:],
            )
            return False
        log.info(
            "subprocess-warmed %s in %.1f s (%s)",
            spec, time.perf_counter() - t0,
            (proc.stdout or "").strip()[-200:],
        )
        return True

    def _dummy_batch(self, spec):
        import jax.numpy as jnp

        b = spec.batch
        frames = np.zeros((b, *self._mailbox_shape()), np.uint8)
        emb, pooled1 = self._encode_prompt("warmup")
        embeds = jnp.concatenate([emb] * b, axis=0)
        pooled = None
        if self.bundle.clip2_cfg is not None:
            pooled = jnp.concatenate([pooled1] * b, axis=0)
        return (
            frames,
            embeds,
            np.full((b,), 0.6, np.float32),
            np.full((b,), 5.0, np.float32),
            np.full((b,), 2.0, np.float32),
            np.arange(b, dtype=np.int32),
            pooled,
        )

    def _dispatch_bucket(
        self,
        spec,
        ref_mode,
        frames,
        ref_frames,
        embeds,
        strength,
        guidance,
        scale,
        seed,
        warm_latents=None,
        warm_alpha=None,
        pooled_embeds=None,
        src_box=None,
        ref_box=None,
        params=None,
        deep_caches=None,
    ):
        """Enqueue one batch on the device (JAX async dispatch — returns
        device arrays immediately without waiting for results).

        ``deep_caches``: temporal-DeepCache trunk rows for a REUSE batch —
        a list of per-stream device-resident [S, h', w', c'] arrays (or an
        already-stacked [B, S, ...]).  None on produce/off batches.

        ``params``: the param tree to run with (None = the default serving
        params) — how a `models:` registry batch selects its checkpoint
        while REUSING this spec's compiled program.

        ``embeds``/``pooled_embeds`` may be lists of per-stream arrays and
        ``warm_latents`` a list of device-resident rows (or None) — the
        concatenation/stacking device ops then run HERE, on the dispatch
        thread, not on the event loop (multi-threaded runtime access
        leaks, see runtime/dispatch.py)."""
        import threading

        import jax.numpy as jnp

        # observability: which threads execute programs and how often (leak
        # triage — the steady-state serving path must count on exactly one)
        name = threading.current_thread().name
        self._dispatch_threads[name] = self._dispatch_threads.get(name, 0) + 1

        if isinstance(embeds, (list, tuple)):
            embeds = jnp.concatenate(embeds, axis=0)
        if isinstance(pooled_embeds, (list, tuple)):
            pooled_embeds = jnp.concatenate(pooled_embeds, axis=0)
        if isinstance(warm_latents, (list, tuple)):
            lat_shape = (spec.height // 8, spec.width // 8, 4)
            zero = jnp.zeros(lat_shape, jnp.float32)
            warm_latents = jnp.stack(
                [
                    zero if r is None else r.astype(jnp.float32)
                    for r in warm_latents
                ]
            )
        if isinstance(deep_caches, (list, tuple)):
            deep_caches = jnp.stack(deep_caches)
        prog = self._get_program(spec, ref_mode=ref_mode)
        key = (spec, ref_mode)
        if params is None:
            params = self.params
        if ref_mode:
            kwargs = {}
            if pooled_embeds is not None:
                kwargs["pooled_embeds"] = pooled_embeds
            if src_box is not None:
                kwargs["src_box"] = src_box
                kwargs["ref_box"] = ref_box
            args = (
                params, frames, ref_frames, embeds,
                strength, guidance, scale, seed,
            )
            self._capture_shapes(key, args, kwargs)
            out, latents = prog(
                params,
                frames,
                ref_frames,
                embeds,
                strength,
                guidance,
                scale,
                seed,
                **kwargs,
            )
            out = self._maybe_pack_i420(out)
        else:
            kwargs = {}
            if warm_latents is not None:
                kwargs = {"warm_latents": warm_latents, "warm_alpha": warm_alpha}
            if pooled_embeds is not None:
                kwargs["pooled_embeds"] = pooled_embeds
            if src_box is not None:
                kwargs["src_box"] = src_box
            if deep_caches is not None and spec.deepcache_temporal:
                kwargs["deep_caches"] = deep_caches
            args = (
                params, frames, embeds, strength, guidance, scale, seed,
            )
            self._capture_shapes(key, args, kwargs)
            res = prog(
                params, frames, embeds, strength, guidance, scale, seed,
                **kwargs,
            )
            out, latents = res[0], res[1]
            # temporal produce mode additionally returns the trunk caches
            caches = res[2] if len(res) > 2 else None
            out = self._maybe_pack_i420(out)
            return key, "deep_caches" in kwargs, out, latents, caches
        return key, False, out, latents, None

    def _maybe_pack_i420(self, out):
        """RGB u8 [B,H,W,3] -> packed I420 [B,3H/2,W] on device when the
        engine serves i420 and the bucket geometry packs; identity
        otherwise.  Downstream consumers branch on ndim (2 = packed), so
        non-packable buckets degrade to RGB without a mode switch."""
        if self.output_format != "i420":
            return out
        h, w = int(out.shape[1]), int(out.shape[2])
        if h % 4 or w % 2:
            return out
        if self._i420_pack is None:
            import jax

            from videosd_tpu.ops.preprocess import rgb_to_i420

            self._i420_pack = jax.jit(rgb_to_i420)
        return self._i420_pack(out)

    def _black_output(self, h: int, w: int) -> np.ndarray:
        """Black init frame in the stream's wire format (reference
        server.py:99,122): Y=0 + neutral chroma when packing I420."""
        if self.output_format == "i420" and h % 4 == 0 and w % 2 == 0:
            buf = np.full((h * 3 // 2, w), 128, np.uint8)
            buf[:h] = 0
            return buf
        return np.zeros((h, w, 3), np.uint8)

    @staticmethod
    def _as_rgb(frame: np.ndarray) -> np.ndarray:
        """Output frame (RGB [H,W,3] or packed I420 [3H/2,W]) -> RGB.
        Host cost only where RGB is genuinely demanded (reference-frame
        feedback, raw-RGB24 WS replies)."""
        if frame.ndim == 2:
            from videosd_tpu.ops.preprocess import i420_to_rgb_host

            return i420_to_rgb_host(frame)
        return frame

    def _finalize_bucket(self, raw):
        """Block on one dispatched batch and bring the images to the host.

        latents stay DEVICE-RESIDENT — they only feed the next frame's
        warm start, and a host round trip would cost 2 transfers per
        batch for nothing.  Returned pre-sliced per row so the event loop
        never issues the slice ops itself."""
        import jax

        key, is_reuse, out, latents, caches = raw
        jax.block_until_ready(out)
        self._ready_specs.add(key)
        if is_reuse:
            self._ready_reuse.add(key)
        rows = [latents[i] for i in range(latents.shape[0])]
        if caches is not None:
            # temporal trunk rows stay device-resident like the latents
            cache_rows = [caches[i] for i in range(caches.shape[0])]
            return np.asarray(out), rows, cache_rows
        return np.asarray(out), rows

    def _run_bucket_sync(self, *args, **kwargs):
        """Dispatch + wait, on the calling thread (warmup and background
        compiles; the batcher's hot path goes through the single-threaded
        DispatchWorker instead — see _process_group).  Also the seam tests
        monkeypatch for fault injection / serving spies."""
        return self._finalize_bucket(self._dispatch_bucket(*args, **kwargs))

    # ------------------------------------------------------------ batcher

    def _snap_resolution(self, h: int, w: int) -> tuple[int, int]:
        """Snap a requested (h, w) to the nearest configured resolution
        bucket (by area then aspect difference).  No-op when no buckets are
        configured — each distinct resolution then compiles its own
        program, exactly like the reference honors arbitrary sizes."""
        buckets = tuple(self.config.resolution_buckets or ())
        if not buckets:
            return h, w
        return min(
            (tuple(b) for b in buckets),
            key=lambda b: (abs(b[0] * b[1] - h * w), abs(b[0] - h) + abs(b[1] - w)),
        )

    def _bucket_batch(self, n: int, buckets=(1, 2, 4, 8, 16)) -> int:
        """Smallest batch bucket holding n frames.  Under a mesh, buckets
        are multiples of the data-axis size so every chip gets equal rows
        (padding rows are discarded on scatter)."""
        d = self.data_axis
        for b in buckets:
            if n <= b * d:
                return b * d
        return buckets[-1] * d

    def _collect_ready(self):
        """Pull the freshest frame of every stream with pending work."""
        ready = []
        for sid, st in list(self.streams.items()):
            if not st.active or not st.waiters:
                continue
            if not self.queue.has_fresh(sid):
                continue
            buf = np.empty(self._mailbox_shape(), np.uint8)
            fid, ts = self.queue.take(sid, buf)
            if fid:
                ready.append((st, buf, ts))
        return ready

    async def _batch_loop(self):
        import jax.numpy as jnp

        from videosd_tpu.pipelines.lcm_img2img import FrameSpec

        loop = asyncio.get_running_loop()
        while not self._stopped.is_set():
            self._wake.clear()
            ready = self._collect_ready()
            if not ready:
                # resolve waiters of streams whose frame was consumed by a
                # newer submission (drop semantics): hand back last output
                for st in self.streams.values():
                    while st.waiters and not self.queue.has_fresh(st.stream_id):
                        if len(st.waiters) <= 1:
                            break
                        w = st.waiters.pop(0)
                        if not w.done():
                            w.set_result(st.last_output)
                            st.last_reply = time.monotonic()
                            self.telemetry.frames_dropped += 1
                try:
                    await asyncio.wait_for(self._wake.wait(), timeout=0.05)
                except asyncio.TimeoutError:
                    pass
                continue

            # batch-cut policy.  The naive fixed deadline (10 ms) splits
            # synchronous clients into partial batches whose service
            # phases then drift apart permanently — measured 7 vs 16
            # aggregate FPS at 4 sync streams.  Rules, re-evaluated every
            # tick:
            # * all recently-active streams in hand + a pipeline slot
            #   free -> cut NOW (single streams never wait the deadline),
            # * device idle + base deadline passed -> cut (a partial
            #   batch beats an idle chip),
            # * device BUSY -> hold: arrivals accumulate for free while
            #   the in-flight batch runs, so split phases re-merge within
            #   one service cycle.  Bounded by ~2x the generation EMA so
            #   a lone fast stream can't be starved by stale peers.
            t0 = time.perf_counter()
            fill_deadline = t0 + max(
                self.deadline_s, self.config.batch_fill_ms / 1e3
            )
            ema = self.queue.stats().get("ema_gen_time", 0.4)
            hard_cap = t0 + min(2.0, max(self.config.batch_fill_ms / 1e3, 2 * ema))
            prev_busy = bool(self._inflight)
            while len(ready) < self.max_batch:
                busy = bool(self._inflight)
                if prev_busy and not busy:
                    # an in-flight batch just drained: its replies trigger
                    # resubmits that can join this batch — restart the
                    # fill window instead of cutting into the drain race
                    fill_deadline = time.perf_counter() + (
                        self.config.batch_fill_ms / 1e3
                    )
                prev_busy = busy
                now_m = time.monotonic()
                # expected cohort: recently-submitting streams PLUS any
                # stream still awaiting a reply — its client will resubmit
                # as soon as the in-flight batch resolves, so a cut that
                # doesn't wait for it locks the cohort into split phases
                # (a pure recency horizon fails exactly when service time
                # approaches it: reproduced at 0.9 s service -> stable
                # 2+2 split, aggregate 2.2 vs 3.9 frames/s per 4 clients)
                recent = sum(
                    1
                    for st in self.streams.values()
                    if st.active
                    and (
                        # awaiting a reply -> will resubmit.  Done/
                        # cancelled futures (a client's wait_for timed
                        # out) must not count: they never resubmit, and
                        # an inflated target would force every cut to
                        # wait out the fill window engine-wide.
                        any(not w.done() for w in st.waiters)
                        or now_m - st.last_reply < 0.25  # reply just went
                        # out; the client's resubmit is in flight
                        or now_m - st.last_submit < 1.0
                    )
                )
                target = min(self.max_batch, max(len(ready), recent))
                now = time.perf_counter()
                if len(ready) >= target and len(self._inflight) < 2:
                    break  # everyone expected is in hand: cut NOW
                if not self._inflight and now >= fill_deadline:
                    # device idle and the cohort window has passed: a
                    # partial batch beats waiting (the fill window covers
                    # the cohort's resubmit spread — cutting at a shorter
                    # base deadline re-splits phases every cycle)
                    break
                if now >= hard_cap:
                    break
                await asyncio.sleep(0.001)
                more = self._collect_ready()
                if more:
                    # latest-wins INSIDE the fill window too: a stream
                    # whose resubmit lands while we wait REPLACES its
                    # stale row (the mailbox's drop semantics).  Appending
                    # instead would put two rows of one stream in the
                    # batch — wasted device rows, and 4 pipelined streams
                    # could inflate into a phantom batch-8 bucket whose
                    # compile stalls real deployments (observed live).
                    by_sid = {
                        st.stream_id: i for i, (st, _b, _t) in enumerate(ready)
                    }
                    for st, buf, ts in more:
                        i = by_sid.get(st.stream_id)
                        if i is None:
                            by_sid[st.stream_id] = len(ready)
                            ready.append((st, buf, ts))
                        else:
                            ready[i] = (st, buf, ts)
                            self.telemetry.frames_dropped += 1

            # group by shape/mode bucket (steps, h, w, ref, controlnet)
            # and by checkpoint — different models can't share one batch
            # (their params differ) but DO share the compiled program
            groups: dict[Any, list] = {}
            for st, buf, ts in ready:
                h, w = self._snap_resolution(
                    int(st.options["height"]), int(st.options["width"])
                )
                ref_mode = bool(st.options.get("ref"))
                cn_i = max(1, int(st.options.get("controlnet_interval", 1) or 1))
                # ref-mode FrameSpecs force deepcache_interval=1, so key
                # on the EFFECTIVE value: ref streams differing only in
                # this option compile to the identical program and must
                # share one batch
                dc_i = (
                    1
                    if ref_mode
                    else max(1, int(st.options.get("deepcache_interval", 1) or 1))
                )
                tmp_n = (
                    0
                    if ref_mode
                    else max(0, int(st.options.get("deepcache_temporal", 0) or 0))
                )
                if self.pipe_engine is not None and (
                    cn_i > 1 or dc_i > 1 or tmp_n > 0
                ):
                    # the pipelined engine is parity-only (the interval
                    # caches are single-program state); coerce rather than
                    # let a public live option crash the dispatch loop
                    if not getattr(self, "_pipe_turbo_warned", False):
                        self._pipe_turbo_warned = True
                        logging.getLogger("videosd_tpu.engine").warning(
                            "controlnet/deepcache intervals ignored under "
                            "mesh_pipe (pipelined serving is parity-only)"
                        )
                    cn_i = dc_i = 1
                    tmp_n = 0
                if tmp_n > 0:
                    # temporal trunk reuse supersedes the per-step interval
                    # (mutually exclusive inside the program)
                    dc_i = 1
                # produce (refresh trunks) vs reuse is a PROGRAM-INPUT
                # difference, so it is part of the batch grouping: 0 = off,
                # 1 = produce, 2 = reuse.  Reuse requires rows produced
                # under THIS bucket's geometry (steps/h/w/model).
                tmp_key = (int(st.options["steps"]), h, w, self._stream_model(st))
                tmp_mode = 0
                if tmp_n > 0:
                    reusable = (
                        st.deep_rows is not None
                        and st.deep_rows_key == tmp_key
                        and st.temporal_age < tmp_n
                    )
                    tmp_mode = 2 if reusable else 1
                key = (
                    int(st.options["steps"]),
                    h,
                    w,
                    ref_mode,
                    bool(st.options.get("controlnet", True)),
                    cn_i,
                    dc_i,
                    # refresh-last only changes the program when a cache is
                    # live — same effective-value rule as dc_i above
                    bool(st.options.get("interval_refresh_last", False))
                    and (cn_i > 1 or dc_i > 1),
                    tmp_mode,
                    self._stream_model(st),
                )
                groups.setdefault(key, []).append((st, buf, ts))

            # pipeline up to 2 batches: host packing + prompt encoding of
            # batch N+1 overlaps device compute of batch N
            for key, items in groups.items():
                while len(self._inflight) >= 2:
                    await asyncio.wait(
                        set(self._inflight), return_when=asyncio.FIRST_COMPLETED
                    )
                task = loop.create_task(self._process_group(loop, key, items))
                self._inflight.add(task)
                task.add_done_callback(self._inflight.discard)

        # only in-flight dispatches are awaited here; background compiles
        # (potentially multi-minute, uncancellable) are drained with a
        # bounded join in stop() — never block the loop exit on them
        if self._inflight:
            await asyncio.gather(*self._inflight, return_exceptions=True)

    async def _process_group(self, loop, key, items):
        import jax.numpy as jnp

        from videosd_tpu.pipelines.lcm_img2img import FrameSpec

        (
            steps, h, w, ref_mode, use_cn, cn_interval, dc_interval,
            refresh_last, tmp_mode, model,
        ) = key
        b = self._bucket_batch(len(items))
        spec = FrameSpec(
            batch=b,
            height=h,
            width=w,
            in_height=self.frame_hw[0],
            in_width=self.frame_hw[1],
            in_format=self.input_format,
            steps=steps,
            use_controlnet=use_cn and not ref_mode,
            controlnet_interval=cn_interval,
            # the reference-attention program has its own double-pass UNet
            # path; DeepCache applies to the plain img2img program only
            deepcache_interval=1 if ref_mode else dc_interval,
            interval_refresh_last=refresh_last,
            deepcache_temporal=tmp_mode > 0,
        )
        # compile-stall avoidance: a fresh bucket (steps slider moved, a
        # resolution renegotiation, or more concurrent streams than any
        # compiled batch size) is a multi-minute XLA compile — serve these
        # frames with the nearest already-compiled variant NOW and swap
        # when the background compile lands
        if (spec, ref_mode) not in self._ready_specs:
            import dataclasses

            # list() snapshot: executor threads add to _ready_specs concurrently
            batch_variants = {
                s.batch
                for s, rm in list(self._ready_specs)
                if rm == ref_mode and dataclasses.replace(s, batch=b) == spec
            }
            if batch_variants:
                self._compile_spec_background(loop, spec, ref_mode)
                bigger = sorted(v for v in batch_variants if v >= len(items))
                if bigger:
                    # pad up into the smallest ready larger batch
                    b = bigger[0]
                    spec = dataclasses.replace(spec, batch=b)
                else:
                    # chunk down: this call serves the first bmax items with
                    # the largest ready batch; the rest re-enter as their
                    # own groups (same logic applies to them)
                    bmax = max(batch_variants)
                    for i in range(bmax, len(items), bmax):
                        t = loop.create_task(
                            self._process_group(loop, key, items[i : i + bmax])
                        )
                        self._inflight.add(t)
                        t.add_done_callback(self._inflight.discard)
                    items = items[:bmax]
                    b = bmax
                    spec = dataclasses.replace(spec, batch=b)
            else:
                fallback = self._nearest_ready_spec(spec, ref_mode)
                if fallback is not None:
                    self._compile_spec_background(loop, spec, ref_mode)
                    spec = fallback
                else:
                    # nothing can stand in (cold start, or the first
                    # ref-mode stream): a sync compile here would sit ON
                    # the dispatch thread and serialize EVERY stream behind
                    # a multi-minute XLA compile.  Pass the frames through
                    # (the reference's init-frame behavior while a model
                    # loads, server.py:99,122) and warm in background.
                    self._compile_spec_background(loop, spec, ref_mode)
                    for st, _buf, _ts in items:
                        while st.waiters:
                            wtr = st.waiters.pop(0)
                            if not wtr.done():
                                wtr.set_result(st.last_output)
                                st.last_reply = time.monotonic()
                                self.telemetry.frames_dropped += 1
                    return
        t_pack = time.perf_counter()
        # pre-encode any uncached prompts ON THE DISPATCH THREAD (an
        # encoder run from the event loop would be a second thread touching
        # the runtime — the exact pattern that leaks, runtime/dispatch.py).
        # Inside a protected region: a tokenizer/encoder failure must
        # resolve the waiters (with the last good output) instead of
        # killing this task and stranding the submit futures forever.
        import functools as _ft

        try:
            # loop until stable: update_options can mutate a prompt DURING
            # the encode awaits; without re-checking, _stream_embeds would
            # face a cache miss on the event loop (its fallbacks cover it,
            # but a brand-new stream would then encode on the wrong
            # thread).  Converges because mutations are human-rate.
            while True:
                missing = {
                    (self._stream_model(st), str(st.options["prompt"]))
                    for st, _buf, _ts in items
                    if (self._stream_model(st), str(st.options["prompt"]))
                    not in self._prompt_cache
                }
                if not missing:
                    break
                for mdl, pr in missing:
                    await self._get_dispatcher().run(
                        loop,
                        _ft.partial(self._encode_prompt, pr, mdl),
                        lambda r: None,
                    )
        except Exception:
            logging.getLogger("videosd_tpu.engine").exception(
                "prompt pre-encode failed for bucket %s", spec
            )
            for st, _buf, _ts in items:
                while st.waiters:
                    wtr = st.waiters.pop(0)
                    if not wtr.done():
                        wtr.set_result(st.last_output)
                        st.last_reply = time.monotonic()
            return
        frames = np.zeros((b, *self._mailbox_shape()), np.uint8)
        ref_frames = np.zeros((b, *self.frame_hw, 3), np.uint8)
        strength = np.full((b,), 0.6, np.float32)
        guidance = np.full((b,), 5.0, np.float32)
        if ref_mode:
            # [B, 2]: (attention fidelity, adain fidelity) — the traced
            # form of the reference_attn/reference_adain booleans
            scale = np.ones((b, 2), np.float32)
        else:
            scale = np.full((b,), 2.0, np.float32)  # controlnet scale
        seed = np.zeros((b,), np.int32)
        # per-element source rectangles: true camera extent -> on-device
        # center-crop parity with the reference at ANY negotiated size
        full_box = self._src_box(None, spec.height, spec.width)
        src_box = np.tile(np.asarray(full_box, np.int32), (b, 1))
        ref_box = np.tile(np.asarray(full_box, np.int32), (b, 1))
        # derive from the (possibly substituted) spec, not the request key
        lat_shape = (spec.height // 8, spec.width // 8, 4)
        warm_alpha = np.zeros((b,), np.float32)
        warm_rows: list = [None] * b  # None -> zeros; else device-resident
        emb_list = []
        for i, (st, buf, ts) in enumerate(items):
            frames[i] = buf
            st.last_input = buf
            if st.in_hw is not None:
                src_box[i] = self._src_box(st.in_hw, spec.height, spec.width)
            if ref_mode and st.ref_frame is not None:
                fitted, ext = self._fit_frame_rgb(st.ref_frame)
                ref_frames[i] = fitted
                ref_box[i] = self._src_box(
                    st.ref_hw or ext, spec.height, spec.width
                )
            strength[i] = float(st.options["strength"])
            guidance[i] = float(st.options["guidance_scale"])
            if ref_mode:
                sf = float(st.options["style_fidelity"])
                scale[i, 0] = sf if st.options.get("reference_attn", True) else 0.0
                scale[i, 1] = sf if st.options.get("reference_adain", True) else 0.0
            else:
                scale[i] = float(st.options["controlnet_scale"])
            seed[i] = int(st.options["seed"])
            wa = float(st.options.get("warm_alpha", 0.0) or 0.0)
            if (
                wa > 0
                and st.last_latents is not None
                and tuple(st.last_latents.shape) == lat_shape
            ):
                warm_alpha[i] = wa
                warm_rows[i] = st.last_latents
            emb_list.append(self._stream_embeds(st))
        emb_list.extend([emb_list[-1]] * (b - len(items)))
        # device-side assembly (embeds concat, warm-latent stack, pooled
        # concat) happens in _dispatch_bucket on the dispatch thread; pass
        # the pieces.  All-cold warm batches pass host zeros directly.
        embeds = [e for e, _ in emb_list]
        if any(r is not None for r in warm_rows):
            warm_lat: Any = warm_rows
        else:
            warm_lat = np.zeros((b, *lat_shape), np.float32)
        deep_rows_in = None
        if spec.deepcache_temporal and tmp_mode == 2:
            if (spec, ref_mode) not in self._ready_reuse:
                # the reuse trace is still cold (temporal enabled live;
                # produce warmed first) — dispatching it now would
                # cold-compile ON the single dispatch worker and stall
                # every stream.  Run this batch as produce instead (parity
                # output, refreshes the rows) and keep warming the reuse
                # variant in the background (_warm_spec covers both).
                self._compile_spec_background(loop, spec, ref_mode)
            else:
                # reuse batch: every member was grouped here BECAUSE it
                # holds valid rows for this bucket key; pad rows feed
                # discarded outputs
                deep_rows_in = [st.deep_rows for st, _buf, _ts in items]
                deep_rows_in.extend([deep_rows_in[-1]] * (b - len(items)))
        pooled = None
        if self.bundle.clip2_cfg is not None:
            # SDXL text_time micro-conditioning consumes the pooled embeds
            pooled = [p for _, p in emb_list]

        self.telemetry.stages.record("pack", time.perf_counter() - t_pack)
        self.queue.mark_gen_start()
        t0 = time.perf_counter()
        try:
            run_args = (
                spec,
                ref_mode,
                frames,
                ref_frames,
                embeds,
                strength,
                guidance,
                scale,
                seed,
                None if ref_mode else warm_lat,
                None if ref_mode else warm_alpha,
                pooled,
                src_box,
                ref_box if ref_mode else None,
            )
            import functools

            run_kw = {}
            if deep_rows_in is not None:
                run_kw["deep_caches"] = deep_rows_in
            if model:
                if model not in self._extra_bundles:
                    # cold registry entry: loading converts a checkpoint on
                    # host (potentially minutes) — serve THIS batch on the
                    # default params and warm the entry off-loop, the same
                    # stall-avoidance shape as a cold bucket compile
                    self._load_model_background(model)
                else:
                    run_kw["params"] = self.params_for(model)
            if "_run_bucket_sync" in self.__dict__:
                # a test monkeypatched the seam: run its whole function on
                # the dispatch thread (serialized; fine for tests)
                res = await self._get_dispatcher().run(
                    loop,
                    functools.partial(self._run_bucket_sync, *run_args, **run_kw),
                    lambda raw: raw,
                )
            else:
                # hot path: async dispatch now, block on the worker later —
                # pipelining without multi-threaded runtime access
                res = await self._get_dispatcher().run(
                    loop,
                    functools.partial(self._dispatch_bucket, *run_args, **run_kw),
                    self._finalize_bucket,
                )
            # (out, lat_rows[, temporal cache_rows]) — 2-tuple tolerated so
            # test fakes of _run_bucket_sync keep working
            out, latents = res[0], res[1]
            cache_rows = res[2] if len(res) > 2 else None
        except Exception:
            # a failed batch must not kill the loop (the reference's
            # try/finally around infer, server.py:107-111): resolve
            # waiters with the last good output and keep serving
            import logging

            logging.getLogger("videosd_tpu.engine").exception(
                "frame program failed for bucket %s", spec
            )
            for st, _buf, _ts in items:
                while st.waiters:
                    wtr = st.waiters.pop(0)
                    if not wtr.done():
                        wtr.set_result(st.last_output)
                        st.last_reply = time.monotonic()
            return
        dt = time.perf_counter() - t0
        self.telemetry.stages.record("device", dt)
        self.queue.record_gen(dt)
        self.telemetry.record_generation(
            dt, batch=len(items), fill=len(items) / b
        )

        for i, (st, _buf, _ts) in enumerate(items):
            st.last_output = out[i]
            st.last_latents = latents[i]
            n_tmp = int(st.options.get("deepcache_temporal", 0) or 0)
            if n_tmp <= 0:
                st.deep_rows = None  # toggled off: never reuse stale rows
            elif cache_rows is not None:
                # produce frame: fresh trunk rows for this bucket key
                st.deep_rows = cache_rows[i]
                st.deep_rows_key = (
                    spec.steps, spec.height, spec.width, self._stream_model(st),
                )
                st.temporal_age = 1
            elif spec.deepcache_temporal:
                st.temporal_age += 1
            # reference behavior: when ref is on, the last generated
            # frame becomes the new reference (server.py:115-116)
            if st.options.get("ref"):
                st.ref_frame = self._as_rgb(out[i])
                st.ref_hw = None  # extent derives from the output's shape
            while st.waiters:
                wtr = st.waiters.pop(0)
                if not wtr.done():
                    wtr.set_result(out[i])
                    st.last_reply = time.monotonic()

    # ------------------------------------------------------------ stats

    def stats(self) -> dict:
        s = self.telemetry.snapshot()
        s.update(self.queue.stats())
        s["streams"] = len(self.streams)
        s["programs_compiled"] = len(self._programs)
        s["programs_compiling"] = len(self._compiling)
        # servable buckets (first dummy run done).  _programs registers at
        # BUILD time, so compiled >= ready while warmups are in flight —
        # ops should gate load admission on this one (see BACKLOG: on
        # remote-dispatch rigs, in-flight warmups time-share the chip)
        s["programs_ready"] = len(self._ready_specs)
        # public view of the servable buckets (batch is the COMPILED batch,
        # i.e. a data-axis multiple when mesh-sharded) — lets external
        # health checks (and the driver dryrun) assert sharding-consistent
        # bucket geometry without reaching into private state
        s["ready_buckets"] = sorted(
            (
                {
                    "batch": sp.batch,
                    "height": sp.height,
                    "width": sp.width,
                    "steps": sp.steps,
                    "ref_mode": rm,
                }
                for sp, rm in list(self._ready_specs)
            ),
            key=lambda d: (
                d["batch"], d["height"], d["width"], d["steps"], str(d["ref_mode"]),
            ),
        )
        s["dispatch_threads"] = dict(self._dispatch_threads)
        if self.pipe_engine is not None:
            m0 = self.pipe_engine.pipe.mesh0
            s["devices"] = {
                "data": m0.shape["data"],
                "model": m0.shape["model"],
                "pipe": 2,
            }
        elif self.mesh is not None:
            s["devices"] = {
                "data": self.mesh.shape["data"],
                "model": self.mesh.shape["model"],
            }
        else:
            s["devices"] = {"data": 1, "model": 1}
        s["weights_source"] = self.weights_source  # None = random init
        if self.model_names:
            s["models"] = {
                name: ("loaded" if name in self._extra_bundles else "cold")
                for name in self.model_names
            }
        loras = getattr(self.config, "lora", None) or []
        if loras:
            s["lora"] = [{"path": p, "scale": sc} for p, sc in loras]
        if str(getattr(self.config, "quant", "none")).lower() != "none":
            s["quant"] = self.config.quant
        return s
