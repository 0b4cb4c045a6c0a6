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
from videosd_tpu.runtime.engine_batcher import BatcherMixin
from videosd_tpu.runtime.engine_framing import FrameIOMixin
from videosd_tpu.runtime.engine_programs import ProgramCacheMixin
from videosd_tpu.runtime.engine_registry import ModelRegistryMixin
from videosd_tpu.runtime.engine_warmup import WarmupMixin
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


class Engine(
    FrameIOMixin,
    ModelRegistryMixin,
    ProgramCacheMixin,
    WarmupMixin,
    BatcherMixin,
):
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
