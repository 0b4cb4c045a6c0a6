"""Benchmark: flagship 4-step LCM 512x512 img2img frame rate on one chip.

Prints ONE JSON line {"metric","value","unit","vs_baseline"}.
Baseline: the rebuild target of >=20 FPS/stream (BASELINE.md; the reference
publishes no numbers of its own — its only runtime metric is the
"Average gentime" EMA, diffusert/server.py:113-114).
vs_baseline = measured_fps / 20.

Two first-class numbers (PERF.md "Headline metric story"):
* ``value``/``vs_baseline`` — the PARITY program (exact reference loop
  semantics, no approximations).  Measured single-chip ceiling is ~17 FPS
  perfect-case (~62% roofline device time, PERF.md); crossing 20 FPS in
  parity mode requires dp/tp over >=2 chips — sharding rules are built
  and equality-verified on an 8-device mesh, hardware absent on this rig.
* ``production_temporal2_cn1_fps``/``production_turbo_vs_baseline``
  — the RECOMMENDED production config (temporal DeepCache N=2, NO
  ControlNet-interval approximation): steady-state cadence FPS,
  quality-gated on the REAL sd15 family at 256² with a CONVERGED
  Stage-C ControlNet (examples/temporal_gate_sd15_256_cn1.json: 31.25 dB
  mean / 26.7 dB worst-frame vs parity; N=1 pins bit-identity).  The
  round-4 recommendation (temporal N=2 + cn2+last,
  ``production_temporal2_cn2_last_fps``) stays measured as the
  speed-leaning option — at real-family calibration the cn2 interval
  alone costs ~5.7 dB (26.1 dB at N=1), a price the tiny-toy gate could
  not see (its CN axis was vacuous before Stage-C converged).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the 4-step 512x512 program is a multi-minute
# compile on this host; cache it across bench runs
from videosd_tpu.compile_cache import setup as _setup_compile_cache

_setup_compile_cache()

BASELINE_FPS = 20.0


def _warm(fn, *args, attempts: int = 3, **kw):
    """First call of a program compiles; retry the known tunnel flake
    ("response body closed before all bytes were read" mid-remote-compile,
    BACKLOG).  Finished compiles persist in the cache, so retries are
    cheap.  The driver runs this file unattended at round end — a single
    flake must not record a failed bench."""
    for attempt in range(attempts):
        try:
            out = fn(*args, **kw)
            jax.block_until_ready(out)
            return out
        except Exception as e:  # jax.errors.JaxRuntimeError
            if attempt == attempts - 1:
                raise
            print(f"# compile retry: {e}", flush=True)
            time.sleep(5)


def main() -> None:
    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )

    bundle = ModelBundle.random("sd15", dtype=jnp.bfloat16)
    spec = FrameSpec(batch=1, height=512, width=512, steps=4)
    program = build_frame_program(bundle, spec)
    encoder = build_prompt_encoder(bundle)

    ids = jnp.asarray(bundle.tokenizer(["portrait, pixar, cg"]), jnp.int32)
    embeds, _ = encoder(bundle.params, ids)

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (1, 512, 512, 3), dtype=np.uint8))
    strength = jnp.array([0.6], jnp.float32)
    guidance = jnp.array([5.0], jnp.float32)
    cn = jnp.array([2.0], jnp.float32)
    seed = jnp.array([23], jnp.int32)

    # warmup/compile
    _warm(program, bundle.params, frame, embeds, strength, guidance, cn, seed)

    # throughput: pipelined dispatch (device-bound; JAX async dispatch hides
    # host/tunnel round trips, as the serving engine does in steady state).
    # Best of 3 windows: this rig reaches the TPU over a shared tunnel whose
    # latency jitters 1.5-2x (PERF.md "measurement pitfalls") — the quietest
    # window is the device-capability number; production host<->TPU DMA has
    # no such artifact.
    def fps_window(n: int = 30) -> float:
        t_start = time.perf_counter()
        outs = []
        for i in range(n):
            out, _ = program(
                bundle.params, frame, embeds, strength, guidance, cn, seed + i
            )
            outs.append(out)
            if len(outs) > 2:  # keep 2 frames in flight
                jax.block_until_ready(outs.pop(0))
        jax.block_until_ready(outs)
        return n / (time.perf_counter() - t_start)

    fps = max(fps_window() for _ in range(3))

    # latency: per-frame blocking round trip
    lat_ms = []
    for i in range(10):
        t0 = time.perf_counter()
        out, lat = program(
            bundle.params, frame, embeds, strength, guidance, cn, seed + i
        )
        jax.block_until_ready(out)
        lat_ms.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(lat_ms, 50))

    # multi-stream: batch-4 cross-stream batching (the serving engine's
    # bucket), aggregate frames/s across the 4 streams on this one chip
    spec4 = FrameSpec(batch=4, height=512, width=512, steps=4)
    program4 = build_frame_program(bundle, spec4)
    frame4 = jnp.asarray(rng.integers(0, 256, (4, 512, 512, 3), dtype=np.uint8))
    embeds4 = jnp.concatenate([embeds] * 4, axis=0)
    args4 = (
        jnp.full((4,), 0.6, jnp.float32),
        jnp.full((4,), 5.0, jnp.float32),
        jnp.full((4,), 2.0, jnp.float32),
        jnp.arange(4, dtype=jnp.int32),
    )
    _warm(program4, bundle.params, frame4, embeds4, *args4)
    def fps4_window(n4: int = 12) -> float:
        t_start = time.perf_counter()
        outs = []
        for _ in range(n4):
            out, _ = program4(bundle.params, frame4, embeds4, *args4)
            outs.append(out)
            if len(outs) > 2:
                jax.block_until_ready(outs.pop(0))
        jax.block_until_ready(outs)
        return 4 * n4 / (time.perf_counter() - t_start)

    fps4 = max(fps4_window() for _ in range(3))

    # informational extras: the opt-in approximation turbo modes
    # (controlnet_interval / deepcache_interval — NOT reference semantics,
    # so they never feed the headline value/vs_baseline, which stay the
    # parity program's numbers).  Quality deltas vs the parity program are
    # measured in tools/turbo_ladder.py and tabled in PERF.md.
    def turbo_fps(cn_i: int, dc_i: int, rl: bool = False) -> float:
        spec_t = FrameSpec(
            batch=1, height=512, width=512, steps=4,
            controlnet_interval=cn_i, deepcache_interval=dc_i,
            interval_refresh_last=rl,
        )
        program_t = build_frame_program(bundle, spec_t)
        _warm(program_t, bundle.params, frame, embeds, strength, guidance, cn, seed)

        def win(n: int = 30) -> float:
            t_start = time.perf_counter()
            outs = []
            for i in range(n):
                out, _ = program_t(
                    bundle.params, frame, embeds, strength, guidance, cn, seed + i
                )
                outs.append(out)
                if len(outs) > 2:
                    jax.block_until_ready(outs.pop(0))
            jax.block_until_ready(outs)
            return n / (time.perf_counter() - t_start)

        return max(win() for _ in range(3))

    fps_turbo = turbo_fps(4, 1)
    fps_dc = turbo_fps(1, 2)
    # recommended production turbo (PERF.md "Round 4: trained-weight
    # quality gates"): cn=2 x dc=3 with interval_refresh_last — the
    # strongest trained-toy gate above the 20 FPS target (31.3 dB PSNR /
    # 0.979 SSIM vs parity; 21.3 FPS, p50 74.7 ms measured).  Round 3's
    # cn4/dc2 recommendation was retired: its 59 dB gate was an artifact
    # of a no-op random-init ControlNet and fell to 14.5 dB on trained
    # weights.  First-class metric with its own vs_baseline: this is the
    # configuration production actually serves at >=20 FPS on ONE chip.
    fps_prod = turbo_fps(2, 3, rl=True)

    # temporal DeepCache steady-state (PERF.md "Temporal DeepCache"):
    # refresh the per-step trunk caches every N frames, reuse in between.
    # N=2 + cn2+last is the round-4 RECOMMENDED production config — on
    # the same drifting-sequence trained-toy gate it strictly dominates
    # cn2/dc3+last (39.1 vs 30.8 dB mean at equal worst-frame and higher
    # FPS), so production_turbo_vs_baseline reports ITS ratio.
    def temporal_fps(n_every: int, cn_i: int, rl: bool, frames: int = 32) -> float:
        spec_t = FrameSpec(
            batch=1, height=512, width=512, steps=4,
            deepcache_temporal=True, controlnet_interval=cn_i,
            interval_refresh_last=rl,
        )
        program_t = build_frame_program(bundle, spec_t)
        caches = _warm(
            program_t, bundle.params, frame, embeds, strength, guidance, cn, seed
        )[2]
        _warm(
            program_t, bundle.params, frame, embeds, strength, guidance, cn,
            seed, deep_caches=caches,
        )

        def win() -> float:
            c = caches
            t_start = time.perf_counter()
            outs = []
            for i in range(frames):
                if i % n_every == 0:
                    out, _lat, c = program_t(
                        bundle.params, frame, embeds, strength, guidance, cn,
                        seed + i,
                    )
                else:
                    out, _lat = program_t(
                        bundle.params, frame, embeds, strength, guidance, cn,
                        seed + i, deep_caches=c,
                    )
                outs.append(out)
                if len(outs) > 2:
                    jax.block_until_ready(outs.pop(0))
            jax.block_until_ready(outs)
            return frames / (time.perf_counter() - t_start)

        return max(win() for _ in range(3))

    fps_temporal = temporal_fps(2, 2, True)
    # RECOMMENDED at real-family calibration (see module docstring):
    # pure temporal trunk reuse, ControlNet evaluated every step
    fps_temporal_cn1 = temporal_fps(2, 1, False)

    # reference-attention mode (B7, the reference's second headline
    # pipeline): 2x UNet per step — measure, don't assert (VERDICT r4).
    # Same method as the headline; drift/quality gating lives in
    # tools/ref_gate.py + PERF.md "Reference-attention mode".
    from videosd_tpu.pipelines.reference_attn import build_reference_program

    spec_r = FrameSpec(
        batch=1, height=512, width=512, steps=4, use_controlnet=False
    )
    program_r = build_reference_program(bundle, spec_r)
    sf_pair = jnp.ones((1, 2), jnp.float32)
    _warm(
        program_r, bundle.params, frame, frame, embeds, strength, guidance,
        sf_pair, seed,
    )

    def ref_window(n: int = 20) -> float:
        t_start = time.perf_counter()
        outs = []
        for i in range(n):
            out, _ = program_r(
                bundle.params, frame, frame, embeds, strength, guidance,
                sf_pair, seed + i,
            )
            outs.append(out)
            if len(outs) > 2:
                jax.block_until_ready(outs.pop(0))
        jax.block_until_ready(outs)
        return n / (time.perf_counter() - t_start)

    fps_ref = max(ref_window() for _ in range(3))

    # ---- MFU (VERDICT r4): one auditable utilization number ----------
    # FLOPs come from walking the traced program's jaxpr (ops/flops.py):
    # every dot_general/conv counted — logical (textbook 2MKN) and padded
    # (every matmul dim rounded to the MXU tile: lane 128 / sublane 8 —
    # the account under which d_head=40 attention pays 3.2x).  Trace with
    # the XLA attention path so QK^T/AV appear as dot_generals; build a
    # FRESH jit object so the env flag can't be shadowed by a cached
    # trace.  Seconds/frame = 1/steady-state pipelined FPS — the
    # device-bound proxy on this rig (dispatch gaps hidden; PERF.md
    # measured device time within ~2% of it).  Wall-clock-based by
    # construction; a pure device-time MFU would read slightly higher.
    import os

    from videosd_tpu.ops.flops import device_peak_flops, mfu, program_flops

    os.environ["VIDEOSD_ATTN_IMPL"] = "xla"
    try:
        flops = program_flops(
            build_frame_program(bundle, spec),
            bundle.params, frame, embeds, strength, guidance, cn, seed,
        )
        flops4 = program_flops(
            build_frame_program(bundle, spec4),
            bundle.params, frame4, embeds4, *args4,
        )
    finally:
        del os.environ["VIDEOSD_ATTN_IMPL"]
    peak = device_peak_flops()
    mfu_logical = mfu(flops["logical"], 1.0 / fps, peak=peak)
    mfu_padded = mfu(flops["padded"], 1.0 / fps, peak=peak)
    mfu4_logical = mfu(flops4["logical"], 4.0 / fps4, peak=peak)

    print(
        json.dumps(
            {
                # headline stays the PARITY program (reference loop
                # semantics, bit-honest): single-chip ceiling is ~17 FPS
                # perfect-case (PERF.md roofline); parity >=20 FPS needs
                # dp/tp over >=2 chips (parallel/ rules ready, single-chip
                # rig here).  production_* is the quality-gated config
                # that crosses the 20 FPS target on ONE chip.
                "metric": "lcm_4step_512x512_img2img_fps_1stream",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
                "p50_latency_ms": round(p50, 2),
                "batch4_aggregate_fps": round(fps4, 3),
                "cn_interval4_turbo_fps": round(fps_turbo, 3),
                "dc_interval2_turbo_fps": round(fps_dc, 3),
                "production_turbo_cn2_dc3_last_fps": round(fps_prod, 3),
                "production_temporal2_cn1_fps": round(fps_temporal_cn1, 3),
                "production_temporal2_cn2_last_fps": round(fps_temporal, 3),
                "ref_mode_fps": round(fps_ref, 3),
                # ratio of the RECOMMENDED config (temporal N=2 + cn1,
                # 31.25 dB mean at sd15-256); the speed-leaning cn2+last
                # ratio is derivable from its own fps field
                "production_turbo_vs_baseline": round(
                    fps_temporal_cn1 / BASELINE_FPS, 4
                ),
                # MFU: jaxpr-walk FLOPs / (steady-state s/frame x chip bf16
                # peak).  logical = model math; padded = MXU-tile math (the
                # hardware-utilization view; d_head=40 + channel padding).
                "flops_per_frame_tflop_logical": round(flops["logical"] / 1e12, 3),
                "flops_per_frame_tflop_padded": round(flops["padded"] / 1e12, 3),
                "chip_peak_bf16_tflops": None if peak is None else peak / 1e12,
                "mfu": None if mfu_logical is None else round(mfu_logical, 4),
                "mfu_padded": None if mfu_padded is None else round(mfu_padded, 4),
                "mfu_batch4": None if mfu4_logical is None else round(mfu4_logical, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
