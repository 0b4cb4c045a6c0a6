"""Sharded-numerics verification: dp x tp (flagship geometry) and
pipeline-parallel (2-stage UNet split) vs the single-device program.

Runs the REAL sd15-family flagship program — FrameSpec(512x512, steps=4),
the program customers actually serve (BASELINE config 1 shape) — sharded
over an n-device ("data","model") mesh, and asserts output equality with
the single-device program on the same inputs.  Random weights (this image
has no checkpoint egress); the check pins the SHARDING's numerics: a TP
partition that mis-slices a fused QKV kernel, drops a psum, or pads a
head dimension wrong produces garbage here, weights trained or not.

Used by both ``__graft_entry__.dryrun_multichip`` (driver-run on N
virtual CPU devices) and the slow test
``tests/test_parallel.py::test_flagship_sharded_matches_single_device``.

Replaces: the reference's actor-pool scaling (server.py:317-321), whose
multi-GPU correctness was never machine-checked at all (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

__all__ = ["verify_flagship_dp_tp", "verify_pipeline_parallel"]


def verify_flagship_dp_tp(
    n_devices: int,
    *,
    model_parallel: int | None = None,
    family: str = "sd15",
    size: int = 512,
    steps: int = 4,
    max_u8_diff: int = 2,
) -> dict:
    """Returns {"max_diff", "mean_diff", "mesh": (dp, tp), "batch"}.

    fp32 (CPU-native and parity-grade): the sharded and single-device
    executions differ only by collective reduction order, so uint8
    outputs must agree within ``max_u8_diff`` counts.

    ``family``/``size``/``steps`` scale the check's cost: the default is
    the true flagship (sd15, 512x512, 4 steps; ~40 min cold on a 1-core
    CPU rig — the slow-test tier).  ``family="tiny"`` runs the SAME
    sharding rules, collectives, and head-sharded attention on the small
    topology (compile dominates the cost on CPU, and even sd15 at
    128x128/2 steps exceeded 580 s cold in round-4 measurement — the
    UNet graph's op count, not its shapes, drives compile time), sized
    for the driver's minutes-scale dryrun budget.
    """
    from videosd_tpu.compile_cache import setup as setup_cache

    setup_cache()  # flagship CPU compiles are multi-minute; persist them

    import jax
    import jax.numpy as jnp

    from videosd_tpu.parallel.serving import ShardedFrameEngine
    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )
    from videosd_tpu.tools.turbo_ladder import structured_frame

    if model_parallel is None:
        # prefer a tall TP so the check stresses the Megatron rules hard
        # while keeping batch (= data size) minimal for 1-core CPU rigs
        model_parallel = max(
            (m for m in (4, 2, 1) if n_devices % m == 0 and m <= n_devices),
        )
    bundle = ModelBundle.random(family, dtype=jnp.float32)
    eng = ShardedFrameEngine(
        bundle, n_devices=n_devices, model_parallel=model_parallel
    )
    b = eng.data_size
    spec = FrameSpec(batch=b, height=size, width=size, steps=steps)

    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["portrait, pixar, cg"]), jnp.int32)
    ctx, pooled = enc(bundle.params, ids)
    embeds = jnp.concatenate([ctx] * b, axis=0)
    kw = {}
    if bundle.unet_cfg.addition_embed_type == "text_time":
        # SDXL micro-conditioning: pooled embeds ride the data axis too
        kw["pooled_embeds"] = jnp.concatenate([pooled] * b, axis=0)
    frames = jnp.asarray(
        np.stack([structured_frame(i, size, size) for i in range(b)])
    )
    strength = jnp.linspace(0.4, 0.8, b).astype(jnp.float32)
    guidance = jnp.full((b,), 5.0, jnp.float32)
    cn = jnp.full((b,), 2.0, jnp.float32)
    seed = jnp.arange(23, 23 + b, dtype=jnp.int32)

    out_sh, lat_sh = eng.run(spec, frames, embeds, strength, guidance, cn, seed, **kw)
    out_sh = np.asarray(out_sh)

    prog = build_frame_program(bundle, spec)
    out_1, lat_1 = prog(
        bundle.params, frames, embeds, strength, guidance, cn, seed, **kw
    )
    out_1 = np.asarray(out_1)

    diff = np.abs(out_sh.astype(np.int32) - out_1.astype(np.int32))
    lat_ok = np.allclose(
        np.asarray(lat_sh, np.float32), np.asarray(lat_1, np.float32),
        rtol=1e-4, atol=1e-4,
    )
    result = {
        "max_diff": int(diff.max()),
        "mean_diff": float(diff.mean()),
        "latents_allclose": bool(lat_ok),
        "mesh": (eng.mesh.shape["data"], eng.mesh.shape["model"]),
        "batch": b,
    }
    if diff.max() > max_u8_diff or not lat_ok:
        raise AssertionError(f"sharded != single-device: {result}")
    return result


def verify_pipeline_parallel(
    n_devices: int,
    *,
    model_parallel: int = 2,
    family: str = "tiny",
    size: int = 64,
    steps: int = 2,
    max_u8_diff: int = 2,
) -> dict:
    """Pipeline-parallel numerics verification (the §2.4 PP row).

    Runs the frame program through parallel/pipe.PipelinedFrameEngine —
    2 UNet stages on disjoint ("data","model") submeshes, dp x tp inside
    each — and asserts output equality with the single-device monolithic
    program on the same inputs, plus stage-LOCAL param placement (the
    capacity claim PP exists for).  Same tolerance rationale as
    verify_flagship_dp_tp: fp32, reduction-order-level differences only.
    """
    from videosd_tpu.compile_cache import setup as setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from videosd_tpu.parallel.pipe import PipelinedFrameEngine
    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )
    from videosd_tpu.tools.turbo_ladder import structured_frame

    bundle = ModelBundle.random(family, dtype=jnp.float32)
    eng = PipelinedFrameEngine(
        bundle, devices=jax.devices()[:n_devices], model_parallel=model_parallel
    )
    b = eng.data_size
    spec = FrameSpec(batch=b, height=size, width=size, steps=steps)

    # the memory claim: each stage's params occupy ONLY its submesh
    dev0 = set(eng.pipe.mesh0.devices.flat)
    dev1 = set(eng.pipe.mesh1.devices.flat)
    assert dev0.isdisjoint(dev1)
    for leaf in jax.tree.leaves((eng.pipe.p0, eng.vae0)):
        assert set(leaf.sharding.device_set) <= dev0
    for leaf in jax.tree.leaves((eng.pipe.p1, eng.vae1)):
        assert set(leaf.sharding.device_set) <= dev1

    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["portrait, pixar, cg"]), jnp.int32)
    ctx, pooled = enc(bundle.params, ids)
    embeds = jnp.concatenate([ctx] * b, axis=0)
    kw = {}
    if bundle.unet_cfg.addition_embed_type == "text_time":
        kw["pooled_embeds"] = jnp.concatenate([pooled] * b, axis=0)
    frames = jnp.asarray(
        np.stack([structured_frame(i, size, size) for i in range(b)])
    )
    strength = jnp.linspace(0.4, 0.8, b).astype(jnp.float32)
    guidance = jnp.full((b,), 5.0, jnp.float32)
    cn = jnp.full((b,), 2.0, jnp.float32)
    seed = jnp.arange(23, 23 + b, dtype=jnp.int32)

    out_pp, lat_pp = eng.run(spec, frames, embeds, strength, guidance, cn, seed, **kw)
    out_pp = np.asarray(out_pp)

    prog = build_frame_program(bundle, spec)
    out_1, lat_1 = prog(
        bundle.params, frames, embeds, strength, guidance, cn, seed, **kw
    )
    out_1 = np.asarray(out_1)

    diff = np.abs(out_pp.astype(np.int32) - out_1.astype(np.int32))
    lat_ok = np.allclose(
        np.asarray(lat_pp, np.float32), np.asarray(lat_1, np.float32),
        rtol=1e-4, atol=1e-4,
    )
    result = {
        "max_diff": int(diff.max()),
        "mean_diff": float(diff.mean()),
        "latents_allclose": bool(lat_ok),
        "stage_mesh": (eng.pipe.mesh0.shape["data"], eng.pipe.mesh0.shape["model"]),
        "stages": 2,
        "batch": b,
    }
    if diff.max() > max_u8_diff or not lat_ok:
        raise AssertionError(f"pipelined != single-device: {result}")
    return result
