"""Train toy weights in-repo so quality metrics become meaningful.

Two round-3 measurements carry an honest caveat: they run on random-init
weights (PERF.md "Temporal warm-start stability": a random UNet does not
contract toward any image manifold, so warm-start feedback DRIFTS instead
of damping; the turbo ladder's PSNR likewise measures an arbitrary-but-
fixed function).  Zero egress means no real checkpoints ever mount here —
so this tool trains tiny ones, in-repo, on the same synthetic
structured-frame distribution those metrics drive, using the framework's
own training stack:

* **Stage A — TAESD autoencoder**: reconstruction MSE over augmented
  structured frames (models/taesd.py, encoder+decoder jointly; a small
  latent L2 keeps codes inside the decoder's tanh clamp).
* **Stage B — UNet eps-prediction** in the trained latent space, via the
  SAME pjit train step the multichip dryrun runs
  (train/step.make_train_step), conditioned on the bundle CLIP tower's
  embeds of the tools' fixed prompt and, when the config has LCM guidance
  conditioning, the w-embedding at the tools' guidance 5.0.
* **Stage C — ControlNet** against the frozen Stage-B UNet
  (train/step.make_controlnet_train_step), conditioned on the SAME canny
  maps the serving pipeline computes (ops.sobel_control_image).  Without
  this the random-init ControlNet is a literal no-op (zero-init output
  convs), which makes ``controlnet_interval`` quality-gating vacuous —
  round-4 measurement: every cn interval scored IDENTICALLY on
  Stage-A/B-only weights.

The result saves in io/checkpoint.save_bundle layout; flicker.py
--weights and turbo_ladder.py --weights auto-detect it (bundle.json) vs
a diffusers snapshot.  A trained toy denoiser is what lets warm_alpha
demonstrate damping and the turbo ladder's PSNR reflect a model that
actually denoises (the reference's quality story rests on hub
checkpoints this image cannot fetch, videopipeline.py:49-72).

Usage:
    python -m videosd_tpu.tools.train_toy --out /tmp/toy_ckpt
        [--family tiny] [--size 64] [--ae-steps 1500] [--unet-steps 3000]
        [--batch 16] [--lr 2e-4]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


_BASE_CACHE: dict = {}


def make_batch(rng: np.random.Generator, n: int, h: int, w: int) -> np.ndarray:
    """Augmented structured frames: the drifting-camera family the flicker
    metric replays (tools/flicker.py drifting_frame), widened with random
    base frames, shifts on both axes, and brightness scaling.  Base frames
    are cached (structured_frame dominates generation cost; rolls are
    cheap), so the training loop stays device-bound."""
    from videosd_tpu.tools.turbo_ladder import structured_frame

    out = np.empty((n, h, w, 3), np.float32)
    for i in range(n):
        idx = int(rng.integers(0, 32))
        base = _BASE_CACHE.get((idx, h, w))
        if base is None:
            base = structured_frame(idx, h, w).astype(np.float32)
            _BASE_CACHE[(idx, h, w)] = base
        base = np.roll(base, int(rng.integers(0, w)), axis=1)
        base = np.roll(base, int(rng.integers(0, h)), axis=0)
        out[i] = np.clip(base * rng.uniform(0.94, 1.06), 0, 255)
    return out / 127.5 - 1.0  # [-1,1], the pipeline's image domain


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--family", default="tiny")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--ae-steps", type=int, default=1500)
    ap.add_argument("--unet-steps", type=int, default=3000)
    ap.add_argument("--cn-steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument(
        "--cn-lr", type=float, default=None,
        help="Stage-C learning rate (default: --lr).  The round-4 sd15-256 "
        "run was flat at the shared lr; the CN's zero-init output convs "
        "gate its gradient scale, so it tolerates (and often needs) a "
        "higher rate than the UNet stage",
    )
    ap.add_argument(
        "--cn-strength-match", type=float, default=1.0,
        help="Restrict Stage-C timestep sampling to t < frac*T — serving "
        "only evaluates the CN on the img2img ladder (t < strength*T; "
        "default client strength 0.6), so uniform-T training wastes mass "
        "above it.  1.0 = full schedule (round-4 behavior)",
    )
    ap.add_argument(
        "--optimizer", default="adamw", choices=("adamw", "adafactor"),
        help="UNet/ControlNet stages; adafactor for full-size families "
        "(sd15 fp32 + Adam state is ~13.6 GB and ResourceExhausts a 16 GB "
        "v5e chip — round-4 measurement; adafactor's factored second "
        "moment fits)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if args.ae_steps < 1 or args.unet_steps < 1 or args.cn_steps < 0:
        ap.error("--ae-steps and --unet-steps must be >= 1 and --cn-steps "
                 ">= 0 (the report's final-loss fields come from the last "
                 "executed step; --cn-steps 0 skips Stage C)")

    from videosd_tpu.compile_cache import setup as setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from videosd_tpu.io.checkpoint import save_bundle
    from videosd_tpu.models.layers import guidance_embedding
    from videosd_tpu.models.taesd import taesd_decode, taesd_encode
    from videosd_tpu.pipelines.lcm_img2img import (
        ModelBundle,
        build_prompt_encoder,
    )
    from videosd_tpu.train.step import init_train_state, make_train_step

    import dataclasses

    # copy: ModelBundle.random returns a cached singleton shared with any
    # other caller in this process — never mutate it
    bundle = dataclasses.replace(ModelBundle.random(args.family, dtype=jnp.float32))
    tcfg = bundle.taesd_cfg
    rng = np.random.default_rng(args.seed)
    h = w = args.size
    report: dict = {"family": args.family, "size": args.size}

    # ---- Stage A: TAESD reconstruction --------------------------------
    ae_opt = optax.adam(args.lr)

    def ae_loss(tp, imgs):
        z = taesd_encode(tp, imgs, tcfg)
        rec = taesd_decode(tp, z, tcfg)
        mse = jnp.mean((rec - imgs) ** 2)
        # keep codes inside the decoder's tanh(z/3)*3 soft clamp
        reg = jnp.mean(jnp.maximum(jnp.abs(z) - 2.5, 0.0) ** 2)
        return mse + 0.05 * reg, mse

    @jax.jit
    def ae_step(tp, opt_state, imgs):
        (_, mse), grads = jax.value_and_grad(ae_loss, has_aux=True)(tp, imgs)
        updates, opt_state = ae_opt.update(grads, opt_state, tp)
        return optax.apply_updates(tp, updates), opt_state, mse

    tp = bundle.params["taesd"]
    opt_state = ae_opt.init(tp)
    t0 = time.perf_counter()
    for step in range(args.ae_steps):
        imgs = jnp.asarray(make_batch(rng, args.batch, h, w))
        tp, opt_state, mse = ae_step(tp, opt_state, imgs)
        if step == 0:
            report["ae_first_mse"] = float(mse)
        if step % 200 == 0 or step == args.ae_steps - 1:
            print(f"# ae step {step}: recon mse {float(mse):.5f}", flush=True)
    report["ae_final_mse"] = float(mse)
    report["ae_seconds"] = round(time.perf_counter() - t0, 1)
    # PSNR of the reconstruction on a held-out frame (u8 domain)
    test = jnp.asarray(make_batch(np.random.default_rng(9999), 4, h, w))
    rec = taesd_decode(tp, taesd_encode(tp, test, tcfg), tcfg)
    err = jnp.mean((jnp.clip(rec, -1, 1) - test) ** 2) * (127.5**2)
    report["ae_holdout_psnr_db"] = round(float(10 * jnp.log10(255.0**2 / err)), 2)
    print(f"# ae holdout PSNR {report['ae_holdout_psnr_db']} dB", flush=True)

    params = dict(bundle.params)
    params["taesd"] = tp
    bundle.params = params

    # ---- Stage B: UNet denoiser in the trained latent space -----------
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["portrait, pixar, cg"]), jnp.int32)
    embeds, _ = enc(bundle.params, ids)  # the tools' fixed prompt
    context = jnp.tile(embeds.astype(jnp.float32), (args.batch, 1, 1))
    w_cond = None
    if bundle.unet_cfg.time_cond_proj_dim is not None:
        w_cond = guidance_embedding(
            jnp.full((args.batch,), 5.0, jnp.float32),
            bundle.unet_cfg.time_cond_proj_dim,
        )

    def make_opt():
        if args.optimizer == "adafactor":
            return optax.adafactor(args.lr)
        return optax.adamw(args.lr)

    encode_j = jax.jit(lambda p, x: taesd_encode(p, x, tcfg))
    unet_opt = make_opt()
    state = init_train_state(bundle.params["unet"], unet_opt)
    step_fn = make_train_step(bundle.unet_cfg, bundle.sched_cfg, unet_opt)

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.perf_counter()
    for step in range(args.unet_steps):
        imgs = jnp.asarray(make_batch(rng, args.batch, h, w))
        latents = encode_j(tp, imgs)
        batch = {"latents": latents, "context": context}
        if w_cond is not None:
            batch["w_cond"] = w_cond
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        if step % 200 == 0 or step == args.unet_steps - 1:
            print(f"# unet step {step}: loss {float(metrics['loss']):.5f}", flush=True)
    report["unet_final_loss"] = float(metrics["loss"])
    report["unet_seconds"] = round(time.perf_counter() - t0, 1)

    params = dict(bundle.params)
    params["unet"] = state["params"]
    bundle.params = params

    # ---- Stage C: ControlNet against the frozen UNet ------------------
    if args.cn_steps > 0:
        from videosd_tpu.ops import sobel_control_image
        from videosd_tpu.train.step import make_controlnet_train_step

        canny_j = jax.jit(lambda x: sobel_control_image(x, 0.11, 0.8))
        cn_lr = args.cn_lr if args.cn_lr is not None else args.lr
        cn_opt = (
            optax.adafactor(cn_lr)
            if args.optimizer == "adafactor"
            else optax.adamw(cn_lr)
        )
        t_hi = max(
            1,
            int(
                bundle.sched_cfg.num_train_timesteps
                * min(1.0, max(0.0, args.cn_strength_match))
            ),
        )
        cn_state = init_train_state(bundle.params["controlnet"], cn_opt)
        cn_step = make_controlnet_train_step(
            bundle.unet_cfg, bundle.sched_cfg, cn_opt, t_max=t_hi
        )
        unet_frozen = bundle.params["unet"]

        # paired holdout (fixed frames, fixed serving-range timesteps,
        # fixed noise key): base vs +CN eps-MSE — the convergence check
        # training-loss wiggle cannot provide (round-4 flat-curve lesson)
        from videosd_tpu.train.step import make_controlnet_eval

        cn_eval = make_controlnet_eval(bundle.unet_cfg, bundle.sched_cfg)
        ev_imgs = jnp.asarray(make_batch(np.random.default_rng(7777), 4, h, w))
        ev_batch = {
            "latents": encode_j(tp, ev_imgs),
            "context": jnp.tile(embeds.astype(jnp.float32), (4, 1, 1)),
            "control": canny_j((ev_imgs + 1.0) * 0.5),
        }
        if w_cond is not None:
            ev_batch["w_cond"] = guidance_embedding(
                jnp.full((4,), 5.0, jnp.float32),
                bundle.unet_cfg.time_cond_proj_dim,
            )
        ev_t = jnp.asarray(
            np.linspace(t_hi * 0.15, t_hi - 1, 4).astype(np.int32)
        )
        ev_key = jax.random.PRNGKey(31337)

        def holdout():
            base, cn = cn_eval(
                cn_state["params"], unet_frozen, ev_batch, ev_t, ev_key
            )
            return float(base), float(cn)

        t0 = time.perf_counter()
        for step in range(args.cn_steps):
            imgs = jnp.asarray(make_batch(rng, args.batch, h, w))
            latents = encode_j(tp, imgs)
            # serving feeds canny of the [0,1] camera frame (lcm_img2img
            # FrameSpec.canny_low/high defaults)
            control = canny_j((imgs + 1.0) * 0.5)
            batch = {"latents": latents, "context": context, "control": control}
            if w_cond is not None:
                batch["w_cond"] = w_cond
            key, sub = jax.random.split(key)
            cn_state, metrics = cn_step(cn_state, unet_frozen, batch, sub)
            if step == 0:
                report["cn_first_loss"] = float(metrics["loss"])
            if step % 200 == 0 or step == args.cn_steps - 1:
                base, cn = holdout()
                print(
                    f"# controlnet step {step}: loss {float(metrics['loss']):.5f}"
                    f"  holdout base {base:.5f} vs +cn {cn:.5f}"
                    f"  (gain {100.0 * (1.0 - cn / base):.1f}%)",
                    flush=True,
                )
        report["cn_final_loss"] = float(metrics["loss"])
        base, cn = holdout()
        report["cn_holdout_base_loss"] = round(base, 6)
        report["cn_holdout_cn_loss"] = round(cn, 6)
        report["cn_holdout_gain_pct"] = round(100.0 * (1.0 - cn / base), 2)
        report["cn_t_max"] = t_hi
        report["cn_lr"] = cn_lr
        report["cn_seconds"] = round(time.perf_counter() - t0, 1)

        params = dict(bundle.params)
        params["controlnet"] = cn_state["params"]
        bundle.params = params

    save_bundle(bundle, args.out)
    report["out"] = args.out
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
