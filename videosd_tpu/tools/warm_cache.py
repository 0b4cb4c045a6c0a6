"""AOT compile-cache warmer: build the serving buckets, populate the
persistent XLA cache, exit.

Ops pre-roll: run this BEFORE (re)starting the server so process boot
costs cache *reads* instead of multi-minute compiles:

    python -m videosd_tpu.tools.warm_cache --config config.yaml

Compiles exactly what `Engine.warmup` would at startup (same call
signatures — a warmup with a different signature compiles a different
program and buys nothing), so a following server boot with the same
config takes every bucket from `compile_cache.setup()`'s directory.
Also a measurement instrument: run twice and compare wall times to
check whether this backend's compiles actually persist (see
BACKLOG.md "server boot" engineering note).

The reference's analog is the never-invoked `compile_model()` torch
warmup (diffusert/videopipeline.py:35-47, config.yaml:5).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="config.yaml")
    p.add_argument(
        "--steps",
        type=int,
        nargs="*",
        default=[4],
        help="step counts to warm (each is its own program)",
    )
    p.add_argument(
        "--cn-interval",
        type=int,
        default=1,
        help="warm the controlnet_interval=k turbo variant of every"
        " bucket (1 = reference-parity programs)",
    )
    p.add_argument(
        "--dc-interval",
        type=int,
        default=1,
        help="warm the deepcache_interval=k turbo variant of every"
        " bucket (1 = reference-parity programs)",
    )
    p.add_argument(
        "--refresh-last",
        action="store_true",
        help="warm the interval_refresh_last variant (final-step cache"
        " refresh; no effect when both intervals are 1)",
    )
    p.add_argument(
        "--ref",
        action="store_true",
        help="also warm each bucket's reference-attention program "
        "(ref-mode streams; double-pass UNet — its own executable)",
    )
    p.add_argument(
        "--temporal",
        action="store_true",
        help="warm the temporal-DeepCache variants of every bucket (BOTH"
        " jit programs: produce and reuse — the production config pairs"
        " this with --cn-interval 2 --refresh-last)",
    )
    args = p.parse_args(argv)

    from videosd_tpu.config import load_config
    from videosd_tpu.runtime.engine import Engine

    cfg = load_config(args.config)
    engine = Engine(cfg)
    buckets = sorted(set(cfg.batch_buckets)) or [1]
    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for b in buckets:
        for s in args.steps:
            t0 = time.perf_counter()
            engine.warmup(
                batch_sizes=(b,), steps=(s,), cn_interval=args.cn_interval,
                dc_interval=args.dc_interval, refresh_last=args.refresh_last,
                temporal=args.temporal or None,
                ref=args.ref,
            )
            timings[f"b{b}_s{s}"] = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "buckets": timings,
                "total_s": round(time.perf_counter() - t_all, 2),
                "cache_dir": __import__(
                    "videosd_tpu.compile_cache", fromlist=["setup"]
                ).setup(),
            }
        )
    )


if __name__ == "__main__":
    main()
