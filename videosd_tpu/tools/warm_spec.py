"""Single-spec compile-cache warmer — the subprocess half of the
engine's ``compile_subprocess`` mode.

``Engine._compile_spec_background`` (runtime/engine.py) launches this
module with a JSON request file when ``config.compile_subprocess`` is
on: an isolated interpreter builds the same Engine, traces + compiles
exactly one FrameSpec into the shared persistent compile cache
(compile_cache.setup()), runs it once, prints one timing line, exits.
The serving process then compiles the same spec from the warm cache, so
the GIL-holding trace/lower/compile of a COLD program never runs inside
the process that answers health checks and WebSocket traffic.

Request schema::

    {"cfg": <ServerConfig.from_dict dict>,
     "spec": <FrameSpec field dict>,
     "ref_mode": false}

``cfg`` carries the engine's LIVE input/output formats (they are
runtime-togglable and may have diverged from the config file).

Relative of ``tools/warm_cache.py`` (the ops pre-roll that warms every
configured bucket before a boot); this one warms a single runtime-
discovered spec on demand.  The reference has no analog — its eager
torch pipelines never compile (closest seam: the never-invoked
``compile_model()`` warmup, diffusert/videopipeline.py:35-47).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", required=True, help="request file (see schema)")
    args = p.parse_args(argv)

    with open(args.json) as f:
        req = json.load(f)

    from videosd_tpu.config import ServerConfig
    from videosd_tpu.pipelines.lcm_img2img import FrameSpec
    from videosd_tpu.runtime.engine import Engine

    cfg = ServerConfig.from_dict(req["cfg"])
    ref_mode = bool(req.get("ref_mode", False))
    t0 = time.perf_counter()
    engine = Engine(cfg)
    t_init = time.perf_counter() - t0
    spec = FrameSpec(**req["spec"])
    t0 = time.perf_counter()
    engine._warm_spec(spec, ref_mode=ref_mode)
    print(
        json.dumps(
            {
                "spec": req["spec"],
                "ref_mode": ref_mode,
                "init_s": round(t_init, 2),
                "warm_s": round(time.perf_counter() - t0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
