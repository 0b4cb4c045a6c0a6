"""Session/API server — the reference's L4 surface, TPU-backed.

Keeps the reference's public API (diffusert/server.py):
* ``POST /offer``  — WebRTC SDP negotiation `{sdp, type, options}` ->
  `{sdp, type}` (server.py:145-264).  Gated on aiortc being installed;
  the rest of the server (engine, batching, data-channel protocol) is
  transport-independent.
* data channels ``"prompt"`` (live option JSON merges with the coercion
  table of server.py:171-187) and ``"record"`` (STT start/stop —
  implemented *working*; the reference's stop handler is a dead generator,
  server.py:207, SURVEY.md §3.6).
* CLI flags --host/--port/--cert-file/--key-file/-v (server.py:280-292),
  config.yaml (server.py:273), CORS-open responses (server.py:307-313),
  5-second watchdog (server.py:323-349).

TPU-native additions:
* ``/ws`` — a WebSocket frame transport speaking the same options/prompt
  protocol (binary RGB frames in, binary JPEG/RGB frames out) so the
  full stack runs and tests without a WebRTC stack.
* ``/stats`` — engine/batcher/telemetry snapshot (the reference only has
  stdout prints).
* ``/healthz`` — liveness.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import ssl
import struct
from typing import Any

import numpy as np
from aiohttp import WSMsgType, web

from videosd_tpu.config import ServerConfig, load_config
from videosd_tpu.runtime.engine import Engine

logger = logging.getLogger("videosd_tpu.server")

try:  # aiortc is optional in this image; the WebRTC path gates on it
    import aiortc  # noqa: F401

    HAVE_AIORTC = True
except Exception:  # pragma: no cover
    HAVE_AIORTC = False

__all__ = ["create_app", "main", "HAVE_AIORTC"]


@web.middleware
async def cors_middleware(request: web.Request, handler):
    """CORS-open responses (reference uses aiohttp_cors with *,
    server.py:307-313)."""
    if request.method == "OPTIONS":
        resp = web.Response()
    else:
        resp = await handler(request)
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Headers"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "*"
    resp.headers["Access-Control-Allow-Credentials"] = "true"
    return resp


async def watchdog(app: web.Application):
    """5-second loop: session stats + stale-state recovery
    (reference server.py:323-349; its 'generating' flag reset maps to
    closing orphaned engine streams)."""
    engine: Engine = app["engine"]
    try:
        while True:
            sessions = len(app["sessions"])
            if sessions == 0:
                for sid in list(engine.streams):
                    engine.close_stream(sid)
            stats = engine.stats()
            logger.info(
                "watchdog: sessions=%d streams=%d ema=%.3fs dropped=%d",
                sessions,
                stats["streams"],
                stats["ema_gen_time"],
                stats["frames_dropped"],
            )
            await asyncio.sleep(5)
    except asyncio.CancelledError:
        pass


# ----------------------------------------------------------------- handlers


async def offer(request: web.Request) -> web.Response:
    """WebRTC signaling endpoint (same schema as server.py:145-264)."""
    if not HAVE_AIORTC:
        return web.json_response(
            {
                "error": "aiortc is not installed on this deployment; "
                "use the /ws transport"
            },
            status=501,
        )
    from videosd_tpu.server.webrtc import handle_offer

    params = await request.json()
    answer = await handle_offer(request.app, params)
    return web.json_response(answer)


def _jpeg_decode(data: bytes, engine: Engine) -> np.ndarray:
    from videosd_tpu.runtime import jpegcodec

    with engine.telemetry.stages.time("jpeg_decode"):
        if engine.input_format == "i420":
            # raw 4:2:0 decode: no host colorspace/upsample work, and the
            # packed upload is half the bytes (engine unpacks on device)
            return jpegcodec.decode_i420(data)
        return jpegcodec.decode_rgb(data)


def _jpeg_encode(out: np.ndarray, engine: Engine) -> bytes:
    from videosd_tpu.runtime import jpegcodec

    with engine.telemetry.stages.time("jpeg_encode"):
        if out.ndim == 2:  # packed I420 from an i420-mode engine: raw path
            return jpegcodec.encode_i420(out, quality=85)
        return jpegcodec.encode_rgb(out, quality=85)


def _parse_ws_options(raw: dict[str, Any]) -> dict[str, Any]:
    from videosd_tpu.config import coerce_options

    return coerce_options(raw)


async def ws_handler(request: web.Request) -> web.WebSocketResponse:
    """WebSocket transport.

    Protocol:
      client -> text JSON {"type":"init","options":{...}}
      client -> text JSON {"type":"prompt", ...changed keys...}   (same as
                the "prompt" data channel, server.py:166-197)
      client -> binary: u16 height, u16 width, raw RGB24 frame (h*w*3
                payload bytes) OR raw packed planar I420 (h*w*3/2 bytes,
                half the upload — Y plane then 2x2-subsampled U, V; needs
                h%4==0 and w%2==0) OR a JPEG blob (detected by the FFD8
                SOI marker) — raw RGB24 at 512x512x15fps is ~12 MB/s,
                impractical beyond localhost; I420 halves that; JPEG
                brings it to ~1 MB/s (the reference's WebRTC transport
                used VP8 for the same reason)
      server -> binary: u16 height, u16 width, raw RGB24 diffused frame,
                OR a JPEG blob when the stream option "jpeg" is truthy
      client -> text JSON {"type":"record","action":"start"|"stop"}
      server -> text JSON {"type":"transcript","text":...}
    """
    ws = web.WebSocketResponse(max_msg_size=64 * 1024 * 1024)
    await ws.prepare(request)
    app = request.app
    engine: Engine = app["engine"]
    stream = None
    app["sessions"].add(ws)
    stt = None
    # frames are processed CONCURRENTLY per connection (the reference's
    # fire-and-forget create_task(diffuse(...)), server.py:136): an in-order
    # handler would cap the engine at one in-flight batch and the dispatch
    # pipeline could never hide the host<->device round trip.  The engine's
    # latest-wins mailbox bounds the backlog; a small cap bounds task count.
    # Each task awaits its predecessor before sending, so replies stay in
    # arrival order, and every frame produces a reply (or an error message)
    # — a synchronous client must never be left waiting.
    frame_tasks: set[asyncio.Task] = set()
    prev_done: asyncio.Future | None = None

    async def handle_frame(frame: np.ndarray, prev: asyncio.Future | None):
        try:
            out = await engine.submit_frame(stream.stream_id, frame)
            if stream.options.get("jpeg"):
                payload = await asyncio.get_running_loop().run_in_executor(
                    None, _jpeg_encode, out, engine
                )
            else:
                # wire protocol is raw RGB24; an i420-mode engine hands us
                # packed planar frames (ndim 2) — unpack on host (the D2H
                # tunnel, not host CPU, is the measured bottleneck)
                if out.ndim == 2:
                    out = engine._as_rgb(out)
                oh, ow = out.shape[:2]
                payload = struct.pack("<HH", oh, ow) + out.tobytes()
        except Exception:
            logger.exception("frame handling failed")
            if prev is not None:
                await asyncio.shield(asyncio.gather(prev, return_exceptions=True))
            if not ws.closed:
                await ws.send_json({"type": "error", "error": "frame failed"})
            return
        if prev is not None:  # in-order delivery
            await asyncio.shield(asyncio.gather(prev, return_exceptions=True))
        if not ws.closed:
            await ws.send_bytes(payload)

    try:
        async for msg in ws:
            if msg.type == WSMsgType.TEXT:
                data = json.loads(msg.data)
                mtype = data.pop("type", "prompt")
                if mtype == "init":
                    stream = engine.open_stream(
                        _parse_ws_options(data.get("options", {}))
                    )
                elif mtype == "prompt":
                    if stream is not None:
                        engine.update_options(stream.stream_id, data)
                elif mtype == "record":
                    from videosd_tpu.server.stt import STTSession

                    if stt is None:
                        stt = STTSession()
                    if data.get("action") == "start":
                        stt.start()
                    elif data.get("action") == "stop":
                        text = await stt.stop_and_transcribe()
                        await ws.send_json({"type": "transcript", "text": text})
                elif mtype == "audio":
                    # PCM16 mono chunk (base64) while recording
                    import base64

                    if stt is not None and stt.recording:
                        pcm = np.frombuffer(
                            base64.b64decode(data.get("pcm16", "")), np.int16
                        )
                        stt.add_frame(pcm, sample_rate=int(data.get("rate", 48000)))
                elif mtype == "stats":
                    await ws.send_json({"type": "stats", "stats": engine.stats()})
            elif msg.type == WSMsgType.BINARY:
                if stream is None:
                    stream = engine.open_stream({})
                if msg.data[:2] == b"\xff\xd8":  # JPEG SOI
                    # decode in a worker thread: PIL's codec releases the
                    # GIL, and an inline decode would block the event loop
                    # (and therefore the batcher) for ~10-30 ms per frame —
                    # measured to serialize against dispatch at 4 streams
                    try:
                        frame = await asyncio.get_running_loop().run_in_executor(
                            None, _jpeg_decode, msg.data, engine
                        )
                    except Exception:
                        await ws.send_json({"type": "error", "error": "bad jpeg"})
                        continue
                else:
                    h, w = struct.unpack("<HH", msg.data[:4])
                    frame = np.frombuffer(msg.data[4:], np.uint8)
                    if frame.size == h * w * 3:
                        frame = frame.reshape(h, w, 3)
                    elif frame.size == h * w * 3 // 2 and h % 4 == 0 and w % 2 == 0:
                        # packed planar I420 upload (half the bytes).  The
                        # engine's mailbox fit accepts either layout; for
                        # an rgb-input engine unpack on host so the frame
                        # program's spec stays layout-stable.
                        frame = frame.reshape(h * 3 // 2, w)
                        if engine.input_format != "i420":
                            from videosd_tpu.ops.preprocess import i420_to_rgb_host

                            frame = i420_to_rgb_host(frame)
                    else:
                        await ws.send_json(
                            {"type": "error", "error": "bad frame size"}
                        )
                        continue
                while len(frame_tasks) >= 4:  # bound per-connection backlog
                    await asyncio.wait(
                        set(frame_tasks), return_when=asyncio.FIRST_COMPLETED
                    )
                t = asyncio.get_running_loop().create_task(
                    handle_frame(frame, prev_done)
                )
                prev_done = t
                frame_tasks.add(t)
                t.add_done_callback(frame_tasks.discard)
            elif msg.type == WSMsgType.ERROR:
                break
    finally:
        for t in frame_tasks:
            t.cancel()
        app["sessions"].discard(ws)
        if stream is not None:
            engine.close_stream(stream.stream_id)
    return ws


async def stats_handler(request: web.Request) -> web.Response:
    return web.json_response(request.app["engine"].stats())


async def healthz(request: web.Request) -> web.Response:
    return web.json_response({"ok": True})


async def profile_handler(request: web.Request) -> web.Response:
    """Capture a jax.profiler device trace for N seconds (default 3).

    SURVEY §5 tracing upgrade: the reference's only profiling is a stdout
    EMA; this emits a real XLA trace viewable in xprof/tensorboard.
    """
    seconds = float(request.query.get("seconds", 3))
    seconds = min(seconds, 30.0)
    log_dir = request.query.get("dir", "/tmp/videosd_trace")
    tel = request.app["engine"].telemetry
    tel.start_trace(log_dir)
    await asyncio.sleep(seconds)
    tel.stop_trace()
    body = {"trace_dir": log_dir, "seconds": seconds}
    if request.query.get("summary", "1") != "0":
        from videosd_tpu.runtime.telemetry import summarize_trace

        loop = asyncio.get_running_loop()
        symbols = None
        if request.query.get("symbols", "1") != "0":
            # symbolize fusion names back to model blocks (unet/down0, ...)
            # via the compiled programs' HLO op_name metadata
            symbols = await loop.run_in_executor(
                None, request.app["engine"].hlo_symbols
            )
        body["summary"] = await loop.run_in_executor(
            None, lambda: summarize_trace(log_dir, symbols=symbols)
        )
    return web.json_response(body)


# ----------------------------------------------------------------- app


async def debug_engine_handler(request: web.Request) -> web.Response:
    """Runtime engine knobs: POST {"output_format": ..., "input_format":
    "rgb"|"i420"}.

    Ops aid for A/B-ing the wire formats live (no reboot).  The output
    flip is free — the I420 pack is a separate tiny jit and every
    consumer branches per-frame on the packed vs RGB layout.  The input
    flip re-keys the frame-program specs: the first bucket in the new
    layout background-compiles while streams get passthrough frames
    (same compile-stall-avoidance as any cold bucket).  GET returns the
    current values."""
    engine: Engine = request.app["engine"]
    if request.method == "POST":
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "bad json"}, status=400)
        fmt = body.get("output_format")
        if fmt is not None:
            fmt = str(fmt).lower()
            if fmt not in ("rgb", "i420"):
                return web.json_response(
                    {"error": f"output_format must be rgb|i420, got {fmt!r}"},
                    status=400,
                )
            engine.output_format = fmt
        in_fmt = body.get("input_format")
        if in_fmt is not None:
            try:
                engine.set_input_format(in_fmt)
            except ValueError as e:
                return web.json_response({"error": str(e)}, status=400)
    return web.json_response(
        {
            "output_format": engine.output_format,
            "input_format": engine.input_format,
        }
    )


async def reload_weights_handler(request: web.Request) -> web.Response:
    """Live checkpoint hot-swap: POST {"weights": "auto"|<dir>|<repo-id>,
    "controlnet": optional, "taesd": optional}.

    Loads the checkpoint off the event loop, then atomically swaps the
    serving params — zero dropped frames, zero recompiles (same family +
    dtype required; the engine rejects shape/dtype mismatches).  The
    reference must restart its Ray actors to change checkpoints; here the
    in-flight batch finishes on the old weights and the next batch runs
    the new ones.  GET returns the current weights provenance."""
    engine: Engine = request.app["engine"]
    if request.method != "POST":
        return web.json_response({"weights_source": engine.weights_source})
    try:
        body = await request.json()
    except Exception:
        return web.json_response({"error": "invalid JSON"}, status=400)
    setting = str(body.get("weights", "auto"))
    cfg = request.app["config"]

    def load():
        import jax.numpy as jnp

        from videosd_tpu.io.discovery import resolve_weights
        from videosd_tpu.pipelines.lcm_img2img import ModelBundle

        resolved = resolve_weights(
            body.get("model", getattr(cfg, "model", None)),
            controlnet=body.get("controlnet", getattr(cfg, "controlnet", None)),
            setting=setting,
        )
        if resolved is None:
            raise FileNotFoundError(
                f"weights: {setting!r} resolved to no checkpoint"
            )
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        loaded = ModelBundle.from_pretrained(
            resolved["model_dir"],
            family=cfg.family,
            controlnet_dir=resolved["controlnet_dir"],
            taesd_dir=body.get("taesd", resolved["taesd_dir"]),
            dtype=dtype,
            with_controlnet=True,
        )
        return loaded.params, resolved

    try:
        params, resolved = await asyncio.get_running_loop().run_in_executor(
            None, load
        )
        engine.swap_params(params, source=resolved)
    except (FileNotFoundError, ValueError) as e:
        return web.json_response({"error": str(e)}, status=400)
    except Exception:
        logger.exception("weight reload failed")
        return web.json_response({"error": "load failed (see logs)"}, status=500)
    return web.json_response({"swapped": True, "weights_source": resolved})


async def debug_memory_handler(request: web.Request) -> web.Response:
    """Host-memory introspection: ?action=start|top|stop (tracemalloc).

    Ops aid for leak hunts on long-running servers; numpy buffers are
    tracked, native-library allocations are not."""
    import tracemalloc

    app = request.app
    action = request.query.get("action", "top")
    if action == "start":
        tracemalloc.start(10)
        app["_tm_base"] = tracemalloc.take_snapshot()
        return web.json_response({"ok": True})
    if action == "stop":
        tracemalloc.stop()
        app.pop("_tm_base", None)
        return web.json_response({"ok": True})
    if not tracemalloc.is_tracing():
        return web.json_response({"error": "not tracing; ?action=start first"})
    snap = tracemalloc.take_snapshot()
    base = app.get("_tm_base")
    stats = (
        snap.compare_to(base, "traceback") if base is not None
        else snap.statistics("traceback")
    )
    top = []
    for s in stats[:15]:
        size = getattr(s, "size_diff", None)
        size = s.size if size is None else size
        count = getattr(s, "count_diff", None)
        count = s.count if count is None else count
        top.append(
            {
                "kib": round(size / 1024, 1),
                "count": count,
                "where": s.traceback.format()[-2:],
            }
        )
    return web.json_response({"top": top})


async def _on_startup(app: web.Application):
    engine: Engine = app["engine"]
    engine.start()
    if engine.model_names:
        # resolve the `models:` registry off-loop at boot so the first
        # stream that selects one doesn't ride the default checkpoint
        # while it lazy-loads (engine._load_model_background)
        await asyncio.get_running_loop().run_in_executor(
            None, engine.load_models
        )
    if app["config"].compile:
        # AOT-warm the hot buckets so first frames don't hit compile stalls
        # (the reference's `compile` flag / compile_model warmup analog,
        # videopipeline.py:35-47, config.yaml:5).  Only the SMALLEST batch
        # bucket gates readiness — the rest warm in the background while
        # the server serves: a multi-stream group whose bucket isn't ready
        # is chunked onto the ready one by the engine's stall-avoidance
        # path, so time-to-first-frame stays ~1 warmup instead of N.
        loop = asyncio.get_running_loop()
        h = w = 512
        batches = sorted(
            b for b in app["config"].batch_buckets if b <= engine.max_batch
        ) or [1]
        await loop.run_in_executor(
            None,
            lambda: engine.warmup(
                batch_sizes=batches[:1], steps=(4,), height=h, width=w
            ),
        )
        from videosd_tpu.pipelines.lcm_img2img import FrameSpec

        # warm the interval variant new streams will actually request
        # (config option_defaults), like Engine.warmup does
        defaults = app["config"].option_defaults or {}
        cn_interval = max(1, int(defaults.get("controlnet_interval", 1) or 1))
        dc_interval = max(1, int(defaults.get("deepcache_interval", 1) or 1))
        ih, iw = engine.frame_hw
        for b in batches[1:]:
            spec = FrameSpec(
                batch=b * engine.data_axis, height=h, width=w,
                in_height=ih, in_width=iw, steps=4,
                in_format=engine.input_format,
                controlnet_interval=cn_interval,
                deepcache_interval=dc_interval,
            )
            engine._compile_spec_background(loop, spec, ref_mode=False)
    app["watchdog_task"] = asyncio.get_running_loop().create_task(watchdog(app))


async def _on_shutdown(app: web.Application):
    # close peer connections + engine (reference on_shutdown, server.py:266-270)
    app["watchdog_task"].cancel()
    for closer in list(app.get("pc_closers", [])):
        await closer()
    await app["engine"].stop()


def create_app(config: ServerConfig | None = None, *, engine: Engine | None = None):
    app = web.Application(middlewares=[cors_middleware])
    cfg = config or ServerConfig()
    app["config"] = cfg
    app["engine"] = engine or Engine(cfg)
    app["sessions"] = set()
    app["pc_closers"] = []
    app.router.add_post("/offer", offer)
    app.router.add_get("/ws", ws_handler)
    app.router.add_get("/stats", stats_handler)
    app.router.add_get("/healthz", healthz)
    app.router.add_post("/profile", profile_handler)
    app.router.add_get("/debug/memory", debug_memory_handler)
    app.router.add_route("*", "/debug/engine", debug_engine_handler)
    app.router.add_route("*", "/reload_weights", reload_weights_handler)

    # serve the bundled static client at / when present (production deploys
    # put nginx in front instead, like the reference's frontend container)
    import os

    client_dir = os.path.join(os.path.dirname(__file__), "..", "..", "client")
    client_dir = os.path.abspath(client_dir)
    if os.path.isdir(client_dir):

        async def index(_req):
            return web.FileResponse(os.path.join(client_dir, "index.html"))

        app.router.add_get("/", index)
        app.router.add_static("/client", client_dir)

        async def appjs(_req):
            return web.FileResponse(os.path.join(client_dir, "app.js"))

        app.router.add_get("/app.js", appjs)

        # service worker must be served from the root path so its scope
        # covers "/" (PWA app shell; client/sw.js)
        async def sw(_req):
            return web.FileResponse(os.path.join(client_dir, "sw.js"))

        app.router.add_get("/sw.js", sw)
    app.on_startup.append(_on_startup)
    app.on_shutdown.append(_on_shutdown)
    return app


def main(argv=None):
    parser = argparse.ArgumentParser(description="videosd_tpu WebRTC/WS server")
    parser.add_argument("--cert-file", help="SSL certificate file (for HTTPS)")
    parser.add_argument("--key-file", help="SSL key file (for HTTPS)")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--config", default="config.yaml")
    parser.add_argument("--verbose", "-v", action="count")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO)

    try:
        cfg = load_config(args.config)
    except FileNotFoundError:
        cfg = ServerConfig()

    ssl_context = None
    if args.cert_file:
        ssl_context = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ssl_context.load_cert_chain(args.cert_file, args.key_file)

    app = create_app(cfg)
    web.run_app(
        app, access_log=None, host=args.host, port=args.port, ssl_context=ssl_context
    )


if __name__ == "__main__":
    main()
