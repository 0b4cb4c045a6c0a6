"""Prompt-generator sidecar — same /llama-chat surface as the reference.

The reference runs FastAPI + langserve + LlamaCpp (diffusert/promptgen.py):
a GGUF Llama-2 chat model with a system prompt that turns a subject into a
styled image prompt (~30 tokens, temperature 5, top_k 60,
promptgen.py:25-46), exposed as a langserve route ``/llama-chat`` that the
client calls via ``RemoteRunnable.invoke({text})``
(client/src/lib/pages/home/index.tsx:20-23, 370).

This implementation keeps the langserve wire format
(``POST /llama-chat/invoke`` with ``{"input": {"text": ...}}`` ->
``{"output": ...}``) on aiohttp (fastapi/langserve are not in this image)
with a pluggable backend:

* ``TransformersBackend`` — any local causal LM (HF cache, CPU), sampling
  with the reference's spirit (high temperature, top-k, ~30 new tokens);
* ``TemplateBackend``    — dependency-free deterministic stylizer used
  when no local model exists (zero-egress default).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import logging
import random

from aiohttp import web

logger = logging.getLogger("videosd_tpu.promptgen")

__all__ = ["create_app", "TemplateBackend", "TransformersBackend", "main"]

SYSTEM_PROMPT = (
    "You generate styled image prompts for a realtime diffusion service: "
    "given a subject, answer with a single short comma-separated prompt "
    "adding style, medium, lighting and detail keywords."
)

_STYLES = [
    "pixar, cg, 3d render",
    "oil painting, impressionist, thick brushstrokes",
    "cyberpunk, neon lighting, rain, blade runner",
    "watercolor, soft pastel tones, paper texture",
    "ukiyo-e woodblock print, edo period",
    "film noir, dramatic shadows, black and white",
    "vaporwave, retrofuturism, chrome, sunset gradient",
    "studio ghibli, anime, lush scenery",
    "renaissance portrait, chiaroscuro, oil on canvas",
    "low poly, isometric, pastel palette",
    "steampunk, brass, gears, victorian",
    "comic book, halftone, bold ink outlines",
]

_DETAILS = [
    "highly detailed",
    "volumetric lighting",
    "8k",
    "sharp focus",
    "cinematic composition",
    "trending on artstation",
    "golden hour",
    "dramatic atmosphere",
    "intricate texture",
    "depth of field",
]


class TemplateBackend:
    """Deterministic subject -> styled prompt expansion (no model files)."""

    def generate(self, text: str, *, seed: int | None = None) -> str:
        subject = text.strip().rstrip(".") or "a scene"
        if seed is None:
            seed = int.from_bytes(hashlib.sha256(subject.encode()).digest()[:4], "little")
        rng = random.Random(seed)
        style = rng.choice(_STYLES)
        details = ", ".join(rng.sample(_DETAILS, 3))
        return f"{subject}, {style}, {details}"


class TransformersBackend:
    """Local causal LM via transformers (CPU), reference-like sampling
    (max 30 new tokens, temperature/top_k from promptgen.py:30-35)."""

    def __init__(self, model_path: str, *, max_new_tokens: int = 30):
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModelForCausalLM.from_pretrained(model_path)
        self.max_new_tokens = max_new_tokens

    def generate(self, text: str, *, seed: int | None = None) -> str:
        import torch

        if seed is not None:
            torch.manual_seed(seed)
        prompt = f"{SYSTEM_PROMPT}\nSubject: {text}\nPrompt:"
        ids = self.tokenizer(prompt, return_tensors="pt").input_ids
        out = self.model.generate(
            ids,
            max_new_tokens=self.max_new_tokens,
            do_sample=True,
            temperature=1.4,
            top_k=60,
        )
        gen = self.tokenizer.decode(out[0, ids.shape[1]:], skip_special_tokens=True)
        return gen.strip().split("\n")[0]


async def invoke(request: web.Request) -> web.Response:
    """langserve-compatible invoke endpoint.

    Body: {"input": {"text": "subject"}, "config": {...}} ->
    {"output": <string or {"text": ...}>, "metadata": {...}}.
    """
    backend = request.app["backend"]
    body = await request.json()
    inp = body.get("input", {})
    text = inp.get("text", "") if isinstance(inp, dict) else str(inp)
    result = backend.generate(text)
    return web.json_response(
        {"output": {"text": result}, "metadata": {"run_id": None, "feedback_tokens": []}}
    )


async def stream(request: web.Request) -> web.StreamResponse:
    """langserve stream endpoint (server-sent events with one chunk —
    enough for RemoteRunnable.stream clients)."""
    backend = request.app["backend"]
    body = await request.json()
    inp = body.get("input", {})
    text = inp.get("text", "") if isinstance(inp, dict) else str(inp)
    result = backend.generate(text)
    resp = web.StreamResponse(headers={"Content-Type": "text/event-stream"})
    await resp.prepare(request)
    await resp.write(b"event: data\ndata: " + json.dumps({"text": result}).encode() + b"\n\n")
    await resp.write(b"event: end\ndata: \n\n")
    return resp


async def healthz(request: web.Request) -> web.Response:
    return web.json_response({"ok": True})


@web.middleware
async def cors_middleware(request: web.Request, handler):
    resp = web.Response() if request.method == "OPTIONS" else await handler(request)
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Headers"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "*"
    return resp


def create_app(backend=None) -> web.Application:
    app = web.Application(middlewares=[cors_middleware])
    app["backend"] = backend or TemplateBackend()
    app.router.add_post("/llama-chat/invoke", invoke)
    app.router.add_post("/llama-chat/stream", stream)
    app.router.add_get("/healthz", healthz)
    return app


def main(argv=None):
    parser = argparse.ArgumentParser(description="videosd_tpu promptgen sidecar")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--model", help="local causal LM dir (else template backend)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    backend = TransformersBackend(args.model) if args.model else TemplateBackend()
    web.run_app(create_app(backend), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
