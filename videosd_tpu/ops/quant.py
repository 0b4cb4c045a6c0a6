"""Post-training int8 (w8a8) quantization of the UNet/ControlNet linears.

What this buys — honestly, per measurement: the v5e MXU nominally runs
int8 at 2x its bf16 rate, but slope-measured on this chip (PERF.md "int8
w8a8 re-probe, round 2") the full w8a8 chain — dynamic per-tensor
activation quant, int8xint8->int32 dot, per-channel dequant — is SLOWER
than the plain bf16 matmul at almost every flagship UNet shape
(0.57-0.95x; a single 1.24x outlier at the batch-4 d640 GEGLU shape).
XLA does not engage a fast int8 MXU path on this stack, and the
quant/dequant epilogues dominate.  The mode is kept as an opt-in
*memory* lever — int8 kernels halve the denoiser towers' weight HBM
(relevant for SDXL-scale models on one chip) — and as a ready seam for
stacks where the int8 path does engage.  It is NOT a throughput win
here; leave it off (the default) for the flagship.

When enabled, this module quantizes *selectively*:

* every transformer-block feed-forward (``ff.proj`` / ``ff.out``) — the
  FLOPs- and weight-heaviest matmuls in the model at any dim;
* self-attention q/k/v/out and cross-attention q/out projections whose
  model dim is >= ``min_attn_dim`` (default 640);
* NEVER the cross-attention k/v (their matmul runs over the 77-token text
  context — nothing to win) and never conv/norm/embedding params.

The reference has no quantization story (fp16 torch end to end,
videopipeline.py:70); this is a beyond-reference serving lever, off by
default (config ``quant: int8`` turns it on).  Weight-only transform:
the quantized tree keeps the exact nesting of the source tree so jitted
programs key on the same pytree structure, and layers.linear dispatches
on the ``w8`` leaf at trace time (zero cost when off).
"""

from __future__ import annotations

from typing import Any

from videosd_tpu.models.layers import quantize_linear

Params = dict[str, Any]

__all__ = ["quantize_transformer_linears", "quantize_bundle_params", "quant_stats"]


def _quantize_attn(a: Params, *, keys: tuple[str, ...]) -> Params:
    out = dict(a)
    for name in keys:
        p = out.get(name)
        if isinstance(p, dict) and "kernel" in p:
            out[name] = quantize_linear(p)
    return out


def quantize_transformer_linears(
    params: Params, *, min_attn_dim: int = 640, ffn: bool = True
) -> Params:
    """Return a new param tree with selected linears in w8a8 form.

    Walks any UNet/ControlNet param tree and rewrites transformer-block
    linears per the module policy.  All untouched leaves are shared with
    the input tree (no copies).  Idempotent: already-quantized blocks are
    left alone.
    """

    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            # a transformer block is a dict holding attn1/attn2/ff
            for name in ("attn1", "attn2"):
                a = out.get(name)
                if not (isinstance(a, dict) and "to_q" in a):
                    continue
                if "kernel" not in a["to_q"]:
                    continue  # already quantized
                dim = a["to_q"]["kernel"].shape[0]
                if dim < min_attn_dim:
                    continue
                keys = (
                    ("to_q", "to_k", "to_v", "to_out")
                    if name == "attn1"
                    else ("to_q", "to_out")  # cross-attn k/v: 77-token matmul
                )
                out[name] = _quantize_attn(a, keys=keys)
            if ffn:
                f = out.get("ff")
                if isinstance(f, dict) and "proj" in f and "kernel" in f["proj"]:
                    out["ff"] = {
                        **f,
                        "proj": quantize_linear(f["proj"]),
                        "out": quantize_linear(f["out"]),
                    }
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def quantize_bundle_params(
    params: Params, *, min_attn_dim: int = 640, ffn: bool = True
) -> Params:
    """Quantize the denoiser towers of a ModelBundle param dict.

    Only ``unet`` and ``controlnet`` are touched — VAE/TAESD convs and the
    CLIP text tower (runs once per prompt, not per frame) stay bf16.
    """
    out = dict(params)
    for tower in ("unet", "controlnet"):
        if tower in out and out[tower] is not None:
            out[tower] = quantize_transformer_linears(
                out[tower], min_attn_dim=min_attn_dim, ffn=ffn
            )
    return out


def quant_stats(params: Params) -> dict[str, int]:
    """Count quantized vs plain linear leaves (for /stats and tests)."""
    n_q = n_plain = 0

    def walk(node):
        nonlocal n_q, n_plain
        if isinstance(node, dict):
            if "w8" in node:
                n_q += 1
            elif "kernel" in node and node["kernel"].ndim == 2:
                n_plain += 1
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(params)
    return {"quantized_linears": n_q, "plain_linears": n_plain}
