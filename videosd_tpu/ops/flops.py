"""Analytic per-program FLOPs account + MFU derivation.

Counts matmul/conv FLOPs by walking the *traced* program's jaxpr — exact
for the model actually served (no hand-maintained per-layer arithmetic to
drift out of sync), and auditable: every dot_general / conv_general_dilated
in the frame program is visited, including sub-jaxprs (pjit, scan, cond,
remat, custom_vjp).

Two numbers per program:

* **logical** FLOPs — the textbook 2·M·K·N count of the math the model
  defines.  ``MFU_logical = logical_flops / (seconds × peak)`` is the
  standard model-FLOPs-utilization figure.
* **padded** FLOPs — the same walk with every matmul dimension rounded up
  to the MXU tile the hardware actually executes (lane dim → 128,
  sublane dim → 8): contraction and output-feature dims pad to multiples
  of 128, the row dim to multiples of 8.  This is the account under which
  a d_head=40 attention pays 128/40 = 3.2× (PERF.md by-block profile) and
  a 320-channel conv pays 384/320.  ``MFU_padded`` is hardware
  utilization: how close the MXU runs to its ceiling on the work it is
  actually issued.

The reference (venetanji/videosd) publishes no FLOPs or utilization
numbers at all (BASELINE.md); these are the rebuild's own discipline.

Peak numbers: bf16 MXU peak per chip, from the public TPU spec sheets.
v5e ("TPU v5 lite") = 197 TFLOP/s bf16.
"""

from __future__ import annotations

import math
from typing import Any

import jax

__all__ = [
    "jaxpr_matmul_flops",
    "program_flops",
    "device_peak_flops",
    "mfu",
]

# bf16 dense peak FLOP/s per chip, by jax device_kind (public spec sheets)
_PEAKS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
    "TPU v6e": 918e12,
}


def device_peak_flops(device=None) -> float | None:
    """bf16 peak FLOP/s for ``device`` (default: jax.devices()[0]), or
    None when the chip is unknown (CPU hosts, new TPU generations)."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for name, peak in _PEAKS.items():
        if kind.startswith(name):
            return peak
    return None


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot_flops(eqn) -> tuple[float, float]:
    """(logical, padded) FLOPs of one dot_general."""
    lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    B = math.prod(lhs[i] for i in lb) if lb else 1
    K = math.prod(lhs[i] for i in lc) if lc else 1
    M = math.prod(
        d for i, d in enumerate(lhs) if i not in set(lc) | set(lb)
    )
    N = math.prod(
        d for i, d in enumerate(rhs) if i not in set(rc) | set(rb)
    )
    logical = 2.0 * B * M * K * N
    # MXU tiling: K (contraction) and N (output features) live in the
    # 128-lane dim, M in the 8-sublane dim
    padded = (
        2.0 * B * _ceil_to(M, 8) * _ceil_to(K, 128) * _ceil_to(N, 128)
    )
    return logical, padded


def _conv_flops(eqn) -> tuple[float, float]:
    """(logical, padded) FLOPs of one conv_general_dilated."""
    dn = eqn.params["dimension_numbers"]
    rhs_shape = eqn.invars[1].aval.shape
    out_shape = eqn.outvars[0].aval.shape
    groups = int(eqn.params.get("feature_group_count", 1) or 1)
    # rhs dims: output-feature, input-feature(/groups), then spatial
    cout = rhs_shape[dn.rhs_spec[0]]
    cin_g = rhs_shape[dn.rhs_spec[1]]
    k_spatial = math.prod(rhs_shape[i] for i in dn.rhs_spec[2:])
    batch = out_shape[dn.out_spec[0]]
    out_spatial = math.prod(out_shape[i] for i in dn.out_spec[2:])
    # per output element: cin_g * k_spatial MACs (already per-group)
    logical = 2.0 * batch * out_spatial * cout * cin_g * k_spatial
    # im2col mapping: M = batch*out_spatial (sublanes), K = k² x cin
    # (cin lane-padded per spatial tap), N = cout (lanes)
    padded = (
        2.0
        * _ceil_to(batch * out_spatial, 8)
        * k_spatial
        * _ceil_to(cin_g, 128)
        * _ceil_to(cout, 128)
        * groups
    )
    return logical, padded


def jaxpr_matmul_flops(jaxpr) -> tuple[float, float]:
    """Walk a (closed) jaxpr; return (logical, padded) matmul/conv FLOPs.

    Recurses into sub-jaxprs: pjit/closed_call bodies, scan (×length),
    while (×1 — trip count is dynamic; the frame program has none),
    cond (max over branches), remat/checkpoint, custom_jvp/vjp calls.
    """
    if hasattr(jaxpr, "jaxpr"):  # ClosedJaxpr
        jaxpr = jaxpr.jaxpr
    logical = padded = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            lo, pa = _dot_flops(eqn)
            logical += lo
            padded += pa
        elif name == "conv_general_dilated":
            lo, pa = _conv_flops(eqn)
            logical += lo
            padded += pa
        elif name == "cond":
            branches = eqn.params["branches"]
            lo, pa = max(
                (jaxpr_matmul_flops(b) for b in branches),
                key=lambda t: t[0],
                default=(0.0, 0.0),
            )
            logical += lo
            padded += pa
        elif name == "scan":
            lo, pa = jaxpr_matmul_flops(eqn.params["jaxpr"])
            n = int(eqn.params.get("length", 1) or 1)
            logical += lo * n
            padded += pa * n
        else:
            for sub in _sub_jaxprs(eqn.params):
                lo, pa = jaxpr_matmul_flops(sub)
                logical += lo
                padded += pa
    return logical, padded


def _sub_jaxprs(params: dict) -> list[Any]:
    """Every jaxpr-valued entry of an eqn's params (pjit's `jaxpr`,
    custom_vjp's `call_jaxpr`/`fun_jaxpr`, while's body+cond, ...)."""
    out = []
    for v in params.values():
        if hasattr(v, "eqns") or (
            hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns")
        ):
            out.append(v)
        elif isinstance(v, (list, tuple)):
            out.extend(
                x
                for x in v
                if hasattr(x, "eqns")
                or (hasattr(x, "jaxpr") and hasattr(x.jaxpr, "eqns"))
            )
    return out


def program_flops(fn, *args, **kwargs) -> dict:
    """Trace ``fn(*args, **kwargs)`` and account its matmul/conv FLOPs.

    Returns {"logical": float, "padded": float} — one forward execution's
    count.  Trace-only (abstract values): nothing runs on device.

    NOTE for attention: count with the XLA einsum path
    (``VIDEOSD_ATTN_IMPL=xla``) so QK^T/AV appear as dot_generals — the
    logical count is implementation-independent, and the padded model
    then prices d_head=40 at the 128-lane tile exactly like the Pallas
    kernel's padded-math roofline (PERF.md).
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    logical, padded = jaxpr_matmul_flops(jaxpr)
    return {"logical": logical, "padded": padded}


def mfu(flops_per_step: float, seconds_per_step: float, peak: float | None = None):
    """flops/(time×peak), or None when the chip peak is unknown."""
    if peak is None:
        peak = device_peak_flops()
    if not peak or seconds_per_step <= 0:
        return None
    return flops_per_step / (seconds_per_step * peak)
