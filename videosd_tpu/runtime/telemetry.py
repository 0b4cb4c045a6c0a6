"""Telemetry: generation-time EMA, per-stage timers, profiler hooks.

Extends the reference's single observable metric — the 0.95/0.05
"Average gentime" EMA printed with ``\\r`` (diffusert/server.py:113-114) and
the 5-second watchdog stats print (server.py:344-349) — with per-stage
(preprocess/denoise/decode/total) timers and optional ``jax.profiler``
trace capture, per SURVEY.md §5's tracing recommendations.
"""

from __future__ import annotations

import contextlib
import sys
import time

__all__ = [
    "EMA",
    "StageTimers",
    "Telemetry",
    "parse_hlo_symbols",
    "summarize_trace",
]


def parse_hlo_symbols(hlo_text: str, symbols: dict | None = None) -> dict:
    """{hlo_instruction_name: scope_path} from optimized-HLO text.

    Reads ``metadata={op_name="jit(..)/unet/down0/..."}`` off each
    instruction.  Names are normalized without the '%' sigil (trace events
    on CPU report them bare).  Pass an existing dict to merge several
    programs; cross-program collisions keep the first mapping and are
    marked with a trailing '*'.
    """
    import re

    symbols = symbols if symbols is not None else {}
    for line in hlo_text.splitlines():
        om = re.search(r'op_name="([^"]+)"', line)
        if not om:
            continue
        nm = re.match(r"\s*(?:ROOT\s+)?%?([\w.-]+)\s*=", line)
        if not nm:
            continue
        name, scope = nm.group(1), om.group(1)
        if name in symbols and symbols[name].rstrip("*") != scope:
            symbols[name] = symbols[name].rstrip("*") + "*"
        else:
            symbols.setdefault(name, scope)
    return symbols


def summarize_trace(log_dir: str, top: int = 15, symbols: dict | None = None) -> dict:
    """Aggregate a jax.profiler trace into a per-op device-time breakdown.

    Parses the captured xplane.pb (jax.profiler.ProfileData) and sums event
    durations on the device planes (TPU/CPU-as-device), grouped by op name.
    Returns {"device_time_ms", "ops": [{"name", "ms", "pct"}, ...]} — the
    op-level answer to "where does the frame time go" that the reference
    never had (its only metric is the gentime EMA, server.py:113-114).

    ``symbols``: optional {hlo_instruction_name: scope_path} map (from
    Engine.hlo_symbols()) — adds a "by_block" rollup grouping device time by
    model block (unet/down0, controlnet, vae_decode, ...) and annotates the
    top ops with their block.
    """
    import glob
    import os

    from jax.profiler import ProfileData

    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return {"error": f"no xplane.pb under {log_dir}"}
    data = ProfileData.from_file(paths[-1])

    # collect (line_name, events) off the device planes; prefer the
    # op-level "XLA Ops" lines over module-level lines (which contain the
    # same time aggregated per jit program — summing both double-counts)
    device_lines: list[tuple[str, list]] = []
    for plane in data.planes:
        name = plane.name or ""
        if not name.startswith("/device:"):
            continue
        for line in plane.lines:
            device_lines.append((line.name or "", list(line.events)))
    # "XLA Ops" is the synchronous compute timeline (sums to wall device
    # time); "Async XLA Ops" holds DMA windows that OVERLAP compute —
    # including them double-counts (measured 3x inflation on the flagship)
    op_lines = [
        evs
        for n, evs in device_lines
        if "op" in n.lower() and not n.lower().startswith("async")
    ]
    chosen = op_lines if op_lines else [evs for _, evs in device_lines]
    if not chosen:
        # CPU backend: no device planes — HLO op events live on the host
        # plane's tf_XLA* executor thread lines (names without the "%...="
        # instruction syntax); used by CPU-mesh tests of this summarizer
        for plane in data.planes:
            if not (plane.name or "").startswith("/host:"):
                continue
            for line in plane.lines:
                if (line.name or "").startswith("tf_XLA"):
                    chosen.append(
                        [
                            ev
                            for ev in line.events
                            if "::" not in ev.name  # ThreadpoolListener noise
                        ]
                    )

    totals: dict[str, float] = {}
    for evs in chosen:
        for ev in evs:
            # HLO event names carry the full instruction text; keep the
            # op name only ("%fusion.123 = ..." -> "fusion.123")
            name = ev.name.split(" = ")[0].strip().lstrip("%")
            totals[name] = totals.get(name, 0.0) + ev.duration_ns / 1e6
    device_ms = sum(totals.values())
    ops = sorted(totals.items(), key=lambda kv: -kv[1])[:top]

    # rollup by op category ("%fusion.123" -> "fusion"): the readable
    # where-does-the-time-go view
    import re

    by_type: dict[str, float] = {}
    for n, ms in totals.items():
        base = re.sub(r"[.\-]\d+$", "", n)
        by_type[base] = by_type.get(base, 0.0) + ms

    def pct(ms):
        return round(100.0 * ms / device_ms, 1) if device_ms else 0.0

    out = {
        "device_time_ms": round(device_ms, 3),
        "by_type": [
            {"name": n, "ms": round(ms, 3), "pct": pct(ms)}
            for n, ms in sorted(by_type.items(), key=lambda kv: -kv[1])[:top]
        ],
        "ops": [
            {"name": n[:120], "ms": round(ms, 3), "pct": pct(ms)}
            for n, ms in ops
        ],
    }

    if symbols:
        # group device time by model block: take the scope path up to the
        # first block-level component after the jit(...) prefixes
        # ("jit(wrapper)/unet/down0/res0/conv" -> "unet/down0")
        by_block: dict[str, float] = {}
        unmapped = 0.0
        for n, ms in totals.items():
            scope = symbols.get(n)
            if scope is None:
                unmapped += ms
                continue
            parts = [p for p in scope.split("/") if not p.startswith("jit(")]
            block = "/".join(parts[:2]) if parts else scope
            by_block[block] = by_block.get(block, 0.0) + ms
        if unmapped:
            by_block["(unmapped)"] = unmapped
        out["by_block"] = [
            {"name": n, "ms": round(ms, 3), "pct": pct(ms)}
            for n, ms in sorted(by_block.items(), key=lambda kv: -kv[1])[:top]
        ]
        for op in out["ops"]:
            sym = symbols.get(op["name"].split(" = ")[0])
            if sym:
                op["block"] = sym
    return out


class EMA:
    """Exponential moving average, reference constants (0.95 old / 0.05 new,
    initial prior 0.4 s — server.py:96,113)."""

    def __init__(self, initial: float = 0.4, decay: float = 0.95):
        self.value = initial
        self.decay = decay
        self.count = 0

    def update(self, sample: float) -> float:
        self.value = self.decay * self.value + (1.0 - self.decay) * sample
        self.count += 1
        return self.value


class StageTimers:
    def __init__(self):
        self.emas: dict[str, EMA] = {}

    @contextlib.contextmanager
    def time(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(stage, time.perf_counter() - t0)

    def record(self, stage: str, seconds: float):
        self.emas.setdefault(stage, EMA(0.0)).update(seconds)

    def snapshot(self) -> dict[str, float]:
        return {k: v.value for k, v in self.emas.items()}


class Telemetry:
    """Process-wide metrics registry + optional jax.profiler tracing."""

    def __init__(self):
        self.gen_time = EMA()
        self.stages = StageTimers()
        self.frames_in = 0
        self.frames_out = 0
        self.frames_dropped = 0
        self.batches = 0
        self.batch_fill = EMA(1.0)
        self._trace_dir: str | None = None

    def record_generation(self, seconds: float, batch: int = 1, fill: float = 1.0):
        self.gen_time.update(seconds)
        self.frames_out += batch
        self.batches += 1
        self.batch_fill.update(fill)

    def print_gentime(self):
        """Reference-style live EMA line (server.py:114)."""
        sys.stdout.write("\rAverage gentime %f" % self.gen_time.value)
        sys.stdout.flush()

    def snapshot(self) -> dict:
        return {
            "avg_gen_time_s": self.gen_time.value,
            "frames_in": self.frames_in,
            "frames_out": self.frames_out,
            "frames_dropped": self.frames_dropped,
            "batches": self.batches,
            "avg_batch_fill": self.batch_fill.value,
            "stages": self.stages.snapshot(),
        }

    def start_trace(self, log_dir: str):
        import jax

        jax.profiler.start_trace(log_dir)
        self._trace_dir = log_dir

    def stop_trace(self):
        if self._trace_dir is not None:
            import jax

            jax.profiler.stop_trace()
            self._trace_dir = None
