"""Localize serving RSS drift: device-resident execution vs per-iteration
host<->device transfers.

Written for the round-5 soak triage (PERF.md "Round 5: serving soak").
The 30-min on-chip soak showed ~0.9 MB host-RSS growth per generated
frame with a stable executable count; the CPU control soak (same engine
code, 15.6k frames) was flat — so the retention had to live below JAX's
public API on the TPU path.  This probe fingerprints WHICH primitive
leaks on a given rig:

* (a) chained executions of device-resident data — exercises dispatch
  only (no transfers);
* (b) per-iteration ``jax.device_put`` of a fresh frame-sized host
  array — the serving upload path;
* (c) per-iteration ``np.asarray(device_array)`` — the download path.

On this round's axon-tunnel rig: (a) +1.4 MB / 1000 execs, (b)
**+749 MB / 1000 uploads of 0.79 MB arrays (~95% of every uploaded
buffer retained)**, (c) +21 MB / 1000 — i.e. the experimental axon
platform client leaks its host->device staging buffer.  Production
PCIe-attached TPU runtimes do not use this client.  Run this probe on
any new rig before trusting long-soak RSS numbers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main(iters: int = 1000) -> dict:
    f = jax.jit(lambda x: x * 1.000001 + 0.5)
    x = jnp.zeros((512, 512, 3), jnp.float32)  # ~3 MB on device
    jax.block_until_ready(f(x))
    out = {}

    r0 = rss_mb()
    y = x
    for _ in range(iters):
        y = f(y)
    jax.block_until_ready(y)
    out["device_resident_mb"] = round(rss_mb() - r0, 1)
    print(f"device-resident x{iters}: d={out['device_resident_mb']:+.1f} MB")

    r0 = rss_mb()
    host = np.zeros((512, 512, 3), np.uint8)  # 0.79 MB, the camera-frame shape
    for _ in range(iters):
        d = jax.device_put(host)
        jax.block_until_ready(f(d.astype(jnp.float32)))
    out["upload_mb"] = round(rss_mb() - r0, 1)
    print(f"upload x{iters} (0.79 MB each): d={out['upload_mb']:+.1f} MB")

    r0 = rss_mb()
    for _ in range(iters):
        np.asarray(f(x))
    out["download_mb"] = round(rss_mb() - r0, 1)
    print(f"download x{iters} (3 MB each): d={out['download_mb']:+.1f} MB")
    return out


if __name__ == "__main__":
    main()
