"""videosd_tpu — a TPU-native real-time video diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of venetanji/videosd
(reference at /root/reference): a real-time webcam -> Stable Diffusion
stylization service.  The reference is CUDA/torch/Ray; this framework is
TPU-first:

- the whole per-frame path (preprocess -> canny -> VAE encode -> K-step LCM
  denoise -> decode -> uint8 postprocess) is ONE jitted XLA program with
  device-resident state (no host round trips between stages),
- multi-chip scaling is jax.sharding.Mesh + NamedSharding under jit (ICI
  collectives), not actor RPC,
- hot ops (attention, groupnorm+silu, preprocessing) have Pallas TPU kernels,
- the serving layer replaces the reference's Ray busy-flag scheduler
  (reference: diffusert/server.py:132-137) with an async multi-stream
  micro-batcher over fixed shape buckets.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # This image's sitecustomize force-registers the remote-TPU ("axon")
    # backend at interpreter start, overriding a JAX_PLATFORMS env var the
    # user set (e.g. CPU-only test/dev runs).  Re-assert the user's choice
    # here: config.update works as long as no backend has been used yet.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backend already initialized — leave it be
        pass

from videosd_tpu.version import __version__

__all__ = ["__version__"]
