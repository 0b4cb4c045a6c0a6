"""Pallas Sobel stencil kernel vs the XLA path (interpreter mode on CPU).

The thresholded edge map has genuine discontinuities at the thresholds, so
parity is asserted on the continuous gradient magnitude and on
off-boundary pixels of the final map.
"""

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from videosd_tpu.ops.pallas.preprocess_kernel import (
    fused_preprocess,
    sobel_magnitude_pallas,
)
from videosd_tpu.ops.sobel import rgb_to_gray, sobel_edges


def test_sobel_magnitude_matches_xla(rng):
    gray = jnp.asarray(rng.random((128, 128)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        mag = np.asarray(sobel_magnitude_pallas(gray))
    # reconstruct reference magnitude from ops.sobel (pre-normalization):
    # sobel_edges normalizes by the max, so compare normalized maps with
    # thresholds disabled (low=-1, high=2 keep everything linear)
    ref = np.asarray(sobel_edges(gray, -1.0, 2.0))
    got = mag / max(mag.max(), 1e-12)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fused_preprocess_matches_xla_path():
    # local fixed rng: the boundary-pixel bound below is stream-dependent,
    # and the shared session rng's position varies with test order
    rng = np.random.default_rng(42)
    frame = jnp.asarray(rng.integers(0, 256, (128, 128, 3), dtype=np.uint8))
    with pltpu.force_tpu_interpret_mode():
        img, edge = fused_preprocess(frame, 0.11, 0.8, out_dtype=jnp.float32)
    ref_img = np.asarray(frame, np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=1e-5)

    ref_edge = np.asarray(sobel_edges(rgb_to_gray(frame.astype(jnp.float32) / 255.0), 0.11, 0.8))
    got = np.asarray(edge)
    # identical except pixels sitting exactly on a threshold boundary
    mismatched = np.abs(got - ref_edge) > 1e-4
    assert mismatched.mean() < 0.001
