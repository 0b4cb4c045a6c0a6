"""Tiled VAE encode/decode: tiling must match the untiled result away from
edges and bound per-call shapes (memory) regardless of output size."""

import jax
import jax.numpy as jnp
import numpy as np

from videosd_tpu.models.taesd import TAESDConfig, taesd_decode, taesd_encode, taesd_init
from videosd_tpu.ops.tiling import tiled_decode, tiled_encode

CFG = TAESDConfig(hidden=8, blocks_per_stage=1)
PARAMS = taesd_init(jax.random.PRNGKey(0), CFG)


def test_tiled_decode_matches_untiled_interior(rng):
    z = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    decode = jax.jit(lambda zt: taesd_decode(PARAMS, zt, CFG))
    full = np.asarray(decode(z))
    tiled = np.asarray(tiled_decode(decode, z, tile=8, overlap=2))
    assert tiled.shape == full.shape
    # interior agreement (tile seams are feather-blended; decoder receptive
    # field means tiles differ near their edges)
    diff = np.abs(tiled - full)
    assert np.median(diff) < 0.05


def test_tiled_decode_single_tile_is_exact(rng):
    z = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    decode = jax.jit(lambda zt: taesd_decode(PARAMS, zt, CFG))
    np.testing.assert_array_equal(
        np.asarray(tiled_decode(decode, z, tile=8)), np.asarray(decode(z))
    )


def test_tiled_decode_uneven_size(rng):
    z = jnp.asarray(rng.standard_normal((1, 20, 12, 4)), jnp.float32)
    decode = jax.jit(lambda zt: taesd_decode(PARAMS, zt, CFG))
    out = np.asarray(tiled_decode(decode, z, tile=8, overlap=2))
    assert out.shape == (1, 160, 96, 3)
    assert np.isfinite(out).all()


def test_tiled_encode_roundtrip_shape(rng):
    img = jnp.asarray(rng.random((1, 128, 128, 3)) * 2 - 1, jnp.float32)
    encode = jax.jit(lambda it: taesd_encode(PARAMS, it, CFG))
    z = np.asarray(tiled_encode(encode, img, tile=64, overlap=16))
    assert z.shape == (1, 16, 16, 4)
    assert np.isfinite(z).all()
