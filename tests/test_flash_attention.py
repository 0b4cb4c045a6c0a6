"""Flash-attention kernel numerics vs. the XLA path (interpreter mode).

On-TPU A/B timing lives in the bench tooling; CI validates numerics on the
CPU mesh through the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from videosd_tpu.models.layers import attention
from videosd_tpu.ops.pallas.flash_attention import flash_attention


def _compare(b, s, h, dh, rng, tol):
    dm = h * dh
    q = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    ref = attention(q, k, v, num_heads=h, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, num_heads=h)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < tol, f"flash vs xla max err {err}"


def test_flash_matches_xla_small(rng):
    # one q tile, one kv tile
    _compare(1, 256, 2, 40, rng, 2e-3)


def test_flash_matches_xla_multitile(rng):
    # multiple q and kv tiles exercise the online-softmax correction path
    _compare(1, 1024, 2, 64, rng, 2e-3)


def test_auto_dispatch_stays_xla_on_cpu(rng):
    """impl='auto' must not pick the TPU kernel on the CPU test mesh."""
    q = jnp.asarray(rng.standard_normal((1, 256, 64)), jnp.float32)
    out = attention(q, q, q, num_heads=2, impl="auto")
    ref = attention(q, q, q, num_heads=2, impl="xla")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_cross_attention_mask_path(rng):
    """Masked attention (CLIP causal) always uses the XLA path."""
    q = jnp.asarray(rng.standard_normal((1, 77, 64)), jnp.float32)
    mask = jnp.triu(jnp.full((77, 77), -jnp.inf, jnp.float32), k=1)[None, None]
    out = attention(q, q, q, num_heads=2, mask=mask, impl="auto")
    assert np.isfinite(np.asarray(out)).all()


def test_flash_banked_kv_longer_than_q(rng):
    """Reference-attention READ pass shape: K/V = 2x Q length."""
    q = jnp.asarray(rng.standard_normal((1, 256, 64)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((1, 512, 64)), jnp.float32)
    ref = attention(q, kv, kv, num_heads=2, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, kv, kv, num_heads=2)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-3
