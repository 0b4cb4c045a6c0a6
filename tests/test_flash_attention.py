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


def test_flash_attention_is_differentiable(rng):
    """Training through the flash kernel: custom_vjp routes the backward
    through the XLA path (round-4 fix — pallas_call has no autodiff rule,
    and the sd15 train step crashed on it; grads must match XLA's)."""
    q = jnp.asarray(rng.standard_normal((1, 256, 80)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 256, 80)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 256, 80)), jnp.float32)

    def loss(impl):
        def f(q_, k_, v_):
            return jnp.sum(attention(q_, k_, v_, num_heads=2, impl=impl) ** 2)
        return f

    gq_x, gk_x, gv_x = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gq_p, gk_p, gv_p = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)

    for g_p, g_x in zip((gq_p, gk_p, gv_p), (gq_x, gk_x, gv_x)):
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-5, atol=1e-5)
