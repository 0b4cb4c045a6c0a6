"""LCM scheduler numerics vs. the reference equations.

The expected values are computed here with an independent NumPy
transliteration of the reference math (diffusert/lcm/lcm_controlnet.py:
set_timesteps :905-938, scalings :940-946, step :1018-1038,
add_noise :1046-1071) so the library is tested against the equations, not
against itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosd_tpu.schedulers import (
    LCMSchedulerConfig,
    add_noise,
    boundary_scalings,
    get_velocity,
    make_alphas_cumprod,
    step,
    timestep_schedule,
)

CFG = LCMSchedulerConfig()


def ref_alphas_cumprod():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def ref_timesteps(strength, steps, origin=50, n_train=1000):
    c = n_train // origin
    origin_ts = np.asarray(list(range(1, int(origin * strength) + 1))) * c - 1
    skipping = max(len(origin_ts) // steps, 1)
    return origin_ts[::-skipping][:steps]


def test_alphas_cumprod_matches_reference():
    ours = make_alphas_cumprod(CFG)
    theirs = ref_alphas_cumprod().astype(np.float32)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


@pytest.mark.parametrize("strength", [1.0, 0.6, 0.4, 0.3, 0.11])
@pytest.mark.parametrize("steps", [1, 2, 4, 8])
def test_timestep_schedule_matches_reference(strength, steps):
    expected = ref_timesteps(strength, steps)
    ts, valid = timestep_schedule(CFG, steps, strength)
    ts, valid = np.asarray(ts), np.asarray(valid)
    got = ts[valid]
    np.testing.assert_array_equal(got, expected)
    # padding slots precede real slots
    k = len(expected)
    assert valid.sum() == k
    assert valid[steps - k :].all()


def test_timestep_schedule_low_strength_pads():
    # strength 0.05, origin 50 -> n=2 real steps out of 4 slots
    ts, valid = timestep_schedule(CFG, 4, 0.05)
    assert np.asarray(valid).tolist() == [False, False, True, True]
    np.testing.assert_array_equal(np.asarray(ts)[2:], ref_timesteps(0.05, 4))


def test_timestep_schedule_traced_strength_no_recompile():
    calls = []

    @jax.jit
    def f(s):
        calls.append(1)
        ts, valid = timestep_schedule(CFG, 4, s)
        return ts, valid

    for s in (0.6, 0.4, 0.9):
        ts, valid = f(jnp.float32(s))
        np.testing.assert_array_equal(
            np.asarray(ts)[np.asarray(valid)], ref_timesteps(s, 4)
        )
    assert len(calls) == 1  # traced once: sliders don't recompile


def test_boundary_scalings():
    for t in [19, 179, 599, 999]:
        c_skip, c_out = boundary_scalings(CFG, t)
        sd = 0.5
        ts = t / 0.1
        np.testing.assert_allclose(
            float(c_skip), sd**2 / (ts**2 + sd**2), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(c_out), ts / (ts**2 + sd**2) ** 0.5, rtol=1e-6
        )


def test_add_noise_matches_reference():
    ac = make_alphas_cumprod(CFG)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    nz = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    t = 599
    got = np.asarray(add_noise(ac, x0, nz, t))
    a = ref_alphas_cumprod()[t]
    want = np.sqrt(a) * x0 + np.sqrt(1 - a) * nz
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-5, atol=2e-6)


def test_step_epsilon_matches_reference():
    ac = make_alphas_cumprod(CFG)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    nz = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    t, t_prev = 599, 459

    prev, denoised = step(CFG, ac, eps, t, t_prev, x, noise=nz, multistep=True)

    acd = ref_alphas_cumprod()
    a_t, b_t = acd[t], 1 - acd[t]
    pred_x0 = (x - np.sqrt(b_t) * eps) / np.sqrt(a_t)
    ts = t / 0.1
    c_skip = 0.25 / (ts**2 + 0.25)
    c_out = ts / (ts**2 + 0.25) ** 0.5
    want_denoised = c_out * pred_x0 + c_skip * x
    want_prev = np.sqrt(acd[t_prev]) * want_denoised + np.sqrt(1 - acd[t_prev]) * nz

    np.testing.assert_allclose(
        np.asarray(denoised), want_denoised.astype(np.float32), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(prev), want_prev.astype(np.float32), rtol=2e-4, atol=1e-5
    )


def test_step_single_step_returns_denoised():
    ac = make_alphas_cumprod(CFG)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    prev, denoised = step(CFG, ac, eps, 999, 999, x, multistep=False)
    np.testing.assert_array_equal(np.asarray(prev), np.asarray(denoised))


def test_step_v_prediction():
    cfg = LCMSchedulerConfig(prediction_type="v_prediction")
    ac = make_alphas_cumprod(cfg)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    v = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    t = 499
    _, denoised = step(cfg, ac, v, t, t, x, multistep=False)
    acd = ref_alphas_cumprod()
    pred_x0 = np.sqrt(acd[t]) * x - np.sqrt(1 - acd[t]) * v
    ts = t / 0.1
    want = (ts / (ts**2 + 0.25) ** 0.5) * pred_x0 + (0.25 / (ts**2 + 0.25)) * x
    np.testing.assert_allclose(np.asarray(denoised), want.astype(np.float32), rtol=2e-4, atol=1e-5)


def test_get_velocity():
    ac = make_alphas_cumprod(CFG)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    nz = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    t = 100
    acd = ref_alphas_cumprod()
    want = np.sqrt(acd[t]) * nz - np.sqrt(1 - acd[t]) * x
    np.testing.assert_allclose(
        np.asarray(get_velocity(ac, x, nz, t)), want.astype(np.float32), rtol=2e-5, atol=2e-6
    )


def test_cosine_and_zero_snr_schedules_exist():
    cos = make_alphas_cumprod(LCMSchedulerConfig(beta_schedule="squaredcos_cap_v2"))
    assert cos.shape == (1000,) and np.all(np.diff(cos) < 0)
    zsnr = make_alphas_cumprod(LCMSchedulerConfig(rescale_betas_zero_snr=True))
    assert zsnr[-1] < 1e-10  # terminal SNR is zero
