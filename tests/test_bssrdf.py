import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pathtracer.bssrdf import (
    compute_beam_diffusion_table, beam_diffusion_ms, beam_diffusion_ss,
    integrate_catmull_rom, catmull_rom_weights, sample_catmull_rom_2d,
    eval_profile_table, fresnel_moment_1, fresnel_moment_2,
)


@pytest.fixture(scope="module")
def table():
    # small table for speed; full size is (100, 64)
    return compute_beam_diffusion_table(g=0.0, eta=1.4, n_rho=24, n_radius=32)


def test_grids_match_reference_formulas(table):
    # radius: 0, 2.5e-3, *1.2 (src/bssrdf.cpp:169-173)
    assert table.radius[0] == 0.0
    assert table.radius[1] == pytest.approx(2.5e-3)
    np.testing.assert_allclose(table.radius[2:] / table.radius[1:-1], 1.2,
                               rtol=1e-6)
    # rho: (1-e^{-8i/(n-1)})/(1-e^{-8}) (src/bssrdf.cpp:176-178)
    i = np.arange(24)
    want = (1 - np.exp(-8 * i / 23)) / (1 - np.exp(-8))
    np.testing.assert_allclose(table.rho, want, rtol=1e-6)


def test_table_properties(table):
    assert np.all(table.profile >= 0)
    assert np.all(np.isfinite(table.profile))
    # rhoEff monotonically increases with albedo and stays in (0, 1)
    assert np.all(np.diff(table.rho_eff) >= -1e-9)
    assert table.rho_eff[0] == pytest.approx(0.0, abs=1e-9)
    assert table.rho_eff[-1] < 1.0
    # CDF rows are monotone and end at rhoEff
    assert np.all(np.diff(table.profile_cdf, axis=1) >= -1e-9)
    np.testing.assert_allclose(table.profile_cdf[:, -1], table.rho_eff,
                               rtol=1e-6)


def test_beam_diffusion_energy_scale():
    # higher albedo -> more diffused energy at fixed radius
    lo = beam_diffusion_ms(0.3, 0.7, 0.0, 1.4, 0.01)
    hi = beam_diffusion_ms(0.9, 0.1, 0.0, 1.4, 0.01)
    assert hi > lo > 0
    # single scattering decays with radius
    a = beam_diffusion_ss(0.5, 0.5, 0.0, 1.4, 0.01)
    b = beam_diffusion_ss(0.5, 0.5, 0.0, 1.4, 1.0)
    assert a > b >= 0


def test_fresnel_moments_match_device_fits():
    # device FM1 (src/bssrdf.cuh:238-244) is the same polynomial
    from tpu_pathtracer.materials.fresnel import fresnel_moment_1 as fm1_dev
    for eta in (0.7, 1 / 1.4, 1.3, 1.5):
        assert float(fm1_dev(jnp.asarray(eta))) == pytest.approx(
            fresnel_moment_1(eta), rel=1e-4)  # f32 vs f64


def test_integrate_catmull_rom_on_polynomial():
    # the CR integral is exact for cubics sampled densely enough
    x = np.linspace(0, 2, 33)
    f = 3 * x**2
    total, cdf = integrate_catmull_rom(x, f)
    assert total == pytest.approx(8.0, rel=1e-3)
    assert cdf[0] == 0 and cdf[-1] == pytest.approx(total)


def test_catmull_rom_weights_partition_of_unity(table):
    xs = jnp.asarray(np.linspace(0.01, 0.95, 50), jnp.float32)
    off, w, valid = catmull_rom_weights(jnp.asarray(table.rho, jnp.float32), xs)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)
    assert np.all(np.asarray(valid))


def test_sample_catmull_rom_2d_distribution(table):
    """Sampled radii should follow the profile row's CDF."""
    rho = jnp.full((4096,), 0.8, jnp.float32)
    u = jnp.asarray(np.random.default_rng(0).uniform(size=4096), jnp.float32)
    r, fval, pdf = sample_catmull_rom_2d(
        jnp.asarray(table.rho, jnp.float32),
        jnp.asarray(table.radius, jnp.float32),
        jnp.asarray(table.profile, jnp.float32),
        jnp.asarray(table.profile_cdf, jnp.float32),
        rho, u)
    r = np.asarray(r)
    assert np.all(np.isfinite(r)) and np.all(r >= 0)
    assert np.all(r <= table.radius[-1] * (1 + 1e-5))
    # empirical CDF at the median radius should be ~0.5
    med = np.median(r)
    # reference CDF: nearest row (rho grid is dense near 0.8)
    a = np.argmin(np.abs(table.rho - 0.8))
    row_cdf = table.profile_cdf[a] / table.rho_eff[a]
    cdf_at_med = np.interp(med, table.radius, row_cdf)
    assert abs(cdf_at_med - 0.5) < 0.06


def test_eval_profile_table_matches_direct(table):
    rho = jnp.asarray([0.5, 0.8, 0.95], jnp.float32)
    r_opt = jnp.asarray([0.01, 0.05, 0.2], jnp.float32)
    sr, re, valid = eval_profile_table(
        jnp.asarray(table.rho, jnp.float32),
        jnp.asarray(table.radius, jnp.float32),
        jnp.asarray(table.profile, jnp.float32),
        jnp.asarray(table.rho_eff, jnp.float32),
        rho, r_opt)
    sr = np.asarray(sr)
    assert np.all(np.isfinite(sr)) and np.all(np.asarray(valid))
    # compare against dense numpy bicubic via the same weights at one point
    a = np.argmin(np.abs(table.rho - 0.8))
    b = np.searchsorted(table.radius, 0.05)
    approx = table.profile[a, b - 1:b + 1].mean()
    assert sr[1] == pytest.approx(approx, rel=0.75)  # same order of magnitude
