import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pathtracer.core.rng import RaySampler
from tpu_pathtracer.materials import (
    fresnel_dielectric, fresnel_moment_1, fresnel_moment_2,
    specular_glass_sample, ggx_reflection_sample, rough_glass_sample,
    fresnel_blend_sample, henyey_greenstein_sample, microfacet_interface_sample,
)

N = 4096


@pytest.fixture()
def uniforms():
    lanes = jnp.arange(N, dtype=jnp.uint32)
    s = RaySampler.init(jnp.uint32(11), lanes)
    s, us = RaySampler.next_n(s, 6)
    return us


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_fresnel_dielectric_limits():
    # normal incidence: ((n1-n2)/(n1+n2))^2
    f = float(fresnel_dielectric(jnp.asarray([1.0]), 1.0, 1.5)[0])
    assert f == pytest.approx(((1 - 1.5) / (1 + 1.5)) ** 2, abs=1e-6)
    # grazing: -> 1
    f = float(fresnel_dielectric(jnp.asarray([0.001]), 1.0, 1.5)[0])
    assert f > 0.98


def test_fresnel_moments_continuity():
    # fits should roughly agree approaching eta=1 from both sides
    lo = float(fresnel_moment_1(jnp.asarray(0.999)))
    hi = float(fresnel_moment_1(jnp.asarray(1.001)))
    assert abs(lo - hi) < 0.01
    lo = float(fresnel_moment_2(jnp.asarray(0.999)))
    hi = float(fresnel_moment_2(jnp.asarray(1.001)))
    assert abs(lo - hi) < 0.02


def test_specular_glass_snell_and_energy(uniforms):
    u1 = uniforms[0]
    raydir = jnp.tile(jnp.asarray([[0.0, -np.sqrt(0.5), np.sqrt(0.5)]], jnp.float32), (N, 1))
    nl = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (N, 1))
    into = jnp.ones((N,), bool)
    nd, refl = specular_glass_sample(u1, into, raydir, nl, jnp.full((N,), 1.5))
    nd = np.asarray(nd)
    refl = np.asarray(refl)
    np.testing.assert_allclose(np.linalg.norm(nd, axis=-1), 1.0, atol=1e-5)
    # reflected rays mirror about normal
    assert np.allclose(nd[refl], [0.0, np.sqrt(0.5), np.sqrt(0.5)], atol=1e-5)
    # refracted rays obey Snell: sin_t = sin_i / 1.5
    sin_t = np.linalg.norm(nd[~refl][:, [0, 2]], axis=-1)
    assert np.allclose(sin_t, np.sqrt(0.5) / 1.5, atol=1e-5)
    # fresnel fraction ~ R(45deg, 1.5) ~ 0.0502
    want = float(fresnel_dielectric(jnp.asarray([np.sqrt(0.5)]), 1.0, 1.5)[0])
    assert abs(refl.mean() - want) < 0.02


def test_specular_glass_tir():
    # from inside glass at grazing angle -> TIR
    raydir = jnp.asarray([[0.0, -0.3, np.sqrt(1 - 0.09)]], jnp.float32)
    nl = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    nd, refl = specular_glass_sample(
        jnp.asarray([0.99]), jnp.asarray([False]), raydir, nl,
        jnp.asarray([1.5]))
    assert bool(refl[0])


def test_ggx_reflection_upper_hemisphere(uniforms):
    u1, u2 = uniforms[0], uniforms[1]
    raydir = jnp.tile(jnp.asarray([[0.0, -1.0, 0.3]], jnp.float32), (N, 1))
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    nl = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (N, 1))
    tangent = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (N, 1))
    F0 = jnp.tile(jnp.asarray([[0.95, 0.93, 0.88]], jnp.float32), (N, 1))
    nd, beta = ggx_reflection_sample(
        u1, u2, raydir, nl, tangent, F0,
        jnp.full((N,), 0.1), jnp.full((N,), 0.1))
    nd = np.asarray(nd)
    beta = np.asarray(beta)
    np.testing.assert_allclose(np.linalg.norm(nd, axis=-1), 1.0, atol=1e-4)
    assert (nd[:, 1] > 0).mean() > 0.95, "most samples reflect upward"
    assert np.all(beta >= 0) and np.all(beta <= 1.0), "beta clamped to [0,1]"
    # roughness ~0.1 concentrates around the mirror direction
    mirror = np.array([0.0, 1.0, 0.3]) / np.linalg.norm([0.0, 1.0, 0.3])
    cos_m = nd @ mirror
    assert np.median(cos_m) > 0.95


def test_ggx_aniso_stretches_lobe(uniforms):
    u1, u2 = uniforms[0], uniforms[1]
    raydir = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (N, 1))
    nl = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (N, 1))
    tangent = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (N, 1))
    F0 = jnp.full((N, 3), 0.9)
    nd, _ = ggx_reflection_sample(
        u1, u2, raydir, nl, tangent, F0,
        jnp.full((N,), 0.4), jnp.full((N,), 0.05))
    nd = np.asarray(nd)
    # lobe spread along tangent (x) should exceed bitangent (z)
    assert nd[:, 0].std() > 2.0 * nd[:, 2].std()


def test_rough_glass_energy_reasonable(uniforms):
    u1, u2 = uniforms[0], uniforms[1]
    raydir = _unit(np.array([[0.2, -1.0, 0.1]], np.float32))
    raydir = jnp.tile(jnp.asarray(raydir), (N, 1))
    nl = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (N, 1))
    into = jnp.ones((N,), bool)
    nd, beta, refl = rough_glass_sample(
        u1, u2, into, raydir, nl, jnp.full((N,), 1.5), jnp.full((N,), 0.2))
    nd = np.asarray(nd)
    beta = np.asarray(beta)
    np.testing.assert_allclose(np.linalg.norm(nd, axis=-1), 1.0, atol=1e-4)
    assert np.all(beta >= 0) and np.all(beta <= 1.0)
    refl = np.asarray(refl)
    # reflected up, refracted down
    assert np.all(nd[refl][:, 1] > -0.2)
    assert np.all(nd[~refl][:, 1] < 0.2)


def test_fresnel_blend_finite(uniforms):
    u1, u2, u3 = uniforms[0], uniforms[1], uniforms[2]
    raydir = jnp.tile(jnp.asarray([[0.0, -1.0, 0.4]], jnp.float32), (N, 1))
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    nl = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (N, 1))
    Rd = jnp.full((N, 3), 0.5)
    Rs = jnp.full((N, 3), 0.04)
    nd, beta = fresnel_blend_sample(u1, u2, u3, raydir, nl, Rd, Rs,
                                    jnp.full((N,), 0.1))
    assert np.all(np.isfinite(np.asarray(nd)))
    assert np.all(np.isfinite(np.asarray(beta)))


def test_hg_mean_cosine(uniforms):
    u1, u2 = uniforms[0], uniforms[1]
    raydir = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (N, 1))
    for g in (0.0, 0.5, -0.5):
        nd = henyey_greenstein_sample(u1, u2, jnp.full((N,), g), raydir)
        cos_t = np.asarray(nd)[:, 2]
        # HG mean cosine = g
        assert abs(cos_t.mean() - g) < 0.03, "g=%s" % g


def test_microfacet_interface_smooth_equals_normal(uniforms):
    u1, u2 = uniforms[0], uniforms[1]
    raydir = jnp.tile(jnp.asarray([[0.0, -1.0, 0.2]], jnp.float32), (N, 1))
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    nl = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (N, 1))
    into = jnp.ones((N,), bool)
    m, nd, beta, refl = microfacet_interface_sample(
        u1, u2, into, raydir, nl, jnp.full((N,), 1.4), jnp.full((N,), 0.0))
    np.testing.assert_allclose(np.asarray(m), np.asarray(nl), atol=1e-6)
    np.testing.assert_allclose(np.asarray(beta), 1.0, atol=1e-6)
