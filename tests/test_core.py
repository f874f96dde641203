import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_pathtracer.core import vecmath as vm
from tpu_pathtracer.core.rng import RaySampler, wang_hash, pcg_hash
from tpu_pathtracer.core.image import tonemap, write_ppm, read_ppm, rmse


def test_wang_hash_reference_values():
    # reference src/Util.cpp:4-12; independently computed expected values
    def wang_py(a):
        a = (a ^ 61) ^ (a >> 16)
        a = (a * 9) & 0xFFFFFFFF
        a = a ^ (a >> 4)
        a = (a * 0x27D4EB2D) & 0xFFFFFFFF
        a = a ^ (a >> 15)
        return a
    xs = np.array([0, 1, 2, 12345, 0xDEADBEEF], np.uint32)
    got = np.asarray(wang_hash(jnp.asarray(xs)))
    want = np.array([wang_py(int(x)) for x in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_sampler_uniformity_and_determinism():
    lanes = jnp.arange(4096, dtype=jnp.uint32)
    s0 = RaySampler.init(wang_hash(jnp.uint32(7)), lanes)
    s1, u1 = RaySampler.next(s0)
    s2, u2 = RaySampler.next(s1)
    u1 = np.asarray(u1)
    u2 = np.asarray(u2)
    assert u1.min() >= 0.0 and u1.max() < 1.0
    # mean/var of U(0,1)
    assert abs(u1.mean() - 0.5) < 0.02
    assert abs(u1.var() - 1 / 12) < 0.005
    # decorrelated across draws and lanes
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.05
    # deterministic
    _, u1b = RaySampler.next(RaySampler.init(wang_hash(jnp.uint32(7)), lanes))
    np.testing.assert_array_equal(u1, np.asarray(u1b))


def test_cosine_hemisphere_distribution():
    lanes = jnp.arange(8192, dtype=jnp.uint32)
    s = RaySampler.init(jnp.uint32(3), lanes)
    s, u1 = RaySampler.next(s)
    s, u2 = RaySampler.next(s)
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8192, 1))
    d = vm.cosine_sample_hemisphere(u1, u2, n)
    d = np.asarray(d)
    assert np.all(d[:, 2] >= -1e-6), "all samples in upper hemisphere"
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # E[cos theta] for cosine-weighted = 2/3
    assert abs(d[:, 2].mean() - 2 / 3) < 0.01


def test_make_basis_orthonormal():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(256, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    u, v = vm.make_basis(jnp.asarray(n, jnp.float32))
    u = np.asarray(u)
    v = np.asarray(v)
    np.testing.assert_allclose(np.sum(u * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(v * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(u * v, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(u, axis=-1), 1.0, atol=1e-5)


def test_barycentric_roundtrip():
    rng = np.random.default_rng(1)
    a, b, c = [jnp.asarray(rng.normal(size=(64, 3)), jnp.float32) for _ in range(3)]
    w = rng.dirichlet((1, 1, 1), size=64).astype(np.float32)
    p = w[:, 0:1] * a + w[:, 1:2] * b + w[:, 2:3] * c
    u, v, ww = vm.barycentric(p, a, b, c)
    np.testing.assert_allclose(np.asarray(u), w[:, 0], atol=2e-3)
    np.testing.assert_allclose(np.asarray(v), w[:, 1], atol=2e-3)
    np.testing.assert_allclose(np.asarray(ww), w[:, 2], atol=2e-3)


def test_tonemap_matches_reference_quantization():
    # pixelToInt: int(pow(clamp(x), 1/2.2) * 255 + .5) (src/Util.h:57)
    accum = np.array([[[0.0, 0.5, 1.0], [2.0, 0.25, 0.0001]]]) * 4
    img = tonemap(accum, 4)
    want = [int(min(max(x, 0), 1) ** (1 / 2.2) * 255 + 0.5)
            for x in [0.0, 0.5, 1.0, 1.0, 0.25, 0.0001]]
    np.testing.assert_array_equal(img.reshape(-1), want)


def test_ppm_roundtrip(tmp_path):
    accum = np.random.default_rng(2).uniform(size=(8, 6, 3)) * 3
    p = tmp_path / "x.ppm"
    write_ppm(str(p), accum, 3)
    back = read_ppm(str(p))
    fwd = tonemap(accum, 3) / 255.0
    assert rmse(back, fwd) < 1e-6
