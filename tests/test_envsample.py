import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pathtracer.scene import procedural, MatDesc
from tpu_pathtracer.scene.config import MAT_DIFF
from tpu_pathtracer.scene.demo import default_camera
from tpu_pathtracer.accel import flatten_mesh_bvh
from tpu_pathtracer.tracer import Renderer, RenderSettings
from tpu_pathtracer.tracer.envsample import (
    build_env_distribution, sample_env_dir, env_pdf_of_dir, power_heuristic,
)


def test_distribution_sampling_statistics():
    env = procedural.make_sky_envmap(128, 64, sun_intensity=200.0)
    dist = {k: jnp.asarray(v) for k, v in build_env_distribution(env).items()}
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.uniform(size=8192), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=8192), jnp.float32)
    d, pdf = sample_env_dir(dist, u1, u2, 0.0)
    d = np.asarray(d)
    pdf = np.asarray(pdf)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    assert np.all(pdf > 0)
    # samples should concentrate near the sun direction (0.35,0.55,0.75)
    sun = np.array([0.35, 0.55, 0.75])
    sun /= np.linalg.norm(sun)
    frac_near_sun = ((d @ sun) > 0.98).mean()
    # that cap is ~1% of the sphere; uniform sampling would land ~1% here
    assert frac_near_sun > 0.15, "importance sampler must target the sun"
    # pdf consistency: env_pdf_of_dir(sampled dir) ~ returned pdf
    pdf2 = np.asarray(env_pdf_of_dir(dist, jnp.asarray(d), 0.0))
    ratio = pdf2 / pdf
    assert np.percentile(np.abs(ratio - 1.0), 90) < 0.05


def test_monte_carlo_estimates_irradiance():
    """E[L * cos / pdf] over the upper hemisphere must match the true
    irradiance integral of the envmap."""
    env = procedural.make_sky_envmap(96, 48, sun_intensity=60.0)
    dist = {k: jnp.asarray(v) for k, v in build_env_distribution(env).items()}
    rng = np.random.default_rng(1)
    n = 1 << 15
    u1 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    d, pdf = sample_env_dir(dist, u1, u2, 0.0)
    d = np.asarray(d)
    pdf = np.asarray(pdf)
    # L(d): nearest texel
    H, W, _ = env.shape
    lon = np.arctan2(d[:, 0], d[:, 2])
    lon = np.where(lon < 0, lon + 2 * np.pi, lon)
    u = (lon / (2 * np.pi)) % 1.0
    v = np.arccos(np.clip(d[:, 1], -1, 1)) / np.pi
    L = env[np.clip((v * H).astype(int), 0, H - 1),
            np.clip((u * W).astype(int), 0, W - 1)].mean(-1)
    cos = np.maximum(d[:, 1], 0.0)   # normal = +y
    est = np.mean(L * cos / pdf)
    # reference: direct quadrature of the same integral
    th = (np.arange(H) + 0.5) / H * np.pi
    ph = (np.arange(W) + 0.5) / W * 2 * np.pi
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    Lq = env.mean(-1)
    cosq = np.maximum(np.cos(TH), 0)
    ref = np.sum(Lq * cosq * np.sin(TH)) * (np.pi / H) * (2 * np.pi / W)
    assert est == pytest.approx(ref, rel=0.05)


def test_power_heuristic_partition():
    pf = jnp.asarray([1.0, 0.1, 5.0])
    pg = jnp.asarray([1.0, 0.9, 0.0])
    w1 = np.asarray(power_heuristic(pf, pg))
    w2 = np.asarray(power_heuristic(pg, pf))
    np.testing.assert_allclose(w1 + w2, 1.0, atol=1e-6)


def test_furnace_with_importance_sampling():
    """Uniform envmap + white diffuse sphere must stay exactly 1 even with
    NEE+MIS enabled — validates weights sum to unity without double count."""
    env = np.ones((32, 64, 3), np.float32)
    fb = flatten_mesh_bvh(
        procedural.make_uv_sphere((0, 0, 0), 1.0, 0, n_lat=12, n_lon=16))
    s = RenderSettings(bounce_min=16, bounce_max=16, use_envmap=True,
                       use_texture=False, env_importance_sampling=True)
    r = Renderer(fb, [MatDesc(refltype=MAT_DIFF, kd=1.0)], envmap=env,
                 width=48, height=48, settings=s)
    rc = default_camera(48, 48, pitch=0.0, radius=4,
                        center=(0, 0, 0)).build_render_camera()
    accum = r.render_frames(r.zeros_accum(), rc, 1, 24)
    img = np.asarray(accum) / 24
    assert abs(img.mean() - 1.0) < 0.02
    assert np.all(np.isfinite(img))


def test_furnace_with_topk_restricted_nee():
    """Top-k restricted NEE must stay unbiased: a uniform env LARGER than
    the top-k cap (here 32k texels, cap 16k — so NEE covers only half the
    sphere, pdf 0 on the rest) still integrates to exactly 1 under MIS:
    the BSDF-side weight degenerates to 1 where the NEE pdf is 0."""
    env = np.ones((128, 256, 3), np.float32)
    fb = flatten_mesh_bvh(
        procedural.make_uv_sphere((0, 0, 0), 1.0, 0, n_lat=12, n_lon=16))
    s = RenderSettings(bounce_min=16, bounce_max=16, use_envmap=True,
                       use_texture=False, env_importance_sampling=True)
    assert s.env_nee_topk == 16384
    r = Renderer(fb, [MatDesc(refltype=MAT_DIFF, kd=1.0)], envmap=env,
                 width=48, height=48, settings=s)
    assert r.scene["env_alias"].shape[0] == 16384
    rc = default_camera(48, 48, pitch=0.0, radius=4,
                        center=(0, 0, 0)).build_render_camera()
    accum = r.render_frames(r.zeros_accum(), rc, 1, 24)
    img = np.asarray(accum) / 24
    assert abs(img.mean() - 1.0) < 0.02
    assert np.all(np.isfinite(img))


def test_importance_sampling_reduces_variance():
    """Sun-lit diffuse plane: NEE+MIS must cut noise dramatically at equal
    spp (the point of BASELINE config 2)."""
    env = procedural.make_sky_envmap(128, 64, sun_intensity=150.0,
                                     sun_sharpness=3000.0)
    fb = flatten_mesh_bvh(procedural.make_plane((0, 0, 0), 10, 10, 0))
    rc = default_camera(48, 48, pitch=0.9, radius=5,
                        center=(0, 0, 0)).build_render_camera()

    def render(is_on):
        s = RenderSettings(bounce_min=2, bounce_max=4, use_envmap=True,
                           use_texture=False, env_importance_sampling=is_on)
        r = Renderer(fb, [MatDesc(refltype=MAT_DIFF)], envmap=env,
                     width=48, height=48, settings=s)
        a = np.asarray(r.render_frames(r.zeros_accum(), rc, 1, 8)) / 8
        return r.accum_to_buffer(a)

    on = render(True)
    off = render(False)
    # same mean energy (unbiased)...
    assert on.mean() == pytest.approx(off.mean(), rel=0.25)
    # ...but much smoother (plane region: rows away from horizon)
    v_on = np.var(on[30:, :, :].mean(-1))
    v_off = np.var(off[30:, :, :].mean(-1))
    assert v_on < v_off * 0.5, (v_on, v_off)


def test_native_alias_matches_python_and_is_fast():
    """The C alias builder (accel/native/alias.cpp) must produce the exact
    table the Python reference loop produces, and build a real-envmap-sized
    (2048x1024) table in interactive time."""
    import time
    from tpu_pathtracer.accel.native_build import alias_build_native
    from tpu_pathtracer.tracer import envsample

    rng = np.random.default_rng(7)
    n = 4096
    p = rng.exponential(size=n)
    p = p / p.sum() * n
    native = alias_build_native(p)
    if native is None:
        pytest.skip("native lib unavailable")
    prob_c, alias_c = native

    # python reference loop (the exact algorithm the C code mirrors)
    prob = np.ones(n)
    alias = np.arange(n, dtype=np.int64)
    q = p.copy()
    small = [i for i in range(n) if q[i] < 1.0]
    large = [i for i in range(n) if q[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = q[s]
        alias[s] = l
        q[l] = q[l] - (1.0 - q[s])
        (small if q[l] < 1.0 else large).append(l)

    np.testing.assert_array_equal(alias_c, alias.astype(np.int32))
    np.testing.assert_array_equal(prob_c, prob.astype(np.float32))

    # validity: per-texel expected mass == p/n
    mass = prob_c.astype(np.float64).copy()
    np.add.at(mass, alias_c, 1.0 - prob_c.astype(np.float64))
    np.testing.assert_allclose(mass, p, rtol=1e-5, atol=1e-5)

    # speed at real envmap size through the full distribution build
    env = rng.exponential(size=(1024, 2048, 3)).astype(np.float32)
    # CPU time (immune to machine load), best of 3 (immune to first-touch
    # page-fault noise under the full suite: a single cold run measured
    # 5.03s CPU in-suite vs 0.35s warm standalone — and even best-of-2 at
    # a 5.0s bound flaked under suite memory pressure). The bound exists
    # to catch the MINUTES-long pure-Python-loop regression class, so it
    # is deliberately loose: 15s is ~40x the warm native time and ~10x
    # under the regression it guards against.
    dt = float("inf")
    for _ in range(3):
        t0 = time.process_time()
        d = envsample.build_env_distribution(env, topk=0)  # unrestricted
        dt = min(dt, time.process_time() - t0)
    assert d["env_alias"].shape == (1024 * 2048, 12)
    assert dt < 15.0, "2048x1024 alias build took %.1fs" % dt
    # default top-k restriction caps the draw table at 16k rows and
    # renormalizes the pdf over the selected texels (0 elsewhere)
    dk = envsample.build_env_distribution(env)
    assert dk["env_alias"].shape == (16384, 12)
    pk = dk["env_pdf_uv"].astype(np.float64)
    assert (pk > 0).sum() == 16384
    np.testing.assert_allclose(pk.mean(), 1.0, rtol=1e-3)


def test_alias_row_radiance_matches_bilinear_fetch():
    """NEE directions point at texel centers, where the bilinear envmap
    fetch equals the texel value — so the radiance packed in the alias row
    (one gather total) must match env_radiance (a second gather)."""
    import jax.numpy as jnp
    from tpu_pathtracer.scene import procedural
    from tpu_pathtracer.scene.texture import make_quad_texture
    from tpu_pathtracer.tracer.envsample import (
        build_env_distribution, sample_env)
    from tpu_pathtracer.tracer.wavefront import RenderSettings, env_radiance

    env = procedural.make_sky_envmap(64, 32)
    scene = {k: jnp.asarray(v) for k, v in build_env_distribution(env).items()}
    scene["envmap_quad"] = jnp.asarray(make_quad_texture(
        np.asarray(env, np.float32), wrap_u=False, wrap_v=False))
    scene["env_h"], scene["env_w"] = env.shape[0], env.shape[1]
    rs = np.random.default_rng(3)
    u1 = jnp.asarray(rs.uniform(size=20000).astype(np.float32))
    u2 = jnp.asarray(rs.uniform(size=20000).astype(np.float32))
    for rot in (0.0, 0.27):
        d, pdf, L = sample_env(scene, u1, u2, rot)
        L_ref = env_radiance(scene, RenderSettings(), d, jnp.float32(rot))
        assert np.abs(np.asarray(L) - np.asarray(L_ref)).max() < 1e-4


def test_quad_folded_pdf_matches_env_pdf_of_dir():
    """The pdf folded into the 16-col envmap quad rows (miss-path fetch,
    texture.sample_envmap_quad_pdf) must reproduce env_pdf_of_dir's
    separate-gather value BIT FOR BIT for arbitrary directions — the MIS
    power-heuristic weights on the NEE side and the miss side must agree
    exactly or the estimator drifts."""
    import jax.numpy as jnp
    from tpu_pathtracer.scene import procedural
    from tpu_pathtracer.scene.texture import (
        make_quad_texture, sample_envmap_quad, sample_envmap_quad_pdf)
    from tpu_pathtracer.tracer.envsample import (
        build_env_distribution, env_pdf_of_dir)
    from tpu_pathtracer.core.vecmath import PI

    env = procedural.make_sky_envmap(64, 32)
    H, W = env.shape[0], env.shape[1]
    dist = build_env_distribution(env)
    scene = {k: jnp.asarray(v) for k, v in dist.items()}
    equad = make_quad_texture(np.asarray(env, np.float32),
                              wrap_u=False, wrap_v=False)
    p = dist["env_pdf_uv"].astype(np.float32)
    pxn = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    pyn = np.concatenate([p[1:], p[-1:]], axis=0)
    pyxn = np.concatenate([pxn[1:], pxn[-1:]], axis=0)
    pq = np.stack([p, pxn, pyn, pyxn], axis=-1).reshape(-1, 4)
    quad16 = jnp.asarray(np.concatenate([equad, pq], axis=1))

    rs = np.random.default_rng(5)
    d = rs.normal(size=(50000, 3)).astype(np.float32)
    # include poles and axis-aligned edge cases
    d[:8] = [[0, 1, 0], [0, -1, 0], [1, 0, 0], [-1, 0, 0],
             [0, 0, 1], [0, 0, -1], [0, 0.999999, 0.001], [0.001, -0.999999, 0]]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dj = jnp.asarray(d)
    for rot in (0.0, 0.27, 0.93):
        L, p_uv = sample_envmap_quad_pdf(quad16, H, W, dj, jnp.float32(rot))
        y = dj[:, 1]
        sin_t = jnp.sqrt(jnp.maximum(1.0 - y * y, 1e-8))
        pdf_fold = np.asarray(p_uv / (2.0 * PI * PI * sin_t))
        pdf_ref = np.asarray(env_pdf_of_dir(scene, dj, jnp.float32(rot)))
        np.testing.assert_array_equal(pdf_fold, pdf_ref)
        # and the radiance channel matches the 12-col fetch
        L12 = sample_envmap_quad(jnp.asarray(equad), H, W, dj,
                                 jnp.float32(rot))
        np.testing.assert_array_equal(np.asarray(L), np.asarray(L12))
