"""Feature-level integration tests: distant light, media, BSSRDF (both
profile paths), matching the BASELINE config ladder."""
import numpy as np
import pytest

from tpu_pathtracer.scene import procedural, MatDesc
from tpu_pathtracer.scene.config import (
    MAT_DIFF, MAT_GLASS, MAT_SUBSURFACE,
)
from tpu_pathtracer.scene.demo import default_camera
from tpu_pathtracer.scene.mesh import TriangleMesh
from tpu_pathtracer.accel import flatten_mesh_bvh
from tpu_pathtracer.tracer import Renderer, RenderSettings


def _render(r, rc, spp):
    accum = r.zeros_accum()
    accum = r.render_frames(accum, rc, 1, spp)
    return np.asarray(accum) / spp


@pytest.fixture(scope="module")
def shadow_scene():
    plane = procedural.make_plane((0, 0, 0), 20, 20, 0)
    sphere = procedural.make_uv_sphere((0, 1.2, 0), 0.8, 1, n_lat=12, n_lon=16)
    return flatten_mesh_bvh(TriangleMesh.concatenate([plane, sphere]))


def test_distant_light_and_shadow(shadow_scene):
    W = H = 64
    mats = [MatDesc(refltype=MAT_DIFF, objcol=(0.8, 0.8, 0.8)),
            MatDesc(refltype=MAT_DIFF, objcol=(0.2, 0.2, 0.2))]
    s = RenderSettings(bounce_min=2, bounce_max=4, use_envmap=False,
                       use_texture=False, use_distant_light=True,
                       distant_light_dir=(1.0, 1.0, 0.0),  # 45 deg from +x
                       distant_light_L=(2.0, 2.0, 2.0))
    r = Renderer(shadow_scene, mats, width=W, height=H, settings=s)
    rc = default_camera(W, H, pitch=1.5, radius=8,
                        center=(0, 0, 0)).build_render_camera()
    buf = r.accum_to_buffer(_render(r, rc, 24))
    # straight-down view: pixel x ~ world x (6.9 px/unit at fov 60, r=8).
    # The sphere (c=(0,1.2,0), r=0.8) casts its shadow around world
    # x=-1.2 -> ~8 px left of center, just beyond the sphere silhouette.
    lit = buf[8:14, W - 14:W - 8].mean()           # far lit plane
    shadow = buf[H // 2 - 2:H // 2 + 2, W // 2 - 12:W // 2 - 8].mean()
    assert lit > 0.05, "directly lit plane must receive distant light"
    assert lit > shadow * 1.5, "occluded region must be darker (shadow rays)"


def test_media_attenuates_and_scatters():
    """A glass shell filled with a dense medium darkens transmission
    (BASELINE config 4)."""
    W = H = 48
    sphere = procedural.make_uv_sphere((0, 0.0, 0), 1.0, 0, n_lat=12, n_lon=16)
    fb = flatten_mesh_bvh(sphere)
    cam = default_camera(W, H, pitch=0.0, radius=3.5, center=(0, 0, 0))
    rc = cam.build_render_camera()

    def render_with(med):
        mats = [MatDesc(refltype=MAT_GLASS, etaT=1.5, medium=med)]
        s = RenderSettings(bounce_min=4, bounce_max=12, use_envmap=False,
                           use_texture=False,
                           has_media=med is not None)
        r = Renderer(fb, mats, width=W, height=H, settings=s,
                     env_const=(1.0, 1.0, 1.0))
        return r.accum_to_buffer(_render(r, rc, 24))

    clear = render_with(None)
    dense = render_with("jade")
    c = clear[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4].mean()
    d = dense[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4].mean()
    assert np.all(np.isfinite(dense))
    assert d < c * 0.9, "dense jade medium must attenuate transmission"


@pytest.mark.parametrize("use_soe", [True, False])
def test_bssrdf_renders_finite_and_bright(use_soe):
    """Subsurface sphere on a plane under constant env (BASELINE config 5);
    exercises both the SoE and the tabulated Catmull-Rom profile paths."""
    W = H = 40
    plane = procedural.make_plane((0, -1.0, 0), 20, 20, 0)
    sphere = procedural.make_uv_sphere((0, 0.0, 0), 1.0, 1, n_lat=12, n_lon=16)
    fb = flatten_mesh_bvh(TriangleMesh.concatenate([plane, sphere]))
    mats = [MatDesc(refltype=MAT_DIFF, objcol=(0.5, 0.5, 0.5)),
            MatDesc(refltype=MAT_SUBSURFACE, objcol=(0.8, 0.75, 0.7),
                    alphax=0.3, etaT=1.4, mfp=(0.3, 0.25, 0.2), ks=0.2)]
    s = RenderSettings(bounce_min=3, bounce_max=10, use_envmap=False,
                       use_texture=False, has_bssrdf=True,
                       bssrdf_use_soe=use_soe)
    r = Renderer(fb, mats, width=W, height=H, settings=s,
                 env_const=(1.0, 1.0, 1.0))
    rc = default_camera(W, H, pitch=0.15, radius=3.5,
                        center=(0, 0, 0)).build_render_camera()
    img = r.accum_to_buffer(_render(r, rc, 16))
    assert np.all(np.isfinite(img))
    center = img[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4].mean()
    assert center > 0.02, "subsurface sphere must return light (soe=%s)" % use_soe
    assert center < 3.0, "subsurface brightness sane"


def test_bssrdf_exit_distant_light():
    """The distant light must reach subsurface material through the exit-
    point NEE (reference src/renderkernel.cu:815-841): with a black
    environment, the only light is the distant source."""
    W = H = 32
    sphere = procedural.make_uv_sphere((0, 0.0, 0), 1.0, 1, n_lat=10, n_lon=14)
    plane = procedural.make_plane((0, -1.0, 0), 20, 20, 0)
    fb = flatten_mesh_bvh(TriangleMesh.concatenate([plane, sphere]))
    from tpu_pathtracer.scene.config import MAT_SUBSURFACE
    mats = [MatDesc(refltype=MAT_DIFF, objcol=(0.6, 0.6, 0.6)),
            MatDesc(refltype=MAT_SUBSURFACE, objcol=(0.8, 0.75, 0.7),
                    alphax=0.3, etaT=1.4, mfp=(0.3, 0.25, 0.2), ks=0.2)]
    s = RenderSettings(bounce_min=3, bounce_max=8, use_envmap=False,
                       use_texture=False, has_bssrdf=True,
                       use_distant_light=True,
                       distant_light_dir=(0.3, 1.0, 0.4),
                       distant_light_L=(3.0, 3.0, 3.0))
    r = Renderer(fb, mats, width=W, height=H, settings=s,
                 env_const=(0.0, 0.0, 0.0))
    rc = default_camera(W, H, pitch=0.3, radius=3.5,
                        center=(0, 0, 0)).build_render_camera()
    img = r.accum_to_buffer(_render(r, rc, 24))
    assert np.all(np.isfinite(img))
    center = img[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4].mean()
    assert center > 0.005, "exit-point NEE must deliver distant light"
