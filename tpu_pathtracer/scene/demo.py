"""Canonical demo scenes (stand-ins for the reference's TestObj/head assets,
which are stripped from its mount — see SURVEY.md §2.2). Each returns
(flat_bvh, materials, envmap, texture, camera_builder)."""
from __future__ import annotations

import numpy as np

from .config import (
    MatDesc, MAT_DIFF, MAT_REFL, MAT_GLASS, MAT_FRESNEL, MAT_EMIT,
    MAT_SUBSURFACE, F0_PRESETS,
)
from .camera import InteractiveCamera
from . import procedural
from ..accel.cache import load_or_build


def default_camera(width, height, pitch=0.25, radius=4.0,
                   center=(0.0, 0.8, 0.0), fovx=60.0):
    cam = InteractiveCamera()
    cam.center_position = center
    cam.radius = radius
    cam.pitch = pitch
    cam.set_resolution(width, height)
    cam.set_fovx(fovx)
    return cam


def testobj_scene(cache_dir=None, variant="default"):
    """The TestObj composition per data/sceneDesc.json: textured diffuse
    ground, MAT_FRESNEL inner sphere, MAT_GLASS outer shell, MAT_REFL plate.

    variants:
      default     — as the reference scene desc
      lambertian  — all-diffuse (BASELINE config #1)
      gold        — GGX gold inner sphere
      subsurface  — BSSRDF inner sphere
      media       — jade medium inside the glass shell
    """
    mesh = procedural.make_test_scene()
    fb = load_or_build(mesh, cache_dir=cache_dir)
    if variant == "lambertian":
        mats = [MatDesc(refltype=MAT_DIFF, useTexture=True),
                MatDesc(refltype=MAT_DIFF, objcol=(0.9, 0.3, 0.25)),
                MatDesc(refltype=MAT_DIFF, objcol=(0.3, 0.9, 0.35)),
                MatDesc(refltype=MAT_DIFF, objcol=(0.3, 0.35, 0.9))]
    elif variant == "gold":
        mats = [MatDesc(refltype=MAT_DIFF, useTexture=True),
                MatDesc(refltype=MAT_REFL, alphax=0.15, alphay=0.15,
                        F0=F0_PRESETS["gold"]),
                MatDesc(refltype=MAT_GLASS),
                MatDesc(refltype=MAT_REFL)]
    elif variant == "subsurface":
        mats = [MatDesc(refltype=MAT_DIFF, useTexture=True),
                MatDesc(refltype=MAT_SUBSURFACE, objcol=(0.83, 0.79, 0.75),
                        alphax=0.3, etaT=1.4, mfp=(0.35, 0.3, 0.25), ks=0.2),
                MatDesc(refltype=MAT_GLASS),
                MatDesc(refltype=MAT_REFL)]
    elif variant == "media":
        mats = [MatDesc(refltype=MAT_DIFF, useTexture=True),
                MatDesc(refltype=MAT_DIFF, objcol=(0.8, 0.8, 0.8)),
                MatDesc(refltype=MAT_GLASS, medium="jade"),
                MatDesc(refltype=MAT_REFL)]
    else:
        mats = [MatDesc(refltype=MAT_DIFF, useTexture=True),
                MatDesc(refltype=MAT_FRESNEL, alphax=0.1, alphay=0.1,
                        kd=5.0, ks=1.0),
                MatDesc(refltype=MAT_GLASS),
                MatDesc(refltype=MAT_REFL)]
    envmap = procedural.make_sky_envmap()
    texture = procedural.make_checker_texture()
    return fb, mats, envmap, texture
