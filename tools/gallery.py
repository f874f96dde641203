#!/usr/bin/env python
"""Render the material showcase gallery (parity with the reference's
renderingResult/*.PNG grid, README.md:3-23): one image per material family
on the standard test composition."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def variants():
    from tpu_pathtracer.scene.config import (
        MatDesc, MAT_DIFF, MAT_REFL, MAT_DIFF_REFL, MAT_FRESNEL, MAT_GLASS,
        MAT_EMIT, MAT_NULL, MAT_SUBSURFACE, F0_PRESETS,
    )

    def mats(center):
        return [MatDesc(refltype=MAT_DIFF, useTexture=True), center,
                MatDesc(refltype=MAT_GLASS),
                MatDesc(refltype=MAT_REFL)]

    out = {
        "diffuse": mats(MatDesc(refltype=MAT_DIFF, objcol=(0.85, 0.4, 0.3))),
        "mirror": mats(MatDesc(refltype=MAT_REFL, alphax=0.0)),
        "ggx_gold": mats(MatDesc(refltype=MAT_REFL, alphax=0.15, alphay=0.15,
                                 F0=F0_PRESETS["gold"])),
        "ggx_aniso": mats(MatDesc(refltype=MAT_REFL, alphax=0.4, alphay=0.05,
                                  F0=F0_PRESETS["silver"],
                                  tangent=(0.0, 1.0, -1.0))),
        # the reference's second aniso config (microfacetAnisotropic02):
        # grooves rotated 90 deg — swap the roughness axes
        "ggx_aniso2": mats(MatDesc(refltype=MAT_REFL, alphax=0.05,
                                   alphay=0.4, F0=F0_PRESETS["silver"],
                                   tangent=(0.0, 1.0, -1.0))),
        "diff_refl": mats(MatDesc(refltype=MAT_DIFF_REFL, alphax=0.2,
                                  alphay=0.2, kd=1.0, ks=1.0,
                                  objcol=(0.4, 0.5, 0.8))),
        "fresnel_blend": mats(MatDesc(refltype=MAT_FRESNEL, alphax=0.1,
                                      alphay=0.1, kd=5.0, ks=1.0)),
        "smooth_glass": mats(MatDesc(refltype=MAT_GLASS, etaT=1.5)),
        "rough_glass": mats(MatDesc(refltype=MAT_GLASS, etaT=1.5,
                                    alphax=0.2)),
        "emissive": mats(MatDesc(refltype=MAT_EMIT, emit=(3.0, 2.0, 1.2))),
        "null": mats(MatDesc(refltype=MAT_NULL)),
        "medium_tea": mats(MatDesc(refltype=MAT_GLASS, medium="tea")),
        "medium_jade": mats(MatDesc(refltype=MAT_GLASS, medium="jade")),
        "medium_milk": mats(MatDesc(refltype=MAT_GLASS, medium="milk")),
        # the reference's mediumSmoke.PNG: the "cloud" sigma_s/sigma_a/g
        # preset from src/scenes.txt:51
        "medium_cloud": mats(MatDesc(refltype=MAT_GLASS, medium="cloud")),
        "bssrdf_soe": mats(MatDesc(refltype=MAT_SUBSURFACE,
                                   objcol=(0.83, 0.79, 0.75), alphax=0.3,
                                   etaT=1.4, mfp=(0.35, 0.3, 0.25), ks=0.2)),
    }
    return out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="renders")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--only", help="comma-separated variant names")
    ap.add_argument("--cache-dir", default=".bvh_cache")
    ap.add_argument("--ladder", action="store_true",
                    help="render the BSSRDF convergence ladder "
                         "(bssrdf_{50,200,800}spp.png, the reference's "
                         "bssrdf50/200/800 gallery row)")
    args = ap.parse_args()

    from tpu_pathtracer.scene import procedural
    from tpu_pathtracer.scene.demo import default_camera
    from tpu_pathtracer.accel import load_or_build
    from tpu_pathtracer.tracer.renderer import Renderer
    from PIL import Image

    os.makedirs(args.out_dir, exist_ok=True)
    mesh = procedural.make_test_scene()
    fb = load_or_build(mesh, cache_dir=args.cache_dir)
    envmap = procedural.make_sky_envmap()
    texture = procedural.make_checker_texture()
    W = H = args.size
    rc = default_camera(W, H).build_render_camera()

    if args.ladder:
        from tpu_pathtracer.scene.config import (
            MatDesc, MAT_DIFF, MAT_GLASS, MAT_REFL, MAT_SUBSURFACE)
        mats = [MatDesc(refltype=MAT_DIFF, useTexture=True),
                MatDesc(refltype=MAT_SUBSURFACE, objcol=(0.83, 0.79, 0.75),
                        alphax=0.3, etaT=1.4, mfp=(0.35, 0.3, 0.25), ks=0.2),
                MatDesc(refltype=MAT_GLASS), MatDesc(refltype=MAT_REFL)]
        r = Renderer(fb, mats, envmap=envmap, texture=texture,
                     width=W, height=H)
        accum = r.zeros_accum()
        done = 0
        for spp in (50, 200, 800):
            t0 = time.time()
            accum = r.render_frames(accum, rc, done + 1, spp - done)
            done = spp
            img = r.accum_to_image(accum, done)
            path = os.path.join(args.out_dir, "bssrdf_%dspp.png" % spp)
            Image.fromarray(img, "RGB").save(path)
            print("bssrdf %3d spp %5.1fs -> %s"
                  % (spp, time.time() - t0, path))
        return

    sel = args.only.split(",") if args.only else None
    for name, mats in variants().items():
        if sel and name not in sel:
            continue
        t0 = time.time()
        settings = None
        if name.startswith("medium"):
            # dense media need a deep scatter budget to cross the sphere
            from tpu_pathtracer.tracer import RenderSettings
            settings = RenderSettings(bounce_min=2, bounce_max=64,
                                      use_envmap=True, use_texture=True,
                                      has_media=True)
        r = Renderer(fb, mats, envmap=envmap, texture=texture,
                     width=W, height=H, settings=settings)
        accum = r.render_frames(r.zeros_accum(), rc, 1, args.spp)
        img = r.accum_to_image(accum, args.spp)
        path = os.path.join(args.out_dir, name + ".png")
        Image.fromarray(img, "RGB").save(path)
        print("%-14s %5.1fs -> %s" % (name, time.time() - t0, path))


if __name__ == "__main__":
    main()
