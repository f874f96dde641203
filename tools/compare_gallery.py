#!/usr/bin/env python
"""Side-by-side comparison sheet: our renders vs the reference gallery.

The reference ships 16 result images (/root/reference/renderingResult/,
README.md:3-23) rendered from assets that are stripped from this mount
(TestObj.obj, pisa.hdr — .MISSING_LARGE_BLOBS), so exact per-pixel RMSE
against them is impossible. What CAN be matched is material behavior: each
pair below puts our render of the same material configuration (same
MatDesc fields / medium presets, procedural stand-in geometry + sky env)
next to the reference PNG. Per-pair notes live in PARITY.md.

Usage: python tools/compare_gallery.py [--out renders/comparison_sheet.png]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_DIR = "/root/reference/renderingResult"

# (reference image, our render, caption)
PAIRS = [
    ("lambertian.PNG", "diffuse.png", "MAT_DIFF textured/cosine"),
    ("specularReflection.PNG", "mirror.png", "MAT_REFL alphax=0 mirror"),
    ("microfacetReflection.PNG", "ggx_gold.png", "MAT_REFL GGX gold F0"),
    ("microfacetAnisotropic01.PNG", "ggx_aniso.png",
     "MAT_REFL aniso ax!=ay"),
    ("microfacetAnisotropic02.PNG", "ggx_aniso2.png",
     "MAT_REFL aniso axes swapped"),
    ("specularGlass.PNG", "smooth_glass.png", "MAT_GLASS alphax=0"),
    ("roughGlass.PNG", "rough_glass.png", "MAT_GLASS rough microfacet"),
    ("fresnelBlend.PNG", "fresnel_blend.png", "MAT_FRESNEL blend"),
    ("plastic.PNG", "diff_refl.png", "MAT_DIFF_REFL ks/kd coin flip"),
    ("mediumTea.PNG", "medium_tea.png", "homogeneous medium: tea"),
    ("mediumMilk.PNG", "medium_milk.png", "homogeneous medium: milk"),
    ("mediumJade.PNG", "medium_jade.png", "homogeneous medium: jade"),
    ("mediumSmoke.PNG", "medium_cloud.png", "homogeneous medium: cloud"),
    ("bssrdf50.PNG", "bssrdf_50spp.png", "BSSRDF ladder 50 spp"),
    ("bssrdf200.PNG", "bssrdf_200spp.png", "BSSRDF ladder 200 spp"),
    ("bssrdf800.PNG", "bssrdf_800spp.png", "BSSRDF ladder 800 spp"),
]

ROW_H = 260
PAD = 6


def _load(path):
    from PIL import Image
    img = Image.open(path).convert("RGB")
    w, h = img.size
    nw = int(w * ROW_H / h)
    return np.asarray(img.resize((nw, ROW_H)), np.uint8)


def _label(img, text):
    """Stamp a small text banner above an image block."""
    from PIL import Image, ImageDraw
    im = Image.fromarray(img)
    draw = ImageDraw.Draw(im)
    draw.rectangle([0, 0, im.size[0], 14], fill=(0, 0, 0))
    draw.text((3, 2), text, fill=(255, 255, 255))
    return np.asarray(im)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="renders/comparison_sheet.png")
    ap.add_argument("--renders-dir", default="renders")
    args = ap.parse_args()

    rows = []
    width = 0
    missing = []
    for ref_name, ours_name, caption in PAIRS:
        ref_p = os.path.join(REF_DIR, ref_name)
        our_p = os.path.join(args.renders_dir, ours_name)
        if not os.path.exists(ref_p) or not os.path.exists(our_p):
            missing.append((ref_name, ours_name))
            continue
        ref = _label(_load(ref_p), "reference  " + ref_name)
        ours = _label(_load(our_p), "ours  %s  (%s)" % (ours_name, caption))
        row = np.concatenate([ref, np.zeros((ROW_H, PAD, 3), np.uint8),
                              ours], axis=1)
        rows.append(row)
        width = max(width, row.shape[1])

    canvas = []
    for row in rows:
        if row.shape[1] < width:
            row = np.pad(row, ((0, 0), (0, width - row.shape[1]), (0, 0)))
        canvas.append(row)
        canvas.append(np.zeros((PAD, width, 3), np.uint8))
    sheet = np.concatenate(canvas, axis=0)

    from PIL import Image
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    Image.fromarray(sheet).save(args.out)
    print("wrote %s (%d pairs)" % (args.out, len(rows)))
    for ref_name, ours_name in missing:
        print("  missing pair: %s <-> %s" % (ref_name, ours_name))


if __name__ == "__main__":
    main()
