#!/usr/bin/env python
"""Assemble renders/contact_sheet.png from the committed gallery renders
(the README hero image — parity with the reference's renderingResult/
grid). Pure PIL; re-run after adding gallery panels."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PANELS = [
    "diffuse", "mirror", "ggx_gold", "ggx_aniso",
    "diff_refl", "fresnel_blend", "smooth_glass", "rough_glass",
    "medium_tea", "medium_jade", "medium_milk", "medium_cloud",
    "bssrdf_soe", "bssrdf_800spp", "organic_sss_128spp",
    "organic_media_128spp",
]


def main():
    from PIL import Image, ImageDraw
    rdir = os.path.join(os.path.dirname(__file__), "..", "renders")
    cell = 256
    cols = 4
    rows = -(-len(PANELS) // cols)
    sheet = Image.new("RGB", (cols * cell, rows * cell), (16, 16, 16))
    draw = ImageDraw.Draw(sheet)
    for i, name in enumerate(PANELS):
        path = os.path.join(rdir, name + ".png")
        if not os.path.exists(path):
            print("missing:", name)
            continue
        img = Image.open(path).convert("RGB").resize((cell, cell),
                                                     Image.LANCZOS)
        x, y = (i % cols) * cell, (i // cols) * cell
        sheet.paste(img, (x, y))
        label = name.replace("_128spp", "").replace("_800spp", "")
        draw = ImageDraw.Draw(sheet)
        draw.rectangle([x, y + cell - 16, x + 7 * len(label) + 8, y + cell],
                       fill=(0, 0, 0))
        draw.text((x + 4, y + cell - 14), label, fill=(230, 230, 230))
    out = os.path.join(rdir, "contact_sheet.png")
    sheet.save(out)
    print("wrote", out, sheet.size)


if __name__ == "__main__":
    main()
