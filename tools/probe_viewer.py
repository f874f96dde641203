#!/usr/bin/env python
"""Measure the interactive viewer's frame economics at a 1080p window
(VERDICT r03 weak#6: PARITY quoted 99 ms/frame at 512^2 and extrapolated).

Reports, wall-clock per HOST-VISIBLE call (the viewer's actual latency,
relay dispatch included — single calls, not chained marginals):

  preview   half-res (960x540) 1-sample frame, the moving-camera path
  full      1920x1080 1-sample accumulation frame (converging view)
  batch4    4 chained full-res frames in one dispatch (the viewer's
            --batch converging mode), per-frame cost

Run: python tools/probe_viewer.py [--size 1080]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from tpu_pathtracer.utils import compcache
    compcache.enable()
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.scene.demo import testobj_scene, default_camera
    from tpu_pathtracer.tracer.renderer import Renderer

    H = 1080 if "--size" not in sys.argv else int(
        sys.argv[sys.argv.index("--size") + 1])
    W = (H * 16) // 9
    fb, mats, envmap, texture = testobj_scene(cache_dir=".bvh_cache")
    r = Renderer(fb, mats, envmap=envmap, texture=texture,
                 width=W, height=H)
    r_lo = Renderer(fb, mats, envmap=envmap, texture=texture,
                    width=W // 2, height=H // 2, base_scene=r.scene)
    cam = default_camera(W, H)
    rc = cam.build_render_camera()
    cam_lo = default_camera(W // 2, H // 2)
    rc_lo = cam_lo.build_render_camera()

    def time_calls(fn, n=10):
        fn()                      # compile + warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            a = fn()
            np.asarray(a[-1:])    # force readback sync
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    acc_lo = r_lo.zeros_accum()
    ms_prev = time_calls(lambda: r_lo.render_frame(acc_lo, rc_lo, 1))
    print("preview %dx%d      %7.1f ms/frame (%.1f fps)"
          % (W // 2, H // 2, ms_prev, 1e3 / ms_prev), flush=True)

    # quarter/eighth-res rungs of the moving-camera ladder (VERDICT r04
    # #8: what does one chip buy at a 1080p window if the preview drops
    # further while the camera moves?)
    for div in (4, 8):
        r_q = Renderer(fb, mats, envmap=envmap, texture=texture,
                       width=W // div, height=H // div, base_scene=r.scene)
        rc_q = default_camera(W // div, H // div).build_render_camera()
        acc_q = r_q.zeros_accum()
        ms_q = time_calls(lambda: r_q.render_frame(acc_q, rc_q, 1))
        print("preview %dx%d      %7.1f ms/frame (%.1f fps)"
              % (W // div, H // div, ms_q, 1e3 / ms_q), flush=True)

    acc = r.zeros_accum()
    ms_full = time_calls(lambda: r.render_frame(acc, rc, 1))
    print("full    %dx%d     %7.1f ms/frame (%.1f fps)"
          % (W, H, ms_full, 1e3 / ms_full), flush=True)

    ms_b4 = time_calls(lambda: r.render_frames(acc, rc, 1, 4)) / 4.0
    print("batch4  %dx%d     %7.1f ms/frame (converging throughput)"
          % (W, H, ms_b4), flush=True)


if __name__ == "__main__":
    main()
