"""Wall-clock telemetry: per-stage timing + rays/s counters as first-class
metrics (upgrade over the reference's once-per-second printf,
src/main.cpp:204-209)."""
from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()

    def elapsed(self):
        return time.perf_counter() - self.t0


class RateMeter:
    """Tracks frames + per-pixel samples and prints
    'time, frame, ms/frame, FPS, Mpaths/s' once per interval, like disp()'s
    stats line (the reference prints ms/frame + FPS only,
    src/main.cpp:204-209; paths/s is the honest extra — bounce and shadow
    rays are NOT counted here, bench.py counts those)."""

    def __init__(self, interval=1.0):
        self.interval = interval
        self.timer = Timer()
        self.last_report = 0.0
        self.frames = 0
        self.rays = 0

    def tick(self, rays_this_frame, out=print):
        self.frames += 1
        self.rays += int(rays_this_frame)
        el = self.timer.elapsed()
        if el - self.last_report >= self.interval:
            fps = self.frames / el
            out("time %.1fs, frames %d, %.2f ms/frame, %.1f FPS, %.2f Mpaths/s"
                % (el, self.frames, 1000.0 * el / self.frames, fps,
                   self.rays / el / 1e6))
            self.last_report = el
