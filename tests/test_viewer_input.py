"""Viewer input decoding: xterm SGR-1006 mouse reports and the drag ->
camera gesture map (the reference's GLUT mouse handlers,
src/MouseKeyboardInput.h:67-111, re-homed onto terminal mouse reporting)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from interactive import decode_sgr_mouse, MouseOrbit  # noqa: E402

from tpu_pathtracer.scene.demo import default_camera  # noqa: E402


def test_decode_press_drag_release():
    assert decode_sgr_mouse("0;10;5", "M") == ("MOUSE", "press", 0, False,
                                               10, 5)
    assert decode_sgr_mouse("32;12;6", "M") == ("MOUSE", "drag", 0, False,
                                                12, 6)
    assert decode_sgr_mouse("0;12;6", "m") == ("MOUSE", "release", 0, False,
                                               12, 6)
    # right button, shift held
    assert decode_sgr_mouse("38;3;4", "M") == ("MOUSE", "drag", 2, True,
                                               3, 4)
    # wheel up / down
    assert decode_sgr_mouse("64;1;1", "M")[1:3] == ("wheel", 1)
    assert decode_sgr_mouse("65;1;1", "M")[1:3] == ("wheel", -1)
    assert decode_sgr_mouse("garbage", "M") is None


def test_left_drag_orbits():
    icam = default_camera(64, 64)
    yaw0, pitch0 = icam.yaw, icam.pitch
    m = MouseOrbit()
    assert not m.apply(("MOUSE", "press", 0, False, 10, 10), icam)
    assert m.apply(("MOUSE", "drag", 0, False, 14, 12), icam)
    assert icam.yaw != yaw0 and icam.pitch != pitch0
    assert not m.apply(("MOUSE", "release", 0, False, 14, 12), icam)
    assert m.last is None


def test_right_drag_and_wheel_zoom():
    icam = default_camera(64, 64)
    r0 = icam.radius
    m = MouseOrbit()
    m.apply(("MOUSE", "press", 2, False, 5, 5), icam)
    assert m.apply(("MOUSE", "drag", 2, False, 5, 9), icam)
    assert icam.radius > r0
    r1 = icam.radius
    assert m.apply(("MOUSE", "wheel", 1, False, 5, 9), icam)
    assert icam.radius < r1


def test_shift_drag_rotates_envmap():
    icam = default_camera(64, 64)
    e0 = icam.env_map_rotation
    yaw0 = icam.yaw
    m = MouseOrbit()
    m.apply(("MOUSE", "press", 0, True, 20, 20), icam)
    assert m.apply(("MOUSE", "drag", 0, True, 30, 20), icam)
    assert icam.env_map_rotation != e0
    assert icam.yaw == yaw0          # shift-drag must NOT orbit
