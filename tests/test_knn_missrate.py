"""Window-KNN blind-spot measurement sanity (tools/knn_window_missrate.py).

The full-grid numbers backing the FuserConfig window-radius docs were run
offline (see config/base.py FuserConfig); this pins the tool's semantics on
a reduced grid: the miss rate is monotone non-increasing in window radius
and exactly zero for the full in-threshold ball (13,13,7) by construction.
"""
import importlib.util
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location(
    "knn_window_missrate", ROOT / "tools" / "knn_window_missrate.py")
mr = importlib.util.module_from_spec(spec)
sys.modules["knn_window_missrate"] = mr
spec.loader.exec_module(mr)


def test_missrate_monotone_and_ball_exact(monkeypatch):
    monkeypatch.setattr(mr, "X", 48)
    monkeypatch.setattr(mr, "Y", 48)
    rep = mr.run([0], [(4, 4, 7), (8, 8, 7), (13, 13, 7)])
    r4 = rep["(4,4,7)"]
    r8 = rep["(8,8,7)"]
    rb = rep["(13,13,7)"]
    for d in ("pts2img", "img2pts"):
        assert rb[d]["mean"] == 0.0, (d, rb)
        assert r8[d]["mean"] <= r4[d]["mean"] + 1e-12, (d, r4, r8)
    # the blind spot is real on realistic scenes: the legacy window misses
    # a nonzero fraction somewhere
    assert max(r4[d]["mean"] for d in r4) > 0.0


def test_openoccupancy_radii_pinned():
    """The openoccupancy config's fuser window was sized from measurement
    at its own 128x128x10 @ 0.8 m fuser grid ((8,8,9): 0.13%/0.09% miss,
    see config/configs.py) — pin the knob so a refactor can't silently
    revert it to the flagship default."""
    from coocc_tpu.config import get_config
    f = get_config("coocc_multi_r101_openoccupancy").fuser
    assert (f.window_rx, f.window_ry, f.window_rz) == (8, 8, 9)
    flag = get_config("coocc_multi_r50_256x704").fuser
    assert (flag.window_rx, flag.window_ry, flag.window_rz) == (6, 6, 7)


def test_set_grid_retargets_scene_scales():
    """set_grid converts the meter-scale scene statistics to cells."""
    mr.set_grid(128, 128, 10, 0.8)
    try:
        assert mr.X == 128 and mr.Z == 10 and mr.VOX == 0.8
        assert mr.GROUND_Z == 4  # (-1.7 + 5.0) / 0.8 ~ 4.1
        assert abs(mr._m(8.0) - 10.0) < 1e-9
        s = mr.lidar_scene(__import__("numpy").random.RandomState(0))
        assert s.shape == (128, 128, 10) and s.any()
    finally:
        mr.set_grid(100, 100, 8, 1.0)
        assert mr.GROUND_Z == 3
