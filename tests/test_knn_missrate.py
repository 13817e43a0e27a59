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
