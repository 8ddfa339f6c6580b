"""Viz exports parse back correctly."""

import numpy as np

from dmsa_lidar_slam_tpu.pipeline import viz


def test_ply_points_roundtrip(rng, tmp_path):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "m.ply")
    viz.save_ply_points(path, pts)
    raw = open(path, "rb").read()
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    back = np.frombuffer(raw[header_end:], dtype="<f4").reshape(-1, 3)
    np.testing.assert_allclose(back, pts, atol=0)


def test_trajectory_and_html(rng, tmp_path):
    trj = np.cumsum(rng.normal(size=(20, 3)), axis=0)
    p = str(tmp_path / "t.ply")
    viz.save_trajectory_ply(p, trj)
    assert open(p, "rb").read(3) == b"ply"
    h = str(tmp_path / "v.html")
    viz.export_html_view(h, rng.normal(size=(500, 3)), trj)
    content = open(h).read()
    assert "<canvas" in content and "trj" in content
