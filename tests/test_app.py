"""App layer: trajectories, profiler CSV, CLI end-to-end smoke
(the reference's manual QA switchboard, automated — SURVEY.md §4/§5)."""

import os

import numpy as np
import pytest

from fovtrace.app import trajectory
from fovtrace.app.profiler import StageTimer


def test_trajectories_in_bounds():
    for name in ["fixed", "circle", "lissajous"]:
        g, poses = trajectory.make(name, 64, 128, 10)
        assert len(g) == 10 and poses is None
        for gy, gx in g:
            assert 0 <= gy < 64 and 0 <= gx < 128


def test_trajectory_csv(tmp_path):
    p = tmp_path / "gaze.csv"
    p.write_text("frame,gy,gx\n0,10,20\n1,90,140\n")
    g, poses = trajectory.make(str(p), 64, 128, 4)
    assert g[0] == (10, 20)
    assert g[1] == (63, 127)  # clamped
    assert g[3] == g[1]       # repeated past EOF
    assert poses is None


def test_trajectory_csv_with_pose(tmp_path):
    p = tmp_path / "gaze.csv"
    p.write_text("0,10,20,1,2,3,0,0,0\n")
    g, poses = trajectory.make(str(p), 64, 128, 2)
    assert poses is not None
    np.testing.assert_allclose(poses[0][0], [1.0, 2.0, 3.0])


def test_stage_timer_csv(tmp_path):
    t = StageTimer()
    for f in range(3):
        t.add("gbuffer_ms", 1.0 + f)
        t.add("shade_ms", 2.0)
        t.end_frame(extra={"ray_count": 100.0})
    assert t.means()["gbuffer_ms"] == 2.0
    out = tmp_path / "report.csv"
    t.write_csv(str(out))
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "gbuffer_ms,shade_ms,ray_count"
    assert len(lines) == 4


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    from fovtrace.app import cli

    out_dir = tmp_path / "frames"
    report = tmp_path / "report.csv"
    rc = cli.main([
        "--scene", "box", "--width", "64", "--height", "64",
        "--frames", "3", "--gaze", "circle", "--out", str(out_dir),
        "--report", str(report), "--max-depth", "2",
        "--reconstruction", "pullpush", "--format", "ppm",
    ])
    assert rc == 0
    assert report.exists()
    dumped = list(out_dir.glob("*.ppm"))
    assert dumped, "final frame should be written"
    from fovtrace.scene import image_io

    img = image_io.load_ppm(str(dumped[0]))
    assert img.shape == (64, 64, 3)
    assert img.max() > 0  # not a black frame


@pytest.mark.slow
def test_cli_view_buffers(tmp_path):
    from fovtrace.app import cli

    for view in ["depth", "saliency", "shading"]:
        out_dir = tmp_path / view
        rc = cli.main([
            "--scene", "box", "--width", "32", "--height", "32",
            "--frames", "1", "--view", view, "--out", str(out_dir),
            "--max-depth", "2", "--reconstruction", "none",
            "--format", "npy",
        ])
        assert rc == 0
        assert list(out_dir.glob("*.npy"))
