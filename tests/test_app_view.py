"""CLI application + matplotlib views (headless, Agg backend).

Covers the reference's app/view layer parity (reference
python/slam_main.py, python/view/*.py — SURVEY.md §2.1 P1, P14, P15): the
pipeline runs end-to-end from argv, emits machine-readable metrics, renders
the GT/dead-reckoning/optimized overlay, and persists/reloads snapshots.
"""

import json
import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from toyslam_tpu.app import main as app_main


def test_cli_run_metrics_and_artifacts(tmp_path, capsys):
    plot = str(tmp_path / "plot.png")
    snap = str(tmp_path / "snap.npz")
    rc = app_main([
        "run", "--steps", "40", "--iterations", "10",
        "--save-plot", plot, "--snapshot", snap,
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert metrics["poses"] == 40
    assert metrics["backend"] == "local"
    # optimization beats dead reckoning on the seeded sequence
    assert metrics["ate_rmse"] < metrics["ate_dead_reckoning"]
    assert metrics["chi2_final"] < metrics["chi2_first"]
    assert os.path.getsize(plot) > 1000
    # snapshot reloads into an equivalent graph
    from toyslam_tpu.io.snapshot import load_snapshot

    graph, meta = load_snapshot(snap)
    assert graph.num_poses >= 40
    assert meta["metrics"]["poses"] == 40


@pytest.mark.slow
def test_cli_ba3d(capsys):
    rc = app_main([
        "ba3d", "--poses", "24", "--landmarks", "80", "--obs", "12",
        "--iterations", "15",
    ])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["chi2_final"] < metrics["chi2_first"] * 0.1
    assert metrics["ate_final"] < metrics["ate_initial"]


def test_views_render_live_updates(tmp_path):
    from toyslam_tpu.config import SimConfig
    from toyslam_tpu.sim import frontend
    from toyslam_tpu.view import (
        FootprintView2d, GraphView2d, RobotStateView, View,
    )

    sim = frontend.simulate(SimConfig(robot_steps=25, seed=0))
    view = View(env=sim.env, radius=sim.radius)
    robot = RobotStateView(view, fov=2.0)
    trail = FootprintView2d(view)
    gview = GraphView2d(view)

    for t in (5, 15, 24):
        scan = None
        valid = np.asarray(sim.valid[t])
        if valid.any():
            rb = np.asarray(sim.meas[t])[valid]
            scan = np.stack(
                [rb[:, 0] * np.cos(rb[:, 1]), rb[:, 0] * np.sin(rb[:, 1])],
                axis=-1,
            )
        robot.update(sim.poses_dr[t], scan)
        trail.update(sim.poses_gt[: t + 1])
        gview.update(
            sim.poses_dr[: t + 1], np.zeros((0, 2))
        )
        view.draw()

    out = str(tmp_path / "live.png")
    view.save(out)
    assert os.path.getsize(out) > 1000
    view.close()


def test_render_result_overlay(tmp_path):
    from toyslam_tpu.config import SimConfig
    from toyslam_tpu.sim import frontend
    from toyslam_tpu.view import render_result

    sim = frontend.simulate(SimConfig(robot_steps=20, seed=0))
    path = str(tmp_path / "overlay.png")
    view = render_result(
        sim.env, sim.radius, sim.poses_gt, sim.poses_dr, sim.poses_dr,
        landmarks=np.asarray(sim.lm_global[0])[np.asarray(sim.valid[0])],
        save_path=path,
    )
    assert os.path.getsize(path) > 1000
    view.close()
