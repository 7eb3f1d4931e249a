"""Live incremental SLAM loop (reference slam_main.py:99-155 parity)."""

import json
import os

import numpy as np
import pytest

from toyslam_tpu.app import main as app_main
from toyslam_tpu.config import OptimizerConfig, SimConfig, SlamConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend
from toyslam_tpu.sim.live import LiveSlam


def test_live_accumulates_frames_and_optimizes():
    cfg = SlamConfig(
        sim=SimConfig(robot_steps=40, seed=0),
        optimizer=OptimizerConfig(iterations=8, solver="schur"),
    )
    live = LiveSlam(cfg)
    frames = 0
    while live.step():
        frames += 1
    assert frames == 39
    assert live.builder.num_poses == 40
    assert live.builder.num_landmarks > 0

    gn = GaussNewton(cfg.optimizer)
    out = live.optimize(lambda g: gn.optimize(g).graph)

    gt = np.asarray(live.traj_gt, np.float32)
    dr = np.asarray(live.traj_dr, np.float32)
    est = np.asarray(out.poses)[: gt.shape[0]]
    ate_dr = frontend.ate_rmse(dr, gt)
    ate = frontend.ate_rmse(est, gt)
    assert ate < ate_dr, (ate, ate_dr)
    # write-back: the builder now holds the optimized trajectory
    np.testing.assert_allclose(
        np.stack(live.builder._poses), est, atol=1e-6
    )


@pytest.mark.slow
def test_live_periodic_reoptimization_improves_running_estimate():
    cfg = SlamConfig(
        sim=SimConfig(robot_steps=60, seed=0),
        optimizer=OptimizerConfig(iterations=6, solver="schur"),
    )
    gn = GaussNewton(cfg.optimizer)
    opt = lambda g: gn.optimize(g).graph  # noqa: E731

    live = LiveSlam(cfg)
    while live.step():
        if live.frame % 20 == 0:
            live.optimize(opt)
    out = live.optimize(opt)

    gt = np.asarray(live.traj_gt, np.float32)
    est = np.asarray(out.poses)[: gt.shape[0]]
    ate = frontend.ate_rmse(est, gt)

    # batch (optimize once at the end) for the same seed
    live2 = LiveSlam(cfg)
    while live2.step():
        pass
    out2 = live2.optimize(opt)
    gt2 = np.asarray(live2.traj_gt, np.float32)
    ate_batch = frontend.ate_rmse(
        np.asarray(out2.poses)[: gt2.shape[0]], gt2
    )
    # same measurement stream -> same GT; both must land well under DR
    ate_dr = frontend.ate_rmse(np.asarray(live2.traj_dr, np.float32), gt2)
    assert ate < ate_dr / 2
    assert ate_batch < ate_dr / 2


@pytest.mark.slow
def test_app_run_live_headless(tmp_path, capsys):
    plot = str(tmp_path / "live.png")
    rc = app_main([
        "run", "--live", "--steps", "30", "--iterations", "5",
        "--optimize-every", "10", "--save-plot", plot,
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert metrics["frames"] == 29
    assert metrics["optimizations"] == 3
    assert metrics["ate_rmse"] < metrics["ate_dead_reckoning"]
    assert os.path.exists(plot)
