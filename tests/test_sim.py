"""Simulator: environment layout, vectorized lidar vs a brute-force oracle,
trajectory integration and noise plumbing."""

import numpy as np
import jax
import jax.numpy as jnp

from toyslam_tpu.config import SimConfig, NoiseConfig
from toyslam_tpu.ops import se2
from toyslam_tpu.sim import environment, lidar, trajectory, frontend


def test_environment_matches_reference_layout():
    pts, radius = environment.load_environment()
    # 422 obstacle points of radius 0.25 (reference python/environment.py:3-27)
    assert pts.shape == (422, 2)
    assert radius == 0.25
    # outer wall extents: x spans [-30, 89], y spans [0, 60]
    assert pts[:, 0].min() == -30.0 and pts[:, 0].max() == 89.0
    assert pts[:, 1].min() == 0.0 and pts[:, 1].max() == 60.0
    # the three free-standing obstacles are present
    for p in [[10, 10], [10, 25], [22, 28]]:
        assert np.any(np.all(pts == p, axis=1))


def _brute_force_scan(pose, env, radius, fov, ray_count):
    """Independent numpy oracle re-deriving lidar_sensor.py:51-113 semantics."""
    origin = pose[:2]
    theta = pose[2]
    angles = np.linspace(theta - fov / 2, theta + fov / 2, ray_count)
    out = []
    for ang in angles:
        d = np.array([np.cos(ang), np.sin(ang)])
        best_t, best_id = np.inf, -1
        for pid, c in enumerate(env):
            oc = c - origin
            tca = oc @ d
            d2 = oc @ oc - tca * tca
            if d2 > radius * radius:
                continue
            thc = np.sqrt(radius * radius - d2)
            t0, t1 = tca - thc, tca + thc
            if t1 < 0:
                continue
            t = t1 if t0 < 0 else t0
            if t < best_t:
                best_t, best_id = t, pid
        if best_id < 0:
            out.append((0.0, 0.0, -1, False))
        else:
            c = env[best_id]
            bearing = np.arctan2(c[1] - origin[1], c[0] - origin[0]) - theta
            bearing = np.arctan2(np.sin(bearing), np.cos(bearing))
            out.append((best_t, bearing, best_id, True))
    meas = np.array([[r, b] for r, b, _, _ in out])
    ids = np.array([i for _, _, i, _ in out])
    valid = np.array([v for _, _, _, v in out])
    return meas, ids, valid


def test_lidar_matches_brute_force():
    env, radius = environment.load_environment()
    rng = np.random.default_rng(0)
    for _ in range(4):
        pose = np.array(
            [rng.uniform(0, 50), rng.uniform(5, 55), rng.uniform(-np.pi, np.pi)],
            np.float32,
        )
        meas, ids, valid = lidar.scan_pose(
            jnp.asarray(pose), jnp.asarray(env), radius, np.deg2rad(120), 20
        )
        m_ref, i_ref, v_ref = _brute_force_scan(
            pose.astype(np.float64), env.astype(np.float64), radius,
            np.deg2rad(120), 20,
        )
        np.testing.assert_array_equal(np.asarray(valid), v_ref)
        np.testing.assert_array_equal(np.asarray(ids)[v_ref], i_ref[v_ref])
        np.testing.assert_allclose(
            np.asarray(meas)[v_ref], m_ref[v_ref], rtol=1e-4, atol=1e-3
        )


def test_scripted_controls_schedule():
    c = trajectory.scripted_controls(149)
    np.testing.assert_allclose(c[0], [2.0, 0.0, np.deg2rad(3.0)], atol=1e-6)
    np.testing.assert_allclose(c[15], [0.9, 0.0, np.deg2rad(6.0)], atol=1e-6)
    np.testing.assert_allclose(c[25], [0.9, 0.0, np.deg2rad(-6.0)], atol=1e-6)
    np.testing.assert_allclose(c[45], [0.8, 0.0, np.deg2rad(5.0)], atol=1e-6)
    np.testing.assert_allclose(c[100], [0.7, 0.0, np.deg2rad(3.0)], atol=1e-6)


def test_integrate_matches_sequential_compose():
    c = jnp.asarray(trajectory.scripted_controls(20))
    start = jnp.asarray([5.0, 15.0, 0.0])
    traj = trajectory.integrate(start, c)
    p = start
    for k in range(20):
        p = se2.compose(p, c[k])
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(p), atol=1e-4)
    assert traj.shape == (21, 3)


def test_simulation_shapes_and_determinism():
    cfg = SimConfig(robot_steps=30)
    s1 = frontend.simulate(cfg)
    s2 = frontend.simulate(cfg)
    assert s1.poses_gt.shape == (30, 3)
    assert s1.meas.shape[0] == 30
    np.testing.assert_array_equal(np.asarray(s1.meas), np.asarray(s2.meas))
    # a different seed gives different noise
    s3 = frontend.simulate(SimConfig(robot_steps=30, seed=1))
    assert not np.allclose(np.asarray(s1.meas), np.asarray(s3.meas))


def test_noise_scales_honour_variance_quirk():
    honest = NoiseConfig(variance_as_std=False)
    quirky = NoiseConfig(variance_as_std=True)
    assert honest.sample_scales()[1] == 0.5
    assert np.isclose(quirky.sample_scales()[1], 0.25)
