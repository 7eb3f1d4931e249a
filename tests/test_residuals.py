"""Jacobian correctness: analytic formulas vs jax autodiff, and reference
quirk documentation (odometry A=-I/B=I approximation)."""

import jax
import jax.numpy as jnp
import numpy as np

from toyslam_tpu.ops import residuals, se2

import oracle


def _random_lm_setup(seed=0, e=16):
    rng = np.random.default_rng(seed)
    poses = jnp.asarray(
        np.stack(
            [
                rng.uniform(-5, 5, e),
                rng.uniform(-5, 5, e),
                rng.uniform(-np.pi, np.pi, e),
            ],
            axis=1,
        ),
        jnp.float32,
    )
    lms = jnp.asarray(rng.uniform(-5, 5, (e, 2)), jnp.float32)
    meas = jnp.asarray(
        np.stack([rng.uniform(0.5, 8, e), rng.uniform(-np.pi, np.pi, e)], 1),
        jnp.float32,
    )
    info = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32) * 3.0, (e, 2, 2))
    idx = jnp.arange(e, dtype=jnp.int32)
    mask = jnp.ones(e, jnp.float32)
    return poses, lms, meas, info, idx, mask


def test_landmark_jacobians_match_autodiff():
    poses, lms, meas, info, idx, mask = _random_lm_setup()
    ev = residuals.eval_landmark_edges(
        poses, lms, idx, idx, meas, info, mask, huber_delta=1.5
    )

    def res_one(pose, lm, m):
        return se2.inv_transform_point(pose, lm) - se2.radial_to_euclidean(m)

    JA_auto = jax.vmap(jax.jacfwd(res_one, argnums=0))(poses, lms, meas)
    JB_auto = jax.vmap(jax.jacfwd(res_one, argnums=1))(poses, lms, meas)
    np.testing.assert_allclose(
        np.asarray(ev.JA), np.asarray(JA_auto), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ev.JB), np.asarray(JB_auto), atol=2e-4
    )


def test_landmark_residual_matches_oracle():
    poses, lms, meas, info, idx, mask = _random_lm_setup(seed=3)
    ev = residuals.eval_landmark_edges(
        poses, lms, idx, idx, meas, info, mask, huber_delta=1.5
    )
    for k in range(poses.shape[0]):
        r, A, B = oracle.lm_residual_jac(
            np.asarray(poses[k], np.float64),
            np.asarray(lms[k], np.float64),
            np.asarray(meas[k], np.float64),
        )
        np.testing.assert_allclose(np.asarray(ev.r[k]), r, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ev.JA[k]), A, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ev.JB[k]), B, atol=1e-4)


def _random_odom_setup(seed=1, e=16):
    rng = np.random.default_rng(seed)
    poses = jnp.asarray(
        np.stack(
            [
                rng.uniform(-5, 5, e + 1),
                rng.uniform(-5, 5, e + 1),
                rng.uniform(-np.pi, np.pi, e + 1),
            ],
            axis=1,
        ),
        jnp.float32,
    )
    meas = jnp.asarray(
        np.stack(
            [
                rng.uniform(-1, 1, e),
                rng.uniform(-1, 1, e),
                rng.uniform(-0.5, 0.5, e),
            ],
            axis=1,
        ),
        jnp.float32,
    )
    info = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 2.0, (e, 3, 3))
    i = jnp.arange(e, dtype=jnp.int32)
    j = i + 1
    mask = jnp.ones(e, jnp.float32)
    return poses, i, j, meas, info, mask


def test_odom_residual_matches_oracle():
    poses, i, j, meas, info, mask = _random_odom_setup()
    ev = residuals.eval_odom_edges(
        poses, i, j, meas, info, mask, huber_delta=1.5
    )
    for k in range(i.shape[0]):
        r = oracle.odom_residual(
            np.asarray(poses[k], np.float64),
            np.asarray(poses[k + 1], np.float64),
            np.asarray(meas[k], np.float64),
        )
        np.testing.assert_allclose(np.asarray(ev.r[k]), r, atol=1e-4)


def test_odom_reference_jacobians_are_identity_approx():
    """The reference uses A=-I, B=I (edges2d.py:75-77)."""
    poses, i, j, meas, info, mask = _random_odom_setup()
    ev = residuals.eval_odom_edges(
        poses, i, j, meas, info, mask, huber_delta=1.5, exact=False
    )
    e = i.shape[0]
    np.testing.assert_allclose(
        np.asarray(ev.JA), np.broadcast_to(-np.eye(3), (e, 3, 3))
    )
    np.testing.assert_allclose(
        np.asarray(ev.JB), np.broadcast_to(np.eye(3), (e, 3, 3))
    )


def test_odom_exact_jacobians_match_autodiff():
    poses, i, j, meas, info, mask = _random_odom_setup(seed=7)
    ev = residuals.eval_odom_edges(
        poses, i, j, meas, info, mask, huber_delta=1.5, exact=True
    )

    def res_one(a, b, m):
        return se2.compose(se2.inverse(m), se2.relative(a, b))

    JA_auto = jax.vmap(jax.jacfwd(res_one, argnums=0))(
        poses[i], poses[j], meas
    )
    np.testing.assert_allclose(
        np.asarray(ev.JA), np.asarray(JA_auto), atol=2e-4
    )


def test_huber_weights():
    chi2 = jnp.array([0.5, 2.25, 9.0])
    err, w = residuals.huber_weights(chi2, 1.5)
    np.testing.assert_allclose(np.asarray(err[0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w[0]), 1.0)
    # boundary chi2 == delta^2 stays inlier
    np.testing.assert_allclose(np.asarray(w[1]), 1.0)
    # outlier: err = 2*sqrt(9)*1.5 - 2.25 = 6.75, w = 1.5/3
    np.testing.assert_allclose(np.asarray(err[2]), 6.75, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w[2]), 0.5, atol=1e-6)
