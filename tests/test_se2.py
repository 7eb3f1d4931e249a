import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toyslam_tpu.ops import se2


def rand_poses(key, shape):
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, shape + (2,), minval=-10, maxval=10)
    th = jax.random.uniform(k2, shape + (1,), minval=-np.pi, maxval=np.pi)
    return jnp.concatenate([xy, th], axis=-1)


def test_compose_inverse_roundtrip():
    key = jax.random.PRNGKey(0)
    a = rand_poses(key, (64,))
    ident = se2.compose(a, se2.inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-5)


def test_compose_matches_matrix_product():
    key = jax.random.PRNGKey(1)
    a, b = rand_poses(key, (2, 32))
    via_arrays = se2.to_matrix(se2.compose(a, b))
    via_mats = jnp.einsum("nij,njk->nik", se2.to_matrix(a), se2.to_matrix(b))
    np.testing.assert_allclose(
        np.asarray(via_arrays), np.asarray(via_mats), atol=1e-5
    )


def test_matrix_roundtrip():
    key = jax.random.PRNGKey(2)
    a = rand_poses(key, (32,))
    back = se2.from_matrix(se2.to_matrix(a))
    np.testing.assert_allclose(np.asarray(back), np.asarray(a), atol=1e-5)


def test_transform_point_inverse():
    key = jax.random.PRNGKey(3)
    p = rand_poses(key, (16,))
    pts = jax.random.normal(jax.random.PRNGKey(4), (16, 2)) * 5
    world = se2.transform_point(p, pts)
    back = se2.inv_transform_point(p, world)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_radial_euclidean_roundtrip():
    meas = jnp.array([[2.0, 0.3], [5.0, -1.2], [0.5, 2.9]])
    back = se2.euclidean_to_radial(se2.radial_to_euclidean(meas))
    np.testing.assert_allclose(np.asarray(back), np.asarray(meas), atol=1e-5)


def test_wrap_angle():
    th = jnp.array([0.0, np.pi - 1e-3, -np.pi + 1e-3, 3 * np.pi, -3 * np.pi])
    w = se2.wrap_angle(th)
    assert np.all(np.abs(np.asarray(w)) <= np.pi + 1e-6)
    np.testing.assert_allclose(np.cos(np.asarray(w)), np.cos(np.asarray(th)), atol=1e-5)
    np.testing.assert_allclose(np.sin(np.asarray(w)), np.sin(np.asarray(th)), atol=1e-5)


def test_retract_matches_reference_vertex_update():
    """Reference VertexPose2d.update: additive xy, angle recompose
    (python/optimizer/vertices.py:28-33)."""
    pose = jnp.array([1.0, 2.0, 0.7])
    delta = jnp.array([0.1, -0.2, 0.3])
    out = se2.retract(pose, delta)
    np.testing.assert_allclose(
        np.asarray(out), [1.1, 1.8, 1.0], atol=1e-6
    )
