import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.ops import rotations as rot


def random_axis_angle(rng, n=64, max_angle=np.pi * 0.95):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(1e-4, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_axis_angle_matrix_roundtrip(rng):
    aa = random_axis_angle(rng)
    R = rot.axis_angle_to_matrix(jnp.asarray(aa))
    # orthonormality
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (len(aa), 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)
    aa2 = rot.matrix_to_axis_angle(R)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-4)


def test_zero_rotation_is_identity_and_differentiable():
    aa = jnp.zeros((4, 3))
    R = rot.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (4, 1, 1)), atol=1e-6)
    g = jax.grad(lambda a: rot.axis_angle_to_matrix(a).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    # round-trip of zero rotation stays zero (ref NaN-guard behavior, transforms.py:223)
    aa2 = rot.matrix_to_axis_angle(R)
    np.testing.assert_allclose(np.asarray(aa2), 0.0, atol=1e-6)


def test_rot6d_roundtrip(rng):
    aa = random_axis_angle(rng)
    r6 = rot.axis_angle_to_rot6d(jnp.asarray(aa))
    assert r6.shape == (len(aa), 6)
    aa2 = rot.rot6d_to_axis_angle(r6)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-4)


def test_rot6d_layout_is_column_pair_interleaved(rng):
    """rot6d must be R[:3,:2] flattened row-major: [r00,r01,r10,r11,r20,r21]."""
    aa = random_axis_angle(rng, n=8)
    R = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(aa)))
    r6 = np.asarray(rot.axis_angle_to_rot6d(jnp.asarray(aa)))
    np.testing.assert_allclose(r6, R[:, :3, :2].reshape(len(aa), 6), atol=1e-6)


def test_rot6d_gram_schmidt_unnormalized_input(rng):
    """Decoding must tolerate arbitrary (non-orthonormal) 6d input."""
    r6 = rng.normal(size=(32, 6)).astype(np.float32)
    R = rot.rot6d_to_matrix(jnp.asarray(r6))
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (32, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-4)


def test_pi_rotation(rng):
    """Angles near pi exercise the quaternion branch selection."""
    axes = rng.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    aa = (axes * (np.pi - 1e-3)).astype(np.float32)
    R = rot.axis_angle_to_matrix(jnp.asarray(aa))
    aa2 = np.asarray(rot.matrix_to_axis_angle(R))
    # axis-angle is unique up to sign at pi; compare rotation matrices
    R2 = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(aa2)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_rigid_align_exact_recovery(rng):
    A = rng.normal(size=(22, 3)).astype(np.float64)
    angle = rng.normal(size=3) * 0.3
    R = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(angle)))
    B = 1.7 * A @ R.T + np.array([0.1, -2.0, 0.5])
    A2 = np.asarray(rot.rigid_align(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(A2, B, atol=1e-5)


@pytest.mark.parametrize("shape", [(5, 3), (2, 7, 3)])
def test_batched_shapes(rng, shape):
    aa = rng.normal(size=shape).astype(np.float32) * 0.5
    R = rot.axis_angle_to_matrix(jnp.asarray(aa))
    assert R.shape == shape[:-1] + (3, 3)
    r6 = rot.axis_angle_to_rot6d(jnp.asarray(aa))
    assert r6.shape == shape[:-1] + (6,)


def test_camera_frame_roundtrip(rng):
    from dposer_tpu.ops.rotations import (camera_to_world_frame, cam2pixel,
                                          pixel2cam, world_to_camera_frame)

    P = jnp.asarray(rng.normal(size=(12, 3)).astype(np.float32))
    R = rot.axis_angle_to_matrix(jnp.asarray(rng.normal(size=3) * 0.4))
    T = jnp.asarray(rng.normal(size=(3, 1)).astype(np.float32))
    cam = world_to_camera_frame(P, R, T)
    back = camera_to_world_frame(cam, R, T)
    np.testing.assert_allclose(np.asarray(back), np.asarray(P), atol=1e-5)

    pts = jnp.asarray(rng.uniform(1, 5, size=(10, 3)).astype(np.float32))
    f, c = (500.0, 480.0), (320.0, 240.0)
    px = cam2pixel(pts, f, c)
    back = pixel2cam(px, f, c)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), rtol=1e-5)


def test_procrustes_alignment(rng):
    from dposer_tpu.ops.rotations import align_to_gt, procrustes

    A = jnp.asarray(rng.normal(size=(15, 3)))
    R = rot.axis_angle_to_matrix(jnp.asarray(rng.normal(size=3) * 0.5))
    B = 0.7 * A @ R.T + jnp.asarray([1.0, -2.0, 0.3])
    d, Z, tform = procrustes(A, B)
    np.testing.assert_allclose(np.asarray(Z), np.asarray(A), atol=1e-4)
    assert float(d) < 1e-5  # fp32: d = 1 - trace^2 carries ~1e-7 rounding
    aligned = align_to_gt(B, A)  # align pose=B to gt=A ... ref semantics
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(A), atol=1e-4)


def test_rotation_matrix_helpers():
    from dposer_tpu.ops.rotations import get_rotation_matrix_x, get_rotation_matrix_y

    Rx = np.asarray(get_rotation_matrix_x(jnp.pi / 2))
    np.testing.assert_allclose(Rx @ np.array([0, 1, 0]), [0, 0, 1], atol=1e-6)
    Ry = np.asarray(get_rotation_matrix_y(jnp.pi / 2))
    np.testing.assert_allclose(Ry @ np.array([0, 0, 1]), [1, 0, 0], atol=1e-6)
