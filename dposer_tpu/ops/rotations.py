"""Rotation representation conversions in pure JAX.

Capability parity with the reference's ``lib/utils/transforms.py:197-261``
(rot6d <-> axis-angle <-> rotation matrix), re-derived from first principles
for XLA: closed-form Rodrigues, Gram-Schmidt rot6d decoding, and a
quaternion-based matrix->axis-angle path that is total (no NaNs) so it can sit
inside jitted/differentiated code.

Layout conventions (these define on-disk data compatibility and must match the
reference exactly):

- ``rot6d`` is the *row-interleaved* flattening of the first two columns of
  the rotation matrix: ``[r00, r01, r10, r11, r20, r21]`` — i.e.
  ``R[:3, :2].reshape(6)`` in row-major order (ref ``transforms.py:251-253``).
- Decoding views rot6d as ``(3, 2)``; column 0/1 are the two Gram-Schmidt
  input vectors (ref ``transforms.py:210-218``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _last_dims(x: jnp.ndarray, shape) -> jnp.ndarray:
    return x.reshape(x.shape[:-1] + shape)


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula. ``aa``: [..., 3] -> [..., 3, 3].

    Total at theta=0 (returns identity, correct gradients) via a safe-angle
    construction: sin(t)/t and (1-cos t)/t^2 are evaluated with Taylor-safe
    switching.
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)  # [..., 1]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    # sin(t)/t, (1-cos t)/t^2 with series fallback near 0
    sin_over = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cos_term = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))

    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)  # [..., 3, 3]
    # K^2 = w w^T - |w|^2 I, computed elementwise (VPU) — exact, no matmul
    outer = aa[..., :, None] * aa[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    K2 = outer - theta2[..., None] * eye
    return eye + sin_over[..., None] * K + cos_term[..., None] * K2


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w, x, y, z).

    Shepperd's method: pick the numerically largest of the four candidate
    square roots via branchless ``where`` selection.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    # Four candidate quaternions, each stable in a different region.
    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)

    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)

    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)

    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)

    # Pick by largest diagonal-based discriminant.
    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cands = jnp.stack([c0, c1, c2, c3], axis=-1)
    idx = jnp.argmax(cands, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # Canonical sign: w >= 0
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w,x,y,z) -> axis-angle [..., 3]."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    half = jnp.arctan2(sin_half, w)
    # theta / sin(theta/2); series for small angles: 2 + theta^2/12 ...
    small = sin_half < 1e-6
    scale = jnp.where(small, 2.0 + 2.0 * (half ** 2) / 6.0, 2.0 * half / jnp.maximum(sin_half, _EPS))
    return xyz * scale[..., None]


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(R))


def rot6d_to_matrix(rot6d: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] via Gram-Schmidt (ref ``transforms.py:227-235``)."""
    m = _last_dims(rot6d, (3, 2))
    a1 = m[..., 0]
    a2 = m[..., 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def matrix_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6]: first two columns, row-major interleave."""
    return R[..., :3, :2].reshape(R.shape[:-2] + (6,))


def axis_angle_to_rot6d(aa: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 6] (ref ``transforms.py:238-255``)."""
    return matrix_to_rot6d(axis_angle_to_matrix(aa))


def rot6d_to_axis_angle(rot6d: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3] (ref ``transforms.py:197-224``, sans NaNs)."""
    return matrix_to_axis_angle(rot6d_to_matrix(rot6d))


# ---------------------------------------------------------------------------
# Camera math (ref transforms.py:172-194)
# ---------------------------------------------------------------------------

def cam_crop2full(crop_cam: jnp.ndarray, center: jnp.ndarray, scale: jnp.ndarray,
                  full_img_shape: jnp.ndarray, focal_length: jnp.ndarray) -> jnp.ndarray:
    """Weak-perspective crop camera (s, tx, ty) -> full-image translation.

    Mirrors ref ``transforms.py:172-190``.
    """
    img_h, img_w = full_img_shape[:, 0], full_img_shape[:, 1]
    cx, cy, b = center[:, 0], center[:, 1], scale * 200.0
    w_2, h_2 = img_w / 2.0, img_h / 2.0
    bs = b * crop_cam[:, 0] + 1e-9
    tz = 2.0 * focal_length / bs
    tx = (2.0 * (cx - w_2) / bs) + crop_cam[:, 1]
    ty = (2.0 * (cy - h_2) / bs) + crop_cam[:, 2]
    return jnp.stack([tx, ty, tz], axis=-1)


def estimate_focal_length(img_h, img_w):
    """fov ~55 deg heuristic (ref ``transforms.py:193-194``)."""
    return (img_w * img_w + img_h * img_h) ** 0.5


# ---------------------------------------------------------------------------
# Camera-frame transforms (ref transforms.py:9-46, 136-169)
# ---------------------------------------------------------------------------

def world_to_camera_frame(P, R, T):
    """[N,3] world points -> camera frame; R [3,3], T [3,1]."""
    return ((R @ (P.T - T)).T)


def camera_to_world_frame(P, R, T):
    return (R.T @ P.T + T).T


def cam2pixel(cam_coord, f, c):
    """[N,3] camera coords -> pixel coords (x, y, depth)."""
    x = cam_coord[:, 0] / cam_coord[:, 2] * f[0] + c[0]
    y = cam_coord[:, 1] / cam_coord[:, 2] * f[1] + c[1]
    return jnp.stack((x, y, cam_coord[:, 2]), 1)


def pixel2cam(pixel_coord, f, c):
    x = (pixel_coord[:, 0] - c[0]) / f[0] * pixel_coord[:, 2]
    y = (pixel_coord[:, 1] - c[1]) / f[1] * pixel_coord[:, 2]
    return jnp.stack((x, y, pixel_coord[:, 2]), 1)


def rotate_points(points, rotation_matrix):
    return points @ rotation_matrix.T


def get_rotation_matrix_x(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def get_rotation_matrix_y(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


# ---------------------------------------------------------------------------
# Procrustes / rigid alignment (host-side eval helpers; numpy-compatible jnp)
# ---------------------------------------------------------------------------

def procrustes(A, B, scaling: bool = True):
    """MATLAB-style procrustes (ref transforms.py:48-133): find the similarity
    transform of B minimizing ||A - (s B R + t)||^2.

    Returns (d, Z, tform) with Z the transformed B and d the normalized
    residual. jnp implementation of the 'best'-reflection branch.
    """
    A = jnp.asarray(A, jnp.float64) if jax.config.jax_enable_x64 else jnp.asarray(A)
    B = jnp.asarray(B, A.dtype)
    mu_A, mu_B = A.mean(0), B.mean(0)
    A0, B0 = A - mu_A, B - mu_B
    ssA = (A0 ** 2).sum()
    ssB = (B0 ** 2).sum()
    normA, normB = jnp.sqrt(ssA), jnp.sqrt(ssB)
    A0, B0 = A0 / normA, B0 / normB
    U, s, Vt = jnp.linalg.svd(A0.T @ B0)
    V = Vt.T
    R = V @ U.T
    trace = s.sum()
    if scaling:
        scale = trace * normA / normB
        d = 1 - trace ** 2
        Z = normA * trace * (B0 @ R) + mu_A
    else:
        scale = 1.0
        d = 1 + ssB / ssA - 2 * trace * normB / normA
        Z = normB * (B0 @ R) + mu_A
    translation = mu_A - scale * (mu_B @ R)
    return d, Z, {"rotation": R, "scale": scale, "translation": translation}


def align_to_gt(pose, pose_gt):
    """Align a pose to GT with procrustes (ref transforms.py:150-155)."""
    return procrustes(pose_gt, pose)[1]

def rigid_transform_3d(A: jnp.ndarray, B: jnp.ndarray):
    """Least-squares similarity transform A->B (ref ``transforms.py:264-280``)."""
    n = A.shape[0]
    centroid_A = jnp.mean(A, axis=0)
    centroid_B = jnp.mean(B, axis=0)
    H = (A - centroid_A).T @ (B - centroid_B) / n
    U, s, Vt = jnp.linalg.svd(H)
    V = Vt.T
    det = jnp.linalg.det(V @ U.T)
    d = jnp.ones_like(s).at[-1].set(jnp.sign(det))
    R = (V * d[None, :]) @ U.T
    varP = jnp.var(A, axis=0).sum()
    c = jnp.sum(s * d) / varP
    t = -c * (R @ centroid_A) + centroid_B
    return c, R, t


def rigid_align(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Align point set A to B with a similarity transform (PA-MPJPE)."""
    c, R, t = rigid_transform_3d(A, B)
    return (c * (R @ A.T)).T + t
