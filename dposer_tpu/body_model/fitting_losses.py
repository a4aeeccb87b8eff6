"""2D-keypoint fitting losses in JAX (ref ``lib/body_model/fitting_losses.py``).

All functions are jit/grad-compatible so SMPLify stages run as fused
optimizer scans on device.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import constants


def perspective_projection(points: jnp.ndarray, rotation: jnp.ndarray,
                           translation: jnp.ndarray, focal_length,
                           camera_center: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection (ref fitting_losses.py:6-38).

    points [B, N, 3], rotation [B, 3, 3], translation [B, 3],
    focal_length [B] or scalar, camera_center [B, 2] -> [B, N, 2].

    Reference-faithful quirk: ``translation`` is accepted but NOT applied —
    the reference's function body never adds it (unlike SPIN's original),
    because every caller in the fitting stack already passes the camera
    translation into the body model (``transl=camera_translation``, ref
    run/smplify.py:209-213, run/demo_fit.py:98-113), so points arrive in
    the camera frame. Rounds 1-3 of this port added the translation here
    as well, applying it twice; the cross-framework SMPLify parity run
    exposed the divergence (stage-1 camera landed 0.64 m apart).
    """
    del translation  # pre-applied by the body model's transl (see docstring)
    batch = points.shape[0]
    K = jnp.zeros((batch, 3, 3))
    fl = jnp.broadcast_to(jnp.asarray(focal_length, jnp.float32), (batch,))
    K = K.at[:, 0, 0].set(fl).at[:, 1, 1].set(fl).at[:, 2, 2].set(1.0)
    K = K.at[:, :2, 2].set(camera_center)

    points = jnp.einsum("bij,bkj->bki", rotation, points)
    projected = points / points[:, :, -1:]
    projected = jnp.einsum("bij,bkj->bki", K, projected)
    return projected[:, :, :-1]


def gmof(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman-McClure robustifier (ref :41-47)."""
    x2 = x ** 2
    s2 = sigma ** 2
    return (s2 * x2) / (s2 + x2)


def angle_prior(pose: jnp.ndarray) -> jnp.ndarray:
    """Unnatural knee/elbow bending penalty (ref :50-56). pose: [B, 69+]."""
    idx = jnp.asarray([55 - 3, 58 - 3, 12 - 3, 15 - 3])
    signs = jnp.asarray([1.0, -1.0, -1.0, -1.0])
    return jnp.exp(pose[:, idx] * signs) ** 2


def body_fitting_loss(body_pose, betas, model_joints, camera_t, camera_center,
                      joints_2d, joints_conf, pose_prior_loss,
                      focal_length=5000.0, sigma=100.0, pose_prior_weight=4.78,
                      shape_prior_weight=5.0, angle_prior_weight=15.2,
                      output="mean"):
    """Weighted fitting loss (ref :59-103).

    ``pose_prior_loss``: precomputed scalar/[B] DPoser prior value (the
    reference calls ``pose_prior(body_pose, betas, quan_t)`` here; JAX-side
    the caller evaluates it in the same graph and passes the value).
    """
    batch = body_pose.shape[0]
    rotation = jnp.broadcast_to(jnp.eye(3), (batch, 3, 3))
    projected = perspective_projection(model_joints, rotation, camera_t,
                                       focal_length, camera_center)
    reproj = gmof(projected - joints_2d, sigma).sum(-1)
    reproj_loss = (joints_conf ** 2) * reproj

    prior = (pose_prior_weight ** 2) * pose_prior_loss if pose_prior_loss is not None else 0.0
    angle = (angle_prior_weight ** 2) * angle_prior(body_pose).sum(-1)
    shape = (shape_prior_weight ** 2) * (betas ** 2).sum(-1)

    total = reproj_loss.sum(-1) + prior + angle + shape
    if output == "sum":
        return total.sum()
    if output == "reprojection":
        return reproj_loss
    return total.mean()


def camera_fitting_loss(model_joints, camera_t, camera_t_est, camera_center,
                        joints_2d, joints_conf, focal_length=5000.0,
                        depth_loss_weight=100.0):
    """Camera-stage loss on hips/shoulders + depth anchor (ref :106-136)."""
    batch = model_joints.shape[0]
    rotation = jnp.broadcast_to(jnp.eye(3), (batch, 3, 3))
    projected = perspective_projection(model_joints, rotation, camera_t,
                                       focal_length, camera_center)

    op_ind = jnp.asarray([constants.JOINT_IDS[j] for j in
                          ["OP RHip", "OP LHip", "OP RShoulder", "OP LShoulder"]])
    gt_ind = jnp.asarray([constants.JOINT_IDS[j] for j in
                          ["Right Hip", "Left Hip", "Right Shoulder", "Left Shoulder"]])
    err_op = (joints_2d[:, op_ind] - projected[:, op_ind]) ** 2
    err_gt = (joints_2d[:, gt_ind] - projected[:, gt_ind]) ** 2

    is_valid = (joints_conf[:, op_ind].min(-1)[:, None, None] > 0).astype(jnp.float32)
    reproj = (is_valid * err_op + (1 - is_valid) * err_gt).sum((1, 2))

    depth = (depth_loss_weight ** 2) * (camera_t[:, 2] - camera_t_est[:, 2]) ** 2
    return (reproj + depth).sum()
