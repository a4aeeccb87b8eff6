"""Fitting-oriented SMPL-X wrapper with the 49-joint OpenPose remap.

Capability parity with ref ``lib/body_model/smpl.py:49-77`` (CLIFF-style):
output joints are remapped to the 25-OpenPose + 24-GT convention via
``JOINT_MAP``, with the first 25 replaced by the SMPL->SMPLX hack (the
SMPL-X extra keypoints at 55..65). Mean pose/shape initialization buffers
come from ``smpl_mean_params.npz``.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.rotations import rot6d_to_axis_angle
from . import constants
from .smplx_jax import BodyModel, Struct


class SMPLXFit:
    """49-joint SMPL-X for 2D-keypoint fitting."""

    def __init__(self, model_path: str, batch_size: int = 1, num_betas: int = 10,
                 vertex_ids: Optional[dict] = None,
                 mean_params_path: Optional[str] = None):
        self.bm = BodyModel(model_path, num_betas=num_betas, batch_size=batch_size,
                            model_type="smplx", vertex_ids=vertex_ids)
        joints = [constants.JOINT_MAP[name] for name in constants.JOINT_NAMES]
        joints[:25] = constants.SMPLX_OPENPOSE_MAP  # ref smpl.py:54-57
        # Reference-faithful quirk (ref smpl.py fixes ONLY joints[:25]):
        # the 24 ground-truth rows keep SPIN's SMPL+extra-regressor indices,
        # which in the SMPL-X Jtr layout land on finger/eye joints. They are
        # only consumed by camera_fitting_loss's gt fallback when a sample's
        # OpenPose hip+shoulder confidences are ALL zero — same behavior,
        # pinned against the reference in test_vendored_tables.py.
        self.joint_map = np.asarray(joints, np.int64)

        mean = np.load(mean_params_path or constants.SMPL_MEAN_PATH)
        rot6d_poses = jnp.asarray(mean["pose"], jnp.float32)  # [144]
        self.mean_poses = rot6d_to_axis_angle(rot6d_poses.reshape(-1, 6)).reshape(-1)  # [72]
        self.mean_shape = jnp.asarray(mean["shape"], jnp.float32)  # [10]
        self.faces = self.bm.faces

    def __call__(self, betas=None, body_pose=None, global_orient=None,
                 transl=None, pose2rot: bool = True, **kwargs):
        assert pose2rot, "rotation-matrix pose input not used by the fitting stack"
        out = self.bm(root_orient=global_orient, pose_body=body_pose,
                      betas=betas, trans=transl)
        joints = out.Jtr[:, self.joint_map, :]
        return Struct(vertices=out.v, joints=joints, betas=out.betas,
                      global_orient=global_orient, body_pose=body_pose,
                      full_pose=out.full_pose)
