"""Evaluation metrics: APD, SI, completion MPJPE/MPVPE, HMR errors.

- APD replaces the reference's O(B^2) Python double loop
  (ref ``lib/utils/metric.py:8-37``) with one batched distance tensor —
  identical value, thousands of times faster at B=500.
- SI (self-intersecting-face percentage) calls the native C++ helper
  (``dposer_tpu/native``) replacing pymeshlab; returns NaNs when the
  extension is unavailable, mirroring the reference's missing-pymeshlab
  behavior (ref metric.py:70-71).
- ``Evaler`` mirrors ref ``lib/dataset/AMASS.py:263-324`` (min-over-
  hypotheses part-wise MPVPE/MPJPE in mm).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..body_model.part_indices import BodyPartIndices, BodySegIndices


@jax.jit
def average_pairwise_distance(joints3d: jnp.ndarray) -> jnp.ndarray:
    """APD over a batch of joint sets [B, J, 3] (ref metric.py:8-37).

    Mean over all ordered pairs (i != j) of the mean per-joint euclidean
    distance between samples.
    """
    b = joints3d.shape[0]
    diff = joints3d[:, None] - joints3d[None, :]  # [B, B, J, 3]
    d = jnp.sqrt(jnp.maximum(jnp.sum(diff ** 2, axis=-1), 1e-24))  # [B, B, J]
    pair = d.mean(-1)
    total = pair.sum() - jnp.trace(pair)
    return total / (b * (b - 1))


def self_intersections_percentage(vertices, faces) -> np.ndarray:
    """% of self-intersecting faces per mesh [B, V, 3] (host-side, C++).

    Returns NaNs if the native extension is unavailable (parity with the
    reference's missing-pymeshlab path).
    """
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int32)
    n_meshes = 1 if vertices.ndim == 2 else len(vertices)
    try:
        from ..native import mesh_si

        return mesh_si.self_intersections_percentage(vertices, faces)
    except Exception:
        return np.full(n_meshes, np.nan)


# ---------------------------------------------------------------------------
# Completion evaluation (ref lib/dataset/AMASS.py:263-324)
# ---------------------------------------------------------------------------

class Evaler:
    """Part-wise MPVPE/MPJPE through a body model.

    ``body_model``: the JAX BodyModel; ``part``: optional body-part name
    restricting which joints/vertices are scored (joint indices are offset
    by +1 to skip the pelvis, ref AMASS.py:269).
    """

    def __init__(self, body_model, part: Optional[str] = None,
                 seg_json_path: Optional[str] = None):
        self.body_model = body_model
        self.part = part
        if part is not None:
            self.joint_idx = np.asarray(getattr(BodyPartIndices, part)) + 1
            try:
                from ..body_model import constants

                path = seg_json_path or os.environ.get("DPOSER_VERT_SEG_PATH")                     or constants.VERT_SEG_PATH
                vert_idx = np.asarray(BodySegIndices.load(path)[part])
                num_verts = body_model.model.v_template.shape[0]
                if vert_idx.max() >= num_verts:
                    # segmentation is for the real SMPL-X mesh; synthetic /
                    # reduced models score all vertices instead
                    self.vert_idx = slice(None)
                else:
                    self.vert_idx = vert_idx
            except (FileNotFoundError, KeyError, AttributeError) as e:
                # only legitimate for synthetic/reduced test models; on a
                # real mesh a silent all-vertices fallback would report a
                # full-mesh MPVPE labeled as part-wise — say so loudly
                import warnings

                warnings.warn(
                    f"part '{part}' vertex segmentation unavailable ({e}); "
                    f"scoring ALL vertices — part-wise MPVPE will actually "
                    f"be full-mesh MPVPE", RuntimeWarning)
                self.vert_idx = slice(None)
        else:
            self.joint_idx = slice(None)
            self.vert_idx = slice(None)

    def _errors(self, outs: jnp.ndarray, gts: jnp.ndarray):
        body_gt = self.body_model(pose_body=gts)
        body_out = self.body_model(pose_body=outs)
        mesh_err = jnp.sqrt(jnp.sum(
            (body_out.v[:, self.vert_idx] - body_gt.v[:, self.vert_idx]) ** 2, -1)
        ).mean(-1) * 1000.0
        joint_err = jnp.sqrt(jnp.sum(
            (body_out.Jtr[:, self.joint_idx] - body_gt.Jtr[:, self.joint_idx]) ** 2, -1)
        ).mean(-1) * 1000.0
        return mesh_err, joint_err

    def eval_bodys(self, outs, gts) -> Dict[str, np.ndarray]:
        """outs/gts: [B, 63] axis-angle body poses -> per-sample mm errors."""
        mesh_err, joint_err = self._errors(jnp.asarray(outs), jnp.asarray(gts))
        return {"mpvpe_all": np.asarray(mesh_err), "mpjpe_body": np.asarray(joint_err)}

    def multi_eval_bodys(self, outs, gts) -> Dict[str, np.ndarray]:
        """outs: [B, hypo, 63] -> min over hypotheses (ref AMASS.py:300-316)."""
        outs = jnp.asarray(outs)
        b, hypo, d = outs.shape
        mesh_err, joint_err = self._errors(outs.reshape(b * hypo, d),
                                           jnp.repeat(jnp.asarray(gts), hypo, axis=0))
        return {
            "mpvpe_all": np.asarray(mesh_err.reshape(b, hypo).min(axis=1)),
            "mpjpe_body": np.asarray(joint_err.reshape(b, hypo).min(axis=1)),
        }

    @staticmethod
    def print_eval_result(eval_result):
        print("MPVPE (All): %.2f mm" % np.mean(eval_result["mpvpe_all"]))
        print("MPJPE (Body): %.2f mm" % np.mean(eval_result["mpjpe_body"]))

    @staticmethod
    def print_multi_eval_result(eval_result, hypo_num):
        print(f"multihypo {hypo_num} MPVPE (All): %.2f mm" % np.mean(eval_result["mpvpe_all"]))
        print(f"multihypo {hypo_num} MPJPE (Body): %.2f mm" % np.mean(eval_result["mpjpe_body"]))


# ---------------------------------------------------------------------------
# HMR evaluation helpers (ref lib/dataset/mocap_dataset.py:61-84)
# ---------------------------------------------------------------------------

def pa_mpjpe(pred: np.ndarray, gt: np.ndarray) -> float:
    """Procrustes-aligned MPJPE (mm) for single [J, 3] sets.

    Host-side numpy in fp64 (matches the reference's numpy procrustes path,
    ref lib/utils/transforms.py:264-286).
    """
    A = np.asarray(pred, np.float64)
    B = np.asarray(gt, np.float64)
    ca, cb = A.mean(0), B.mean(0)
    H = (A - ca).T @ (B - cb) / len(A)
    U, s, Vt = np.linalg.svd(H)
    V = Vt.T
    d = np.ones_like(s)
    d[-1] = np.sign(np.linalg.det(V @ U.T))
    R = (V * d[None, :]) @ U.T
    c = (s * d).sum() / np.var(A, axis=0).sum()
    t = -c * (R @ ca) + cb
    aligned = (c * (R @ A.T)).T + t
    return float(np.sqrt(((aligned - B) ** 2).sum(-1)).mean() * 1000.0)


def pelvis_aligned_mpjpe(pred: np.ndarray, gt: np.ndarray, pelvis_idx: int = 0) -> float:
    """Pelvis-aligned MPJPE (mm)."""
    p = pred - pred[pelvis_idx:pelvis_idx + 1]
    g = gt - gt[pelvis_idx:pelvis_idx + 1]
    return float(np.sqrt(((p - g) ** 2).sum(-1)).mean() * 1000.0)
