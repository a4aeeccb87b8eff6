"""SMPL-X body-part index tables (ref ``lib/body_model/utils.py:11-61``).

Joint indices are derived from the canonical SMPL-X body-joint ordering
(vchoutas/smplx joint_names.py, public); the "pelvis" (global orient) is
excluded so indices are 0..20 over the 21 modelled joints.

Vertex-segment indices (``BodySegIndices``) come from the standard
``smplx_vert_segmentation.json`` asset; pass its path (or rely on the
``DPOSER_VERT_SEG_PATH`` env var) — the file ships with SMPL-X tooling.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List

BODY_JOINT_NAMES = [
    "pelvis",  # actually global_orient; excluded from part indices
    "left_hip", "right_hip", "spine1", "left_knee", "right_knee", "spine2",
    "left_ankle", "right_ankle", "spine3", "left_foot", "right_foot", "neck",
    "left_collar", "right_collar", "head", "left_shoulder", "right_shoulder",
    "left_elbow", "right_elbow", "left_wrist", "right_wrist",
]

_IDX = {name: i - 1 for i, name in enumerate(BODY_JOINT_NAMES)}


class BodyPartIndices:
    """Joint-index sets per body part, used to build completion masks."""

    left_leg = sorted(_IDX[n] for n in ["left_hip", "left_knee", "left_ankle", "left_foot"])
    right_leg = sorted(_IDX[n] for n in ["right_hip", "right_knee", "right_ankle", "right_foot"])
    left_arm = sorted(_IDX[n] for n in ["left_collar", "left_shoulder", "left_elbow", "left_wrist"])
    right_arm = sorted(_IDX[n] for n in ["right_collar", "right_shoulder", "right_elbow", "right_wrist"])
    trunk = sorted(_IDX[n] for n in ["spine1", "spine2", "spine3", "left_shoulder", "right_shoulder"])
    hands = sorted(_IDX[n] for n in ["left_wrist", "right_wrist"])
    legs = sorted(left_leg + right_leg)
    arms = sorted(left_arm + right_arm)

    PARTS = ["left_leg", "right_leg", "left_arm", "right_arm", "trunk", "hands", "legs", "arms"]


_SEG_GROUPS: Dict[str, List[str]] = {
    "left_leg": ["leftLeg", "leftUpLeg", "leftFoot", "leftToeBase"],
    "right_leg": ["rightLeg", "rightUpLeg", "rightFoot", "rightToeBase"],
    "left_arm": ["leftArm", "leftForeArm"],
    "right_arm": ["rightArm", "rightForeArm"],
    "trunk": ["spine1", "spine2", "leftShoulder", "rightShoulder"],
    "hands": ["leftHand", "rightHand"],
}


def smpl_to_openpose(model_type: str = "smplx", use_hands: bool = True,
                     use_face: bool = True, use_face_contour: bool = False,
                     openpose_format: str = "coco25"):
    """Permutation mapping SMPL-family joints to OpenPose order.

    Standard index tables from SMPLify-X tooling (ref
    lib/body_model/utils.py:68-177); data constants of the released models.
    """
    import numpy as np

    if openpose_format.lower() == "coco25":
        if model_type == "smpl":
            return np.array([24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4,
                             7, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34],
                            dtype=np.int32)
        if model_type == "smplh":
            body = np.array([52, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4,
                             7, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62],
                            dtype=np.int32)
            mapping = [body]
            if use_hands:
                mapping += [np.array([20, 34, 35, 36, 63, 22, 23, 24, 64, 25,
                                      26, 27, 65, 31, 32, 33, 66, 28, 29, 30,
                                      67], dtype=np.int32),
                            np.array([21, 49, 50, 51, 68, 37, 38, 39, 69, 40,
                                      41, 42, 70, 46, 47, 48, 71, 43, 44, 45,
                                      72], dtype=np.int32)]
            return np.concatenate(mapping)
        if model_type == "smplx":
            body = np.array([55, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4,
                             7, 56, 57, 58, 59, 60, 61, 62, 63, 64, 65],
                            dtype=np.int32)
            mapping = [body]
            if use_hands:
                mapping += [np.array([20, 37, 38, 39, 66, 25, 26, 27, 67, 28,
                                      29, 30, 68, 34, 35, 36, 69, 31, 32, 33,
                                      70], dtype=np.int32),
                            np.array([21, 52, 53, 54, 71, 40, 41, 42, 72, 43,
                                      44, 45, 73, 49, 50, 51, 74, 46, 47, 48,
                                      75], dtype=np.int32)]
            if use_face:
                mapping += [np.arange(76, 127 + 17 * use_face_contour,
                                      dtype=np.int32)]
            return np.concatenate(mapping)
        raise ValueError(f"Unknown model type: {model_type}")
    if openpose_format == "coco19":
        if model_type == "smpl":
            return np.array([24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4,
                             7, 25, 26, 27, 28], dtype=np.int32)
        if model_type == "smplh":
            body = np.array([52, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4,
                             7, 53, 54, 55, 56], dtype=np.int32)
            mapping = [body]
            if use_hands:
                mapping += [np.array([20, 34, 35, 36, 57, 22, 23, 24, 58, 25,
                                      26, 27, 59, 31, 32, 33, 60, 28, 29, 30,
                                      61], dtype=np.int32),
                            np.array([21, 49, 50, 51, 62, 37, 38, 39, 63, 40,
                                      41, 42, 64, 46, 47, 48, 65, 43, 44, 45,
                                      66], dtype=np.int32)]
            return np.concatenate(mapping)
        if model_type == "smplx":
            body = np.array([55, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4,
                             7, 56, 57, 58, 59], dtype=np.int32)
            mapping = [body]
            if use_hands:
                mapping += [np.array([20, 37, 38, 39, 60, 25, 26, 27, 61, 28,
                                      29, 30, 62, 34, 35, 36, 63, 31, 32, 33,
                                      64], dtype=np.int32),
                            np.array([21, 52, 53, 54, 65, 40, 41, 42, 66, 43,
                                      44, 45, 67, 49, 50, 51, 68, 46, 47, 48,
                                      69], dtype=np.int32)]
            if use_face:
                mapping += [np.arange(70, 70 + 51 + 17 * use_face_contour,
                                      dtype=np.int32)]
            return np.concatenate(mapping)
        raise ValueError(f"Unknown model type: {model_type}")
    raise ValueError(f"Unknown joint format: {openpose_format}")


class BodySegIndices:
    """Vertex-index sets per body part, for part-wise MPVPE.

    Built lazily from a ``smplx_vert_segmentation.json`` file.
    """

    _cache: Dict[str, Dict[str, List[int]]] = {}

    @classmethod
    def load(cls, seg_json_path: str | None = None) -> Dict[str, List[int]]:
        path = seg_json_path or os.environ.get("DPOSER_VERT_SEG_PATH")
        if path is None:
            raise FileNotFoundError(
                "smplx_vert_segmentation.json path required: pass seg_json_path "
                "or set DPOSER_VERT_SEG_PATH")
        path = os.path.abspath(path)
        if path in cls._cache:
            return cls._cache[path]
        seg = json.load(open(path))
        out: Dict[str, List[int]] = {}
        for part, groups in _SEG_GROUPS.items():
            ids = set()
            for g in groups:
                ids.update(seg[g])
            out[part] = sorted(ids)
        out["legs"] = sorted(set(out["left_leg"] + out["right_leg"]))
        out["arms"] = sorted(set(out["left_arm"] + out["right_arm"]))
        cls._cache[path] = out
        return out
