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
