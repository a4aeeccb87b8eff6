"""Pure-JAX SMPL / SMPL-H / SMPL-X body model.

Re-implements the forward path of the `smplx` package used by the reference's
``BodyModel`` wrapper (ref ``lib/body_model/body_model.py:8-112``) as jitted,
batched, differentiable XLA: shape/expression blendshapes, pose-corrective
blendshapes, joint regression, the kinematic rigid-transform chain, linear
blend skinning, extra vertex keypoints and barycentric face landmarks.

This is the decisive TPU win for the fitting tasks: every loss that
differentiates through the body model (completion/motion-denoising/SMPLify,
ref ``run/*.py``) stays inside one jitted graph instead of re-entering a
Python body-model forward per optimizer step.

Semantics mirrored from smplx (and the reference's kwargs, body_model.py:30-37):
``use_pca=False`` (raw 45-dim hand poses), ``flat_hand_mean=True`` (zero hand
means), ``num_betas=10``, ``num_expression_coeffs=10``.

Joint layout of the returned ``Jtr`` (SMPL-X): 55 LBS joints + 21 extra
vertex keypoints + 51 barycentric face landmarks = 127, matching
``smpl_to_openpose`` (ref lib/body_model/utils.py:110-130).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.rotations import axis_angle_to_matrix
from .vertex_ids import EXTRA_JOINT_NAMES, VERTEX_IDS

_MODEL_JOINTS = {"smpl": 24, "smplh": 52, "smplx": 55}
_BODY_JOINTS = 21  # articulated body joints shared by all variants


@struct.dataclass
class BodyModelParams:
    """Static mesh/model tensors as a pytree (device-resident)."""

    v_template: jnp.ndarray  # [V, 3]
    shapedirs: jnp.ndarray  # [V, 3, n_betas (+n_expr)]
    posedirs: jnp.ndarray  # [(J-1)*9, V*3]
    J_regressor: jnp.ndarray  # [J, V]
    lbs_weights: jnp.ndarray  # [V, J]
    parents: jnp.ndarray  # [J] int32
    faces: jnp.ndarray  # [F, 3] int32
    extra_joint_ids: jnp.ndarray  # [E] int32 (may be empty)
    lmk_faces_idx: jnp.ndarray  # [L] int32 (may be empty)
    lmk_bary_coords: jnp.ndarray  # [L, 3]


def load_body_model_npz(path: str, model_type: str = "smplx", num_betas: int = 10,
                        num_expressions: int = 10,
                        vertex_ids: Optional[Dict[str, int]] = None) -> BodyModelParams:
    """Load a released SMPL-family ``.npz`` (or pickled ``.pkl``) model file."""
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        # canonical SMPL pkls store J_regressor as a scipy sparse matrix;
        # densify BEFORE np.asarray (which would wrap it in a 0-d object
        # array and break the float32 conversion downstream)
        data = {k: (v.toarray() if hasattr(v, "toarray") else np.asarray(v))
                if not isinstance(v, (int, float, str)) else v
                for k, v in data.items()}
    else:
        with np.load(path, allow_pickle=True) as f:
            data = {k: f[k] for k in f.files}

    n_joints = _MODEL_JOINTS[model_type]
    v_template = np.asarray(data["v_template"], np.float32)
    num_verts = v_template.shape[0]

    shapedirs = np.asarray(data["shapedirs"], np.float32)
    # smplx convention: >300 trailing dims means [300 shape | 100 expression]
    if shapedirs.shape[-1] > 300 and model_type == "smplx":
        shape_part = shapedirs[:, :, :num_betas]
        expr_part = shapedirs[:, :, 300:300 + num_expressions]
        shapedirs = np.concatenate([shape_part, expr_part], axis=-1)
    else:
        shapedirs = shapedirs[:, :, :num_betas]

    posedirs = np.asarray(data["posedirs"], np.float32)
    if posedirs.ndim == 3:  # [V, 3, P] -> [P, V*3]
        posedirs = posedirs.reshape(num_verts * 3, -1).T

    J_reg = data["J_regressor"]
    if hasattr(J_reg, "toarray"):  # scipy sparse (npz allow_pickle path)
        J_reg = J_reg.toarray()
    J_regressor = np.asarray(J_reg, np.float32)

    parents = np.asarray(data["kintree_table"])[0].astype(np.int64)
    parents[0] = 0  # root marker is often 2^32-1

    faces = np.asarray(data["f"], np.int32) if "f" in data else np.zeros((0, 3), np.int32)

    vid_table = vertex_ids or VERTEX_IDS.get(model_type, {})
    extra = np.asarray([vid_table[n] for n in EXTRA_JOINT_NAMES], np.int32) \
        if vid_table else np.zeros((0,), np.int32)
    # Static clamp for under-sized (synthetic) templates whose vertex/face
    # count is below the real SMPL-X ids: a JAX gather CLAMPS out-of-range
    # indices in the forward but DROPS their cotangents in the backward
    # (scatter semantics), silently zeroing d(extra keypoints)/d(vertices) —
    # which killed the fitting gradient through OpenPose joints 55..65 on
    # the synthetic fixtures (caught by the cross-framework SMPLify parity
    # run, round 4). Clamping the index table itself keeps the forward
    # bit-identical and restores the backward. No-op on real assets.
    extra = np.minimum(extra, num_verts - 1)

    lmk_faces = np.asarray(data["lmk_faces_idx"], np.int32) if "lmk_faces_idx" in data \
        else np.zeros((0,), np.int32)
    if faces.shape[0]:
        lmk_faces = np.minimum(lmk_faces, faces.shape[0] - 1)
    lmk_bary = np.asarray(data["lmk_bary_coords"], np.float32) if "lmk_bary_coords" in data \
        else np.zeros((0, 3), np.float32)

    return BodyModelParams(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor[:n_joints]),
        lbs_weights=jnp.asarray(np.asarray(data["weights"], np.float32)[:, :n_joints]),
        parents=jnp.asarray(parents[:n_joints], jnp.int32),
        faces=jnp.asarray(faces),
        extra_joint_ids=jnp.asarray(extra),
        lmk_faces_idx=jnp.asarray(lmk_faces),
        lmk_bary_coords=jnp.asarray(lmk_bary),
    )


# ---------------------------------------------------------------------------
# Core LBS
# ---------------------------------------------------------------------------

def blend_shapes(betas: jnp.ndarray, shape_dirs: jnp.ndarray) -> jnp.ndarray:
    """[B, S] x [V, 3, S] -> [B, V, 3]."""
    return jnp.einsum("bs,vcs->bvc", betas, shape_dirs)


def rigid_transform_chain(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                          parents: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics along the kinematic tree.

    rot_mats: [B, J, 3, 3]; joints: [B, J, 3] rest positions.
    Returns (posed_joints [B, J, 3], rel_transforms [B, J, 4, 4]) where
    rel_transforms already subtract the rest-pose joint contribution (the
    standard LBS 'A' matrices).
    """
    B, J = rot_mats.shape[:2]
    parents = np.asarray(parents)
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])

    def make_T(R, t):
        T = jnp.concatenate([R, t[..., None]], axis=-1)  # [..., 3, 4]
        bottom = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), T.shape[:-2] + (1, 4))
        return jnp.concatenate([T, bottom], axis=-2)

    T_local = make_T(rot_mats, rel_joints)  # [B, J, 4, 4]

    # unrolled chain: parent index < child index in SMPL kintrees
    chains = [T_local[:, 0]]
    for j in range(1, J):
        chains.append(chains[parents[j]] @ T_local[:, j])
    T_global = jnp.stack(chains, axis=1)  # [B, J, 4, 4]

    posed_joints = T_global[:, :, :3, 3]
    # A = T_global - pad(T_global @ [j_rest, 0])
    correction = jnp.einsum("bjmn,bjn->bjm", T_global[:, :, :3, :3], joints)
    A = T_global.at[:, :, :3, 3].add(-correction)
    return posed_joints, A


def lbs(betas: jnp.ndarray, pose: jnp.ndarray, model: BodyModelParams,
        pose2rot: bool = True):
    """Linear blend skinning.

    betas: [B, S]; pose: [B, J*3] axis-angle (pose2rot) or [B, J, 3, 3].
    Returns (vertices [B, V, 3], joints [B, J, 3]).
    """
    B = pose.shape[0]
    J = model.J_regressor.shape[0]

    v_shaped = model.v_template[None] + blend_shapes(betas, model.shapedirs)
    j_rest = jnp.einsum("jv,bvc->bjc", model.J_regressor, v_shaped)

    if pose2rot:
        rot_mats = axis_angle_to_matrix(pose.reshape(B, J, 3))
    else:
        rot_mats = pose.reshape(B, J, 3, 3)

    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)  # [B, (J-1)*9]
    pose_offsets = (pose_feature @ model.posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = rigid_transform_chain(rot_mats, j_rest, np.asarray(model.parents))

    T = jnp.einsum("vj,bjmn->bvmn", model.lbs_weights, A)
    verts = jnp.einsum("bvmn,bvn->bvm", T[:, :, :3, :3], v_posed) + T[:, :, :3, 3]
    return verts, posed_joints


def vertices_to_landmarks(vertices: jnp.ndarray, faces: jnp.ndarray,
                          lmk_faces_idx: jnp.ndarray,
                          lmk_bary_coords: jnp.ndarray) -> jnp.ndarray:
    """Barycentric face landmarks. vertices [B,V,3] -> [B, L, 3]."""
    lmk_faces = faces[lmk_faces_idx]  # [L, 3] vertex ids
    lmk_verts = vertices[:, lmk_faces]  # [B, L, 3, 3]
    return jnp.einsum("blvc,lv->blc", lmk_verts, lmk_bary_coords)


# ---------------------------------------------------------------------------
# High-level wrapper with the reference BodyModel API
# ---------------------------------------------------------------------------

class Struct:
    """Attribute bag mirroring smplx.utils.Struct outputs."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)

    def keys(self):
        return self.__dict__.keys()

    def __getitem__(self, k):
        return self.__dict__[k]


class BodyModel:
    """HuMoR-style wrapper (ref ``lib/body_model/body_model.py``) over the
    JAX LBS core. All forwards are jitted and batch-size polymorphic
    (recompiles per new batch shape, cached thereafter)."""

    NUM_HAND_JOINTS = 15

    def __init__(self, bm_path: str, num_betas: int = 10, batch_size: int = 1,
                 num_expressions: int = 10, model_type: str = "smplx",
                 dtype=jnp.float32, vertex_ids: Optional[Dict[str, int]] = None):
        assert model_type in ["smpl", "smplh", "smplx"]
        self.model_type = model_type
        self.num_betas = num_betas
        self.num_expressions = num_expressions if model_type == "smplx" else 0
        self.batch_size = batch_size  # informative only; forwards are polymorphic
        self.model = load_body_model_npz(bm_path, model_type=model_type,
                                         num_betas=num_betas,
                                         num_expressions=num_expressions,
                                         vertex_ids=vertex_ids)
        self.n_joints = self.model.J_regressor.shape[0]
        self.J_regressor = np.asarray(self.model.J_regressor)
        self.J_regressor_idx = {"pelvis": 0, "lwrist": 20, "rwrist": 21, "neck": 12}
        self.faces = np.asarray(self.model.faces)
        self._forward = jax.jit(self._forward_impl)

    # -- core ---------------------------------------------------------------
    def _forward_impl(self, betas, full_pose):
        verts, joints = lbs(betas, full_pose, self.model)
        if self.model.extra_joint_ids.shape[0]:
            extra = verts[:, self.model.extra_joint_ids]
            joints = jnp.concatenate([joints, extra], axis=1)
        if self.model.lmk_faces_idx.shape[0]:
            lmk = vertices_to_landmarks(verts, self.model.faces,
                                        self.model.lmk_faces_idx,
                                        self.model.lmk_bary_coords)
            joints = jnp.concatenate([joints, lmk], axis=1)
        return verts, joints

    def _assemble_pose(self, B, root_orient, pose_body, pose_hand, pose_jaw, pose_eye):
        def z(n):
            return jnp.zeros((B, n), jnp.float32)

        # SMPL's "body" spans 23 joints (includes the two hand roots, so
        # callers zero-pad 63->69 like ref run/demo.py:146-161); SMPL-H/X: 21.
        n_body = 23 if self.model_type == "smpl" else _BODY_JOINTS
        root_orient = z(3) if root_orient is None else root_orient
        pose_body = z(n_body * 3) if pose_body is None else pose_body
        parts = [root_orient, pose_body]
        if self.model_type == "smplx":
            parts.append(z(3) if pose_jaw is None else pose_jaw)
            parts.append(z(6) if pose_eye is None else pose_eye)
        if self.model_type in ("smplh", "smplx"):
            # flat_hand_mean=True: missing hands are zeros (ref body_model.py:36)
            parts.append(z(self.NUM_HAND_JOINTS * 2 * 3) if pose_hand is None else pose_hand)
        return jnp.concatenate(parts, axis=1)

    def __call__(self, root_orient=None, pose_body=None, pose_hand=None,
                 pose_jaw=None, pose_eye=None, betas=None, trans=None,
                 expression=None, return_dict: bool = False, **kwargs):
        """Forward (ref body_model.py:68-112). Any arg may be None."""
        sizes = [a.shape[0] for a in (root_orient, pose_body, pose_hand, betas, trans)
                 if a is not None]
        B = sizes[0] if sizes else self.batch_size

        full_pose = self._assemble_pose(B, root_orient, pose_body, pose_hand,
                                        pose_jaw, pose_eye)
        betas = jnp.zeros((B, self.num_betas), jnp.float32) if betas is None else betas
        if self.model_type == "smplx":
            expression = jnp.zeros((B, self.num_expressions), jnp.float32) \
                if expression is None else expression
            shape_comps = jnp.concatenate([betas, expression], axis=1)
        else:
            shape_comps = betas

        verts, joints = self._forward(shape_comps, full_pose)
        if trans is not None:
            verts = verts + trans[:, None, :]
            joints = joints + trans[:, None, :]

        out = {
            "v": verts,
            "f": self.model.faces,
            "betas": betas,
            "Jtr": joints,
            "body_joints": joints[:, :22],
            "pose_body": full_pose[:, 3:3 + (23 if self.model_type == "smpl" else _BODY_JOINTS) * 3],
            "full_pose": full_pose,
        }
        if self.model_type in ("smplh", "smplx"):
            hand_start = full_pose.shape[1] - self.NUM_HAND_JOINTS * 6
            out["pose_hand"] = full_pose[:, hand_start:]
        if self.model_type == "smplx":
            out["pose_jaw"] = full_pose[:, 66:69]
            out["pose_eye"] = pose_eye
        return out if return_dict else Struct(**out)
