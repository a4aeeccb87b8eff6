"""Torch mirror of ``dposer_tpu.body_model.smplx_jax`` for cross-framework
parity harnesses.

The reference's task pipelines (e.g. ``run/motion_denoising.py:63-100``)
differentiate a torch Adam loop through a torch body model; the licensed
``smplx`` package its ``BodyModel`` wraps is absent from this image. This
shim is a drop-in torch replacement implementing the SAME forward math as
this repo's JAX body model (blendshapes, pose correctives, FK chain, LBS,
extra vertex keypoints, barycentric landmarks), so the reference's own
optimizers can run end-to-end on the synthetic model files while the body
model is held fixed between the two frameworks — making the
weights+sampler+optimizer the only variables in a parity run.

Verified against the JAX model in ``tests/test_export.py``
(torch shim forward == ``smplx_jax.BodyModel`` forward to float32 tolerance
on random poses/betas).

NOT a runtime component: parity/benchmark harness only.
"""
import numpy as np
import torch

_BODY_JOINTS = 21


class _Struct:
    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)


def _axis_angle_to_matrix(aa):
    """Torch transcription of ``ops/rotations.py::axis_angle_to_matrix``
    (Taylor-safe Rodrigues, total at theta=0)."""
    eps = 1e-12
    theta2 = (aa * aa).sum(-1, keepdim=True)
    theta = torch.sqrt(torch.clamp(theta2, min=eps))
    small = theta2 < 1e-8
    sin_over = torch.where(small, 1.0 - theta2 / 6.0, torch.sin(theta) / theta)
    cos_term = torch.where(small, 0.5 - theta2 / 24.0,
                           (1.0 - torch.cos(theta)) / torch.clamp(theta2, min=eps))

    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zero = torch.zeros_like(x)
    K = torch.stack([
        torch.stack([zero, -z, y], dim=-1),
        torch.stack([z, zero, -x], dim=-1),
        torch.stack([-y, x, zero], dim=-1),
    ], dim=-2)
    outer = aa[..., :, None] * aa[..., None, :]
    eye = torch.eye(3, dtype=aa.dtype, device=aa.device).expand(K.shape)
    K2 = outer - theta2[..., None] * eye
    return eye + sin_over[..., None] * K + cos_term[..., None] * K2


class TorchBodyModel(torch.nn.Module):
    """Reference-API body model (``lib/body_model/body_model.py:68-112``
    call signature) backed by a torch transcription of this repo's JAX LBS.

    ``pose_body`` is returned verbatim on the output struct so callers can
    keep it a leaf tensor across forwards (the reference's MotionDenoise
    sets ``smpl_init.pose_body.requires_grad = True`` and re-feeds it,
    ref run/motion_denoising.py:216-255).
    """

    NUM_HAND_JOINTS = 15

    def __init__(self, bm_path, num_betas=10, batch_size=1,
                 num_expressions=10, model_type="smplx", vertex_ids=None):
        super().__init__()
        # reuse the repo's loader so both frameworks read identical tensors
        from dposer_tpu.body_model.smplx_jax import load_body_model_npz

        assert model_type in ("smpl", "smplh", "smplx")
        self.model_type = model_type
        self.num_betas = num_betas
        self.num_expressions = num_expressions if model_type == "smplx" else 0
        self.batch_size = batch_size
        m = load_body_model_npz(bm_path, model_type=model_type,
                                num_betas=num_betas,
                                num_expressions=num_expressions,
                                vertex_ids=vertex_ids)

        def t(x, dtype=torch.float32):
            return torch.from_numpy(np.array(x)).to(dtype)

        self.register_buffer("v_template", t(m.v_template))
        self.register_buffer("shapedirs", t(m.shapedirs))
        self.register_buffer("posedirs", t(m.posedirs))
        self.register_buffer("J_regressor", t(m.J_regressor))
        self.register_buffer("lbs_weights", t(m.lbs_weights))
        self.register_buffer("faces", t(m.faces, torch.long))
        # JAX clamps out-of-range gather indices; mirror that so the shim is
        # the same function on under-sized synthetic models (real SMPL-X
        # vertex ids vs the synthetic template's vertex/face count)
        n_verts = self.v_template.shape[0]
        n_faces = max(int(np.asarray(m.faces).shape[0]), 1)
        self.register_buffer("extra_joint_ids",
                             t(m.extra_joint_ids, torch.long).clamp(max=n_verts - 1))
        self.register_buffer("lmk_faces_idx",
                             t(m.lmk_faces_idx, torch.long).clamp(max=n_faces - 1))
        self.register_buffer("lmk_bary_coords", t(m.lmk_bary_coords))
        self.parents = np.array(m.parents)
        self.register_buffer("parents_t", torch.from_numpy(self.parents.astype(np.int64)))
        self.n_joints = self.J_regressor.shape[0]
        self.f = self.faces

    def _lbs(self, betas, full_pose):
        B = full_pose.shape[0]
        J = self.n_joints
        v_shaped = self.v_template[None] + torch.einsum(
            "bs,vcs->bvc", betas, self.shapedirs)
        j_rest = torch.einsum("jv,bvc->bjc", self.J_regressor, v_shaped)

        rot_mats = _axis_angle_to_matrix(full_pose.reshape(B, J, 3))
        eye = torch.eye(3, dtype=rot_mats.dtype, device=rot_mats.device)
        pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)
        pose_offsets = (pose_feature @ self.posedirs).reshape(B, -1, 3)
        v_posed = v_shaped + pose_offsets

        # FK chain (parents[j] < j in SMPL kintrees)
        rel_joints = j_rest.clone()
        rel_joints[:, 1:] = j_rest[:, 1:] - j_rest[:, self.parents_t[1:]]
        T_local = torch.zeros(B, J, 4, 4, dtype=rot_mats.dtype,
                              device=rot_mats.device)
        T_local[:, :, :3, :3] = rot_mats
        T_local[:, :, :3, 3] = rel_joints
        T_local[:, :, 3, 3] = 1.0
        chains = [T_local[:, 0]]
        for j in range(1, J):
            chains.append(chains[self.parents[j]] @ T_local[:, j])
        T_global = torch.stack(chains, dim=1)

        posed_joints = T_global[:, :, :3, 3]
        correction = torch.einsum("bjmn,bjn->bjm", T_global[:, :, :3, :3], j_rest)
        A = T_global.clone()
        A[:, :, :3, 3] = A[:, :, :3, 3] - correction

        T = torch.einsum("vj,bjmn->bvmn", self.lbs_weights, A)
        verts = torch.einsum("bvmn,bvn->bvm", T[:, :, :3, :3], v_posed) \
            + T[:, :, :3, 3]
        return verts, posed_joints

    def _assemble_pose(self, B, root_orient, pose_body, pose_hand,
                       pose_jaw, pose_eye, ref):
        def z(n):
            return torch.zeros(B, n, dtype=ref.dtype, device=ref.device)

        n_body = 23 if self.model_type == "smpl" else _BODY_JOINTS
        parts = [z(3) if root_orient is None else root_orient,
                 z(n_body * 3) if pose_body is None else pose_body]
        if self.model_type == "smplx":
            parts.append(z(3) if pose_jaw is None else pose_jaw)
            parts.append(z(6) if pose_eye is None else pose_eye)
        if self.model_type in ("smplh", "smplx"):
            parts.append(z(self.NUM_HAND_JOINTS * 2 * 3)
                         if pose_hand is None else pose_hand)
        return torch.cat(parts, dim=1)

    def forward(self, root_orient=None, pose_body=None, pose_hand=None,
                pose_jaw=None, pose_eye=None, betas=None, trans=None,
                expression=None, return_dict=False, **kwargs):
        sizes = [a.shape[0] for a in (root_orient, pose_body, pose_hand,
                                      betas, trans) if a is not None]
        B = sizes[0] if sizes else self.batch_size
        ref = next(a for a in (pose_body, root_orient, betas, trans,
                               self.v_template) if a is not None)

        full_pose = self._assemble_pose(B, root_orient, pose_body, pose_hand,
                                        pose_jaw, pose_eye, ref)
        if betas is None:
            betas = torch.zeros(B, self.num_betas, dtype=ref.dtype,
                                device=ref.device)
        if self.model_type == "smplx":
            if expression is None:
                expression = torch.zeros(B, self.num_expressions,
                                         dtype=ref.dtype, device=ref.device)
            shape_comps = torch.cat([betas, expression], dim=1)
        else:
            shape_comps = betas

        verts, joints = self._lbs(shape_comps, full_pose)
        if self.extra_joint_ids.numel():
            joints = torch.cat([joints, verts[:, self.extra_joint_ids]], dim=1)
        if self.lmk_faces_idx.numel():
            lmk_faces = self.faces[self.lmk_faces_idx]  # [L, 3]
            lmk_verts = verts[:, lmk_faces]  # [B, L, 3, 3]
            lmk = torch.einsum("blvc,lv->blc", lmk_verts, self.lmk_bary_coords)
            joints = torch.cat([joints, lmk], dim=1)
        if trans is not None:
            verts = verts + trans[:, None, :]
            joints = joints + trans[:, None, :]

        out = {
            "v": verts,
            "f": self.faces,
            "betas": betas,
            "Jtr": joints,
            "body_joints": joints[:, :22],
            # verbatim input so it can stay an autograd leaf across forwards
            "pose_body": pose_body if pose_body is not None
            else full_pose[:, 3:3 + (23 if self.model_type == "smpl"
                                     else _BODY_JOINTS) * 3],
            "full_pose": full_pose,
        }
        if self.model_type in ("smplh", "smplx"):
            out["pose_hand"] = full_pose[:, -self.NUM_HAND_JOINTS * 6:]
        if self.model_type == "smplx":
            out["pose_jaw"] = full_pose[:, 66:69]
            out["pose_eye"] = pose_eye
        return out if return_dict else _Struct(**out)


class TorchSMPLXFit(torch.nn.Module):
    """Torch mirror of ``dposer_tpu.body_model.smplx_fit.SMPLXFit`` — the
    CLIFF-style 49-joint fitting wrapper the reference's SMPLify drives
    (ref ``lib/body_model/smpl.py:49-77``): SMPL-X forward + OpenPose
    joint remap, ``forward(betas, body_pose, global_orient, transl)``
    returning ``.joints`` [B, 49, 3] and ``.vertices``."""

    def __init__(self, model_path, batch_size=1, num_betas=10,
                 vertex_ids=None):
        super().__init__()
        from dposer_tpu.body_model import constants

        self.bm = TorchBodyModel(model_path, num_betas=num_betas,
                                 batch_size=batch_size, model_type="smplx",
                                 vertex_ids=vertex_ids)
        joints = [constants.JOINT_MAP[name] for name in constants.JOINT_NAMES]
        joints[:25] = constants.SMPLX_OPENPOSE_MAP
        self.register_buffer(
            "joint_map",
            torch.as_tensor(joints, dtype=torch.long).clamp(
                max=self.bm.J_regressor.shape[0]
                + self.bm.extra_joint_ids.numel()
                + self.bm.lmk_faces_idx.numel() - 1))
        self.faces = self.bm.faces

    def forward(self, betas=None, body_pose=None, global_orient=None,
                transl=None, pose2rot=True, **kwargs):
        assert pose2rot, "rotation-matrix pose input not used by the fitting stack"
        out = self.bm(root_orient=global_orient, pose_body=body_pose,
                      betas=betas, trans=transl)
        return _Struct(vertices=out.v, joints=out.Jtr[:, self.joint_map],
                       betas=out.betas, global_orient=global_orient,
                       body_pose=body_pose, full_pose=out.full_pose)
