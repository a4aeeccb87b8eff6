"""Image-crop dataset for HMR + EHF evaluation (ref ``lib/dataset/mocap_dataset.py``)."""
from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..body_model.smplx_jax import BodyModel
from ..ops.metrics import pa_mpjpe
from ..ops.rotations import axis_angle_to_matrix
from .preprocess import load_ply, process_image


def estimate_focal_length(img_h, img_w):
    return (img_w * img_w + img_h * img_h) ** 0.5  # fov ~55 degrees


class MocapDataset:
    """Per-bbox crops of detected persons (ref mocap_dataset.py:18-59)."""

    # EHF fixed camera rotation (axis-angle), ref mocap_dataset.py:25-26
    EHF_CAM_R_AA = np.array([-2.98747896, 0.01172457, -0.05704687])

    def __init__(self, img_bgr_list: List[np.ndarray], detection_list: np.ndarray,
                 body_model_path: str | None = None, body_model: BodyModel | None = None):
        self.img_bgr_list = img_bgr_list
        self.detection_list = detection_list
        self.cam_R = np.asarray(
            axis_angle_to_matrix(jnp.asarray(self.EHF_CAM_R_AA, jnp.float32)))
        if body_model is not None:
            self.smplx = body_model
        elif body_model_path is not None:
            self.smplx = BodyModel(bm_path=body_model_path, num_betas=10,
                                   batch_size=1, model_type="smplx")
        else:
            self.smplx = None

    def __len__(self):
        return len(self.detection_list)

    def __getitem__(self, idx) -> Dict:
        img_idx = int(self.detection_list[idx][0])
        img_bgr = self.img_bgr_list[img_idx]
        img_rgb = img_bgr[:, :, ::-1]
        img_h, img_w, _ = img_rgb.shape
        focal_length = estimate_focal_length(img_h, img_w)

        bbox = self.detection_list[idx][1:5]
        norm_img, center, scale, crop_ul, crop_br, _ = process_image(img_rgb, bbox)
        return {
            "norm_img": norm_img, "center": center, "scale": scale,
            "crop_ul": crop_ul, "crop_br": crop_br,
            "img_h": img_h, "img_w": img_w, "focal_length": focal_length,
        }

    def batch(self) -> Dict:
        """All detections stacked into arrays (replaces the torch DataLoader)."""
        items = [self[i] for i in range(len(self))]
        return {k: np.stack([np.asarray(it[k], np.float32) for it in items])
                for k in items[0]}

    def eval_EHF(self, pred_results, gt_ply_path: str) -> Dict[str, List[float]]:
        """PA-/pelvis-aligned MPJPE vs a GT .ply (ref mocap_dataset.py:61-84)."""
        pose, betas, camera_translation, _ = pred_results
        mesh_gt = load_ply(gt_ply_path)
        mesh_gt = (self.cam_R @ mesh_gt.T).T
        out = self.smplx(betas=jnp.asarray(betas),
                         pose_body=jnp.asarray(pose[:, 3:66]),
                         root_orient=jnp.asarray(pose[:, :3]),
                         trans=jnp.asarray(camera_translation))
        mesh_out = np.asarray(out.v)[0]

        J = self.smplx.J_regressor
        joint_gt = (J @ mesh_gt)[:22]
        joint_out = (J @ mesh_out)[:22]

        pelvis = self.smplx.J_regressor_idx["pelvis"]
        aligned = joint_out - (J @ mesh_out)[pelvis, None, :] + (J @ mesh_gt)[pelvis, None, :]
        return {
            "pa_mpjpe_body": [pa_mpjpe(joint_out, joint_gt)],
            "mpjpe_body": [float(np.sqrt(((aligned - joint_gt) ** 2).sum(1)).mean() * 1000)],
        }

    @staticmethod
    def print_eval_result(eval_result):
        print("PA MPJPE (Body): %.2f mm" % np.mean(eval_result["pa_mpjpe_body"]))
        print("MPJPE (Body): %.2f mm" % np.mean(eval_result["mpjpe_body"]))
