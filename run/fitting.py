"""EHF-dataset HMR evaluation (ref ``run/fitting.py``): per-image SMPLify
with the DPoser prior, PA-/pelvis-MPJPE against GT .ply scans.

    python -m run.fitting --data-dir <EHF dir> --ckpt-path ... --bodymodel-path ...
"""
import argparse
import json
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--dataset-folder", type=str,
                    default="./data/AMASS/amass_processed")
parser.add_argument("--version", type=str, default="version1")
parser.add_argument("--ckpt-path", type=str,
                    default="./pretrained_models/axis-zscore-400k.pth")
parser.add_argument("--bodymodel-path", type=str,
                    default="../body_models/smplx/SMPLX_NEUTRAL.npz")
parser.add_argument("--config-path", type=str,
                    default="configs.subvp.amass_scorefc_continuous.get_config")
parser.add_argument("--sde-N", type=int, default=500)
parser.add_argument("--time-strategy", type=str, default="3",
                    choices=["1", "2", "3"])
parser.add_argument("--data-dir", type=str, required=True)
parser.add_argument("--outdir", type=str, default="lifting_results/output")
parser.add_argument("--device", type=str, default=None, help="unused")
parser.add_argument("--seed", type=int, default=42)


def main(args):
    import cv2
    import jax
    import jax.numpy as jnp

    from dposer_tpu.body_model import constants
    from dposer_tpu.body_model.smplx_fit import SMPLXFit
    from dposer_tpu.data.mocap import MocapDataset
    from dposer_tpu.data.preprocess import compute_bbox
    from dposer_tpu.ops.rotations import cam_crop2full
    from dposer_tpu.tasks.smplify import SMPLify

    from .smplify import build_dposer_prior

    os.makedirs(args.outdir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    smpl = SMPLXFit(args.bodymodel_path, batch_size=1)
    N_POSES = 22

    img_paths = sorted(glob(f"{args.data_dir}/*_img.jpg") or glob(f"{args.data_dir}/*_img.png"))
    json_paths = sorted(glob(f"{args.data_dir}/*_2Djnt.json"))
    gt_ply_paths = sorted(glob(f"{args.data_dir}/*_align.ply"))
    all_eval = {"pa_mpjpe_body": [], "mpjpe_body": []}
    pose_prior = build_dposer_prior(args, batch_size=1)
    bend_pose = np.load(constants.BEND_POSE_PATH)["pose"]

    for img_path, json_path, gt_ply_path in zip(img_paths, json_paths, gt_ply_paths):
        img_name = os.path.splitext(os.path.basename(img_path))[0]
        orig_img_bgr_all = [cv2.imread(img_path)]
        json_data = json.load(open(json_path))
        keypoints = np.array(json_data["people"][0]["pose_keypoints_2d"]).reshape(25, 3)

        bboxes = compute_bbox(json_data)
        bend_init = bboxes[0, 2] > 400  # wide bbox -> seated (ref fitting.py:71)
        bboxes = np.array([[0, 400, 100, 1000, 1200]])  # manual EHF bbox (ref :72)
        batch_size = 1

        mocap_db = MocapDataset(orig_img_bgr_all, bboxes, body_model=smpl.bm)
        batch = mocap_db.batch()
        center = jnp.asarray(batch["center"])
        scale = jnp.asarray(batch["scale"])
        img_h, img_w = jnp.asarray(batch["img_h"]), jnp.asarray(batch["img_w"])
        focal_length = jnp.asarray(batch["focal_length"])

        kpts = np.zeros((1, 49, 3), np.float32)
        kpts[0, :25] = keypoints
        keypoints49 = jnp.asarray(kpts)

        full_img_shape = jnp.stack((img_h, img_w), axis=-1)
        init_cam_t = cam_crop2full(jnp.asarray([[0.9, 0.0, 0.0]]), center, scale,
                                   full_img_shape, focal_length)
        smpl_poses = jnp.tile(smpl.mean_poses[: N_POSES * 3][None], (batch_size, 1))
        if bend_init:
            smpl_poses = jnp.asarray(bend_pose[:, : N_POSES * 3])
        init_betas = jnp.tile(smpl.mean_shape[None], (batch_size, 1))
        camera_center = jnp.stack([img_w, img_h], axis=-1) / 2

        smplify = SMPLify(smpl, pose_prior=pose_prior, step_size=1e-2,
                          batch_size=batch_size, num_iters=100,
                          focal_length=float(focal_length[0]),
                          time_strategy=args.time_strategy, sde_N=args.sde_N)
        key, kf = jax.random.split(key)
        results = smplify(kf, smpl_poses, init_betas, init_cam_t, camera_center,
                          keypoints49)
        np_results = tuple(None if r is None else np.asarray(r) for r in results)
        batch_eval = mocap_db.eval_EHF(np_results, gt_ply_path)
        mocap_db.print_eval_result(batch_eval)
        all_eval["pa_mpjpe_body"].extend(batch_eval["pa_mpjpe_body"])
        all_eval["mpjpe_body"].extend(batch_eval["mpjpe_body"])

        np.savez(os.path.join(args.outdir, f"{img_name}_fit.npz"),
                 pose=np_results[0], betas=np_results[1], cam_t=np_results[2])

    print("results on whole dataset:")
    MocapDataset.print_eval_result(all_eval)


if __name__ == "__main__":
    main(parser.parse_args())
