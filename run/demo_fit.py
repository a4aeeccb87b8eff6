"""Single-image HMR demo (ref ``run/demo_fit.py``): OpenPose keypoints ->
bbox -> crop -> SMPLify(+DPoser prior) fit -> rendered overlay.

    python -m run.demo_fit --img examples/image_00077.jpg \
        --openpose examples/image_00077_keypoints.json --ckpt-path ... \
        --bodymodel-path ...
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--dataset-folder", type=str,
                    default="../data/AMASS/amass_processed")
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
parser.add_argument("--img", type=str, required=True)
parser.add_argument("--openpose", type=str, default=None)
parser.add_argument("--outdir", type=str, default="./output/test_results/hmr")
parser.add_argument("--device", type=str, default=None, help="unused")
parser.add_argument("--seed", type=int, default=42)


def main(args):
    import cv2
    import jax
    import jax.numpy as jnp

    from dposer_tpu.body_model import constants
    from dposer_tpu.body_model.fitting_losses import perspective_projection
    from dposer_tpu.body_model.smplx_fit import SMPLXFit
    from dposer_tpu.body_model.visual import render_mesh
    from dposer_tpu.data.mocap import MocapDataset
    from dposer_tpu.data.preprocess import compute_bbox
    from dposer_tpu.ops.rotations import cam_crop2full
    from dposer_tpu.tasks.smplify import SMPLify

    from .smplify import build_dposer_prior

    os.makedirs(args.outdir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    smpl = SMPLXFit(args.bodymodel_path, batch_size=1)
    N_POSES = 22  # including root orient

    orig_img_bgr_all = [cv2.imread(args.img)]
    json_data = json.load(open(args.openpose))
    keypoints = np.array(json_data["people"][0]["pose_keypoints_2d"]).reshape(25, 3)
    bboxes = compute_bbox(json_data)
    batch_size = len(bboxes)
    assert batch_size == 1, "we only support single person and single image for this demo"

    mocap_db = MocapDataset(orig_img_bgr_all, bboxes, body_model=smpl.bm)
    batch = mocap_db.batch()

    center = jnp.asarray(batch["center"])
    scale = jnp.asarray(batch["scale"])
    img_h = jnp.asarray(batch["img_h"])
    img_w = jnp.asarray(batch["img_w"])
    focal_length = jnp.asarray(batch["focal_length"])

    kpts = np.zeros((1, 49, 3), np.float32)
    kpts[0, :25] = keypoints
    keypoints49 = jnp.asarray(kpts)

    full_img_shape = jnp.stack((img_h, img_w), axis=-1)
    pred_cam_crop = jnp.tile(jnp.asarray([[1.3, 0.0, 0.0]]), (batch_size, 1))
    init_cam_t = cam_crop2full(pred_cam_crop, center, scale, full_img_shape,
                               focal_length)

    smpl_poses = jnp.tile(smpl.mean_poses[: N_POSES * 3][None], (batch_size, 1))
    init_betas = jnp.tile(smpl.mean_shape[None], (batch_size, 1))
    camera_center = jnp.stack([img_w, img_h], axis=-1) / 2

    pred_output = smpl(betas=init_betas, body_pose=smpl_poses[:, 3:],
                       global_orient=smpl_poses[:, :3], transl=init_cam_t)

    # initial reprojection diagnostics (ref demo_fit.py:104-139)
    pred_kp2d = perspective_projection(pred_output.joints,
                                       jnp.broadcast_to(jnp.eye(3), (batch_size, 3, 3)),
                                       init_cam_t, focal_length, camera_center)
    op_ind = np.array([constants.JOINT_IDS[j] for j in
                       ["OP RHip", "OP LHip", "OP RShoulder", "OP LShoulder"]])
    init_reproj = float(((kpts[0, op_ind, :2] - np.asarray(pred_kp2d)[0, op_ind]) ** 2).sum())
    print("initial re-projection loss", init_reproj)

    pose_prior = build_dposer_prior(args, batch_size=batch_size)
    smplify = SMPLify(smpl, pose_prior=pose_prior, step_size=1e-2,
                      batch_size=batch_size, num_iters=100,
                      focal_length=float(focal_length[0]),
                      time_strategy=args.time_strategy, sde_N=args.sde_N)
    key, kf = jax.random.split(key)
    new_pose, new_betas, new_cam_t, new_loss = smplify(
        kf, smpl_poses, init_betas, init_cam_t, camera_center, keypoints49)
    print("after re-projection loss", float(jnp.sum(new_loss)))

    pred_output = smpl(betas=new_betas, body_pose=new_pose[:, 3:],
                       global_orient=new_pose[:, :3], transl=new_cam_t)
    verts = np.asarray(pred_output.vertices)[0]
    h, w = orig_img_bgr_all[0].shape[:2]
    try:
        overlay = render_mesh(orig_img_bgr_all[0].astype(np.float64), verts,
                              smpl.faces,
                              {"focal": (float(focal_length[0]), float(focal_length[0])),
                               "princpt": (w / 2, h / 2)}, view="front")
        cv2.imwrite(os.path.join(args.outdir, "mesh_fit.jpg"), overlay.astype(np.uint8))
        print(f"overlay saved under {args.outdir}")
    except Exception as e:
        print(f"[skip render] {e}")
    np.savez(os.path.join(args.outdir, "fit_result.npz"),
             pose=np.asarray(new_pose), betas=np.asarray(new_betas),
             cam_t=np.asarray(new_cam_t))


if __name__ == "__main__":
    main(parser.parse_args())
