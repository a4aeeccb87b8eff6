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
parser.add_argument("--step-size", type=float, default=1e-2,
                    help="Adam step size for SMPLify stage 2 (reference "
                         "default 1e-2, ref run/smplify.py:140). The "
                         "synthetic-GT HD protocol runs at the reference "
                         "default and improves over the mean-pose init "
                         "(see PERFORMANCE.md 'HMR accuracy'); earlier "
                         "rounds tuned this down to 3e-3 to work around "
                         "what turned out to be two fitting-stack bugs "
                         "(doubled camera translation, dead extra-keypoint "
                         "gradients), both fixed in round 4")
parser.add_argument("--cam-step-size", type=float, default=1e-2,
                    help="Adam step size for SMPLify stage 1 (camera "
                         "translation + orient; reference uses one "
                         "step_size for both stages). Adam's travel is "
                         "bounded by step*iters and the camera stage must "
                         "recover ~0.3-0.5 m of translation in num-iters "
                         "steps, so this stays at 1e-2 even when stage 2 "
                         "is tuned")
parser.add_argument("--num-iters", type=int, default=100,
                    help="iterations per SMPLify stage (5 stages; reference "
                         "default 100)")
parser.add_argument("--report-init-baseline", action="store_true",
                    help="also evaluate the UNFITTED init (mean/bend pose at "
                         "the bbox-implied camera translation) through the "
                         "same eval_EHF path and print its PA-/MPJPE, so the "
                         "fit's improvement over its own starting point is "
                         "in the log (beyond-reference; used by the "
                         "synthetic-GT accuracy protocol)")
parser.add_argument("--batch-images", type=int, default=16,
                    help="images fitted per jitted SMPLify program "
                         "(beyond-reference; the reference fits one at a "
                         "time). Measured on v5e: 29.7/15.1/10.8 ms per "
                         "image at 8/16/32 — a single image starves the "
                         "chip. Images in one batch share the per-step "
                         "diffusion time draw; per-image metrics are "
                         "computed individually")


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
    init_eval = {"pa_mpjpe_body": [], "mpjpe_body": []}
    bend_pose = np.load(constants.BEND_POSE_PATH)["pose"]

    # images are fitted --batch-images at a time through ONE jitted SMPLify
    # program (all per-image rows are independent in the fitting loss);
    # engines are cached per (focal, batch) so the EHF loop compiles once
    # rather than per image (ref run/fitting.py:62-130 fits sequentially)
    items = list(zip(img_paths, json_paths, gt_ply_paths))
    priors, fitters = {}, {}

    # multi-chip: the image axis shards over the local mesh (each chip fits
    # its images; the reference has no parallelism here)
    from dposer_tpu import parallel as par

    mesh = par.make_mesh(local=True)
    fit_mesh = mesh if mesh.devices.size > 1 else None
    if fit_mesh is not None:
        print(f"batched images data-parallel over {mesh.devices.size} devices")

    for c0 in range(0, len(items), args.batch_images):
        chunk = items[c0:c0 + args.batch_images]
        B = len(chunk)
        imgs, kpts49, bends, names, plys = [], [], [], [], []
        for img_path, json_path, gt_ply_path in chunk:
            imgs.append(cv2.imread(img_path))
            json_data = json.load(open(json_path))
            kp = np.array(json_data["people"][0]["pose_keypoints_2d"]).reshape(25, 3)
            row = np.zeros((49, 3), np.float32)
            row[:25] = kp
            kpts49.append(row)
            bb = compute_bbox(json_data)
            # bbox row is [id, min_x, min_y, max_x, max_y]: min_y > 400 =
            # subject low in the frame = seated -> bend init (ref fitting.py:71)
            bends.append(bb[0, 2] > 400)
            names.append(os.path.splitext(os.path.basename(img_path))[0])
            plys.append(gt_ply_path)

        # manual EHF bbox per image (ref :72); detection row = [img_idx, bbox]
        det = np.concatenate([np.arange(B, dtype=np.float32)[:, None],
                              np.tile([[400, 100, 1000, 1200]], (B, 1))], axis=1)
        mocap_db = MocapDataset(imgs, det, body_model=smpl.bm)
        batch = mocap_db.batch()
        center = jnp.asarray(batch["center"])
        scale = jnp.asarray(batch["scale"])
        img_h, img_w = jnp.asarray(batch["img_h"]), jnp.asarray(batch["img_w"])
        focal_length = jnp.asarray(batch["focal_length"])
        if not np.allclose(batch["focal_length"], batch["focal_length"][0]):
            raise ValueError("images with different sizes in one batch; "
                             "use --batch-images 1")

        keypoints49 = jnp.asarray(np.stack(kpts49))
        full_img_shape = jnp.stack((img_h, img_w), axis=-1)
        init_cam_t = cam_crop2full(jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]), (B, 1)),
                                   center, scale, full_img_shape, focal_length)
        smpl_poses = np.tile(np.asarray(smpl.mean_poses[: N_POSES * 3])[None], (B, 1))
        for i, bend in enumerate(bends):
            if bend:
                smpl_poses[i] = bend_pose[0, : N_POSES * 3]
        smpl_poses = jnp.asarray(smpl_poses)
        init_betas = jnp.tile(smpl.mean_shape[None], (B, 1))
        camera_center = jnp.stack([img_w, img_h], axis=-1) / 2

        fkey = (round(float(focal_length[0]), 3), B)
        if fkey not in fitters:
            if B not in priors:  # setdefault would rebuild the prior eagerly
                priors[B] = build_dposer_prior(args, batch_size=B)
            fitters[fkey] = SMPLify(smpl, pose_prior=priors[B],
                                    step_size=args.step_size,
                                    cam_step_size=args.cam_step_size,
                                    batch_size=B, num_iters=args.num_iters,
                                    focal_length=fkey[0],
                                    time_strategy=args.time_strategy,
                                    sde_N=args.sde_N, mesh=fit_mesh)
        key, kf = jax.random.split(key)
        results = fitters[fkey](kf, smpl_poses, init_betas, init_cam_t,
                                camera_center, keypoints49)
        np_results = tuple(None if r is None else np.asarray(r) for r in results)

        if args.report_init_baseline:
            init_np = (np.asarray(smpl_poses), np.asarray(init_betas),
                       np.asarray(init_cam_t), None)
            for i in range(B):
                one = tuple(None if r is None else r[i:i + 1] for r in init_np)
                b_eval = mocap_db.eval_EHF(one, plys[i])
                init_eval["pa_mpjpe_body"].extend(b_eval["pa_mpjpe_body"])
                init_eval["mpjpe_body"].extend(b_eval["mpjpe_body"])

        for i in range(B):
            one = tuple(None if r is None else r[i:i + 1] for r in np_results)
            batch_eval = mocap_db.eval_EHF(one, plys[i])
            mocap_db.print_eval_result(batch_eval)
            all_eval["pa_mpjpe_body"].extend(batch_eval["pa_mpjpe_body"])
            all_eval["mpjpe_body"].extend(batch_eval["mpjpe_body"])
            np.savez(os.path.join(args.outdir, f"{names[i]}_fit.npz"),
                     pose=one[0], betas=one[1], cam_t=one[2])

    if args.report_init_baseline:
        print("init (unfitted) baseline on whole dataset:")
        MocapDataset.print_eval_result(init_eval)
    print("results on whole dataset:")
    MocapDataset.print_eval_result(all_eval)


if __name__ == "__main__":
    main(parser.parse_args())
