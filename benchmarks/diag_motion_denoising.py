"""Diagnose the motion-denoising objective on a fragment: per-iteration
loss-term breakdown (temp / data / dposer, raw and weighted) plus the terms
evaluated AT the ground truth — the round-3 config-3 divergence postmortem
tool (VERDICT r3 Weak #2).

The decisive statistic is ``temp(GT)``: the temporal-smoothness term the
reference's objective (ref ``run/motion_denoising.py:156-162``) assumes is
SMALL on real data. On i.i.d.-frame fragments temp(GT) is of the same order
as the data term's whole dynamic range, so the schedule's growing
``w_temp=10*(1+it)`` against decaying ``w_data=100/(1+it^2)`` collapses all
frames toward one pose instead of denoising.

    python benchmarks/diag_motion_denoising.py \
        --config configs/subvp/amass_scorefc_continuous.py \
        --ckpt-path output/.../best_model --bodymodel-path data/synth_smplx.npz \
        --dataset-folder data/AMASS/amass_synth \
        --file-path data/he_frags/seq0.npz [--iid-from-testset]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags
from absl.flags import argparse_flags
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS
config_flags.DEFINE_config_file("config", None, "model config", lock_config=False)
flags.mark_flags_as_required(["config"])


def parse_args(argv):
    p = argparse_flags.ArgumentParser()
    p.add_argument("--dataset-folder", type=str, default="data/AMASS/amass_synth")
    p.add_argument("--version", type=str, default="version1")
    p.add_argument("--ckpt-path", type=str, required=True)
    p.add_argument("--bodymodel-path", type=str, default="data/synth_smplx.npz")
    p.add_argument("--file-path", type=str, default="data/he_frags/seq0.npz")
    p.add_argument("--noise-std", type=float, default=0.04)
    p.add_argument("--time-strategy", type=str, default="3")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--iid-from-testset", action="store_true",
                   help="ALSO diagnose an i.i.d.-frame fragment drawn from "
                        "the test split (the round-3 failure mode)")
    return p.parse_args(argv[1:])


def diagnose(tag, gt_poses, args, config, sde, score_fn, normalizer):
    import jax

    from dposer_tpu.body_model.smplx_jax import BodyModel
    from dposer_tpu.tasks import MotionDenoise
    from dposer_tpu.tasks.motion_denoising import noise_schedule_kwargs

    T = len(gt_poses)
    bm = BodyModel(bm_path=args.bodymodel_path, model_type="smplx",
                   batch_size=T, num_betas=10)
    key = jax.random.PRNGKey(args.seed)
    key, k_noise, k_opt = jax.random.split(key, 3)
    joints = bm(pose_body=gt_poses).Jtr[:, :22]
    noisy = joints + args.noise_std * jax.random.normal(k_noise, joints.shape)

    md = MotionDenoise(sde, score_fn, bm, normalizer, dposer_weight=1.0,
                       batch_size=T)
    kwargs = noise_schedule_kwargs(args.noise_std)
    res = md.optimize(k_opt, noisy, gt_poses, time_strategy=args.time_strategy,
                      instrument=True, **kwargs)
    tr = md.last_trace
    spi = kwargs["steps_per_iter"]

    # the objective evaluated AT ground truth (what the schedule assumes)
    import jax.numpy as jnp
    v_gt = bm(pose_body=gt_poses).v
    temp_gt = float(np.mean(np.linalg.norm(
        np.asarray(v_gt[:-1] - v_gt[1:]), axis=-1)))
    data_gt = float(np.mean(np.linalg.norm(
        np.asarray(joints - noisy), axis=-1)))

    print(f"\n=== {tag} (T={T}, noise_std={args.noise_std}) ===")
    print(f"objective at GT:    temp={temp_gt:.4f}  data={data_gt:.4f}  "
          f"(w_temp grows 10->%d, w_data decays 100->%d over the schedule)"
          % (10 * kwargs["iterations"], 100 // (1 + (kwargs["iterations"] - 1) ** 2)))
    print("it |   temp    data   dposer |  w*temp  w*data  w*dposer")
    for it in range(kwargs["iterations"]):
        s = slice(it * spi, (it + 1) * spi)
        print(f"{it:2d} | {tr['temp'][s].mean():7.4f} {tr['data'][s].mean():7.4f} "
              f"{tr['dposer'][s].mean():8.3f} | {tr['w_temp'][s].mean():7.2f} "
              f"{tr['w_data'][s].mean():7.2f} {tr['w_dposer'][s].mean():9.3f}")
    print(f"init_MPJPE {np.mean(res['init_MPJPE']):.4f} cm -> "
          f"MPJPE {np.mean(res['MPJPE']):.4f} cm "
          f"({'DENOISED' if np.mean(res['MPJPE']) < np.mean(res['init_MPJPE']) else 'DIVERGED'})")
    return res


def main(args):
    import jax.numpy as jnp

    from run.common import build_normalizer, load_model_for_inference

    config = FLAGS.config
    _, _, sde, _, score_fn = load_model_for_inference(config, args.ckpt_path,
                                                      sde_N=500)
    normalizer = build_normalizer(config, args.dataset_folder, args.version)

    gt = jnp.asarray(np.load(args.file_path)["pose_body"].astype(np.float32))
    diagnose(f"coherent fragment {os.path.basename(args.file_path)}", gt,
             args, config, sde, score_fn, normalizer)

    if args.iid_from_testset:
        test = np.load(os.path.join(args.dataset_folder, args.version, "test",
                                    "pose_body.npy"))
        gt_iid = jnp.asarray(test[:len(gt)].astype(np.float32))
        diagnose("i.i.d.-frame fragment (round-3 failure mode)", gt_iid,
                 args, config, sde, score_fn, normalizer)


if __name__ == "__main__":
    app.run(main, flags_parser=parse_args)
