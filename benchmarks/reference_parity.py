"""Trained-model parity: run the REFERENCE's own pipelines on a checkpoint
this framework trained, next to ours, and compare protocol metrics
(VERDICT r3 Missing #1).

Chain: JAX train -> ``utils.checkpoint.save_torch_checkpoint`` (the
release .pth schema) -> the reference's own load protocol (strict
``load_state_dict`` + EMA ``copy_to``, ref run/demo.py:106-118) -> the
reference's own torch samplers and metric code:

- **Generation/APD** (ref run/demo.py:137-161): the reference's
  ``sampling.get_sampling_fn`` (pc, euler_maruyama + langevin, N=1000,
  eps=5e-3) generates 500 poses; its ``Posenormalizer`` denormalizes; its
  ``average_pairwise_distance`` scores. Ours: the same protocol through
  this framework's sampler stack. Joints for BOTH come from the same
  synthetic SMPL body (this repo's JAX body model — the reference's
  ``BodyModel`` needs the licensed ``smplx`` assets, absent here; the body
  model is held fixed so the WEIGHTS+SAMPLER are the only variables).
- **Completion/MPJPE-MPVPE** (ref run/completion.py:95-200,279-321): the
  reference's ``DPoserComp.optimize`` (its own torch Adam loop, time
  strategy '3') completes masked test poses; ours is
  ``tasks.completion.DPoserComp``. Same observations, same masks
  (generated once, shared), metrics via this repo's vmapped ``Evaler``
  (proven equal to the reference's loop in tests/test_metrics.py).

Absent third-party deps that the reference imports but this comparison
never calls (``pymeshlab``, ``torchgeometry``, ``smplx``) are stubbed at
import time; every code path actually executed is the reference's.

    python benchmarks/reference_parity.py \
        --ckpt-path output/.../best_model --n-samples 500 --comp-batch 50
"""
import argparse
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def load_reference_modules():
    """Reference modules as a namespace package, with the unused third-party
    imports stubbed (import-time only; no stubbed symbol is ever called)."""
    _stub("pymeshlab", MeshSet=object, Mesh=object)
    _stub("torchgeometry")
    _stub("smplx", SMPL=object, SMPLH=object, SMPLX=object)
    _stub("smplx.utils", Struct=object)
    sys.modules["smplx"].utils = sys.modules["smplx.utils"]
    if REFERENCE not in sys.path:
        sys.path.append(REFERENCE)
    import lib.algorithms.advanced.model as ref_model  # noqa: E501
    import lib.algorithms.advanced.sampling as ref_sampling
    import lib.algorithms.advanced.sde_lib as ref_sde_lib
    import lib.algorithms.ema as ref_ema
    import lib.dataset.AMASS as ref_amass
    import lib.utils.metric as ref_metric

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_run_completion", os.path.join(REFERENCE, "run/completion.py"))
    ref_completion = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_completion)
    return (ref_model, ref_sampling, ref_sde_lib, ref_ema, ref_amass,
            ref_metric, ref_completion)


def write_torch_stats(torch, src_dir, dst_dir):
    """Reference Posenormalizer wants torch-serialized stats files."""
    import numpy as np

    os.makedirs(dst_dir, exist_ok=True)
    for suffix in ("normalize1", "normalize2"):
        src = os.path.join(src_dir, f"axis_{suffix}.npz")
        data = {k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in np.load(src).items()}
        torch.save(data, os.path.join(dst_dir, f"axis_{suffix}.pt"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-path", type=str, required=True)
    ap.add_argument("--dataset-folder", type=str, default="data/AMASS/amass_synth")
    ap.add_argument("--version", type=str, default="version1")
    ap.add_argument("--smpl-path", type=str, default="data/synth_smpl.npz")
    ap.add_argument("--n-samples", type=int, default=500)
    ap.add_argument("--comp-batch", type=int, default=50)
    ap.add_argument("--comp-hypo", type=int, default=2)
    ap.add_argument("--part", type=str, default="left_leg")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.environ.setdefault("DPOSER_PLATFORM", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from dposer_tpu.body_model.smplx_jax import BodyModel
    from dposer_tpu.data.amass import PoseNormalizer
    from dposer_tpu.diffusion import sampling as our_sampling
    from dposer_tpu.diffusion.score_fn import get_score_fn
    from dposer_tpu.ops.metrics import Evaler, average_pairwise_distance
    from dposer_tpu.tasks.completion import DPoserComp as OurComp
    from dposer_tpu.utils.checkpoint import (load_params_for_inference,
                                             restore_train_state,
                                             save_torch_checkpoint)
    from dposer_tpu.utils.generic import import_configs
    from run.common import build_sde, create_score_model
    from dposer_tpu.data.amass import N_POSES

    (ref_model, ref_sampling, ref_sde_lib, ref_ema, ref_amass, ref_metric,
     ref_completion) = load_reference_modules()

    config = import_configs("configs.subvp.amass_scorefc_continuous.get_config")
    config.sampling.corrector = "langevin"  # metrics protocol, ref demo.py:142
    device = "cpu"
    torch.manual_seed(args.seed)

    # ---- export: JAX train state -> release .pth schema -------------------
    pth = "/tmp/dposer_parity_export.pth"
    state = restore_train_state(args.ckpt_path)
    save_torch_checkpoint(pth, state["params"], ema_params=state.get("ema_params"),
                          step=int(state.get("step", 0)))
    print(f"exported {args.ckpt_path} -> {pth}")

    # ---- the reference's own load protocol (ref demo.py:102-118) ----------
    POSE_DIM = 3
    r_model = ref_model.ScoreModelFC(config, n_poses=N_POSES, pose_dim=POSE_DIM,
                                     hidden_dim=config.model.HIDDEN_DIM,
                                     embed_dim=config.model.EMBED_DIM,
                                     n_blocks=config.model.N_BLOCKS).to(device)
    r_model.eval()
    checkpoint = torch.load(pth, map_location="cpu", weights_only=False)
    ema = ref_ema.ExponentialMovingAverage(r_model.parameters(),
                                           decay=config.model.ema_rate)
    r_model.load_state_dict(checkpoint["model_state_dict"])
    ema.load_state_dict(checkpoint["ema"])
    ema.copy_to(r_model.parameters())

    r_sde = ref_sde_lib.subVPSDE(beta_min=config.model.beta_min,
                                 beta_max=config.model.beta_max,
                                 N=config.model.num_scales)

    stats_pt_dir = "/tmp/dposer_parity_stats"
    write_torch_stats(torch, os.path.join(args.dataset_folder, args.version,
                                          "train"), stats_pt_dir)
    r_norm = ref_amass.Posenormalizer(data_path=stats_pt_dir, device=device,
                                      normalize=config.data.normalize,
                                      min_max=config.data.min_max,
                                      rot_rep=config.data.rot_rep)

    # ---- ours --------------------------------------------------------------
    model = create_score_model(config, n_poses=N_POSES)
    params, _ = load_params_for_inference(args.ckpt_path,
                                          n_blocks=config.model.N_BLOCKS)
    sde = build_sde(config)
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t),
                            continuous=config.training.continuous)
    normalizer = PoseNormalizer(
        os.path.join(args.dataset_folder, args.version, "train"),
        normalize=config.data.normalize, min_max=config.data.min_max,
        rot_rep=config.data.rot_rep)

    D = N_POSES * POSE_DIM
    body = BodyModel(args.smpl_path, model_type="smpl",
                     batch_size=args.n_samples, num_betas=10)

    def smpl_joints22(poses_axis_np):
        padded = jnp.concatenate(
            [jnp.asarray(poses_axis_np), jnp.zeros((len(poses_axis_np), 6))], 1)
        return body(pose_body=padded).Jtr[:, :22, :]

    # ======== generation / APD (ref demo.py:137-161) ========================
    shape = (args.n_samples, D)
    r_sampler = ref_sampling.get_sampling_fn(config, r_sde, shape,
                                             lambda x: x, 5e-3, device=device)
    with torch.no_grad():
        _, r_samples = r_sampler(r_model, observation=None)
    r_axis = r_norm.offline_denormalize(r_samples, to_axis=True).cpu().numpy()

    o_sampler = our_sampling.get_sampling_fn(config, sde, shape, score_fn,
                                             inverse_scaler=None, eps=5e-3)
    _, o_samples = o_sampler(jax.random.PRNGKey(args.seed))
    o_axis = np.asarray(normalizer.offline_denormalize(o_samples, to_axis=True))

    # the reference's own metric implementation scores both sets
    apd_ref = float(ref_metric.average_pairwise_distance(
        torch.from_numpy(np.asarray(smpl_joints22(r_axis)))))
    apd_ours = float(ref_metric.average_pairwise_distance(
        torch.from_numpy(np.asarray(smpl_joints22(o_axis)))))
    apd_ours_ourimpl = float(average_pairwise_distance(smpl_joints22(o_axis)))
    print(f"\n[generation, {args.n_samples} samples, pc/em+langevin N=1000]")
    print(f"APD  reference pipeline (torch, exported ckpt): {apd_ref:.4f}")
    print(f"APD  this framework   (same weights):           {apd_ours:.4f}")
    print(f"     (our APD impl on our samples:              {apd_ours_ourimpl:.4f})")
    print(f"     relative delta: {abs(apd_ref - apd_ours) / apd_ref * 100:.2f}%")

    # pose-space moments — distribution-level agreement, sampler-noise aware
    for name, arr in (("reference", r_axis), ("ours", o_axis)):
        print(f"     {name}: mean-norm {np.linalg.norm(arr.mean(0)):.4f} "
              f"std-norm {np.linalg.norm(arr.std(0)):.4f}")

    # ======== completion (ref completion.py:95-200,279-321) =================
    Bc = args.comp_batch
    test = np.load(os.path.join(args.dataset_folder, args.version, "test",
                                "pose_body.npy"))[:Bc].astype(np.float32)
    gts_axis = torch.from_numpy(test)
    poses_n = r_norm.offline_normalize(gts_axis.to(device), from_axis=True)
    mask_t, obs_t = ref_completion.create_mask(poses_n, part=args.part)

    r_comp = ref_completion.DPoserComp(r_model, r_sde,
                                       config.training.continuous,
                                       batch_size=Bc)
    hypos_ref = []
    for _ in range(args.comp_hypo):
        hypos_ref.append(r_comp.optimize(obs_t, mask_t))
    hypos_ref = torch.stack(hypos_ref, dim=1)
    preds_ref = r_norm.offline_denormalize(hypos_ref, to_axis=True).detach().cpu().numpy()

    our_comp = OurComp(sde, score_fn)
    obs_j = jnp.asarray(obs_t.cpu().numpy())
    mask_j = jnp.asarray(mask_t.cpu().numpy())
    hypos_ours = our_comp.optimize_hypos(jax.random.PRNGKey(args.seed + 1),
                                         obs_j, mask_j, args.comp_hypo)
    preds_ours = np.asarray(normalizer.offline_denormalize(hypos_ours,
                                                           to_axis=True))

    body_c = BodyModel(args.smpl_path.replace("synth_smpl.npz",
                                              "synth_smplx.npz"),
                       model_type="smplx", batch_size=Bc, num_betas=10)
    evaler = Evaler(body_model=body_c, part=args.part)
    res_ref = evaler.multi_eval_bodys(jnp.asarray(preds_ref),
                                      jnp.asarray(test))
    res_ours = evaler.multi_eval_bodys(jnp.asarray(preds_ours),
                                       jnp.asarray(test))
    print(f"\n[completion, {Bc} poses, part={args.part}, hypo={args.comp_hypo}, "
          f"same masks/observations]")
    for k in ("mpvpe_all", "mpjpe_body"):
        a, b = float(np.mean(res_ref[k])), float(np.mean(res_ours[k]))
        print(f"{k}  reference pipeline: {a:.2f} mm   ours: {b:.2f} mm   "
              f"delta {abs(a - b) / a * 100:.2f}%")


if __name__ == "__main__":
    main()
