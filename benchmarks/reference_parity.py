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
  ``--comp-seeds K`` repeats the whole completion protocol K times with
  independent hypothesis seeds on BOTH sides and reports mean +- spread,
  so the cross-framework delta can be read against the within-framework
  seed noise of the min-over-hypotheses statistic.
- **Motion denoising/MPJPE** (ref run/motion_denoising.py:63-300): the
  reference's ``MotionDenoise.optimize`` (torch Adam through a torch body
  model) denoises the SAME noisy joints as our ``tasks.motion_denoising``
  on the config-3 protocol fragments. The torch body model is
  ``torch_body_shim.TorchBodyModel`` — a transcription of this repo's JAX
  LBS proven equal to it in tests (the licensed ``smplx`` package the
  reference wraps is absent), so weights+optimizer are the only variables.

Absent third-party deps that the reference imports but this comparison
never calls (``pymeshlab``, ``torchgeometry``, ``smplx``, ``pyrender``,
``trimesh``) are stubbed at import time; every code path actually
executed is the reference's.

    python benchmarks/reference_parity.py \
        --ckpt-path output/.../best_model --n-samples 500 --comp-batch 50
    python benchmarks/reference_parity.py --ckpt-path ... \
        --protocols completion --comp-seeds 5          # seed-spread table
    python benchmarks/reference_parity.py --ckpt-path ... \
        --protocols motion --motion-fragments 2        # motion parity
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


def _load_ref_run_module(filename):
    """Load a reference ``run/*.py`` entry script as a module. Each defines
    the same absl ``config`` flag at import time, so drop any existing
    definition first (we never parse flags; configs come from import_configs)."""
    from absl import flags
    import importlib.util

    if "config" in flags.FLAGS:
        delattr(flags.FLAGS, "config")
    spec = importlib.util.spec_from_file_location(
        "ref_run_" + filename.replace(".py", ""),
        os.path.join(REFERENCE, "run", filename))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_reference_modules():
    """Reference modules as a namespace package, with the unused third-party
    imports stubbed (import-time only; no stubbed symbol is ever called)."""
    _stub("pymeshlab", MeshSet=object, Mesh=object)
    _stub("torchgeometry")
    _stub("smplx", SMPL=object, SMPLH=object, SMPLX=object)
    _stub("smplx.utils", Struct=object)
    sys.modules["smplx"].utils = sys.modules["smplx.utils"]
    _stub("pyrender")
    _stub("trimesh")
    _stub("pytorch3d")
    _stub("pytorch3d.renderer", look_at_view_transform=object,
          FoVPerspectiveCameras=object, PointLights=object,
          RasterizationSettings=object, MeshRenderer=object,
          MeshRasterizer=object, SoftPhongShader=object, TexturesVertex=object)
    _stub("pytorch3d.structures", Meshes=object)
    if REFERENCE not in sys.path:
        sys.path.append(REFERENCE)
    import lib.algorithms.advanced.likelihood as ref_likelihood
    import lib.algorithms.advanced.model as ref_model  # noqa: E501
    import lib.algorithms.advanced.sampling as ref_sampling
    import lib.algorithms.advanced.sde_lib as ref_sde_lib
    import lib.algorithms.ema as ref_ema
    import lib.dataset.AMASS as ref_amass
    import lib.utils.metric as ref_metric

    return (ref_model, ref_sampling, ref_sde_lib, ref_ema, ref_amass,
            ref_metric, ref_likelihood)


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
    ap.add_argument("--comp-seeds", type=int, default=1,
                    help="repeat completion with K independent hypothesis "
                         "seeds per side; report mean +- spread")
    ap.add_argument("--gen-seeds", type=int, default=1,
                    help="repeat generation with K independent sampler "
                         "seeds per side; report APD mean +- spread")
    ap.add_argument("--part", type=str, default="left_leg")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lik-batch", type=int, default=50)
    ap.add_argument("--x64", action="store_true",
                    help="precision control for the likelihood protocol: "
                         "integrate OUR ODE state in float64 (the "
                         "reference's scipy solve_ivp always does) — the "
                         "fp32-default delta of ~0.035 bits/dim collapses "
                         "into the within-framework Hutchinson spread")
    ap.add_argument("--lik-out", type=str, default=None,
                    help="optional JSON artifact for the likelihood/"
                         "interpolation protocol numbers")
    ap.add_argument("--protocols", type=str, default="generation,completion",
                    help="comma subset of generation,completion,likelihood,"
                         "interpolation,motion,fitting")
    ap.add_argument("--motion-fragments", type=int, default=2)
    ap.add_argument("--motion-dir", type=str, default="data/he_frags")
    ap.add_argument("--motion-body", type=str,
                    default="data/synth_smplx_human.npz")
    ap.add_argument("--motion-std", type=float, default=0.04)
    ap.add_argument("--fit-dir", type=str, default="data/ehf_synth")
    ap.add_argument("--fit-body", type=str, default="data/synth_smplx_ehf.npz")
    ap.add_argument("--fit-iters", type=int, default=100)
    ap.add_argument("--fit-step", type=float, default=1e-2,
                    help="Adam step for BOTH SMPLify stages on BOTH sides "
                         "(the reference class has a single step_size)")
    ap.add_argument("--fit-no-prior", action="store_true",
                    help="drop the DPoser prior on both sides: the whole "
                         "fit is then deterministic, isolating optimizer/"
                         "body-model/loss parity from prior-noise variance")
    args = ap.parse_args()
    protocols = set(args.protocols.split(","))

    os.environ.setdefault("DPOSER_PLATFORM", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
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

    (ref_model, ref_sampling, ref_sde_lib, ref_ema, ref_amass,
     ref_metric, ref_likelihood) = load_reference_modules()

    config = import_configs("configs.subvp.amass_scorefc_continuous.get_config")
    config.sampling.corrector = "langevin"  # metrics protocol, ref demo.py:142
    device = "cpu"
    torch.manual_seed(args.seed)

    # ---- export: JAX train state -> release .pth schema -------------------
    if args.ckpt_path.endswith(".pth"):
        # already the release schema (e.g. the pinned
        # artifacts/trained_r5/axis-zscore-400k-synth.pth): both sides load
        # it directly — the export step has nothing to do
        pth = args.ckpt_path
        state = None
        print(f"using release-schema checkpoint {pth} directly")
    else:
        pth = "/tmp/dposer_parity_export.pth"
        state = restore_train_state(args.ckpt_path)
        # the EMA shadow params live under ema.shadow_params (utils/checkpoint
        # save_train_state layout); exporting them is what makes "same weights"
        # literal — our load_params_for_inference serves EMA params, and the
        # reference's demo/completion load protocol does ema.copy_to
        ema_state = state.get("ema")
        ema_params = ema_state.get("shadow_params") \
            if isinstance(ema_state, dict) else None
        save_torch_checkpoint(pth, state["params"], ema_params=ema_params,
                              step=int(state.get("step", 0)))
        print(f"exported {args.ckpt_path} -> {pth} (ema shadow: "
              f"{'yes' if ema_params is not None else 'RAW FALLBACK'})")

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

    # ======== generation / APD (ref demo.py:137-161) ========================
    if "generation" in protocols:
        body = BodyModel(args.smpl_path, model_type="smpl",
                         batch_size=args.n_samples, num_betas=10)

        def smpl_joints22(poses_axis_np):
            padded = jnp.concatenate(
                [jnp.asarray(poses_axis_np), jnp.zeros((len(poses_axis_np), 6))], 1)
            return body(pose_body=padded).Jtr[:, :22, :]

        shape = (args.n_samples, D)
        r_sampler = ref_sampling.get_sampling_fn(config, r_sde, shape,
                                                 lambda x: x, 5e-3, device=device)
        o_sampler = our_sampling.get_sampling_fn(config, sde, shape, score_fn,
                                                 inverse_scaler=None, eps=5e-3)

        print(f"\n[generation, {args.n_samples} samples, pc/em+langevin "
              f"N=1000, seeds={args.gen_seeds}]")
        apds_ref, apds_ours = [], []
        for s in range(args.gen_seeds):
            torch.manual_seed(args.seed + 7919 * s)
            with torch.no_grad():
                _, r_samples = r_sampler(r_model, observation=None)
            r_axis = r_norm.offline_denormalize(
                r_samples, to_axis=True).cpu().numpy()

            _, o_samples = o_sampler(jax.random.PRNGKey(args.seed + 7919 * s))
            o_axis = np.asarray(normalizer.offline_denormalize(
                o_samples, to_axis=True))

            # the reference's own metric implementation scores both sets
            apd_ref = float(ref_metric.average_pairwise_distance(
                torch.from_numpy(np.asarray(smpl_joints22(r_axis)))))
            apd_ours = float(ref_metric.average_pairwise_distance(
                torch.from_numpy(np.asarray(smpl_joints22(o_axis)))))
            apds_ref.append(apd_ref)
            apds_ours.append(apd_ours)
            apd_ours_ourimpl = float(
                average_pairwise_distance(smpl_joints22(o_axis)))
            print(f"seed {s}: APD  reference pipeline (torch, exported ckpt): "
                  f"{apd_ref:.4f}")
            print(f"seed {s}: APD  this framework   (same weights):           "
                  f"{apd_ours:.4f}")
            print(f"     (our APD impl on our samples:              "
                  f"{apd_ours_ourimpl:.4f})")
            print(f"     relative delta: "
                  f"{abs(apd_ref - apd_ours) / apd_ref * 100:.2f}%")

            # pose-space moments — distribution-level, sampler-noise aware
            for name, arr in (("reference", r_axis), ("ours", o_axis)):
                print(f"     {name}: mean-norm {np.linalg.norm(arr.mean(0)):.4f} "
                      f"std-norm {np.linalg.norm(arr.std(0)):.4f}")
        if args.gen_seeds > 1:
            ra, ob = np.asarray(apds_ref), np.asarray(apds_ours)
            print(f"summary APD  reference: {ra.mean():.4f} +- {ra.std():.4f}"
                  f"   ours: {ob.mean():.4f} +- {ob.std():.4f}   delta of "
                  f"means {abs(ra.mean() - ob.mean()) / ra.mean() * 100:.2f}%")

    # ======== completion (ref completion.py:95-200,279-321) =================
    if "completion" in protocols:
        ref_completion = _load_ref_run_module("completion.py")
        Bc = args.comp_batch
        test = np.load(os.path.join(args.dataset_folder, args.version, "test",
                                    "pose_body.npy"))[:Bc].astype(np.float32)
        gts_axis = torch.from_numpy(test)
        poses_n = r_norm.offline_normalize(gts_axis.to(device), from_axis=True)
        mask_t, obs_t = ref_completion.create_mask(poses_n, part=args.part)

        r_comp = ref_completion.DPoserComp(r_model, r_sde,
                                           config.training.continuous,
                                           batch_size=Bc)
        our_comp = OurComp(sde, score_fn)
        obs_j = jnp.asarray(obs_t.cpu().numpy())
        mask_j = jnp.asarray(mask_t.cpu().numpy())

        body_c = BodyModel(args.smpl_path.replace("synth_smpl.npz",
                                                  "synth_smplx.npz"),
                           model_type="smplx", batch_size=Bc, num_betas=10)
        evaler = Evaler(body_model=body_c, part=args.part)

        print(f"\n[completion, {Bc} poses, part={args.part}, "
              f"hypo={args.comp_hypo}, seeds={args.comp_seeds}, "
              f"same masks/observations]")
        per_seed = {"mpvpe_all": ([], []), "mpjpe_body": ([], [])}
        for s in range(args.comp_seeds):
            torch.manual_seed(args.seed + 7919 * s)
            hypos_ref = torch.stack(
                [r_comp.optimize(obs_t, mask_t) for _ in range(args.comp_hypo)],
                dim=1)
            preds_ref = r_norm.offline_denormalize(
                hypos_ref, to_axis=True).detach().cpu().numpy()

            hypos_ours = our_comp.optimize_hypos(
                jax.random.PRNGKey(args.seed + 7919 * s + 1),
                obs_j, mask_j, args.comp_hypo)
            preds_ours = np.asarray(normalizer.offline_denormalize(
                hypos_ours, to_axis=True))

            res_ref = evaler.multi_eval_bodys(jnp.asarray(preds_ref),
                                              jnp.asarray(test))
            res_ours = evaler.multi_eval_bodys(jnp.asarray(preds_ours),
                                               jnp.asarray(test))
            for k in ("mpvpe_all", "mpjpe_body"):
                a, b = float(np.mean(res_ref[k])), float(np.mean(res_ours[k]))
                per_seed[k][0].append(a)
                per_seed[k][1].append(b)
                print(f"seed {s}: {k}  reference pipeline: {a:.2f} mm   "
                      f"ours: {b:.2f} mm   delta {abs(a - b) / a * 100:.2f}%")
        if args.comp_seeds > 1:
            print("summary (mean +- std over seeds; delta-of-means vs "
                  "within-framework spread):")
            for k in ("mpvpe_all", "mpjpe_body"):
                ra = np.asarray(per_seed[k][0])
                ob = np.asarray(per_seed[k][1])
                print(f"{k}  reference: {ra.mean():.2f} +- {ra.std():.2f} mm   "
                      f"ours: {ob.mean():.2f} +- {ob.std():.2f} mm   "
                      f"delta of means {abs(ra.mean() - ob.mean()) / ra.mean() * 100:.2f}%")

    # ======== likelihood / bits-per-dim (ref likelihood.py:40-113) ==========
    lik_json = {}
    if "likelihood" in protocols:
        from dposer_tpu.diffusion.likelihood import (get_fast_likelihood_fn,
                                                     get_likelihood_fn)

        Bl = args.lik_batch
        test = np.load(os.path.join(args.dataset_folder, args.version, "test",
                                    "pose_body.npy"))[:Bl].astype(np.float32)
        data_n = normalizer.offline_normalize(jnp.asarray(test),
                                              from_axis=True)
        if args.x64:
            data_n = jnp.asarray(data_n, jnp.float64)
        data_t = r_norm.offline_normalize(torch.from_numpy(test).to(device),
                                          from_axis=True)
        np.testing.assert_allclose(np.asarray(data_n, np.float32),
                                   data_t.cpu().numpy(), atol=1e-5)

        print(f"\n[likelihood/bpd, {Bl} test poses, Hutchinson-Rademacher, "
              f"scipy-RK45 (ref) vs on-device RK45 / tabled RK4 (ours)]")
        # the reference's own scipy-RK45 likelihood on the exported .pth
        # (the run.train eval path, ref train.py:279)
        r_lik = ref_likelihood.get_likelihood_fn(r_sde, lambda x: x)
        torch.manual_seed(args.seed)
        bpd_r, z_r, nfe_r = r_lik(r_model, data_t)
        bpd_r = bpd_r.cpu().numpy()
        print(f"reference pipeline (torch, exported ckpt): "
              f"bpd {bpd_r.mean():.4f} +- {bpd_r.std():.4f}  nfe {nfe_r}")
        # within-framework control: the SAME reference pipeline with a
        # different Hutchinson draw — the scale against which the
        # cross-framework delta-of-means must be read (bpd is an unbiased
        # ESTIMATE; frameworks draw different Rademacher streams)
        torch.manual_seed(args.seed + 1)
        bpd_r2, _, _ = r_lik(r_model, data_t)
        bpd_r2 = bpd_r2.cpu().numpy()
        print(f"reference, 2nd Hutchinson seed (control):   "
              f"bpd {bpd_r2.mean():.4f} +- {bpd_r2.std():.4f}"
              f"   within-ref delta {abs(bpd_r2.mean() - bpd_r.mean()):.4f} "
              f"bits/dim")

        # ours #1: adaptive on-device RK45 oracle (diffusion/likelihood.py)
        o_lik = get_likelihood_fn(sde, score_fn)
        bpd_a, z_a, nfe_a = o_lik(jax.random.PRNGKey(args.seed + 31), data_n)
        bpd_a = np.asarray(bpd_a)
        print(f"ours adaptive RK45 (same weights):          "
              f"bpd {bpd_a.mean():.4f} +- {bpd_a.std():.4f}  nfe {int(nfe_a)}"
              f"   delta {abs(bpd_a.mean() - bpd_r.mean()):.4f} bits/dim")

        # ours #2: fixed-grid tabled RK4 fast path
        f_lik = get_fast_likelihood_fn(sde, model, params, n_steps=250,
                                       eps=1e-5)
        bpd_f, _, nfe_f = f_lik(jax.random.PRNGKey(args.seed + 31), data_n)
        bpd_f = np.asarray(bpd_f)
        print(f"ours tabled RK4 (250 steps):                "
              f"bpd {bpd_f.mean():.4f} +- {bpd_f.std():.4f}  nfe {int(nfe_f)}"
              f"   delta {abs(bpd_f.mean() - bpd_r.mean()):.4f} bits/dim")

        lik_json["likelihood"] = dict(
            batch=Bl, bpd_reference=float(bpd_r.mean()),
            bpd_reference_seed2=float(bpd_r2.mean()),
            bpd_ours_adaptive=float(bpd_a.mean()),
            bpd_ours_rk4=float(bpd_f.mean()),
            bpd_std_reference=float(bpd_r.std()),
            latent_mean_abs_delta=float(
                np.abs(np.asarray(z_a) - z_r.cpu().numpy()).mean()))
        # ours #3: the fused Pallas likelihood KERNEL — TPU only (its
        # documented quality band is +-0.05 bits/dim vs the oracle,
        # PERFORMANCE.md "ODE paths"); skipped on CPU hosts
        if jax.default_backend() == "tpu":
            from dposer_tpu.ops.pallas.fused_lik import \
                get_pallas_likelihood_fn

            k_lik = get_pallas_likelihood_fn(sde, model, params, (Bl, D),
                                             n_steps=100, eps=1e-5)
            bpd_k, _, _ = k_lik(jax.random.PRNGKey(args.seed + 31), data_n)
            bpd_k = np.asarray(bpd_k)
            print(f"ours fused Pallas kernel (bf16, 100 st): "
                  f"bpd {bpd_k.mean():.4f} +- {bpd_k.std():.4f}"
                  f"   delta {abs(bpd_k.mean() - bpd_r.mean()):.4f} bits/dim")
            lik_json["likelihood"]["bpd_ours_kernel"] = float(bpd_k.mean())
        else:
            print("ours fused Pallas kernel: skipped (CPU host; band pinned "
                  "vs the RK4 twin in tests/test_fast_ode.py)")

    # ======== interpolation (ref demo.py:412-500) ===========================
    if "interpolation" in protocols:
        from dposer_tpu.diffusion.likelihood import get_likelihood_fn
        from dposer_tpu.diffusion.sampling import get_ode_sampler
        from dposer_tpu.ops.smoothing import slerp_interpolation

        chosen_idx = [1, 10, 11, 12, 17, 14]  # ref demo.py:418
        test = np.load(os.path.join(args.dataset_folder, args.version, "test",
                                    "pose_body.npy")).astype(np.float32)
        anchors = test[chosen_idx]
        A = len(chosen_idx)
        anchors_n = normalizer.offline_normalize(jnp.asarray(anchors),
                                                 from_axis=True)
        anchors_t = r_norm.offline_normalize(
            torch.from_numpy(anchors).to(device), from_axis=True)

        print(f"\n[interpolation, {A} anchors: likelihood-ODE encode -> "
              f"slerp -> PF-ODE decode (ref demo.py:412-500)]")
        # encode on both sides (the x-path of the augmented ODE is the
        # deterministic PF-ODE; Hutchinson noise only drives the logp lane
        # + adaptive step control)
        r_lik = ref_likelihood.get_likelihood_fn(r_sde, lambda x: x)
        torch.manual_seed(args.seed)
        _, z_r, _ = r_lik(r_model, anchors_t)
        z_r = z_r.cpu().numpy()
        o_lik = get_likelihood_fn(sde, score_fn)
        _, z_o, _ = o_lik(jax.random.PRNGKey(args.seed + 41), anchors_n)
        z_o = np.asarray(z_o)
        z_scale = np.abs(z_r).mean()
        z_delta = np.abs(z_o - z_r).mean()
        print(f"latent agreement: mean|z_ours - z_ref| = {z_delta:.4f} "
              f"(latent scale {z_scale:.4f}, rel {z_delta / z_scale * 100:.2f}%)")

        # decoders: reference's own scipy-RK45 ODE sampler vs ours
        r_ode = ref_sampling.get_ode_sampler(
            r_sde, (A, D), lambda x: x, denoise=False, eps=1e-3,
            device=device)
        o_ode = get_ode_sampler(sde, (A, D), score_fn, denoise=False,
                                eps=1e-3)

        # (a) round trip: encode -> decode ~= identity, each side through
        # its own pipeline
        with torch.no_grad():
            _, x_r_rt = r_ode(r_model, z=torch.from_numpy(z_r).to(device))
        x_r_rt = x_r_rt.cpu().numpy()
        _, x_o_rt = o_ode(jax.random.PRNGKey(0), z=jnp.asarray(z_o))
        x_o_rt = np.asarray(x_o_rt)
        rt_ref = np.abs(x_r_rt - anchors_t.cpu().numpy()).mean()
        rt_ours = np.abs(x_o_rt - np.asarray(anchors_n)).mean()
        print(f"round-trip |decode(encode(x)) - x| (normalized space): "
              f"reference {rt_ref:.4f}   ours {rt_ours:.4f}")

        # (b) cross-framework decode: the SAME latents (ours' encode)
        # through the reference's decoder vs ours — both deterministic
        # PF-ODE solves, so pointwise comparable
        with torch.no_grad():
            _, x_r_cross = r_ode(r_model, z=torch.from_numpy(z_o).to(device))
        x_r_cross = x_r_cross.cpu().numpy()
        cross = np.abs(x_r_cross - x_o_rt).mean()
        scale = np.abs(x_o_rt).mean()
        print(f"cross-framework decode of the same latents: mean|delta| = "
              f"{cross:.4f} (pose scale {scale:.4f}, "
              f"rel {cross / scale * 100:.2f}%)")

        # (c) slerp path between the first two anchors, decoded by BOTH
        # frameworks (the ref protocol's inter_frames walk)
        K = 9
        z_path = np.asarray(slerp_interpolation(
            jnp.asarray(z_o[0]), jnp.asarray(z_o[1]), K + 2))[1:-1]
        o_ode_p = get_ode_sampler(sde, (K, D), score_fn, denoise=False,
                                  eps=1e-3)
        _, x_o_path = o_ode_p(jax.random.PRNGKey(0), z=jnp.asarray(z_path))
        x_o_path = np.asarray(x_o_path)
        r_ode_p = ref_sampling.get_ode_sampler(
            r_sde, (K, D), lambda x: x, denoise=False, eps=1e-3,
            device=device)
        with torch.no_grad():
            _, x_r_path = r_ode_p(r_model,
                                  z=torch.from_numpy(z_path).to(device))
        x_r_path = x_r_path.cpu().numpy()
        assert np.isfinite(x_o_path).all() and np.isfinite(x_r_path).all()
        per_frame = np.abs(x_r_path - x_o_path).mean(axis=1)
        # a slerped latent can land near a separatrix between mixture
        # components, where the PF-ODE is genuinely solver-sensitive (OUR
        # OWN decode at rtol 1e-5 vs 1e-7 moves just as much there, so it
        # is a property of the flow, not a framework delta). Detect such
        # frames with a tolerance-sensitivity probe and report both the
        # full and the stable-frame statistics.
        o_ode_tight = get_ode_sampler(sde, (K, D), score_fn, denoise=False,
                                      eps=1e-3, rtol=1e-7, atol=1e-7)
        _, x_o_tight = o_ode_tight(jax.random.PRNGKey(0),
                                   z=jnp.asarray(z_path))
        self_sens = np.abs(np.asarray(x_o_tight) - x_o_path).mean(axis=1)
        stable = self_sens < 0.01
        print(f"slerp path ({K} frames): cross-framework decode per-frame "
              f"|delta| median {np.median(per_frame):.4f}, max "
              f"{per_frame.max():.4f}; {int(stable.sum())}/{K} frames "
              f"solver-stable (self-sensitivity < 0.01), their mean|delta| "
              f"= {per_frame[stable].mean():.4f}; pose-space std "
              f"{x_o_path.std():.4f} (in-distribution scale ~1)")
        if not stable.all():
            print(f"     separatrix frames {np.where(~stable)[0].tolist()}: "
                  f"cross-delta {np.round(per_frame[~stable], 3).tolist()} vs "
                  f"OWN rtol-sensitivity "
                  f"{np.round(self_sens[~stable], 3).tolist()} — "
                  f"flow-intrinsic, not a framework gap")

        lik_json["interpolation"] = dict(
            latent_rel_delta_pct=float(z_delta / z_scale * 100),
            round_trip_ref=float(rt_ref), round_trip_ours=float(rt_ours),
            cross_decode_rel_pct=float(cross / scale * 100),
            slerp_stable_frames=int(stable.sum()), slerp_frames=K,
            slerp_stable_mean_abs_delta=float(per_frame[stable].mean()),
            slerp_path_median_abs_delta=float(np.median(per_frame)))

    if lik_json and args.lik_out:
        import json

        os.makedirs(os.path.dirname(args.lik_out), exist_ok=True)
        with open(args.lik_out, "w") as f:
            json.dump(lik_json, f, indent=1)
        print(f"wrote {args.lik_out}")

    # ======== motion denoising (ref motion_denoising.py:63-300) =============
    if "motion" in protocols:
        run_motion_parity(args, config, r_model, torch, np, jax, jnp)

    # ======== fitting / SMPLify (ref run/smplify.py:118-281) ================
    if "fitting" in protocols:
        if state is None:
            raise SystemExit("--protocols fitting needs an orbax train-state "
                             "directory (it re-exports EMA params into "
                             "model_state_dict); pass the training run's "
                             "best_model dir, not a .pth")
        run_fitting_parity(args, state, torch, np, jax, jnp)


def run_fitting_parity(args, state, torch, np, jax, jnp):
    """Config-4 family, cross-framework: the reference's own two-stage
    ``SMPLify`` (torch Adam, DPoser prior, ref run/smplify.py:118-281)
    drives the ``TorchSMPLXFit`` shim on the synthetic-GT EHF images, next
    to ``tasks.smplify.SMPLify`` — identical inits, keypoints, cameras and
    eval path (``MocapDataset.eval_EHF``); weights held equal by exporting
    the EMA params into ``model_state_dict`` (the reference's SMPLify loads
    raw weights without ``ema.copy_to``, ref run/smplify.py:60-67, while
    this framework serves EMA params — the export slots EMA into the slot
    the reference reads)."""
    import json
    from glob import glob

    import cv2

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_body_shim import TorchSMPLXFit

    from dposer_tpu.body_model import constants
    from dposer_tpu.body_model.smplx_fit import SMPLXFit
    from dposer_tpu.data.mocap import MocapDataset
    from dposer_tpu.data.preprocess import compute_bbox
    from dposer_tpu.ops.rotations import cam_crop2full
    from dposer_tpu.tasks.smplify import SMPLify as OurSMPLify
    from dposer_tpu.utils.checkpoint import save_torch_checkpoint
    from run.smplify import build_dposer_prior

    ref_smplify_mod = _load_ref_run_module("smplify.py")

    # EMA-as-raw export: the weight set BOTH sides run
    ema_state = state.get("ema")
    ema_params = ema_state.get("shadow_params") if isinstance(ema_state, dict) \
        else None
    weights = ema_params if ema_params is not None else state["params"]
    pth_fit = "/tmp/dposer_parity_export_fit.pth"
    save_torch_checkpoint(pth_fit, weights, ema_params=weights,
                          step=int(state.get("step", 0)))

    tree = "/tmp/dposer_parity_tree"
    write_torch_stats(torch, os.path.join(args.dataset_folder, args.version,
                                          "train"),
                      os.path.join(tree, args.version, "train"))
    config_path = "configs.subvp.amass_scorefc_continuous.get_config"
    ns_ref = types.SimpleNamespace(device="cpu", dataset_folder=tree,
                                   version=args.version, ckpt_path=pth_fit,
                                   sde_N=500, time_strategy="3",
                                   config_path=config_path)
    ns_ours = types.SimpleNamespace(dataset_folder=args.dataset_folder,
                                    version=args.version, ckpt_path=pth_fit,
                                    sde_N=500, time_strategy="3",
                                    config_path=config_path)

    # ---- batch construction: identical to run/fitting.py:115-157 ----------
    N22 = 22
    smpl = SMPLXFit(args.fit_body, batch_size=1)
    img_paths = sorted(glob(f"{args.fit_dir}/*_img.jpg"))
    json_paths = sorted(glob(f"{args.fit_dir}/*_2Djnt.json"))
    ply_paths = sorted(glob(f"{args.fit_dir}/*_align.ply"))
    B = len(img_paths)
    bend_pose = np.load(constants.BEND_POSE_PATH)["pose"]

    imgs, kpts49, bends = [], [], []
    for img_path, json_path in zip(img_paths, json_paths):
        imgs.append(cv2.imread(img_path))
        jd = json.load(open(json_path))
        kp = np.array(jd["people"][0]["pose_keypoints_2d"]).reshape(25, 3)
        row = np.zeros((49, 3), np.float32)
        row[:25] = kp
        kpts49.append(row)
        bb = compute_bbox(jd)
        bends.append(bb[0, 2] > 400)

    det = np.concatenate([np.arange(B, dtype=np.float32)[:, None],
                          np.tile([[400, 100, 1000, 1200]], (B, 1))], axis=1)
    mocap_db = MocapDataset(imgs, det, body_model=smpl.bm)
    batch = mocap_db.batch()
    center = jnp.asarray(batch["center"])
    scale = jnp.asarray(batch["scale"])
    img_h, img_w = jnp.asarray(batch["img_h"]), jnp.asarray(batch["img_w"])
    focal_length = jnp.asarray(batch["focal_length"])

    keypoints49 = np.stack(kpts49)
    full_img_shape = jnp.stack((img_h, img_w), axis=-1)
    init_cam_t = np.asarray(cam_crop2full(
        jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]), (B, 1)),
        center, scale, full_img_shape, focal_length))
    init_pose = np.tile(np.asarray(smpl.mean_poses[: N22 * 3])[None], (B, 1))
    for i, bend in enumerate(bends):
        if bend:
            init_pose[i] = bend_pose[0, : N22 * 3]
    init_betas = np.tile(np.asarray(smpl.mean_shape)[None], (B, 1))
    camera_center = np.stack([np.asarray(img_w), np.asarray(img_h)],
                             axis=-1) / 2
    focal = float(focal_length[0])

    print(f"\n[fitting/SMPLify, {B} synthetic-GT EHF images, step "
          f"{args.fit_step}, {args.fit_iters} iters x 5 stages, EMA weights "
          f"on both sides]")

    # ---- reference pipeline ------------------------------------------------
    torch.manual_seed(args.seed)
    ref_body = TorchSMPLXFit(args.fit_body, batch_size=B)
    ref_fit = ref_smplify_mod.SMPLify(body_model=ref_body,
                                      step_size=args.fit_step, batch_size=B,
                                      num_iters=args.fit_iters,
                                      focal_length=focal, args=ns_ref)
    if args.fit_no_prior:
        ref_fit.pose_prior = None
    r_pose, r_betas, r_cam_t, r_reproj = ref_fit(
        torch.from_numpy(init_pose.copy()),
        torch.from_numpy(init_betas.copy()),
        torch.from_numpy(init_cam_t.copy()),
        torch.from_numpy(camera_center.astype(np.float32)),
        torch.from_numpy(keypoints49.copy()))
    res_ref = (r_pose.numpy(), r_betas.numpy(), r_cam_t.numpy(), None)

    # ---- ours ---------------------------------------------------------------
    prior = None if args.fit_no_prior \
        else build_dposer_prior(ns_ours, batch_size=B)
    our_fit = OurSMPLify(smpl, pose_prior=prior, step_size=args.fit_step,
                         cam_step_size=args.fit_step, batch_size=B,
                         num_iters=args.fit_iters, focal_length=focal,
                         time_strategy="3", sde_N=500)
    o_pose, o_betas, o_cam_t, o_reproj = our_fit(
        jax.random.PRNGKey(args.seed), jnp.asarray(init_pose),
        jnp.asarray(init_betas), jnp.asarray(init_cam_t),
        jnp.asarray(camera_center), jnp.asarray(keypoints49))
    res_ours = (np.asarray(o_pose), np.asarray(o_betas),
                np.asarray(o_cam_t), None)

    # stage 1 is deterministic and the camera freezes after it, so the
    # returned translations compare the two stage-1 solvers directly
    cam_delta = float(np.abs(res_ref[2] - res_ours[2]).max())
    print(f"stage-1 camera translation: max |ref - ours| = {cam_delta:.5f} m")
    print(f"final reprojection loss  reference: "
          f"{float(np.mean(r_reproj.detach().numpy())):.2f}   "
          f"ours: {float(np.mean(np.asarray(o_reproj))):.2f}")

    # ---- shared eval (the config-4 accuracy path, data/mocap.py) ----------
    def eval_side(res):
        acc = {"pa_mpjpe_body": [], "mpjpe_body": []}
        for i in range(B):
            one = tuple(None if r is None else r[i:i + 1] for r in res)
            ev = mocap_db.eval_EHF(one, ply_paths[i])
            acc["pa_mpjpe_body"].extend(ev["pa_mpjpe_body"])
            acc["mpjpe_body"].extend(ev["mpjpe_body"])
        return {k: float(np.mean(v)) for k, v in acc.items()}

    e_init = eval_side((init_pose, init_betas, init_cam_t, None))
    e_ref = eval_side(res_ref)
    e_ours = eval_side(res_ours)
    print(f"unfitted init baseline: PA-MPJPE {e_init['pa_mpjpe_body']:.2f} mm"
          f"   MPJPE {e_init['mpjpe_body']:.2f} mm")
    for k in ("pa_mpjpe_body", "mpjpe_body"):
        a, b = e_ref[k], e_ours[k]
        print(f"{k}  reference pipeline: {a:.2f} mm   ours: {b:.2f} mm   "
              f"delta {abs(a - b) / a * 100:.2f}%")


def run_motion_parity(args, config, r_model, torch, np, jax, jnp):
    """Config-3 protocol, both frameworks, same noisy joints: the
    reference's ``MotionDenoise`` torch Adam loop (driving the verified
    ``TorchBodyModel`` shim) vs ``tasks.motion_denoising.MotionDenoise``."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_body_shim import TorchBodyModel

    from dposer_tpu.body_model.smplx_jax import BodyModel
    from dposer_tpu.tasks.motion_denoising import (MotionDenoise as OurMD,
                                                   noise_schedule_kwargs)
    from run.common import load_model_for_inference

    ref_motion = _load_ref_run_module("motion_denoising.py")

    # the reference Posenormalizer locates torch stats by directory layout
    tree = "/tmp/dposer_parity_tree"
    write_torch_stats(torch, os.path.join(args.dataset_folder, args.version,
                                          "train"),
                      os.path.join(tree, args.version, "train"))
    ns = types.SimpleNamespace(device="cpu", dataset_folder=tree,
                               version=args.version)

    frag_files = sorted(
        f for f in os.listdir(args.motion_dir) if f.endswith(".npz"))
    frag_files = frag_files[:args.motion_fragments]
    kwargs = noise_schedule_kwargs(args.motion_std)

    # ours: the CLI-identical load path (sde_N=500, ref :317-322)
    _, _, sde500, _, score_fn500 = load_model_for_inference(
        config, args.ckpt_path, sde_N=500)
    from dposer_tpu.data.amass import PoseNormalizer
    normalizer = PoseNormalizer(
        os.path.join(args.dataset_folder, args.version, "train"),
        normalize=config.data.normalize, min_max=config.data.min_max,
        rot_rep=config.data.rot_rep)

    print(f"\n[motion denoising, {len(frag_files)} fragments, "
          f"std={args.motion_std}, strategy 3, shared noisy joints]")
    sums = {"ref_init": [], "ref_final": [], "our_init": [], "our_final": []}
    our_body = ref_body = md_ours = None
    for i, fname in enumerate(frag_files):
        gt = np.load(os.path.join(args.motion_dir, fname))["pose_body"]
        gt = gt.astype(np.float32)
        T = len(gt)
        if our_body is None:
            our_body = BodyModel(args.motion_body, model_type="smplx",
                                 batch_size=T, num_betas=10)
            ref_body = TorchBodyModel(args.motion_body, model_type="smplx",
                                      batch_size=T, num_betas=10)
            md_ours = OurMD(sde500, score_fn500, our_body, normalizer,
                            dposer_weight=1.0, batch_size=T)

        # one shared noise draw so init error is identical on both sides
        jt_gt = np.asarray(our_body(pose_body=jnp.asarray(gt)).Jtr[:, :22])
        rng = np.random.default_rng(args.seed + i)
        noisy = (jt_gt + args.motion_std
                 * rng.standard_normal(jt_gt.shape)).astype(np.float32)

        torch.manual_seed(args.seed + i)
        md_ref = ref_motion.MotionDenoise(
            config, ns, r_model, body_model=ref_body, sde_N=500,
            dposer_weight=1.0, batch_size=T)
        res_ref = md_ref.optimize(torch.from_numpy(noisy),
                                  torch.from_numpy(gt),
                                  time_strategy="3", **kwargs)

        res_ours = md_ours.optimize(jax.random.PRNGKey(args.seed + i),
                                    jnp.asarray(noisy), jnp.asarray(gt),
                                    time_strategy="3", **kwargs)

        ri, rf = (float(np.mean(res_ref[k])) for k in ("init_MPJPE", "MPJPE"))
        oi, of = (float(np.mean(res_ours[k])) for k in ("init_MPJPE", "MPJPE"))
        sums["ref_init"].append(ri)
        sums["ref_final"].append(rf)
        sums["our_init"].append(oi)
        sums["our_final"].append(of)
        print(f"{fname}: reference {ri:.3f} -> {rf:.3f} cm   "
              f"ours {oi:.3f} -> {of:.3f} cm")

    ref_mean = float(np.mean(sums["ref_final"]))
    our_mean = float(np.mean(sums["our_final"]))
    print(f"mean MPJPE  reference pipeline: {np.mean(sums['ref_init']):.3f} "
          f"-> {ref_mean:.3f} cm   ours: {np.mean(sums['our_init']):.3f} "
          f"-> {our_mean:.3f} cm   "
          f"final delta {abs(ref_mean - our_mean) / ref_mean * 100:.2f}%")


if __name__ == "__main__":
    main()
