"""TPU throughput for the three fitting tasks (BASELINE.json configs 2-4).

- completion: DPoserComp, 10 hypotheses x 10 samples, sde N=1000, 2x100 Adam
  steps (ref run/completion.py:167-207); plus the torch-CPU reference-pattern
  baseline (the reference's own model/sde modules in its per-step loop).
- motion denoising: HumanEva protocol, 60-frame fragment, noise-std 0.04
  schedule (3x60 steps, sde N=500, ref run/motion_denoising.py:329-336), with
  a FULL-SIZE (10475-vertex) synthetic SMPL-X so the body-model FLOPs match
  the real release.
- demo_fit/SMPLify: 100 camera + 5x100 body Adam steps on image_00077's
  OpenPose keypoints (ref run/smplify.py:198-260), full-size body model.

    python -u benchmarks/time_fitting.py [--skip-torch]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dposer_tpu.diffusion.score_fn import get_score_fn
from dposer_tpu.diffusion.sde import SubVPSDE
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.utils.benchtime import steady_state

DIM = 63


def flagship():
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=1024, embed_dim=512,
                         n_blocks=2, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)),
                        jnp.zeros((1,)))["params"]
    return model, params


def score_fn_for(model, params, sde):
    return get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t),
                        continuous=True)


def report(name, seconds, n_iters, extra=""):
    print(f"{name:42s} {seconds * 1e3:9.1f} ms/task  "
          f"({n_iters / seconds:8.1f} iters/s){extra}", flush=True)


def steady(launch):
    return steady_state(launch, m_pipe=4)


def bench_completion():
    from dposer_tpu.tasks import DPoserComp

    model, params = flagship()
    sde = SubVPSDE(N=1000)
    obs = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (10, DIM))
    mask = jnp.zeros((10, DIM)).at[:, 39:45].set(1.0)  # ~right_arm-sized
    key = jax.random.PRNGKey(2)
    variants = [("XLA, vmapped hypos", DPoserComp(
        sde, score_fn_for(model, params, sde)))]
    if jax.default_backend() == "tpu":
        variants.append(("fused Pallas kernel", DPoserComp(
            sde, score_fn_for(model, params, sde), backend="pallas",
            model=model, params=params)))
    t = None
    for name, comp in variants:
        out = comp.optimize_hypos(key, obs, mask, 10)
        np.asarray(out)  # compile + force true completion
        t = steady(lambda i: comp.optimize_hypos(
            jax.random.fold_in(key, i), obs, mask, 10))
        # 200 Adam steps, all 10 hypos vmapped/row-flattened inside
        report(f"completion 10x10 ({name})", t, 200,
               f"  [= {200 * 10 / t:8.1f} hypo-iters/s]")
    return t


def bench_completion_torch_cpu(probe_steps=10):
    """Reference pattern: sequential-hypothesis Adam loop with the
    reference's own model+sde (ref run/completion.py:131-207)."""
    import importlib.util

    import torch

    torch.set_num_threads(os.cpu_count() or 1)

    def load(rel, name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join("/root/reference", rel))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    refm = load("lib/algorithms/advanced/model.py", "fit_ref_model")
    refs = load("lib/algorithms/advanced/sde_lib.py", "fit_ref_sde")
    import ml_collections

    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        dropout=0.0, embedding_type="positional", fourier_scale=16,
        nonlinearity="swish", scale_by_sigma=True, sigma_min=0.01,
        sigma_max=50.0, num_scales=1000))
    model = refm.ScoreModelFC(c, n_poses=21, pose_dim=3, hidden_dim=1024,
                              embed_dim=512, n_blocks=2)
    model.eval()
    sde = refs.subVPSDE(0.1, 20.0, N=1000)
    obs = 0.3 * torch.randn(10, DIM)
    mask = torch.zeros(10, DIM)
    mask[:, 39:45] = 1.0

    def one_hypo_steps(n):
        x = obs.clone().requires_grad_(True)
        optim = torch.optim.Adam([x], lr=0.1)
        ts = torch.linspace(1.0, 1e-3, 1000)
        for i in range(n):
            quan_t = torch.tensor(900)
            t = ts[quan_t].expand(10)
            # one-step denoise DPoser loss (ref completion.py:105-149)
            z = torch.randn_like(x)
            alpha, sigma = sde.return_alpha_sigma(t)
            mean, std = sde.marginal_prob(x, t)
            perturbed = mean + std[:, None] * z
            with torch.no_grad():
                score = -model(perturbed, t * 999) / std[:, None]
            # alpha is [B, 1], sigma [B] (ref sde_lib.py:227-231)
            x0_hat = (perturbed + sigma[:, None] ** 2 * score) / alpha
            snr = alpha / torch.sqrt(sigma)[:, None]
            dposer = (0.5 * torch.sqrt(1 + snr) * (x - x0_hat.detach()) ** 2).mean()
            data = ((x * mask - obs * mask) ** 2).mean()
            loss = 100.0 * data + 0.1 * dposer
            optim.zero_grad()
            loss.backward()
            optim.step()

    one_hypo_steps(2)  # warmup
    t0 = time.perf_counter()
    one_hypo_steps(probe_steps)
    per_step = (time.perf_counter() - t0) / probe_steps
    total = per_step * 200 * 10  # 200 steps x 10 sequential hypotheses
    report("completion 10x10 (torch CPU, extrapolated)", total, 200 * 10)
    return total


def full_size_body(tmp, n_verts=10475):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from fixtures import make_stats_dir, make_synthetic_body_model

    bm_path, _ = make_synthetic_body_model(
        os.path.join(tmp, "SMPLX_NEUTRAL.npz"), "smplx", n_verts=n_verts)
    stats = make_stats_dir(os.path.join(tmp, "stats"))
    return bm_path, stats


def bench_motion_denoising(tmp):
    from dposer_tpu.body_model.smplx_jax import BodyModel
    from dposer_tpu.data import PoseNormalizer
    from dposer_tpu.tasks.motion_denoising import MotionDenoise, noise_schedule_kwargs

    bm_path, stats = full_size_body(tmp)
    model, params = flagship()
    sde = SubVPSDE(N=500)
    body = BodyModel(bm_path=bm_path, num_betas=10, batch_size=60,
                     model_type="smplx")
    normalizer = PoseNormalizer(data_path=stats, normalize=True, min_max=False,
                                rot_rep="axis")
    md = MotionDenoise(sde, score_fn_for(model, params, sde), body, normalizer,
                       batch_size=60)
    kwargs = noise_schedule_kwargs(0.04)  # 3 x 60 steps
    n_steps = kwargs["iterations"] * kwargs["steps_per_iter"]
    joints = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (60, 22, 3))
    md.optimize(jax.random.PRNGKey(4), joints, time_strategy="3", **kwargs)
    np.asarray(md.last_poses)  # compile + force true completion

    def launch(i):
        md.optimize(jax.random.fold_in(jax.random.PRNGKey(5), i), joints,
                    time_strategy="3", **kwargs)
        return md.last_poses

    t = steady(launch)
    report(f"motion denoising 60f @0.04 ({n_steps} steps)", t, n_steps)
    return t


def bench_smplify(tmp):
    from dposer_tpu.body_model.smplx_fit import SMPLXFit
    from dposer_tpu.data import PoseNormalizer
    from dposer_tpu.tasks.smplify import DPoser, SMPLify

    bm_path, stats = full_size_body(tmp)
    model, params = flagship()
    sde = SubVPSDE(N=500)
    normalizer = PoseNormalizer(data_path=stats, normalize=True, min_max=False,
                                rot_rep="axis")
    smpl = SMPLXFit(bm_path, batch_size=1)
    prior = DPoser(sde, score_fn_for(model, params, sde), normalizer, batch_size=1)
    fitter = SMPLify(smpl, pose_prior=prior, step_size=1e-2, batch_size=1,
                     num_iters=100, focal_length=1500.0, sde_N=500)

    kp = json.load(open("/root/reference/examples/image_00077_keypoints.json"))
    arr = np.asarray(kp["people"][0]["pose_keypoints_2d"], np.float32).reshape(1, 25, 3)
    kpts = np.concatenate([arr, np.zeros((1, 24, 3), np.float32)], axis=1)
    init_pose = jnp.concatenate([jnp.zeros((1, 3)),
                                 smpl.mean_poses[3:66][None]], axis=1)
    betas = smpl.mean_shape[None]
    cam_t = jnp.asarray([[0.0, 0.0, 5.0]])
    center = jnp.asarray([[600.0, 400.0]])

    args = (jax.random.PRNGKey(6), init_pose, betas, cam_t, center,
            jnp.asarray(kpts))
    out = fitter(*args)
    np.asarray(out[0])  # compile both stages + force true completion
    t = steady(lambda i: fitter(*args)[0])
    report("demo_fit SMPLify (100 + 5x100 iters)", t, 600)
    return t


def bench_motion_denoising_batched(tmp, F=8):
    """Directory-mode fast path: F fragments per vmapped program."""
    from dposer_tpu.body_model.smplx_jax import BodyModel
    from dposer_tpu.data import PoseNormalizer
    from dposer_tpu.tasks.motion_denoising import MotionDenoise, noise_schedule_kwargs

    bm_path, stats = full_size_body(tmp)
    model, params = flagship()
    sde = SubVPSDE(N=500)
    body = BodyModel(bm_path=bm_path, num_betas=10, batch_size=60,
                     model_type="smplx")
    normalizer = PoseNormalizer(data_path=stats, normalize=True, min_max=False,
                                rot_rep="axis")
    md = MotionDenoise(sde, score_fn_for(model, params, sde), body, normalizer,
                       batch_size=60)
    kwargs = noise_schedule_kwargs(0.04)
    n_steps = kwargs["iterations"] * kwargs["steps_per_iter"]
    joints = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (F, 60, 22, 3))
    keys = jax.random.split(jax.random.PRNGKey(4), F)
    out = md.optimize_batch(keys, joints, time_strategy="3", **kwargs)
    np.asarray(out)
    t = steady(lambda i: md.optimize_batch(
        jax.random.split(jax.random.PRNGKey(5 + i), F), joints,
        time_strategy="3", **kwargs))
    report(f"motion denoising, {F} fragments vmapped", t, n_steps,
           f"  [= {t / F * 1e3:6.1f} ms/fragment]")
    return t


def bench_smplify_batched(tmp, B=8):
    """run.fitting fast path: B images per jitted SMPLify program."""
    from dposer_tpu.body_model.smplx_fit import SMPLXFit
    from dposer_tpu.data import PoseNormalizer
    from dposer_tpu.tasks.smplify import DPoser, SMPLify

    bm_path, stats = full_size_body(tmp)
    model, params = flagship()
    sde = SubVPSDE(N=500)
    normalizer = PoseNormalizer(data_path=stats, normalize=True, min_max=False,
                                rot_rep="axis")
    smpl = SMPLXFit(bm_path, batch_size=B)
    prior = DPoser(sde, score_fn_for(model, params, sde), normalizer, batch_size=B)
    fitter = SMPLify(smpl, pose_prior=prior, step_size=1e-2, batch_size=B,
                     num_iters=100, focal_length=1500.0, sde_N=500)

    kp = json.load(open("/root/reference/examples/image_00077_keypoints.json"))
    arr = np.asarray(kp["people"][0]["pose_keypoints_2d"], np.float32).reshape(1, 25, 3)
    kpts = np.concatenate([arr, np.zeros((1, 24, 3), np.float32)], axis=1)
    kpts = jnp.asarray(np.tile(kpts, (B, 1, 1)))
    init_pose = jnp.tile(jnp.concatenate([jnp.zeros((1, 3)),
                                          smpl.mean_poses[3:66][None]], axis=1),
                         (B, 1))
    betas = jnp.tile(smpl.mean_shape[None], (B, 1))
    cam_t = jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]]), (B, 1))
    center = jnp.tile(jnp.asarray([[600.0, 400.0]]), (B, 1))

    args_ = (jax.random.PRNGKey(6), init_pose, betas, cam_t, center, kpts)
    out = fitter(*args_)
    np.asarray(out[0])
    t = steady(lambda i: fitter(*args_)[0])
    report(f"SMPLify, {B} images batched", t, 600,
           f"  [= {t / B * 1e3:6.1f} ms/image]")
    return t


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bench_completion()
    if "--skip-torch" not in sys.argv:
        bench_completion_torch_cpu()
    with tempfile.TemporaryDirectory() as tmp:
        bench_motion_denoising(tmp)
        bench_smplify(tmp)
        bench_motion_denoising_batched(tmp)
        bench_smplify_batched(tmp)


if __name__ == "__main__":
    main()
