"""Would per-channel (SmoothQuant-fold) int8 fix the completion path?

The kernel's int8 mode uses per-TENSOR activation scales and is measured
to degrade completion (128 -> 216 mm MPJPE; the mixed-precision probe
shows precision matters through the whole late half). Before wiring
per-channel scales into the kernel, this probe answers whether they
would even help: it runs the exact completion protocol (same masks,
seeds, eval as `quality_vs_nfe.py`) through the XLA twins on CPU —

    fp32                      (quality ceiling; the bf16 kernel tracks it)
    int8 per-tensor twin      (the kernel's current quant math)
    int8 per-channel twin     (smooth_fold alpha=0.5 migration)

all three driving the same tabled imputation-EM loop with identical
noise streams, so the forward's quantization scheme is the ONLY
variable. If per-channel recovers fp32-level MPJPE, wiring it into the
kernel (folding the channel scales into the GN affine + weights) is
worth the complexity; if not, the serving guidance stays "completion
serves bf16" with this as evidence.

    python -u benchmarks/probe_perchannel_completion.py \
        --ckpt-path output/.../best_model
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-path", type=str, required=True)
    ap.add_argument("--dataset-folder", type=str, default="data/AMASS/amass_synth")
    ap.add_argument("--version", type=str, default="version1")
    ap.add_argument("--smplx-path", type=str, default="data/synth_smplx.npz")
    ap.add_argument("--comp-batch", type=int, default=50)
    ap.add_argument("--comp-hypo", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    # twins are plain jnp; CPU keeps the TPU free and is plenty fast here
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from dposer_tpu.body_model.smplx_jax import BodyModel
    from dposer_tpu.data.amass import N_POSES
    from dposer_tpu.diffusion.fast_sampler import (_imputation_tables,
                                                   _labels_for, _pred_tables,
                                                   make_fast_forward,
                                                   precompute_time_tables)
    from dposer_tpu.ops.metrics import Evaler
    from dposer_tpu.ops.pallas.quant import (calibrate_act_amax,
                                             calibrate_act_amax_per_channel,
                                             make_fast_forward_int8)
    from dposer_tpu.utils.generic import import_configs
    from dposer_tpu.utils.masks import create_mask
    from run.common import build_normalizer, load_model_for_inference

    config = import_configs("configs.subvp.amass_scorefc_continuous.get_config")
    model, params, sde, _, _ = load_model_for_inference(config, args.ckpt_path)
    normalizer = build_normalizer(config, args.dataset_folder, args.version)
    D = N_POSES * 3
    EPS = 5e-3
    B, H = args.comp_batch, args.comp_hypo
    rows = B * H

    timesteps = sde.timesteps(EPS)
    labels = _labels_for(sde, timesteps)
    cx, cout, cnoise = _pred_tables(sde, timesteps, "euler_maruyama")
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    if out_scale is not None:
        cout = cout * out_scale
    imput_mc, imput_std = _imputation_tables(sde, timesteps)
    n_steps = int(timesteps.shape[0])

    amax_t = calibrate_act_amax(sde, model, params, (256, D),
                                jax.random.PRNGKey(999), eps=EPS)
    amax_c = calibrate_act_amax_per_channel(sde, model, params, (256, D),
                                            jax.random.PRNGKey(999), eps=EPS)

    fwds = {
        "fp32": make_fast_forward(model, params, tprojs, None),
        "int8 per-tensor": make_fast_forward_int8(model, params, tprojs,
                                                  None, amax_t),
        "int8 per-channel": make_fast_forward_int8(model, params, tprojs,
                                                   None, list(amax_c)),
    }

    test = np.load(os.path.join(args.dataset_folder, args.version, "test",
                                "pose_body.npy"))[:B].astype(np.float32)
    poses_n = normalizer.offline_normalize(jnp.asarray(test), from_axis=True)
    mask1, obs1 = create_mask(jax.random.PRNGKey(11), poses_n, part="left_leg")
    obs = jnp.tile(obs1, (H, 1))
    mask = jnp.tile(mask1, (H, 1))
    body_x = BodyModel(args.smplx_path, model_type="smplx",
                       batch_size=B, num_betas=10)
    evaler = Evaler(body_model=body_x, part="left_leg")

    key = jax.random.PRNGKey(13)
    x0 = sde.prior_sampling(key, (rows, D))

    def run(fwd):
        def body(x, i):
            ki = jax.random.fold_in(key, i)
            # imputation before the predictor (ref sampling.py:410-427)
            zc = jax.random.normal(jax.random.fold_in(ki, 0), x.shape)
            masked = imput_mc[i] * obs + imput_std[i] * zc
            x = x * (1.0 - mask) + masked * mask
            res = fwd(x, i)
            x_mean = cx[i] * x + cout[i] * res
            ze = jax.random.normal(jax.random.fold_in(ki, 1), x.shape)
            x_new = x_mean + cnoise[i] * ze
            zp = jax.random.normal(jax.random.fold_in(ki, 2), x.shape)
            masked = imput_mc[i] * obs + imput_std[i] * zp
            x_new = x_new * (1.0 - mask) + masked * mask
            return x_new, x_mean

        x, means = jax.lax.scan(body, x0, jnp.arange(n_steps))
        out = means[-1]  # denoise=True: the final mean
        hyp = jnp.swapaxes(out.reshape(H, B, D), 0, 1)
        preds = normalizer.offline_denormalize(hyp, to_axis=True)
        res = evaler.multi_eval_bodys(preds, jnp.asarray(test))
        return float(np.mean(res["mpjpe_body"])), \
            float(np.mean(res["mpvpe_all"])) if "mpvpe_all" in res else None

    for name, fwd in fwds.items():
        mpjpe, _ = run(fwd)
        print(f"completion twin [{name:16s}]  MPJPE {mpjpe:.2f} mm",
              flush=True)


if __name__ == "__main__":
    main()
