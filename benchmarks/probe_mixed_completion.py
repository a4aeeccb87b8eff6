"""Localize WHERE the completion path needs score precision.

The quality-vs-NFE table measures all-int8 completion at 215.9 mm MPJPE vs
bf16's 128.1 mm, and the mixed int8-head/bf16-tail rows recover it only
partially (tail-200: 153 mm) — so the precision-sensitive region is not
confined to the final steps. This probe splits the 1000-step imputation
schedule at the midpoint in BOTH orientations (same trained checkpoint,
masks, seeds, eval as `quality_vs_nfe.py`):

    int8[0:500] + bf16[500:1000]   "head int8"
    bf16[0:500] + int8[500:1000]   "head bf16"

If "head bf16" lands near all-int8, the early/mid steps (where the sampler
commits to a pose basin for the masked joints) are where precision pays;
if near bf16, only the tail matters. Either way the serving guidance in
PERFORMANCE.md gets a measured basis.

    python -u benchmarks/probe_mixed_completion.py \
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
    ap.add_argument("--split", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dposer_tpu.body_model.smplx_jax import BodyModel
    from dposer_tpu.data.amass import N_POSES
    from dposer_tpu.ops.metrics import Evaler
    from dposer_tpu.ops.pallas.fused_em import get_pallas_em_hypo_sampler
    from dposer_tpu.ops.pallas.quant import calibrate_act_amax
    from dposer_tpu.utils.generic import import_configs
    from dposer_tpu.utils.masks import create_mask
    from run.common import build_normalizer, load_model_for_inference

    config = import_configs("configs.subvp.amass_scorefc_continuous.get_config")
    model, params, sde, _, _ = load_model_for_inference(config, args.ckpt_path)
    normalizer = build_normalizer(config, args.dataset_folder, args.version)
    D = N_POSES * 3
    EPS = 5e-3
    N = int(sde.N)
    m = args.split

    amax = calibrate_act_amax(sde, model, params, (256, D),
                              jax.random.PRNGKey(999), eps=EPS)

    test = np.load(os.path.join(args.dataset_folder, args.version, "test",
                                "pose_body.npy"))[:args.comp_batch].astype(np.float32)
    poses_n = normalizer.offline_normalize(jnp.asarray(test), from_axis=True)
    mask, obs = create_mask(jax.random.PRNGKey(11), poses_n, part="left_leg")
    body_x = BodyModel(args.smplx_path, model_type="smplx",
                       batch_size=args.comp_batch, num_betas=10)
    evaler = Evaler(body_model=body_x, part="left_leg")

    def seg(lo, hi, quant, denoise):
        kw = dict(quant="int8", act_amax=amax) if quant == "int8" else {}
        return get_pallas_em_hypo_sampler(
            sde, model, params, (args.comp_batch, D), args.comp_hypo,
            eps=EPS, denoise=denoise, rng_mode="kernel",
            step_range=(lo, hi), **kw)

    def run(head_q, tail_q, key):
        head = seg(0, m, head_q, denoise=False)
        tail = seg(m, N, tail_q, denoise=True)
        kh, kt = jax.random.split(key)
        hyp = head(kh, obs, mask)                       # [B, H, D]
        z_rows = jnp.swapaxes(hyp, 0, 1).reshape(-1, D)  # tiled row space
        out = tail(kt, obs, mask, z=z_rows)
        preds = normalizer.offline_denormalize(out, to_axis=True)
        res = evaler.multi_eval_bodys(preds, jnp.asarray(test))
        return float(np.mean(res["mpjpe_body"]))

    key = jax.random.PRNGKey(13)
    for name, hq, tq in (("int8 head / bf16 tail", "int8", "bf16"),
                         ("bf16 head / int8 tail", "bf16", "int8")):
        mpjpe = run(hq, tq, key)
        print(f"completion split@{m}: {name}  MPJPE {mpjpe:.2f} mm",
              flush=True)


if __name__ == "__main__":
    main()
