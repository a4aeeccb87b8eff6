"""Shared CLI plumbing: model/checkpoint/sde construction from a config."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dposer_tpu import N_POSES
from dposer_tpu.data import PoseNormalizer
from dposer_tpu.diffusion.score_fn import get_score_fn
from dposer_tpu.diffusion.sde import build_sde, sampling_eps_for
from dposer_tpu.models import create_score_model
from dposer_tpu.utils.checkpoint import load_params_for_inference


# Kernel-unavailability classes the Pallas-vs-XLA routing treats as a clean
# fallback: the fused kernels REFUSE configurations outside their scope with
# ValueError (e.g. the langevin whole-batch VMEM budget guard,
# ops/pallas/fused_em.py:350-379) or NotImplementedError (unsupported
# corrector/predictor). Anything else — a Mosaic lowering failure, an XLA
# runtime error — is a genuine bug and must propagate, not silently demote
# a protocol to the XLA path (VERDICT r4 item 5). Pinned by
# tests/test_pallas_pc_paths.py::test_vmem_refusal_is_a_clean_fallback.
KERNEL_FALLBACK_ERRORS = (ValueError, NotImplementedError)


def pose_dim(config) -> int:
    return 3 if config.data.rot_rep == "axis" else 6


def load_model_for_inference(config, ckpt_path: str, sde_N: int | None = None):
    """(model, params, sde, eps, score_fn): EMA-averaged eval model from a
    checkpoint (torch .pth or orbax dir), mirroring ref run/demo.py:88-118."""
    model = create_score_model(config, n_poses=N_POSES)
    params, step = load_params_for_inference(
        ckpt_path, n_blocks=config.model.N_BLOCKS,
        embedding_type=config.model.embedding_type)
    print(f"=> loaded checkpoint '{ckpt_path}' (step {step})")
    sde = build_sde(config, N=sde_N)
    eps = sampling_eps_for(sde)
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t),
                            continuous=config.training.continuous)
    return model, params, sde, eps, score_fn


def build_normalizer(config, dataset_folder: str, version: str) -> PoseNormalizer:
    return PoseNormalizer(
        data_path=os.path.join(dataset_folder, version, "train"),
        normalize=config.data.normalize, min_max=config.data.min_max,
        rot_rep=config.data.rot_rep)
