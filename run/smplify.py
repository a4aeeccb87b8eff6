"""SMPLify library shim: the engines live in ``dposer_tpu.tasks.smplify``
(the reference keeps them under ``run/smplify.py``; this module preserves the
import path ``from run.smplify import SMPLify, DPoser``)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dposer_tpu.tasks.smplify import DPoser, SMPLify  # noqa: F401  (re-export)


def build_dposer_prior(args, batch_size: int = 1):
    """Construct the DPoser prior from CLI-style args (config-path, ckpt-path,
    sde-N, dataset-folder, version), mirroring ref run/smplify.py:17-67."""
    from dposer_tpu.utils.generic import import_configs

    from .common import build_normalizer, load_model_for_inference

    config = import_configs(args.config_path)
    model, params, sde, eps, score_fn = load_model_for_inference(
        config, args.ckpt_path, sde_N=args.sde_N)
    normalizer = build_normalizer(config, args.dataset_folder, args.version)
    return DPoser(sde, score_fn, normalizer, batch_size=batch_size)
