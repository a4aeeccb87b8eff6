"""DPoser-TPU: a TPU-native diffusion pose-prior framework.

Rebuilds the capabilities of DPoser (arXiv 2312.05541; reference implementation
in PyTorch) as an idiomatic JAX/XLA stack:

- ``dposer_tpu.diffusion``: VP/subVP/VE SDEs, score-model adapter, fused
  ``lax.scan`` predictor-corrector samplers, likelihood ODE, losses, EMA.
- ``dposer_tpu.models``: the ScoreModelFC score network (flax.linen).
- ``dposer_tpu.body_model``: pure-JAX SMPL/SMPL-X (blendshapes + LBS) and
  keypoint-fitting losses.
- ``dposer_tpu.tasks``: test-time optimization engines (completion, motion
  denoising, SMPLify-style mesh recovery) as jitted optimizer scans.
- ``dposer_tpu.data``: AMASS dataset, pose normalizers, eval helpers.
- ``dposer_tpu.parallel``: device-mesh sharding utilities for data-parallel
  training and sharded evaluation.
- ``dposer_tpu.ops``: rotation transforms, smoothing, metrics, Pallas kernels.
"""

__version__ = "0.1.0"

N_POSES = 21  # SMPL-X body joints modelled by the pose prior (ref lib/dataset/AMASS.py:9)

# Opt-in backend override: some TPU plugins (axon) ignore JAX_PLATFORMS, so
# DPOSER_PLATFORM=cpu forces the backend before first device use.
import os as _os

if _os.environ.get("DPOSER_PLATFORM"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["DPOSER_PLATFORM"])
    except Exception:
        pass

from . import parallel  # noqa: E402,F401  (re-export for dposer_tpu.parallel)
