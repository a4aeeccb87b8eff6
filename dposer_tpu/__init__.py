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

# Persistent XLA compilation cache, on by default: every fresh CLI process
# otherwise re-pays the full compile of each program it touches — minutes
# per program on tunneled TPU hosts. Cached executables load in seconds
# (measured 64 s cold -> 3.9 s cached for the flagship K=64 multi-step
# train program; see PERFORMANCE.md). DPOSER_COMPILATION_CACHE=off
# disables; any other value overrides the default ~/.cache/dposer_tpu/jax
# directory. DPOSER_CACHE_MIN_COMPILE_SECS overrides the persistence
# threshold (default 0: persist everything — tunneled TPU plugins report
# PURE compile seconds, excluding the minutes of RPC wait that make a
# recompile expensive, so jax's usual >=5 s heuristic silently skips
# exactly the small programs that cost the most wall clock to rebuild;
# measured: a batch-8 flagship forward reported <5 s, recompiled at
# 353 s of tunnel wall per fresh process until persisted).
def _backfill_cache_atimes(cache_dir):
    """Stamp missing ``*-atime`` sidecars so LRU eviction can't poison writes.

    jax's ``LRUCache`` (active when ``jax_compilation_cache_max_size`` is set)
    scans every existing ``*-cache`` entry on each put and reads its
    ``*-atime`` sidecar; an entry written before the size cap was configured
    has no sidecar, so the read raises FileNotFoundError and the put is
    dropped — every NEW program silently stops being persisted. Backfill the
    sidecars with each entry's mtime so eviction order stays honest.
    """
    import pathlib

    d = pathlib.Path(cache_dir)
    if not d.is_dir():
        return
    for f in d.glob("*-cache"):
        sidecar = f.with_name(f.name[: -len("-cache")] + "-atime")
        if not sidecar.exists():
            ns = int(f.stat().st_mtime * 1e9)
            sidecar.write_bytes(ns.to_bytes(8, "little"))


_cache_dir = _os.environ.get("DPOSER_COMPILATION_CACHE")
if _cache_dir not in ("off", "0", ""):
    import jax as _jax

    # Parse outside the broad try: a malformed value must not abort AFTER
    # jax_compilation_cache_dir is set, which would silently skip the 4 GB
    # size cap and leave the cache enabled but unbounded.
    try:
        _min_compile_secs = float(
            _os.environ.get("DPOSER_CACHE_MIN_COMPILE_SECS", "0"))
    except ValueError:
        import warnings as _warnings
        _warnings.warn(
            "DPOSER_CACHE_MIN_COMPILE_SECS is not a number; using 0")
        _min_compile_secs = 0.0

    try:
        _cache_path = _cache_dir or _os.path.join(
            _os.path.expanduser("~"), ".cache", "dposer_tpu", "jax")
        _jax.config.update("jax_compilation_cache_dir", _cache_path)
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", _min_compile_secs)
        # kernel-sampler executables embed their coefficient tables and run
        # ~100 MB each — cap the directory with LRU eviction
        _jax.config.update("jax_compilation_cache_max_size", 4 << 30)
        _backfill_cache_atimes(_cache_path)
    except Exception:  # old jax without the option, or read-only home
        pass

from . import parallel  # noqa: E402,F401  (re-export for dposer_tpu.parallel)
