"""Device-mesh sharding utilities (data-parallel training & sharded eval).

TPU-native replacement for the reference's parallelism (SURVEY §2.7):

- the vestigial ``torch.nn.DataParallel`` (ref lib/algorithms/advanced/
  utils.py:91) and the gloo multi-process eval (ref run/completion.py:83-88,
  300-321) both collapse into GSPMD: one program, a ``jax.sharding.Mesh``
  over all chips, batch-dim ``NamedSharding``; XLA inserts the gradient
  psums / result all-gathers over ICI automatically.
- multi-host extends the same code via ``jax.distributed.initialize`` — no
  NCCL/gloo analog needed.

Everything here is topology-agnostic: tested on a virtual 8-device CPU mesh,
runs unchanged on a TPU slice.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = (DATA_AXIS,),
              shape: Optional[Sequence[int]] = None, local: bool = False) -> Mesh:
    """A 1-D (default) or reshaped mesh over the first ``n_devices`` devices.

    ``local=True`` restricts the mesh to this process's devices — the right
    topology for multi-host *eval*, where each process owns a disjoint slice
    of the test set (via ``shard_eval_batches``) and parallelizes its own
    batches over its own chips, mirroring the reference's process-per-GPU
    split (ref run/completion.py:326-338). Training uses the default global
    mesh instead (one data-parallel program over all hosts).
    """
    all_devs = jax.local_devices() if local else jax.devices()
    if n_devices is not None and not 0 < n_devices <= len(all_devs):
        raise ValueError(f"n_devices={n_devices} out of range for "
                         f"{len(all_devs)} available device(s)")
    devs = all_devs[: (n_devices if n_devices is not None else len(all_devs))]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch) -> jax.Array:
    """Place a host batch onto the mesh, split along dim 0.

    Works for process-local meshes and for single-process global meshes.
    For a global mesh spanning several processes use
    ``shard_global_batch`` (each host contributes its slice).
    """
    return jax.device_put(batch, batch_sharding(mesh))


def _shard_global(mesh: Mesh, arr, batch_axis: int) -> jax.Array:
    """Shared body of :func:`shard_global_batch` (batch_axis=0) and
    :func:`shard_global_multi_batch` (batch_axis=1): every process passes
    the SAME full logical array; each host keeps its slice along
    ``batch_axis`` and the result is one global array sharded there."""
    spec = P(*([None] * batch_axis + [DATA_AXIS]))
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sh)
    from jax.experimental import multihost_utils

    pc = jax.process_count()
    n = arr.shape[batch_axis]
    if n % pc:
        raise ValueError(f"global batch {n} must be divisible by {pc} processes")
    per = n // pc
    sl = [slice(None)] * np.ndim(arr)
    sl[batch_axis] = slice(jax.process_index() * per,
                           (jax.process_index() + 1) * per)
    return multihost_utils.host_local_array_to_global_array(
        np.asarray(arr)[tuple(sl)], mesh, spec)


def shard_global_batch(mesh: Mesh, batch) -> jax.Array:
    """Assemble a globally-sharded batch on a (possibly multi-host) mesh.

    Every process passes the SAME full logical batch (e.g. drawn from an
    identically-seeded stream); each host keeps only its slice and the
    result is one global array sharded along dim 0 — the multi-host form of
    ``shard_batch``. Single-process: identical to ``shard_batch``.
    """
    return _shard_global(mesh, batch, 0)


def data_parallel_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """Compile ``step_fn(state, key, batch) -> (state, aux)`` data-parallel.

    State & key replicated, batch sharded along dim 0; XLA handles the
    cross-chip gradient reduction. The mesh size must divide the batch size.
    """
    repl = replicate(mesh)
    return jax.jit(step_fn,
                   in_shardings=(repl, repl, batch_sharding(mesh)),
                   out_shardings=(repl, repl))


def shard_global_multi_batch(mesh: Mesh, batches) -> jax.Array:
    """Place ``[K, B, ...]`` step-stacked batches with dim 1 batch-sharded
    (multi-host form mirrors :func:`shard_global_batch`)."""
    return _shard_global(mesh, batches, 1)


def data_parallel_multi_step(multi_step_fn: Callable, mesh: Mesh) -> Callable:
    """Like :func:`data_parallel_step` for a K-step scan:
    ``fn(state, key, batches [K, B, D])`` with dim 1 batch-sharded."""
    repl = replicate(mesh)
    return jax.jit(multi_step_fn,
                   in_shardings=(repl, repl, NamedSharding(mesh, P(None, DATA_AXIS))),
                   out_shardings=(repl, repl))


def data_parallel_multi_step_indexed(multi_step_fn: Callable, mesh: Mesh) -> Callable:
    """Device-resident-data variant: ``fn(state, key, idx [K, B], data [N, D])``
    with the batch dim of the int32 index array sharded and the dataset a
    replicated device-array ARGUMENT (closing over it would bake it into
    the executable as a literal — see ``losses.multi_step_indexed``).
    Index staging reuses :func:`shard_global_multi_batch` (it is
    shape-agnostic over trailing dims)."""
    repl = replicate(mesh)
    return jax.jit(multi_step_fn,
                   in_shardings=(repl, repl,
                                 NamedSharding(mesh, P(None, DATA_AXIS)), repl),
                   out_shardings=(repl, repl))


def data_parallel_sampler(sampler: Callable, mesh: Mesh) -> Callable:
    """Compile a built sampler data-parallel over the mesh (jitted ONCE).

    ``sampler(key, observation=None, mask=None, z=None) -> (trajs|None, x)``
    (the ``get_pc_sampler`` contract). Array inputs and the sample output
    ``x [B, D]`` (plus the trajectory's batch axis, when collected) are
    constrained to batch sharding, so GSPMD partitions the whole reverse
    loop along the batch dim — the TPU-native replacement for the
    reference's process-per-GPU eval (ref run/completion.py:326-338).

    Uses ``with_sharding_constraint`` (not ``in_shardings``) so batch sizes
    that do not divide the mesh still run (GSPMD pads internally).
    One jitted body serves this and the param-threaded variant:
    delegates to :func:`data_parallel_sampler_params` with the params slot
    empty.
    """
    import functools

    run_p = data_parallel_sampler_params(lambda _params: sampler, mesh)
    return functools.partial(run_p, None)


def multi_hypothesis_imputation_sampler(sampler: Callable, mesh: Mesh) -> Callable:
    """Hypotheses via vmap + batch data-parallel over the mesh, jitted once.

    ``run(keys [H], observation [B, D], mask [B, D]) -> [B, H, D]`` for an
    imputation sampler with the ``get_pc_sampler`` contract — replaces the
    reference's sequential hypothesis loop (ref run/demo.py:359-362,
    run/train.py:289-292). Shared by run.demo completion2 and run.train eval.
    Delegates to :func:`multi_hypothesis_imputation_sampler_params` with the
    params slot empty (one jitted body for both).
    """
    import functools

    run_p = multi_hypothesis_imputation_sampler_params(
        lambda _params: sampler, mesh)
    return functools.partial(run_p, None)


def data_parallel_sampler_params(sampler_factory: Callable, mesh: Mesh) -> Callable:
    """Param-threaded variant of :func:`data_parallel_sampler`, jitted ONCE.

    ``sampler_factory(params) -> sampler`` is invoked inside the jitted
    program, and ``run(params, key, ...)`` takes the score-net params as an
    explicit (replicated) argument — so a caller whose params *change value*
    every call (run.train's EMA-swapped eval, ref train.py:275-312) reuses
    one compiled 1000-step scan instead of retracing it per eval firing.
    """
    bshard = batch_sharding(mesh)
    tshard = NamedSharding(mesh, P(None, DATA_AXIS))

    @jax.jit
    def run(params, key, observation=None, mask=None, z=None):
        kwargs = {}
        if observation is not None:
            kwargs["observation"] = jax.lax.with_sharding_constraint(observation, bshard)
        if mask is not None:
            kwargs["mask"] = jax.lax.with_sharding_constraint(mask, bshard)
        if z is not None:
            kwargs["z"] = jax.lax.with_sharding_constraint(z, bshard)
        trajs, x = sampler_factory(params)(key, **kwargs)
        x = jax.lax.with_sharding_constraint(x, bshard)
        if trajs is not None and getattr(trajs, "ndim", 0) >= 2:
            trajs = jax.lax.with_sharding_constraint(trajs, tshard)
        return trajs, x

    return run


def multi_hypothesis_imputation_sampler_params(sampler_factory: Callable,
                                               mesh: Mesh) -> Callable:
    """Param-threaded variant of :func:`multi_hypothesis_imputation_sampler`:
    ``run(params, keys [H], observation [B, D], mask [B, D]) -> [B, H, D]``,
    jitted once across EMA updates (see
    :func:`data_parallel_sampler_params`)."""
    import jax.numpy as jnp

    bshard = batch_sharding(mesh)

    @jax.jit
    def run(params, keys, observation, mask):
        observation = jax.lax.with_sharding_constraint(observation, bshard)
        mask = jax.lax.with_sharding_constraint(mask, bshard)
        sampler = sampler_factory(params)
        outs = jax.vmap(
            lambda k: sampler(k, observation=observation, mask=mask)[1])(keys)
        return jnp.swapaxes(outs, 0, 1)  # [B, H, D]

    return run


def pad_batch_to_multiple(batch: np.ndarray, multiple: int):
    """Pad dim 0 up to a multiple (repeating the last row) -> (padded, n).

    Entry points pad eval batches so explicit ``in_shardings`` (which require
    divisibility, unlike constraint-based sharding) always apply; per-sample
    results are trimmed back to ``n`` afterwards.
    """
    n = batch.shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, n
    pad = np.repeat(np.asarray(batch)[-1:], multiple - rem, axis=0)
    return np.concatenate([np.asarray(batch), pad], axis=0), n


def allgather_ragged_1d(arr: np.ndarray) -> np.ndarray:
    """Gather variable-length per-process 1-D host arrays (all processes).

    ``multihost_utils.process_allgather`` requires equal shapes across
    processes, but eval shards are ragged whenever the batch count does not
    divide the process count (``shard_eval_batches`` pads nothing, matching
    ref lib/dataset/EvaSampler.py:88-111). Gather the true lengths first,
    pad to the global max, gather, then trim per process.
    """
    from jax.experimental import multihost_utils

    arr = np.asarray(arr)
    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([arr.shape[0]], np.int32))).reshape(-1)
    m = int(counts.max())
    padded = np.zeros((max(m, 1),), arr.dtype)
    padded[:arr.shape[0]] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(counts), -1)
    return np.concatenate([gathered[i, :counts[i]] for i in range(len(counts))])


def shard_eval_batches(dataset_len: int, batch_size: int,
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None) -> range:
    """Contiguous per-process shard of batch indices for multi-host eval.

    Single-program replacement for ``DistributedEvalSampler``
    (ref lib/dataset/EvaSampler.py:88-111): contiguous shards, no padding.
    Within one host, all devices cooperate on each batch via batch sharding,
    so only multi-host (process) sharding needs an explicit split.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n_batches = dataset_len // batch_size
    if dataset_len % batch_size and pi == 0:
        # reference-faithful (its DataLoader also sets drop_last=True,
        # ref run/completion.py:78) but say so instead of dropping silently
        print(f"[shard_eval_batches] dropping the final "
              f"{dataset_len % batch_size} of {dataset_len} samples "
              f"(drop_last batching, batch_size={batch_size})")
    per = n_batches // pc
    extra = n_batches % pc
    start = pi * per + min(pi, extra)
    stop = start + per + (1 if pi < extra else 0)
    return range(start, stop)
