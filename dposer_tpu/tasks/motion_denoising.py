"""Motion denoising: noisy 3D joints -> clean pose sequence.

Capability parity with ref ``run/motion_denoising.py:63-300``. The per-frame
pose sequence [T, 63] is optimized with Adam against
temporal-vertex-smoothness + joint-data + DPoser-prior losses; the ENTIRE
schedule (iterations x steps_per_iter with iteration-indexed weights) runs
as one ``lax.scan`` with the JAX body model inside the jitted loss — the
reference re-enters a Python body-model forward per step (ref :255).

Faithful details:
- loss weights: ``temp: 10*(1+it)``, ``data: 100/(1+it^2)``,
  ``dposer: 0.1*(1+it)*dposer_weight`` (ref :156-162)
- init pose = 0.01 * randn (ref :74), NOT the noisy joints
- DPoser loss: sum/batch, UNweighted (ref :125-143 default weighted=False)
- final gaussian smoothing (window 3, sigma 2) keeping endpoints (ref :283-285)
- MPJPE/MPVPE vs GT in cm (ref :292-299)
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.sde import SDE
from ..ops.smoothing import gaussian_smoothing
from .prior import DPoserPrior, sample_quan_t


def _safe_norm(d, axis=-1):
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=axis), 1e-12))


class MotionDenoise:
    """Sequence pose optimizer against noisy 3D joints."""

    def __init__(self, sde: SDE, score_fn: Callable, body_model,
                 normalizer, dposer_weight: float = 1.0,
                 batch_size: int = 60, lr: float = 0.03, mesh=None):
        self.sde = sde
        self.mesh = mesh  # fragment-dim GSPMD for optimize_batch (optional)
        self.prior = DPoserPrior(sde, score_fn)
        self.body_model = body_model
        self.normalizer = normalizer
        self.dposer_weight = dposer_weight
        # signature parity only (ref motion_denoising.py takes it); the
        # prior loss scales by the actual fragment length T instead
        self.batch_size = batch_size
        self.lr = lr
        # jitted solvers cached per schedule so a directory/CSV eval over
        # many fragments compiles ONCE (a fresh closure per sequence would
        # retrace the whole 150+-step program every time)
        self._run_cache: Dict[tuple, Callable] = {}

    def _body(self, poses):
        out = self.body_model(pose_body=poses)
        return out.v, out.Jtr

    def _get_run(self, T: int, time_strategy: str, sample_trun: float,
                 sample_time: int, iterations: int, steps_per_iter: int,
                 instrument: bool = False):
        """``instrument=True`` returns ``(smooth_poses, trace)`` where trace
        is a dict of per-step raw and weighted loss terms ([total_steps]
        each) — the diagnostic seam for the protocol (see
        benchmarks/diag_motion_denoising.py)."""
        cache_key = (T, time_strategy, sample_trun, sample_time, iterations,
                     steps_per_iter, instrument)
        if cache_key in self._run_cache:
            return self._run_cache[cache_key]

        total_steps = iterations * steps_per_iter
        timesteps = self.prior.timesteps
        opt = optax.adam(self.lr, b1=0.9, b2=0.999)

        def total_loss(poses, init_joints, k_t, k_z, step, it):
            normed = self.normalizer.offline_normalize(poses, from_axis=True)
            quan_t = sample_quan_t(k_t, step, total_steps, self.sde.N,
                                   time_strategy, sample_trun, sample_time, offset=2)
            t = timesteps[quan_t]
            vec_t = jnp.full((T,), t, poses.dtype)
            dposer = self.prior.loss(k_z, normed, vec_t, weighted=False,
                                     reduction="sum_per_batch", batch_size=T)
            v, jtr = self._body(poses)
            temp = jnp.mean(_safe_norm(v[:-1] - v[1:]))
            data = jnp.mean(_safe_norm(jtr[:, :22] - init_joints))
            # iteration-indexed weights (ref :156-162)
            w_temp = 10.0 * (1.0 + it)
            w_data = 100.0 / (1.0 + it * it)
            w_dposer = 0.1 * (1.0 + it) * self.dposer_weight
            terms = {"temp": temp, "data": data, "dposer": dposer,
                     "w_temp": w_temp * temp, "w_data": w_data * data,
                     "w_dposer": w_dposer * dposer}
            return w_temp * temp + w_data * data + w_dposer * dposer, terms

        @jax.jit
        def run(key, poses0, init_joints):
            opt_state = opt.init(poses0)

            def step(carry, i):
                poses, opt_state = carry
                it = i // steps_per_iter
                k_t, k_z = jax.random.split(jax.random.fold_in(key, i))
                grads, terms = jax.grad(total_loss, has_aux=True)(
                    poses, init_joints, k_t, k_z, i, it)
                updates, opt_state = opt.update(grads, opt_state, poses)
                poses = optax.apply_updates(poses, updates)
                return (poses, opt_state), (terms if instrument else None)

            (poses, _), trace = jax.lax.scan(step, (poses0, opt_state),
                                             jnp.arange(total_steps, dtype=jnp.int32))
            # smoothing for demo consistency; endpoints kept (ref :283-285)
            smooth = gaussian_smoothing(poses, window_size=3, sigma=2.0)
            smooth = smooth.at[0].set(poses[0]).at[-1].set(poses[-1])
            return (smooth, trace) if instrument else smooth

        self._run_cache[cache_key] = run
        return run

    def optimize_batch(self, keys: jax.Array, joints3d: jnp.ndarray,
                       time_strategy: str = "3", sample_trun: float = 2.0,
                       sample_time: int = 990, iterations: int = 5,
                       steps_per_iter: int = 50) -> jnp.ndarray:
        """Denoise F independent fragments at once: ``keys [F]``,
        ``joints3d [F, T, 22, 3]`` -> poses ``[F, T, 63]``, vmapping the
        cached fused solver over the fragment axis (the reference — and
        ``optimize`` — runs fragments sequentially; per-fragment results are
        identical to ``optimize`` for the same key, tested in
        test_tasks.py)."""
        T = joints3d.shape[1]
        run = self._get_run(T, time_strategy, sample_trun, sample_time,
                            iterations, steps_per_iter)
        vkey = ("vmap", T, time_strategy, sample_trun, sample_time,
                iterations, steps_per_iter)
        if vkey not in self._run_cache:
            def one(k, joints):
                k, k_init = jax.random.split(k)
                poses0 = 0.01 * jax.random.normal(k_init, (T, 63))
                return run(k, poses0, jax.lax.stop_gradient(joints))

            batched = jax.vmap(one)
            if self.mesh is not None:
                # fragment axis sharded over the mesh: a directory eval then
                # uses ALL local chips (beyond-reference; constraint-based so
                # the ragged final chunk still runs)
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel.sharding import DATA_AXIS

                mesh = self.mesh

                def constrain(a):
                    spec = P(DATA_AXIS, *([None] * (a.ndim - 1)))
                    return jax.lax.with_sharding_constraint(
                        a, NamedSharding(mesh, spec))

                inner_batched = batched

                def sharded(ks, joints):
                    out = inner_batched(constrain(ks), constrain(joints))
                    return constrain(out)

                batched = sharded
            self._run_cache[vkey] = jax.jit(batched)
        return self._run_cache[vkey](keys, joints3d)

    def optimize(self, key: jax.Array, joints3d: jnp.ndarray,
                 gt_poses: Optional[jnp.ndarray] = None, time_strategy: str = "3",
                 sample_trun: float = 2.0, sample_time: int = 990,
                 iterations: int = 5, steps_per_iter: int = 50,
                 verbose: bool = False,
                 instrument: bool = False) -> Dict[str, np.ndarray]:
        """joints3d: [T, 22, 3] noisy joints; returns metric dict (cm) and
        stores the denoised poses on ``self.last_poses`` (plus the per-step
        loss-term trace on ``self.last_trace`` when ``instrument``)."""
        T = joints3d.shape[0]
        init_joints = jax.lax.stop_gradient(joints3d)

        key, k_init = jax.random.split(key)
        poses0 = 0.01 * jax.random.normal(k_init, (T, 63))

        run = self._get_run(T, time_strategy, sample_trun, sample_time,
                            iterations, steps_per_iter, instrument=instrument)
        poses = run(key, poses0, init_joints)
        if instrument:
            poses, trace = poses
            self.last_trace = {k: np.asarray(v) for k, v in trace.items()}
        self.last_poses = poses

        results: Dict[str, np.ndarray] = {}
        if gt_poses is not None:
            results = self.metrics(poses, joints3d, gt_poses)
            if verbose:
                print("before denoising:{:0.8f} cm".format(results["init_MPJPE"].mean()))
                print("after denoising:{:0.8f} cm".format(results["MPJPE"].mean()))
        return results

    def metrics(self, poses: jnp.ndarray, joints3d: jnp.ndarray,
                gt_poses: jnp.ndarray) -> Dict[str, np.ndarray]:
        """Per-frame init-MPJPE / MPJPE / MPVPE in cm (ref :292-299)."""
        v_gt, j_gt = self._body(gt_poses)
        init_err = _safe_norm(joints3d - j_gt[:, :22]).mean(-1) * 100.0
        v_out, j_out = self._body(poses)
        mpjpe = _safe_norm(j_out[:, :22] - j_gt[:, :22]).mean(-1) * 100.0
        mpvpe = _safe_norm(v_out - v_gt).mean(-1) * 100.0
        return {"init_MPJPE": np.asarray(init_err), "MPJPE": np.asarray(mpjpe),
                "MPVPE": np.asarray(mpvpe)}


def noise_schedule_kwargs(std: float) -> Dict:
    """Per-noise-level optimization schedules (ref :329-336)."""
    if std == 0.02:
        return {"iterations": 3, "steps_per_iter": 40, "sample_trun": 10.0, "sample_time": 495}
    if std == 0.04:
        return {"iterations": 3, "steps_per_iter": 60, "sample_trun": 4.0, "sample_time": 490}
    if std == 0.1:
        return {"iterations": 3, "steps_per_iter": 80, "sample_trun": 3.0, "sample_time": 480}
    raise NotImplementedError(f"no schedule for noise std {std}")
