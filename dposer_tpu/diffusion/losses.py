"""Score-matching losses, optimizer, and the train/eval step.

Capability parity with ref ``lib/algorithms/advanced/losses.py``:

- continuous denoising score matching: ``t ~ U(eps, T)``, perturb through
  ``marginal_prob``, loss ``||score*std + z||^2`` (or likelihood-weighted
  ``g^2 ||score + z/std||^2``), ``reduce_mean`` or 0.5*sum (ref :61-137)
- optional auxiliary body-model loss: multi-step denoise back to x0_hat, run
  gt & estimate through SMPL-X, add SNR-weighted v2v + j2j L2 (ref :239-258)
- legacy discrete SMLD / DDPM losses (ref :140-184)
- Adam with linear LR warmup (5000 steps) and global-norm clip 1.0
  (ref :31-58) via optax
- one fused train step: loss + grad + clip + Adam + EMA in a single jit
  (the reference's step_fn mutates python state across 4 torch calls)
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .ema import EMAState, ema_init, ema_update
from .score_fn import get_score_fn
from .sde import SDE, VESDE, VPSDE, batch_mul


# ---------------------------------------------------------------------------
# Optimizer (ref losses.py:31-58)
# ---------------------------------------------------------------------------

def build_optimizer(config) -> optax.GradientTransformation:
    """Adam + linear warmup + grad clip, mirroring ``optimization_manager``."""
    if config.optim.optimizer != "Adam":
        raise NotImplementedError(f"Optimizer {config.optim.optimizer} not supported yet!")

    def lr_schedule(step):
        lr = config.optim.lr
        warmup = config.optim.warmup
        if warmup > 0:
            return lr * jnp.minimum(step / warmup, 1.0)
        return lr

    chain = []
    if config.optim.grad_clip >= 0:
        chain.append(optax.clip_by_global_norm(config.optim.grad_clip))
    if config.optim.weight_decay:
        # AFTER the clip: torch Adam's weight_decay adds wd*p to the
        # (already externally clipped) gradient inside the step — decaying
        # before the clip would jointly rescale grad+wd*p and weaken both
        # vs the reference (latent: shipped configs use weight_decay=0)
        chain.append(optax.add_decayed_weights(config.optim.weight_decay))
    chain.append(optax.adam(learning_rate=lr_schedule, b1=config.optim.beta1,
                            b2=0.999, eps=config.optim.eps))
    return optax.chain(*chain)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema: EMAState


def init_train_state(config, params) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = build_optimizer(config)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       opt_state=tx.init(params),
                       ema=ema_init(params, decay=config.model.ema_rate))
    return state, tx


# ---------------------------------------------------------------------------
# Continuous SDE loss (ref losses.py:61-137)
# ---------------------------------------------------------------------------

def get_sde_loss_fn(sde: SDE, train: bool, model_apply: Callable,
                    reduce_mean: bool = False, continuous: bool = True,
                    likelihood_weighting: bool = False, eps: float = 1e-5,
                    return_data: bool = False, denoise_steps: int = 5):
    """Returns ``loss_fn(params, key, batch) -> loss`` (or ``(loss, data)``).

    ``model_apply(params, x, labels, key, train)`` evaluates the raw network
    (dropout keyed when training).
    """
    reduce_op = (lambda x: jnp.mean(x, axis=-1)) if reduce_mean \
        else (lambda x: 0.5 * jnp.sum(x, axis=-1))

    def make_score_fn(params, key):
        return get_score_fn(
            sde, lambda x, labels: model_apply(params, x, labels, key, train),
            continuous=continuous)

    def multi_step_denoise(score_fn, x_t, t, t_end, N):
        """Ref losses.py:91-106: DDIM-style multi-step denoise to x0_hat."""
        alpha_grid = jnp.linspace(0.0, 1.0, N + 1)
        score_first = None
        x_current = x_t
        for i in range(N):
            t_current = (1 - alpha_grid[i]) * t + alpha_grid[i] * t_end
            t_before = (1 - alpha_grid[i + 1]) * t + alpha_grid[i + 1] * t_end
            a_cur, s_cur = sde.return_alpha_sigma(t_current)
            a_bef, s_bef = sde.return_alpha_sigma(t_before)
            score = score_fn(x_current, t_current)
            if i == 0:
                score_first = score
            noise_pred = -score * s_cur[:, None]
            x_current = (a_bef / a_cur) * (x_current - s_cur[:, None] * noise_pred) \
                + s_bef[:, None] * noise_pred
        return score_first, x_current

    def loss_fn(params, key, batch):
        k_t, k_z, k_model = jax.random.split(key, 3)
        t = jax.random.uniform(k_t, (batch.shape[0],), batch.dtype,
                               minval=eps, maxval=sde.T)
        z = jax.random.normal(k_z, batch.shape, batch.dtype)
        mean, std = sde.marginal_prob(batch, t)
        perturbed = mean + batch_mul(std, z)

        score_fn = make_score_fn(params, k_model)
        if return_data:
            alpha, sigma = sde.return_alpha_sigma(t)
            snr = alpha / sigma[:, None]
            score, estimated = multi_step_denoise(
                score_fn, perturbed, t, t_end=t / (2 * denoise_steps), N=denoise_steps)
        else:
            score = score_fn(perturbed, t)

        if not likelihood_weighting:
            losses = jnp.square(batch_mul(std, score) + z)
            losses = reduce_op(losses.reshape(losses.shape[0], -1))
        else:
            g2 = sde.sde(jnp.zeros_like(batch), t)[1] ** 2
            losses = jnp.square(score + batch_mul(1.0 / std, z))
            losses = reduce_op(losses.reshape(losses.shape[0], -1)) * g2

        loss = jnp.mean(losses)
        if return_data:
            return loss, {"clean_sample": estimated, "SNR": snr, "t": t}
        return loss

    return loss_fn


# ---------------------------------------------------------------------------
# Legacy discrete losses (ref losses.py:140-184)
# ---------------------------------------------------------------------------

def get_smld_loss_fn(vesde: VESDE, train: bool, model_apply: Callable,
                     reduce_mean: bool = False):
    assert isinstance(vesde, VESDE), "SMLD training only works for VESDEs."
    reduce_op = (lambda x: jnp.mean(x, axis=-1)) if reduce_mean \
        else (lambda x: 0.5 * jnp.sum(x, axis=-1))
    smld_sigmas = vesde.discrete_sigmas()[::-1]  # descending

    def loss_fn(params, key, batch):
        k_l, k_z, k_m = jax.random.split(key, 3)
        labels = jax.random.randint(k_l, (batch.shape[0],), 0, vesde.N)
        sigmas = smld_sigmas[labels]
        noise = batch_mul(sigmas, jax.random.normal(k_z, batch.shape, batch.dtype))
        perturbed = noise + batch
        score = model_apply(params, perturbed, labels, k_m, train)
        target = -batch_mul(1.0 / sigmas ** 2, noise)
        losses = jnp.square(score - target)
        losses = reduce_op(losses.reshape(losses.shape[0], -1)) * sigmas ** 2
        return jnp.mean(losses)

    return loss_fn


def get_ddpm_loss_fn(vpsde: VPSDE, train: bool, model_apply: Callable,
                     reduce_mean: bool = True):
    assert isinstance(vpsde, VPSDE), "DDPM training only works for VPSDEs."
    reduce_op = (lambda x: jnp.mean(x, axis=-1)) if reduce_mean \
        else (lambda x: 0.5 * jnp.sum(x, axis=-1))
    alphas_cumprod = jnp.cumprod(vpsde.alphas())
    sqrt_ac = jnp.sqrt(alphas_cumprod)
    sqrt_1m_ac = jnp.sqrt(1.0 - alphas_cumprod)

    def loss_fn(params, key, batch):
        k_l, k_z, k_m = jax.random.split(key, 3)
        labels = jax.random.randint(k_l, (batch.shape[0],), 0, vpsde.N)
        noise = jax.random.normal(k_z, batch.shape, batch.dtype)
        perturbed = batch_mul(sqrt_ac[labels], batch) + batch_mul(sqrt_1m_ac[labels], noise)
        score = model_apply(params, perturbed, labels, k_m, train)
        losses = jnp.square(score - noise)
        losses = reduce_op(losses.reshape(losses.shape[0], -1))
        return jnp.mean(losses)

    return loss_fn


# ---------------------------------------------------------------------------
# Train / eval step (ref losses.py:187-275)
# ---------------------------------------------------------------------------

def get_step_fn(sde: SDE, train: bool, model_apply: Callable,
                tx: Optional[optax.GradientTransformation] = None,
                reduce_mean: bool = False, continuous: bool = True,
                likelihood_weighting: bool = False, auxiliary_loss: bool = False,
                denormalize: Optional[Callable] = None,
                body_model_fn: Optional[Callable] = None,
                rot_rep: str = "rot6d", denoise_steps: int = 5,
                rot6d_to_axis: Optional[Callable] = None):
    """Build a fused one-step train/eval function.

    ``step_fn(state, key, batch) -> (state, loss_dict)``; with
    ``auxiliary_loss`` the (slow) body-model v2v/j2j terms are added
    (ref losses.py:239-258). ``body_model_fn(pose_axis [B, 63]) ->
    (v [B,V,3], Jtr [B,J,3])`` must be jit-compatible (the JAX SMPL-X is).
    """
    if continuous:
        loss_fn = get_sde_loss_fn(sde, train, model_apply, reduce_mean=reduce_mean,
                                  continuous=True, likelihood_weighting=likelihood_weighting,
                                  return_data=auxiliary_loss, denoise_steps=denoise_steps)
    else:
        assert not likelihood_weighting, \
            "Likelihood weighting is not supported for original SMLD/DDPM training."
        if isinstance(sde, VESDE):
            loss_fn = get_smld_loss_fn(sde, train, model_apply, reduce_mean=reduce_mean)
        elif isinstance(sde, VPSDE):
            loss_fn = get_ddpm_loss_fn(sde, train, model_apply, reduce_mean=reduce_mean)
        else:
            raise ValueError(f"Discrete training for {type(sde).__name__} is not recommended.")
    if auxiliary_loss:
        assert denormalize is not None and body_model_fn is not None

    def full_loss(params, key, batch):
        if not auxiliary_loss:
            loss = loss_fn(params, key, batch)
            return loss, {"step_loss": loss, "score_loss": loss}
        score_loss, data = loss_fn(params, key, batch)
        weight = jnp.log(1.0 + data["SNR"])  # [B, 1]
        estimate = denormalize(data["clean_sample"])
        gt = denormalize(batch)
        if rot_rep == "rot6d":
            n = estimate.shape[0]
            estimate = rot6d_to_axis(estimate.reshape(-1, 6)).reshape(n, -1)
            gt = rot6d_to_axis(gt.reshape(-1, 6)).reshape(n, -1)
        gt_v, gt_j = body_model_fn(gt)
        pred_v, pred_j = body_model_fn(estimate)
        loss_v2v = jnp.mean(weight * jnp.square(gt_v - pred_v).sum(-1))
        loss_j2j = jnp.mean(weight * jnp.square(gt_j - pred_j).sum(-1))
        loss = score_loss + loss_v2v + loss_j2j
        return loss, {"step_loss": loss, "score_loss": score_loss,
                      "v2v_loss": loss_v2v, "j2j_loss": loss_j2j}

    if train:
        assert tx is not None, "train step needs the optimizer transformation"

        def step_fn(state: TrainState, key, batch):
            (_, loss_dict), grads = jax.value_and_grad(full_loss, has_aux=True)(
                state.params, key, batch)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = ema_update(state.ema, params)
            new_state = state.replace(step=state.step + 1, params=params,
                                      opt_state=opt_state, ema=ema)
            return new_state, loss_dict
    else:

        def step_fn(state: TrainState, key, batch):
            # eval under EMA params (ref losses.py:265-271 store/copy/restore)
            _, loss_dict = full_loss(state.ema.shadow_params, key, batch)
            return state, loss_dict

    return step_fn


def multi_step(step_fn):
    """Scan ``K`` training steps in ONE dispatch (TPU-native amortization).

    ``fn(state, key, batches [K, B, D]) -> (state, loss_dict of [K])``.
    Each substep consumes ``fold_in(key, state.step)`` — the key is a pure
    function of the GLOBAL step index, so with a fixed ``key`` the noise
    stream is invariant to the dispatch factor K (one K-step dispatch ==
    K single-step dispatches == the reference's per-step loop) and
    deterministic across preemption/resume. Only the per-step host->device
    dispatch (~25 ms RPC latency on a tunneled chip, us-level when
    directly attached) is amortized.
    The reference dispatches per step from Python (ref train.py:245-247).

    Train step fns only: an eval-mode ``step_fn`` (train=False) does not
    advance ``state.step``, so every substep would draw the same key.
    """
    import jax

    def fn(state, key, batches):
        def body(carry, batch):
            k = jax.random.fold_in(key, carry.step)
            new_state, loss_dict = step_fn(carry, k, batch)
            return new_state, loss_dict

        return jax.lax.scan(body, state, batches)

    return fn


def multi_step_indexed(step_fn):
    """:func:`multi_step` over DEVICE-RESIDENT data: the scan consumes
    ``[K, B]`` int32 row indices and gathers each substep's batch from
    ``data`` ([N, D], already on the mesh) inside the program.

    TPU-native data path: the host ships 4 bytes/row instead of the row
    itself (63-256x less host->device traffic per dispatch — the reference
    re-uploads every batch, and at 400k x 1280 steps that is ~129 GB for a
    250 MB dataset). Gathered values are bit-identical to the host stream
    (``AMASSDataset.train_index_batches`` yields the same permutation).

    ``data`` is an explicit argument of the returned ``fn`` — closing over
    the dataset bakes it into the XLA program as a literal (a 252 MB
    dataset made a 942 MB serialized executable and a ~100 MB HLO text to
    hash/compile per launch; passing it as a buffer argument is free).
    """
    import jax

    def fn(state, key, idx, data):
        def body(carry, rows):
            k = jax.random.fold_in(key, carry.step)
            return step_fn(carry, k, data[rows])

        return jax.lax.scan(body, state, idx)

    return fn
