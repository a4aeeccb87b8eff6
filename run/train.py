"""Training CLI (ref ``run/train.py``): score-matching training with periodic
evaluation (bpd, completion MPVPE/MPJPE, generation APD), checkpointing, and
best-by-APD model selection.

TPU-native: the fused train step is jitted data-parallel over all local
devices; eval metrics run through the jitted likelihood/sampler paths.
Resume loads the newest ``checkpoint-step*`` (the reference hardcodes
step55000, ref train.py:183).

    python -m run.train --config configs/subvp/amass_scorefc_continuous.py \
        --dataset-folder ... --version version1 [--bodymodel-path ...]
"""
import glob
import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags
from absl.flags import argparse_flags
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS
config_flags.DEFINE_config_file(
    "config", None, "Training configuration.", lock_config=False)
flags.mark_flags_as_required(["config"])


def parse_args(argv):
    parser = argparse_flags.ArgumentParser(description="train diffusion model")
    parser.add_argument("--dataset-folder", type=str,
                        default="./data/AMASS/amass_processed")
    parser.add_argument("--version", type=str, default="version1")
    parser.add_argument("--bodymodel-path", type=str,
                        default="../body_models/smplx/SMPLX_NEUTRAL.npz",
                        help="path of SMPLX model [for visual validation]")
    parser.add_argument("--restore-dir", type=str, help="resume training")
    parser.add_argument("--shape", type=bool, default=False)
    parser.add_argument("--sample", type=int, help="sample trainset to reduce data")
    parser.add_argument("--task", type=str, default=None)
    parser.add_argument("--name", type=str, default="")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed for multi-host TPU "
                             "slices (coordinator auto-detected on TPU pods; "
                             "elsewhere set --coordinator/--num-processes/"
                             "--process-id)")
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a device trace of steps 10-20 into this "
                             "directory (TensorBoard profile plugin; new "
                             "capability — the reference has no profiling)")
    parser.add_argument("--host-data", action="store_true",
                        help="force per-dispatch batch uploads instead of "
                             "the HBM-resident dataset + index-window path "
                             "(auto-selected when the train tensor fits)")
    parser.add_argument("--train-kernel", choices=("auto", "on", "off"),
                        default="off",
                        help="route the train step through the fused Pallas "
                             "fwd+bwd kernel (ops/pallas/fused_train.py). "
                             "Measured at PARITY with the XLA step on v5e "
                             "(1.134 vs 1.131 ms/step - see PERFORMANCE.md), "
                             "so the XLA step stays the default; the kernel "
                             "is kept for configs/hardware where the balance "
                             "differs. auto: use it on a single-device TPU "
                             "mesh when the config is in kernel scope "
                             "(continuous VP/subVP DSM, no auxiliary loss, "
                             "positional embeddings, hidden%%128==0), else "
                             "fall back; on: require it; off: never")
    parser.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="train steps scanned per device dispatch "
                             "(amortizes the ~25 ms per-dispatch RPC overhead "
                             "of tunneled chips; 256 reached 4%% off the "
                             "pure-device step floor — see PERFORMANCE.md. "
                             "Any value works: eval/save fire when a dispatch "
                             "crosses a freq multiple, and a final partial "
                             "window runs step-by-step. The training stream "
                             "is invariant to K: per-step keys fold the "
                             "global step index and one index stream feeds "
                             "both dispatch modes)")
    return parser.parse_args(argv[1:])


def main(args):
    import signal

    import jax
    import jax.numpy as jnp

    if args.multihost:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    from dposer_tpu import N_POSES, parallel as par
    from dposer_tpu.body_model.smplx_jax import BodyModel
    from dposer_tpu.data import AMASSDataset
    from dposer_tpu.diffusion import losses as losses_lib
    from dposer_tpu.diffusion import sampling as sampling_lib
    from dposer_tpu.diffusion.likelihood import get_likelihood_fn
    from dposer_tpu.diffusion.score_fn import get_score_fn
    from dposer_tpu.diffusion.sde import build_sde, sampling_eps_for
    from dposer_tpu.models import create_score_model
    from dposer_tpu.models.score_mlp import make_model_apply
    from dposer_tpu.ops.metrics import Evaler, average_pairwise_distance
    from dposer_tpu.ops.rotations import rot6d_to_axis_angle
    from dposer_tpu.utils import checkpoint as ckpt_lib
    from dposer_tpu.utils.generic import MetricWriter, create_logger
    from dposer_tpu.utils.masks import create_mask
    from dposer_tpu.utils.profiling import StepTimer

    config = FLAGS.config
    key = jax.random.PRNGKey(args.seed)

    logger, final_output_dir = create_logger(
        config.OUTPUT_DIR, config.DATASET.TRAIN_DATASET,
        config.DATASET.TEST_DATASET, "train", name=args.name)
    logger.info(pprint.pformat(config))
    logger.info(pprint.pformat(args))
    writer = MetricWriter(os.path.join(final_output_dir, "tb"))

    # body model for validation metrics (optional: skipped when unavailable)
    body_model_vis = None
    if args.bodymodel_path and os.path.exists(args.bodymodel_path):
        body_model_vis = BodyModel(bm_path=args.bodymodel_path, num_betas=10,
                                   batch_size=50, model_type="smplx")
    else:
        logger.info("body model unavailable -> completion/APD eval disabled")

    # datasets
    train_dataset = AMASSDataset(args.dataset_folder, version=args.version,
                                 subset="train", sample_interval=args.sample,
                                 rot_rep=config.data.rot_rep, return_shape=args.shape,
                                 normalize=config.data.normalize,
                                 min_max=config.data.min_max)
    test_dataset = AMASSDataset(args.dataset_folder, version=args.version,
                                subset="test", sample_interval=100,
                                rot_rep=config.data.rot_rep, return_shape=args.shape,
                                normalize=config.data.normalize,
                                min_max=config.data.min_max)
    denormalize = train_dataset.Denormalize if config.data.normalize else (lambda x: x)
    logger.info(f"total train samples: {len(train_dataset)}")
    logger.info(f"total test samples: {len(test_dataset)}")

    POSE_DIM = 3 if config.data.rot_rep == "axis" else 6
    model = create_score_model(config, n_poses=N_POSES)
    key, k_init = jax.random.split(key)
    params = model.init(k_init, jnp.zeros((1, N_POSES * POSE_DIM)), jnp.zeros((1,)))["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info(f"model params: {n_params / 1e6:.2f}M")

    state, tx = losses_lib.init_train_state(config, params)

    # resume
    if args.restore_dir and os.path.exists(args.restore_dir):
        ckpts = sorted(glob.glob(os.path.join(args.restore_dir, "checkpoint-step*")),
                       key=lambda p: int(p.rsplit("step", 1)[1].split(".")[0]))
        if ckpts:
            ckpt_path = ckpts[-1]
            logger.info(f"=> loading checkpoint: {ckpt_path}")
            if os.path.isdir(ckpt_path):
                target = jax.device_get({
                    "params": state.params, "opt_state": state.opt_state,
                    "ema": {"shadow_params": state.ema.shadow_params,
                            "num_updates": state.ema.num_updates,
                            "decay": state.ema.decay},
                    "step": 0})
                restored = ckpt_lib.restore_train_state(ckpt_path, target)
                state = state.replace(
                    params=restored["params"], opt_state=restored["opt_state"],
                    step=jnp.asarray(restored["step"], jnp.int32),
                    ema=state.ema.replace(
                        shadow_params=restored["ema"]["shadow_params"],
                        num_updates=jnp.asarray(restored["ema"]["num_updates"], jnp.int32)))
            else:  # torch .pth
                cv = ckpt_lib.convert_torch_checkpoint(
                    ckpt_path, n_blocks=config.model.N_BLOCKS,
                    embedding_type=config.model.embedding_type)
                state = state.replace(params=cv["params"],
                                      step=jnp.asarray(cv["step"], jnp.int32))
                if cv["ema_params"] is not None:
                    state = state.replace(ema=state.ema.replace(
                        shadow_params=cv["ema_params"],
                        num_updates=jnp.asarray(
                            # torch None = counter disabled -> negative per
                            # ema.py's convention (0 would re-enable warmup)
                            -1 if cv["ema_num_updates"] is None
                            else cv["ema_num_updates"], jnp.int32)))
            logger.info(f"=> loaded checkpoint (step {int(state.step)})")

    # SDE + samplers + losses
    sde = build_sde(config)
    sampling_eps = sampling_eps_for(sde)
    sampling_shape = (config.eval.batch_size, N_POSES * POSE_DIM)

    model_apply = make_model_apply(model)
    step_kwargs = {}
    if config.training.auxiliary_loss:
        body_model_train = BodyModel(bm_path=args.bodymodel_path, num_betas=10,
                                     batch_size=config.training.batch_size,
                                     model_type="smplx")

        def body_fn(pose_axis):
            out = body_model_train(pose_body=pose_axis)
            return out.v, out.Jtr

        step_kwargs = dict(auxiliary_loss=True, denormalize=denormalize,
                           body_model_fn=body_fn, rot_rep=config.data.rot_rep,
                           denoise_steps=config.training.denoise_steps,
                           rot6d_to_axis=rot6d_to_axis_angle)

    train_step = losses_lib.get_step_fn(
        sde, train=True, model_apply=model_apply, tx=tx,
        reduce_mean=config.training.reduce_mean,
        continuous=config.training.continuous,
        likelihood_weighting=config.training.likelihood_weighting, **step_kwargs)

    mesh = par.make_mesh()  # global: one data-parallel program over all hosts
    mesh_local = par.make_mesh(local=True)  # eval runs process-local
    n_dev = mesh.devices.size
    if config.training.batch_size % n_dev:
        raise ValueError(f"batch {config.training.batch_size} must be divisible "
                         f"by the {n_dev} mesh devices")
    if args.train_kernel != "off":
        # Fused fwd+bwd Pallas kernel (same step contract, composes with
        # multi_step/_indexed). bf16 compute inside the kernel; the dropout
        # stream differs from XLA's (on-core PRNG), which is a different
        # but equally valid draw. Single-device scope: under a >1-device
        # mesh GSPMD cannot partition the custom call, so auto falls back.
        try:
            if jax.default_backend() != "tpu":
                raise NotImplementedError("pallas train kernel needs a TPU")
            if n_dev > 1:
                raise NotImplementedError(
                    "pallas train kernel is single-device (use the XLA "
                    "GSPMD step on multi-chip meshes)")
            if step_kwargs:
                raise NotImplementedError(
                    "auxiliary body loss is outside the kernel scope")
            if not config.training.continuous:
                raise NotImplementedError("kernel scope is continuous DSM")
            from dposer_tpu.ops.pallas.fused_train import get_pallas_step_fn
            train_step = get_pallas_step_fn(
                sde, model, tx, reduce_mean=config.training.reduce_mean,
                likelihood_weighting=config.training.likelihood_weighting,
                batch_hint=config.training.batch_size)
            logger.info("train step: fused Pallas fwd+bwd kernel")
        except NotImplementedError as e:
            if args.train_kernel == "on":
                raise
            logger.info(f"pallas train kernel unavailable ({e}); XLA step")
    K = max(1, args.steps_per_dispatch)
    # No divisibility requirements: per-substep log triggers and the
    # crossed-a-multiple eval/save predicate below work for any K (the
    # reference's flagship n_iters=400001 is prime-ish on purpose); a
    # final partial window runs as single-step dispatches. Multiple freq
    # multiples crossed by ONE dispatch collapse into one eval/save:
    for freq, name in ((config.training.eval_freq, "eval_freq"),
                       (config.training.save_freq, "save_freq")):
        if K > freq:
            logger.warning(
                f"--steps-per-dispatch={K} > {name}={freq}: {name} events "
                f"fire once per dispatch (every {K} steps), not every {freq}")
    # Commit the freshly-built (or restored) state to the replicated
    # sharding the train programs declare as in_shardings BEFORE the first
    # dispatch: jit keys its program cache on the arguments' actual
    # shardings, so an uncommitted first-call state makes the SECOND
    # dispatch recompile the whole multi-step program (measured: two
    # ~5 min compiles instead of one on the tunneled chip).
    state = jax.device_put(state, par.replicate(mesh))
    sharded_step = par.data_parallel_step(train_step, mesh)
    # Device-resident data path: when the (normalized) train tensor fits in
    # HBM, it is uploaded ONCE and each dispatch ships only a [K, B] int32
    # index window (the same shuffled stream) — 63x less host->device
    # traffic per step and no per-batch host gather. The reference
    # re-uploads every batch from its DataLoader (ref train.py:245-247).
    device_data = (K > 1 and not args.host_data
                   and train_dataset.poses.nbytes <= 2 << 30)
    if K > 1:
        if device_data:
            data_dev = jax.device_put(jnp.asarray(train_dataset.poses),
                                      par.replicate(mesh))
            sharded_multi = par.data_parallel_multi_step_indexed(
                losses_lib.multi_step_indexed(train_step), mesh)
            logger.info(f"train data device-resident "
                        f"({train_dataset.poses.nbytes / 2**20:.0f} MiB, "
                        f"index-window dispatches)")
        else:
            sharded_multi = par.data_parallel_multi_step(
                losses_lib.multi_step(train_step), mesh)
    logger.info(f"data-parallel over {n_dev} device(s) / "
                f"{jax.process_count()} process(es), {K} step(s)/dispatch: "
                f"{mesh.devices.ravel()[:4]}...")

    def eval_score_fn_for(eval_params):
        return get_score_fn(sde, lambda x, t: model.apply({"params": eval_params}, x, t),
                            continuous=config.training.continuous)

    # Eval programs — built and jitted ONCE, with the EMA params threaded as
    # an explicit argument. The params change *value* every eval firing but
    # never shape, so firings after the first reuse the compiled 1000-step
    # sampler scans and the likelihood ODE instead of paying a full retrace
    # (the reference rebuilds its eval objects per firing, ref train.py:263-312).
    def _eval_sampler_factory(eval_params):
        return sampling_lib.get_sampling_fn(
            config, sde, sampling_shape, eval_score_fn_for(eval_params),
            inverse_scaler=None, eps=sampling_eps, return_trajectory=True,
            jit=False)

    def _eval_imput_factory(eval_params):
        return sampling_lib.get_sampling_fn(
            config, sde, sampling_shape, eval_score_fn_for(eval_params),
            inverse_scaler=None, eps=sampling_eps, imputation=True, jit=False)

    eval_sampler = par.data_parallel_sampler_params(_eval_sampler_factory,
                                                    mesh_local)
    multi_imput_sampler = par.multi_hypothesis_imputation_sampler_params(
        _eval_imput_factory, mesh_local)
    hypo_num = 5

    @jax.jit
    def eval_likelihood(eval_params, k, poses):
        return get_likelihood_fn(sde, eval_score_fn_for(eval_params),
                                 rtol=1e-4, atol=1e-4, eps=1e-4,
                                 jit=False)(k, poses)

    num_train_steps = config.training.n_iters
    metrics = {}
    metrics_n = 0  # substeps accumulated in the current logging window
    best_APD = 0.0
    step = int(state.step)
    # ONE index stream feeds both dispatch modes (and the single-step tail):
    # the gathered values are identical either way. skip= fast-forwards past
    # the restored step's batches, so together with the global-step noise
    # keys below a preempted+resumed run reproduces the uninterrupted one
    # exactly (CLI resume-determinism test pins this).
    idx_stream = train_dataset.train_index_batches(config.training.batch_size,
                                                   seed=args.seed, skip=step)

    # graceful-preemption checkpointing (new capability; the reference
    # swallows all failures, ref train.py:406-410). On SIGTERM/SIGINT the
    # loop exits at the next step boundary and saves a resumable checkpoint.
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        logger.info(f"signal {signum} received -> checkpoint and exit")
        stop_requested["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _request_stop)
        except ValueError:
            pass  # non-main thread (tests)

    def save_checkpoint(tag=None):
        path = os.path.join(final_output_dir, f"checkpoint-step{tag or step}")
        ckpt_lib.save_train_state(path, jax.device_get({
            "params": state.params, "opt_state": state.opt_state,
            "ema": {"shadow_params": state.ema.shadow_params,
                    "num_updates": state.ema.num_updates,
                    "decay": state.ema.decay},
            "step": int(state.step)}))
        return path

    timer = StepTimer()
    local_step = 0  # steps taken by THIS process run (robust under resume)
    trace_active = False
    trace_done = False

    def stage_window(n_steps_left):
        """Assemble the next K-step window and START its (async)
        host->device transfer — called right after a dispatch is enqueued,
        so the upload overlaps device compute instead of serializing with
        it. Device-resident mode stages a [K, B] int32 index window
        (~0.3 MB at K=64/B=1280); host mode stages the gathered rows
        (~20 MB). Returns ``(rows, sharded_or_None)``: when fewer than K
        steps remain, only the host-side index rows are drawn (no upload)
        and the single-step tail consumes them, so the index stream stays
        exactly sequential across dispatch modes."""
        if n_steps_left <= 0:
            return [], None
        if n_steps_left < K:
            return [next(idx_stream) for _ in range(n_steps_left)], None
        rows = [next(idx_stream) for _ in range(K)]
        if device_data:
            stack = np.stack(rows)
        else:
            stack = np.stack([train_dataset.poses[r] for r in rows])
        return rows, par.shard_global_multi_batch(mesh, stack)

    staged_rows, staged = (stage_window(num_train_steps - step)
                           if K > 1 else ([], None))
    # Per-step noise key = fold_in(train_key, GLOBAL step): a pure function
    # of the step index, so the training stream is invariant to
    # --steps-per-dispatch (CLI equality test pins K=1 == K>1 incl. the
    # partial tail) and deterministic across preemption/resume — the
    # reference's rolling torch RNG offers neither (ref train.py:245-247).
    key, train_key = jax.random.split(key)
    while step < num_train_steps and not stop_requested["flag"]:
        if args.profile_dir and not trace_active and not trace_done \
                and local_step >= 10:
            jax.profiler.start_trace(args.profile_dir)
            trace_active = True
        k_this = min(K, num_train_steps - step)
        if k_this == K and K > 1:
            state, loss_dicts = (sharded_multi(state, train_key, staged,
                                               data_dev)
                                 if device_data
                                 else sharded_multi(state, train_key, staged))
            # overlap the next upload with this dispatch
            staged_rows, staged = stage_window(num_train_steps - step - K)
            # ONE device->host transfer for the whole window: per-element
            # float() would pay a ~25 ms RPC per read on a tunneled chip
            # (128 reads/dispatch at K=64 — measured 10x slower end-to-end)
            loss_np = jax.device_get(loss_dicts)
            sub_losses = [{k: float(v[j]) for k, v in loss_np.items()}
                          for j in range(K)]
        else:  # K == 1, or the final partial window: single-step dispatches
            sub_losses = []
            for j in range(k_this):
                # the tail consumes the pre-drawn staged rows first so the
                # stream stays sequential with the dispatch-window path
                rows = staged_rows.pop(0) if staged_rows else next(idx_stream)
                batch = train_dataset.poses[rows]
                # global-step key, matching multi_step's substep convention
                kj = jax.random.fold_in(train_key, step + j)
                state, loss_dict = sharded_step(
                    state, kj, par.shard_global_batch(mesh, batch))
                sub_losses.append({k: float(v) for k, v in loss_dict.items()})
        prev_step = step
        step = int(state.step)
        local_step += k_this
        if trace_active and local_step >= 20:
            jax.profiler.stop_trace()
            trace_active = False
            trace_done = True
            logger.info(f"device trace (local steps 10-20) saved to {args.profile_dir}")
        if stop_requested["flag"]:
            break  # skip eval/periodic-save; the preemption checkpoint follows

        timer.tick()  # per dispatch; float(...) above already synchronized
        for j, loss_dict in enumerate(sub_losses):
            s_j = prev_step + j + 1
            for k, v in loss_dict.items():
                metrics[k] = metrics.get(k, 0.0) + v
            metrics_n += 1
            if s_j % config.training.log_freq == 0:
                msg = f"Iter: [{s_j}/{num_train_steps}, {s_j / num_train_steps * 100:.2f}%],\t"
                # divide by the substeps actually accumulated: after a resume
                # from a non-aligned step the first window is partial, and
                # /log_freq would understate the loss (0.17 -> 0.06 seen)
                for k in list(metrics):
                    writer.add_scalar(k, metrics[k] / metrics_n, s_j)
                    msg += f"{k}: {metrics[k] / metrics_n:.6f},\t"
                    metrics[k] = 0.0
                metrics_n = 0
                if timer.steps_per_sec:
                    # per-dispatch EMA x nominal window (the one partial
                    # tail window would misscale the full-dispatch EMA)
                    steps_per_sec = timer.steps_per_sec * K
                    msg += f"steps/s: {steps_per_sec:.1f},\t"
                    writer.add_scalar("steps_per_sec", steps_per_sec, s_j)
                logger.info(msg)

        # "crossed a multiple of freq this dispatch": == 0 for K == 1; after
        # resuming from a non-K-aligned step, plain % == 0 could never fire
        if step % config.training.eval_freq < k_this:
            logger.info("start validating")
            # eval sampling is data-parallel over the mesh (batch sharded,
            # GSPMD partitions the reverse loop); hypotheses run under vmap
            # instead of the reference's sequential loop (ref train.py:289-292);
            # the jitted programs are shared across firings (built above)
            ema_params = state.ema.shadow_params

            eval_metrics = {"bpd": [], "mpvpe_all": [], "mpjpe_body": []}
            all_samples = []
            trajs = None
            for bi, poses in enumerate(test_dataset.eval_batches(config.eval.batch_size)):
                poses = jnp.asarray(poses)
                key, k1, k2, k3 = jax.random.split(key, 4)
                bpd, z, nfe = eval_likelihood(ema_params, k1, poses)
                logger.info(f"Sample bpd: {float(bpd.mean())} with nfe: {int(nfe)}")
                eval_metrics["bpd"].append(float(bpd.mean()))

                if body_model_vis is not None:
                    mask, observation = create_mask(k2, poses, part="left_leg")
                    key, kh = jax.random.split(key)
                    multihypo = multi_imput_sampler(
                        ema_params, jax.random.split(kh, hypo_num),
                        observation, mask)
                    preds = denormalize(multihypo)
                    gts = denormalize(poses)
                    if config.data.rot_rep == "rot6d":
                        b = poses.shape[0]
                        preds = rot6d_to_axis_angle(preds.reshape(-1, 6)).reshape(b, hypo_num, -1)
                        gts = rot6d_to_axis_angle(gts.reshape(-1, 6)).reshape(b, -1)
                    evaler = Evaler(body_model=body_model_vis, part="left_leg")
                    res = evaler.multi_eval_bodys(preds, gts)
                    eval_metrics["mpvpe_all"].append(float(np.mean(res["mpvpe_all"])))
                    eval_metrics["mpjpe_body"].append(float(np.mean(res["mpjpe_body"])))

                key, kg = jax.random.split(key)
                trajs, samples = eval_sampler(ema_params, kg)
                all_samples.append(samples)

            for k, v in eval_metrics.items():
                if v:
                    writer.add_scalar(f"eval_{k}", float(np.mean(v)), step)

            all_samples = jnp.concatenate(all_samples, axis=0)[:50]
            slice_step = sde.N // 10
            trajs_s = trajs[::slice_step, :5]
            trajs_dn = denormalize(trajs_s)
            samples_dn = denormalize(all_samples)
            if config.data.rot_rep == "rot6d":
                trajs_dn = rot6d_to_axis_angle(trajs_dn.reshape(-1, 6)).reshape(-1, N_POSES * 3)
                samples_dn = rot6d_to_axis_angle(samples_dn.reshape(-1, 6)).reshape(-1, N_POSES * 3)
            else:
                trajs_dn = trajs_dn.reshape(-1, N_POSES * 3)

            APD = 0.0
            if body_model_vis is not None:
                body_out = body_model_vis(pose_body=samples_dn)
                APD = float(average_pairwise_distance(body_out.Jtr[:, :22, :]))
                logger.info(f"APD: {APD}")
                writer.add_scalar("APD", APD, step)

            n_t, n_s = trajs_s.shape[0], trajs_s.shape[1]
            np.savez(os.path.join(final_output_dir, "last_samples.npz"),
                     pose_trajs=np.asarray(trajs_dn).reshape(n_t, n_s, -1),
                     pose_samples=np.asarray(samples_dn).reshape(1, samples_dn.shape[0], -1))
            logger.info("validating completed")

            if APD > best_APD:
                best_APD = APD
                logger.info(f"saving best checkpoint, APD: {best_APD}")
                ckpt_lib.save_train_state(
                    os.path.join(final_output_dir, "best_model"),
                    {"params": state.params, "ema": {
                        "shadow_params": state.ema.shadow_params,
                        "num_updates": state.ema.num_updates,
                        "decay": state.ema.decay},
                     "step": int(state.step)})

        if step % config.training.save_freq < k_this:
            logger.info(f"Save checkpoint to {final_output_dir}")
            save_checkpoint()

    if trace_active:  # loop ended between local steps 10 and 20
        jax.profiler.stop_trace()
        logger.info(f"device trace saved to {args.profile_dir}")

    if stop_requested["flag"]:
        path = save_checkpoint()
        logger.info(f"preemption checkpoint saved: {path}")

    writer.close()
    logger.info(f"End. Final output dir: {final_output_dir}")


if __name__ == "__main__":
    app.run(main, flags_parser=parse_args)
