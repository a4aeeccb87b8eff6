"""Wall-clock breakdown of the APD/SI metrics protocol (BASELINE config 1).

Protocol (ref run/demo.py:137-161): 500 langevin-corrector samples ->
SMPL body forward -> APD over joints[:22] -> per-mesh C++ self-intersection
percentage. The sampling stage runs on the TPU (skipped with --no-tpu);
the SI tail is host C++ (threaded over meshes; this box has 1 core, so
--threads>1 shows parity, not speedup).

    python benchmarks/time_metrics.py [--no-tpu] [--n 500] [--threads 0]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_body_like_mesh(n_lat=84, n_lon=84, seed=0):
    """UV-sphere with smooth radial noise: SMPL-scale face count (~13.8k)
    and a realistic (low) self-intersection rate."""
    rng = np.random.default_rng(seed)
    lat = np.linspace(1e-3, np.pi - 1e-3, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    LA, LO = np.meshgrid(lat, lon, indexing="ij")
    verts = np.stack([np.sin(LA) * np.cos(LO), np.sin(LA) * np.sin(LO),
                      np.cos(LA)], axis=-1).reshape(-1, 3)
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts.astype(np.float32), np.asarray(faces, np.int32)


def deform(verts, rng, amp):
    """Smooth low-frequency radial deformation (can fold -> intersections)."""
    w = rng.normal(size=(3, 3))
    phase = rng.uniform(0, 2 * np.pi, 3)
    r = 1.0 + amp * np.sin(verts @ w.T * 2.0 + phase).sum(-1)
    return (verts * r[:, None]).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-tpu", action="store_true")
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    stages = {}

    if not args.no_tpu:
        import jax
        import jax.numpy as jnp

        from dposer_tpu.diffusion import sde as sde_lib
        from dposer_tpu.models import ScoreModelFC
        from dposer_tpu.ops.pallas.fused_em import get_pallas_em_sampler

        model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=1024,
                             embed_dim=512, n_blocks=2, dropout=0.0,
                             scale_by_sigma=True, num_scales=1000)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)),
                            jnp.zeros((1,)))["params"]
        sde = sde_lib.SubVPSDE(N=1000)
        sampler = get_pallas_em_sampler(sde, model, params, (args.n, 63),
                                        eps=1e-3, corrector="langevin",
                                        snr=0.16, rng_mode="kernel")
        _, x = sampler(jax.random.PRNGKey(1))   # compile
        np.asarray(x)
        t0 = time.perf_counter()
        M = 5
        outs = [sampler(jax.random.PRNGKey(2 + i))[1] for i in range(M)]
        np.asarray(outs[-1])                     # D2H read bounds all M
        stages["sampling (langevin kernel)"] = (time.perf_counter() - t0) / M

    # body forward stage proxy: the fitting benches measure the real LBS;
    # here we time what the SI protocol consumes - mesh generation is not
    # part of the timed protocol, so build meshes untimed
    verts0, faces = make_body_like_mesh()
    rng = np.random.default_rng(1)
    batch = np.stack([deform(verts0, rng, amp=0.08) for _ in range(args.n)])
    print(f"meshes: {batch.shape[0]} x {verts0.shape[0]} verts / "
          f"{faces.shape[0]} faces")

    from dposer_tpu.native import mesh_si

    # warm up (build lib)
    mesh_si.self_intersections_percentage(batch[:2], faces,
                                          n_threads=args.threads)
    t0 = time.perf_counter()
    si = mesh_si.self_intersections_percentage(batch, faces,
                                               n_threads=args.threads)
    stages[f"SI (C++ grid+Moller, threads={args.threads or 'auto'})"] = \
        time.perf_counter() - t0
    print(f"SI mean {si.mean():.3f}% (nonzero on {(si > 0).mean() * 100:.0f}% "
          f"of meshes)")

    # APD on joints [n, 22, 3] (vectorized pdist, ops/metrics.py)
    import jax
    import jax.numpy as jnp

    from dposer_tpu.ops.metrics import average_pairwise_distance

    joints = jnp.asarray(np.random.default_rng(2).normal(
        size=(args.n, 22, 3)).astype(np.float32))
    apd = average_pairwise_distance(joints)
    float(apd)  # compile
    t0 = time.perf_counter()
    float(average_pairwise_distance(joints))
    stages["APD (vectorized pdist)"] = time.perf_counter() - t0

    print("\nstage breakdown:")
    total = 0.0
    for k, v in stages.items():
        print(f"  {k:45s} {v * 1e3:9.1f} ms")
        total += v
    print(f"  {'TOTAL':45s} {total * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
