"""Regenerate the synthetic SMPL-X body fixtures (licensed release assets
are not in this image; every body-model flow runs on these).

All variants come from ``tests/fixtures.make_synthetic_body_model`` with
fixed seeds, so a clean checkout reproduces the exact protocol fixtures:

    python benchmarks/gen_synth_body.py --which hd
        -> data/synth_smplx_hd.npz  (10,475 verts = the real SMPL-X count,
           so ALL 21 extra-keypoint vertex ids are distinct vertices; used
           by the round-4 HMR accuracy protocol, PERFORMANCE.md "HMR
           accuracy"; ~110 MB, gitignored)
    python benchmarks/gen_synth_body.py --which human
        -> data/synth_smplx_human.npz (120 verts, human-scale; motion
           protocol + small-body fitting parity; byte-verified to
           reproduce the round-4 fixture)

(``data/synth_smplx_ehf.npz`` — the deliberately-different fit-side body
of the small-body protocol, mirroring real EHF's scan-vs-model gap — is
a prior-round artifact whose generator seed is not recorded; it is kept
as-is rather than regenerated.)
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

VARIANTS = {
    # name: (n_verts, template_scale, seed)
    "hd": (10475, 0.15, 0),
    "human": (120, 0.15, 0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", choices=sorted(VARIANTS), default="hd")
    ap.add_argument("--out", type=str, default=None,
                    help="default: data/synth_smplx_<which>.npz")
    args = ap.parse_args()

    from fixtures import make_synthetic_body_model

    n_verts, scale, seed = VARIANTS[args.which]
    out = args.out or os.path.join(REPO, "data", f"synth_smplx_{args.which}.npz")
    path, _ = make_synthetic_body_model(out, "smplx", n_verts=n_verts,
                                        template_scale=scale, seed=seed)
    import numpy as np

    f = np.load(path)
    print(f"wrote {path}: v_template {f['v_template'].shape}, "
          f"faces {f['f'].shape}")


if __name__ == "__main__":
    main()


def make_smooth_smpl_body(path, n_lat=84, n_lon=84, seed=0,
                          root_w=0.55, tau=0.3):
    """SMPL-type fixture whose forward outputs SMOOTH body-scale meshes:
    UV-sphere template (13.9k faces — the real SMPL face count scale),
    spatially smooth LBS weights (softmax over joint distance, blended
    with a rigid root component) and low-frequency sinusoidal blendshape
    fields. The random-point-cloud fixtures self-intersect at ~98%, which
    distorts the --metrics SI tail's narrow-phase workload; this variant
    lands in the body-realistic few-percent regime, so the
    serial-vs-pipelined tail measurement (PERFORMANCE.md "APD/SI metrics
    protocol") times the real work. Usage:

        python benchmarks/gen_synth_body.py --which smpl-smooth
            -> data/synth_smpl_smooth.npz
    """
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from time_metrics import make_body_like_mesh
    from fixtures import _parents

    rng = np.random.default_rng(seed)
    verts, faces = make_body_like_mesh(n_lat=n_lat, n_lon=n_lon, seed=seed)
    verts = verts * 0.85  # ~human span in metres
    n_verts, n_joints = len(verts), 24

    joints = 0.4 * rng.normal(size=(n_joints, 3)).astype(np.float32)
    joints[0] = 0.0
    d = np.linalg.norm(verts[:, None] - joints[None], axis=-1)
    group = d.argmin(1)
    J_regressor = np.zeros((n_joints, n_verts), np.float32)
    for j in range(n_joints):
        members = np.where(group == j)[0]
        if len(members) == 0:
            members = np.array([j % n_verts])
        J_regressor[j, members] = 1.0 / len(members)

    # smooth skinning: local softmax over joint distance + rigid root
    # share (keeps ~1-rad poses from shredding the surface)
    w_local = np.exp(-d / tau)
    w_local /= w_local.sum(1, keepdims=True)
    weights = (1 - root_w) * w_local
    weights[:, 0] += root_w
    weights = (weights / weights.sum(1, keepdims=True)).astype(np.float32)

    def smooth_field(k, amp):
        w = rng.normal(size=(k, 3, 3))
        ph = rng.uniform(0, 2 * np.pi, (k, 3))
        out = np.stack([amp * np.sin(verts @ w[i].T * 2.0 + ph[i])
                        for i in range(k)], axis=-1)
        return out.astype(np.float32)  # [V, 3, k]

    shapedirs = smooth_field(10, 0.02)
    posedirs = smooth_field((n_joints - 1) * 9, 0.002)

    parents = np.asarray(_parents("smpl"), np.int64)
    parents[0] = 2 ** 32 - 1
    kintree_table = np.stack([parents, np.arange(n_joints)], 0)
    np.savez(path, v_template=verts.astype(np.float32), shapedirs=shapedirs,
             posedirs=posedirs, J_regressor=J_regressor, weights=weights,
             kintree_table=kintree_table, f=faces)
    return str(path)
