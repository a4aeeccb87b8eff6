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
