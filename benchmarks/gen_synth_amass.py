"""Generate a reference-scale synthetic AMASS layout for the full-schedule
training demonstration (BASELINE config 5; the licensed AMASS tensors are
not in this image).

Layout matches ``lib/data/prepare_data.py``'s output consumed by
``AMASSDataset`` (ref AMASS.py:12-132): ``<root>/<version>/<subset>/
pose_body.pt``-style tensors, saved as the torch-free ``.npz`` sibling.

Poses are a 64-component mixture over 21 axis-angle body joints with
low-rank cross-joint correlation (so the diffusion model has real structure
to learn, APD is meaningful, and completion can exploit correlations) and
mocap-plausible magnitudes (joint angles mostly within +-1 rad).

    python benchmarks/gen_synth_amass.py --root data/AMASS/amass_synth \
        --train-n 1000000 --test-n 5000
"""
import argparse
import os

import numpy as np

D = 63  # 21 joints x 3 (axis-angle)


def make_mixture(rng):
    """The shared synthetic-AMASS mixture: 64 correlated components.

    Exposed so sibling generators (gen_synth_motion.py) can draw temporally
    coherent sequences from the SAME distribution the prior is trained on.
    NOTE: consumes draws from ``rng`` in a fixed order — call before any
    other sampling to keep dataset reproducibility for a given seed.
    """
    centers = (0.5 * rng.normal(size=(64, D))).astype(np.float32)
    centers *= rng.uniform(0.2, 1.0, size=(1, D)).astype(np.float32)
    mixweights = rng.dirichlet(np.full(64, 2.0))
    basis = (0.12 * rng.normal(size=(8, D))).astype(np.float32)
    return centers, mixweights, basis


def sample_poses(rng, n, centers, mixweights, basis):
    comp = rng.choice(len(centers), size=n, p=mixweights)
    # low-rank correlated noise + small isotropic jitter
    latents = rng.normal(size=(n, basis.shape[0])).astype(np.float32)
    poses = centers[comp] + latents @ basis \
        + 0.05 * rng.normal(size=(n, D)).astype(np.float32)
    return poses.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="data/AMASS/amass_synth")
    ap.add_argument("--version", type=str, default="version1")
    ap.add_argument("--train-n", type=int, default=1_000_000)
    ap.add_argument("--test-n", type=int, default=5_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    centers, mixweights, basis = make_mixture(rng)

    for subset, n in (("train", args.train_n), ("test", args.test_n),
                      ("valid", max(args.test_n // 2, 1))):
        path = os.path.join(args.root, args.version, subset)
        os.makedirs(path, exist_ok=True)
        poses = sample_poses(rng, n, centers, mixweights, basis)
        np.save(os.path.join(path, "pose_body.npy"), poses)
        print(f"{subset}: {poses.shape} -> {path}/pose_body.npy "
              f"(|pose| p95 = {np.percentile(np.abs(poses), 95):.2f} rad)")


if __name__ == "__main__":
    main()
