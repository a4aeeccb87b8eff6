"""AMASS preprocessing (ref ``lib/data/prepare_data.py`` + ``script.py``):
VPoser-style dataset dump — per AMASS subset, sample 30% of the middle 80%
frames of every ``*_stageii.npz`` mocap sequence and concatenate into
``pose_body`` / ``root_orient`` (+``betas``) tensors per split.

Output format: ``.pt`` (torch, reference-compatible) when torch is present,
plus ``.npz`` siblings readable without torch.

    python -m dposer_tpu.data.prepare --amass-dir <raw AMASS> --output-dir \
        <processed>/version1 [--betas]
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

# AMASS split definition (ref lib/data/script.py:18-23)
AMASS_SPLITS = {
    "train": ["CMU", "PosePrior", "TotalCapture", "Eyes_Japan_Dataset", "KIT",
              "BMLrub", "BMLmovi", "EKUT", "TCDHands", "ACCAD"],
    "valid": ["HumanEva", "HDM05", "SFU", "Mosh"],
    "test": ["Transitions", "SSM"],
}


def _save(path: str, array: np.ndarray):
    # .npy sibling is readable without torch (see data.amass._load_tensor_file)
    np.save(os.path.splitext(path)[0] + ".npy", array)
    try:
        import torch

        torch.save(torch.from_numpy(array), path)
    except ImportError:
        pass


def prepare_split(split_name: str, ds_names, amass_dir: str, out_dir: str,
                  keep_rate: float = 0.3, num_betas: int = 10,
                  save_betas: bool = False, seed: int = 0):
    rng = np.random.default_rng(seed)
    fields = {"pose_body": [], "root_orient": []}
    if save_betas:
        fields["betas"] = []

    for ds_name in ds_names:
        fnames = sorted(glob.glob(os.path.join(amass_dir, ds_name, "*/*_stageii.npz")))
        if not fnames:
            fnames = sorted(glob.glob(os.path.join(amass_dir, ds_name, "*/*_poses.npz")))
        print(f"Found {len(fnames)} sequences from {ds_name}.")
        for fname in fnames:
            cdata = np.load(fname, allow_pickle=True)
            n = len(cdata["poses"])
            lo, hi = int(0.1 * n), int(0.9 * n)
            take = int(keep_rate * 0.8 * n)
            if take < 1 or hi <= lo:
                continue
            ids = rng.choice(np.arange(lo, hi), take, replace=False)
            fullpose = cdata["poses"][ids].astype(np.float32)
            fields["pose_body"].append(fullpose[:, 3:66])
            fields["root_orient"].append(fullpose[:, :3])
            if save_betas:
                fields["betas"].append(
                    np.tile(cdata["betas"][:num_betas].astype(np.float32), (len(ids), 1)))

    split_dir = os.path.join(out_dir, split_name)
    os.makedirs(split_dir, exist_ok=True)
    empty_width = {"pose_body": 63, "root_orient": 3, "betas": num_betas}
    for k, v in fields.items():
        arr = (np.concatenate(v) if v
               else np.zeros((0, empty_width[k]), np.float32))
        _save(os.path.join(split_dir, f"{k}.pt"), arr)
        print(f"{split_name}/{k}: {arr.shape}")


def main(args):
    for split_name, ds_names in AMASS_SPLITS.items():
        prepare_split(split_name, ds_names, args.amass_dir, args.output_dir,
                      keep_rate=args.keep_rate, save_betas=args.betas,
                      seed=args.seed)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Prepare AMASS pose tensors.")
    parser.add_argument("--amass-dir", type=str, required=True)
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--keep-rate", type=float, default=0.3)
    parser.add_argument("--betas", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    main(parser.parse_args())
