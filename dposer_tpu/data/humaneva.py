"""HumanEva sequence splitter (ref ``lib/dataset/HumanEva.py``): slice AMASS
npz files into fixed-length pose fragments for motion-denoising eval.

    python -m dposer_tpu.data.humaneva --input-dir ... --output-dir ... [--seq-len 60]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def split_npz(npz_fname: str, output_base_dir: str, seq_len: int = 60):
    cdata = np.load(npz_fname, allow_pickle=True)
    if "poses" not in cdata:
        # AMASS subject dirs also ship non-mocap npz (e.g. *_shape.npz,
        # *_stagei.npz); skip them instead of aborting the whole walk
        print(f"skipping {npz_fname} (no 'poses' key)")
        return
    fullpose = cdata["poses"]
    pose_body = fullpose[:, 3:66]
    root_orient = fullpose[:, :3]

    num_batches = pose_body.shape[0] // seq_len
    base_name = os.path.basename(npz_fname).replace(".npz", "")
    subdir = os.path.basename(os.path.dirname(npz_fname))
    output_dir = os.path.join(output_base_dir, subdir)
    os.makedirs(output_dir, exist_ok=True)

    for idx in range(num_batches):
        s, e = idx * seq_len, (idx + 1) * seq_len
        np.savez(os.path.join(output_dir, f"{base_name}_batch{str(idx).zfill(3)}.npz"),
                 pose_body=pose_body[s:e], root_orient=root_orient[s:e])


def main(args):
    for root, _, files in os.walk(args.input_dir):
        for file in files:
            if file.endswith(".npz"):
                split_npz(os.path.join(root, file), args.output_dir, args.seq_len)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Preprocess pose and trans data and save as npz files.")
    parser.add_argument("--input-dir", type=str, required=True)
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--seq-len", type=int, default=60)
    main(parser.parse_args())
