"""Logging / config-import utilities (ref ``lib/utils/generic.py``)."""
from __future__ import annotations

import importlib
import logging
import os
import time


def create_logger(output_dir: str = "output", train_dataset: str = "amass",
                  test_dataset: str = "amass", phase: str = "train",
                  name: str = "") -> tuple:
    """Timestamped run directory + file/console logger (ref generic.py:7-48)."""
    run_name = f"{time.strftime('%Y-%m-%d-%H-%M-%S')}{'-' + name if name else ''}"
    final_output_dir = os.path.join(output_dir, f"{train_dataset}_{test_dataset}", run_name)
    os.makedirs(final_output_dir, exist_ok=True)

    # phase in the logger name: two create_logger calls landing on the same
    # wall-clock second (train then test) must not share a logger and
    # double-emit through each other's handlers
    logger = logging.getLogger(f"{run_name}:{phase}")
    logger.setLevel(logging.INFO)
    logger.propagate = False  # root-logger config must not duplicate lines
    if not logger.handlers:  # same (run, phase) re-requested: reuse as-is
        fmt = logging.Formatter("%(asctime)-15s %(message)s")
        fh = logging.FileHandler(os.path.join(final_output_dir, f"{phase}.log"))
        fh.setFormatter(fmt)
        ch = logging.StreamHandler()
        ch.setFormatter(fmt)
        logger.addHandler(fh)
        logger.addHandler(ch)
    return logger, final_output_dir


def import_configs(config_path: str):
    """Dotted-path config import, e.g.
    ``configs.subvp.amass_scorefc_continuous.get_config`` (ref generic.py:51-56)."""
    module_name, function_name = config_path.rsplit(".", 1)
    module = importlib.import_module(module_name)
    return getattr(module, function_name)()


class MetricWriter:
    """TensorBoard scalar writer; ALWAYS mirrors scalars to a plain
    ``metrics.jsonl`` (greppable run artifact, survives without TB tooling)."""

    def __init__(self, logdir: str):
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        import json

        self._jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                      "step": int(step)}) + "\n")
        self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
