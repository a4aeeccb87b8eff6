"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Mirrors the TPU multi-chip topology for sharding tests without hardware
(see SURVEY.md §4: ``xla_force_host_platform_device_count``).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Keep jax's stock >=5 s persistence threshold for the suite (and the CLI
# subprocesses it spawns, which inherit this env): the package defaults the
# threshold to 0 for tunneled-TPU hosts, but the suite compiles thousands of
# tiny CPU programs and jax's LRUCache pays an O(entries) eviction scan per
# put — persisting them all would slow the single-core suite quadratically.
# The cache env-knob test clears this to pin the package default.
os.environ.setdefault("DPOSER_CACHE_MIN_COMPILE_SECS", "5")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin in this image ignores JAX_PLATFORMS; force via config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def load_reference_module(relpath, name):
    """Import a self-contained reference file as a parity oracle.

    Only used for modules with no intra-repo imports (sde_lib.py, model.py,
    ema.py). The reference is an oracle for output comparison — never a code
    source.
    """
    import importlib.util

    path = os.path.join(REFERENCE, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def torch():
    return pytest.importorskip("torch")


@pytest.fixture(scope="session")
def ref_sde_lib(torch):
    return load_reference_module("lib/algorithms/advanced/sde_lib.py", "ref_sde_lib")


@pytest.fixture(scope="session")
def ref_model_lib(torch):
    return load_reference_module("lib/algorithms/advanced/model.py", "ref_model_lib")


@pytest.fixture(scope="session")
def ref_ema_lib(torch):
    return load_reference_module("lib/algorithms/ema.py", "ref_ema_lib")
