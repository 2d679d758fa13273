"""Test harness: force an 8-device CPU mesh before any JAX backend init.

The reference has no distributed tests because it has no distributed code
(SURVEY.md §4). Here DP sharding, gradient reduction, and per-host input
pipelines are tested in CI on a virtual 8-device CPU mesh.

The environment's axon sitecustomize pins JAX_PLATFORMS=axon (one real TPU
chip); overriding via jax.config after import is the supported escape hatch.
"""

import os

import pytest

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite's cost is dominated by CPU jit
# compiles of the 5-model train step (~30 wall-clock minutes cold); cached
# executables cut repeat runs to a fraction. Safe to delete at any time.
# Machine-fingerprinted + AOT-free (utils/compile_cache.py): entries written
# on one host can never poison a run on another (round-3 postmortem).
from dcvgan_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture(scope="session")
def mock_data_root(tmp_path_factory):
    """Session-scoped mock dataset tree (solid-color pixel oracle)."""
    from dcvgan_tpu.data.mock import generate_mock_dataset

    root = tmp_path_factory.mktemp("data") / "processed" / "mock" / "train"
    generate_mock_dataset(root)
    return root
