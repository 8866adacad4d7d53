"""Test harness config.

Must run before ANY jax import: forces the real CPU backend (the container's
axon TPU plugin would otherwise claim the process — see sitecustomize), sets
an 8-way virtual device mesh for sharding tests ("multi-node without a
cluster", SURVEY.md section 4), and enables f64 parity mode.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin at interpreter
# start and force-sets jax_platforms="axon,cpu"; override it back so the
# suite runs on the real (virtual 8-device) CPU backend.
jax.config.update("jax_platforms", "cpu")

from tpuwave import config  # noqa: E402

config.use_x64()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def parameters_dir():
    from pathlib import Path
    root = Path(__file__).resolve().parent.parent / "parameters"
    if not root.exists():
        pytest.skip("parameters/ not generated (run scripts/generate_presets.py)")
    return root
