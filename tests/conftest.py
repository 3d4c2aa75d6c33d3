"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU even when the session environment preselects a TPU platform
# (JAX_PLATFORMS=axon): unit tests must run without hardware.
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# If a sitecustomize already initialized jax on a hardware backend before
# this conftest ran (the env default is JAX_PLATFORMS=axon and the PJRT
# registration happens at interpreter startup), the env overrides above
# came too late: the suite would run on the TPU — slow, occupying the
# bench chip, and flaky on CPU-tuned tolerances. Fail fast instead.
import jax  # noqa: E402

if jax.devices()[0].platform != "cpu":
    pytest.exit(
        "tests must run on CPU: launch via ./run_tests.sh (or prefix "
        "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu) so the TPU tunnel is "
        f"never dialed; got devices={jax.devices()}", returncode=3)

# Interpret-mode speed: the production default (fused closest+shadow
# kernel) doubles every interpret-mode traversal for zero extra CPU-test
# coverage — the fused kernel's semantics are pinned explicitly by
# tests/test_fused_shadow.py, which sets the flag itself. The full suite
# was verified green WITH the fused default on 2026-08-17 (136 passed);
# keeping it off here returns the suite to ~half the wall time.
from raytracer_tpu.render import pallas_split  # noqa: E402

pallas_split.USE_FUSED_SHADOW = False


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
