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
