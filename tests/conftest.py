"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh (the driver validates real
multi-chip sharding separately via __graft_entry__.dryrun_multichip); this
keeps the suite hermetic and off the TPU.  Must run before jax imports.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The axon TPU plugin's sitecustomize imports jax at interpreter startup
# with JAX_PLATFORMS=axon, so the env var above is captured too late; force
# the CPU platform through jax.config (tests are CPU-only — the driver
# exercises the real chip via bench.py / __graft_entry__.py).
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if p and "axon" not in p)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    return {
        i: (
            (GOLDEN / f"sample{i}.ref").read_bytes(),
            (GOLDEN / f"sample{i}.bz2").read_bytes(),
        )
        for i in (1, 2, 3)
    }


@pytest.fixture()
def rng():
    return np.random.default_rng(0xB21)
