"""Test bootstrap.

Mirrors the reference's test-environment gating (TestEnvironment.swift:5-54 —
CI detection, GPU-family gating) translated to TPU reality: unit tests run on
a deterministic 8-virtual-device CPU mesh with Pallas interpret mode
(SURVEY.md §4: "Pallas interpret=True on CPU for kernel unit tests,
multi-device via XLA host simulation").

This environment force-loads a TPU PJRT plugin through a sitecustomize hook
that sets jax_platforms to the plugin; tests pin back to CPU *before* JAX
backends initialize. Set UMFA_TEST_TPU=1 to keep the real device and run the
(separately marked) TPU tests instead.
"""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

_USE_TPU = os.environ.get("UMFA_TEST_TPU") == "1"

if not _USE_TPU:
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    # Must happen before any backend initialization (jax.devices(), any op).
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    config.addinivalue_line("markers", "slow: long-running test")
    config.addinivalue_line("markers", "multidevice: needs ≥8 devices")


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() not in ("cpu",)
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(pytest.mark.skip(reason="no TPU in test env"))
        if "multidevice" in item.keywords and len(jax.devices()) < 8:
            item.add_marker(pytest.mark.skip(reason="needs 8 devices"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
