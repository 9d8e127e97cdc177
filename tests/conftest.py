"""Test configuration: force a virtual 8-device CPU platform.

Tests exercise the multi-chip sharding path on a host-platform device mesh
(SURVEY.md section 4: the reference ships no tests; this pyramid is ours).
Environment variables must be set before jax is first imported.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force the CPU backend regardless of any site-injected platform plugin; must
# happen after import but before first backend use.
jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
SCENARIO_DIR = REPO_ROOT / "example_scenarios"


@pytest.fixture(scope="session")
def scenario_dir() -> pathlib.Path:
    return SCENARIO_DIR


@pytest.fixture(scope="session")
def repo_root() -> pathlib.Path:
    return REPO_ROOT
