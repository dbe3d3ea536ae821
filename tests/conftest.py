"""Test harness: force an 8-device virtual CPU mesh BEFORE jax imports,
so multi-chip sharding is exercised without TPU hardware (the strategy
SURVEY.md §4 prescribes in place of the reference's no-fake-backend gap).
"""

import os
import sys
from pathlib import Path

# The image pre-sets JAX_PLATFORMS=axon (single real TPU via a tunnel,
# re-asserted by a sitecustomize on PYTHONPATH); tests must run on the
# virtual 8-device CPU mesh, so force both the env var AND the jax
# config (the config update is what actually wins over the site hook).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Immunize the suite against TPU-relay outages: jax initializes EVERY
# registered PJRT plugin inside backends() regardless of jax_platforms,
# and when the relay is down the axon plugin's client constructor
# retries internally for ~45 min — hanging a CPU-only test run at the
# first jax.devices(). Dropping the registered factory (not just the
# env var — the sitecustomize already consumed that) keeps CPU runs
# relay-independent.
try:  # pragma: no cover - depends on image sitecustomize
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:  # noqa: BLE001 - defensive; suite still valid without
    pass

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import pytest


REFERENCE_ROOT = Path("/root/reference")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def corpus_texts():
    """A small deterministic synthetic corpus for kernel tests."""
    rng = np.random.default_rng(42)
    words = [f"w{i}" for i in range(200)] + ["the", "of", "police", "fir"]
    texts = []
    for _ in range(97):
        n = int(rng.integers(3, 40))
        texts.append(" ".join(rng.choice(words, size=n)))
    return texts


@pytest.fixture(scope="session")
def reference_chunks():
    """The reference's generated chunk corpus (data, not code), used as
    real-scale test data when available."""
    path = REFERENCE_ROOT / "legal_chunks.json"
    if not path.exists():
        pytest.skip("reference corpus not available")
    import json

    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)
