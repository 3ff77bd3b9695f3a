"""Multi-host path: mocked jax.distributed bootstrap + real global-batch
assembly on the 8-virtual-device mesh (SURVEY §2.3 last row).

No multi-host hardware exists in this environment, so the
``jax.distributed.initialize`` call is mocked; the data-placement path
(``host_local_to_global``) runs for real — ``make_array_from_process_
local_data`` works identically in a single process.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.parallel.mesh import make_mesh
from sr.parallel.multihost import (
    host_local_to_global,
    initialize_multihost,
    is_coordinator,
    multihost_env,
)


@pytest.fixture
def mock_dist(monkeypatch):
    calls = []

    def fake_initialize(**kwargs):
        calls.append(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    return calls


def test_noop_without_config(mock_dist, monkeypatch):
    for var in ("SR_COORDINATOR", "SR_MULTIHOST"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_multihost() is False
    assert mock_dist == []


def test_explicit_args(mock_dist):
    assert initialize_multihost("10.0.0.1:1234", 4, 2) is True
    assert mock_dist == [{
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }]


def test_env_var_path(mock_dist, monkeypatch):
    monkeypatch.setenv("SR_COORDINATOR", "host0:9999")
    monkeypatch.setenv("SR_NUM_PROCESSES", "8")
    monkeypatch.setenv("SR_PROCESS_ID", "3")
    assert multihost_env() == {
        "coordinator_address": "host0:9999",
        "num_processes": 8,
        "process_id": 3,
    }
    assert initialize_multihost() is True
    assert mock_dist[0]["coordinator_address"] == "host0:9999"
    assert mock_dist[0]["num_processes"] == 8
    assert mock_dist[0]["process_id"] == 3


def test_tpu_autodetect_path(mock_dist, monkeypatch):
    monkeypatch.delenv("SR_COORDINATOR", raising=False)
    monkeypatch.setenv("SR_MULTIHOST", "auto")
    assert initialize_multihost() is True
    assert mock_dist == [{}]  # argument-less: TPU runtime autodetection


def test_local_device_ids_forwarded(mock_dist):
    initialize_multihost("h:1", 2, 0, local_device_ids=[0, 1])
    assert mock_dist[0]["local_device_ids"] == [0, 1]


def test_is_coordinator_single_process():
    assert is_coordinator() is True  # process_index 0


def test_host_local_to_global_assembly():
    """Host-local shards become one globally-sharded array the jitted
    step can consume; values land in submission order."""
    mesh = make_mesh((8,), ("data",))
    local = {
        "lr": np.arange(8 * 4 * 4 * 1, dtype=np.float32).reshape(8, 4, 4, 1),
        "hr": np.ones((8, 8, 8, 1), np.float32),
    }
    g = host_local_to_global(local, mesh)
    assert g["lr"].shape == (8, 4, 4, 1)
    assert len(g["lr"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["lr"]), local["lr"])

    # and a jitted reduction over the global array works
    total = jax.jit(lambda b: jnp.sum(b["lr"]))(g)
    assert float(total) == float(local["lr"].sum())
