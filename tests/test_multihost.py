"""Multi-host wiring (parallel/multihost.py): single-process identity
semantics, env gating, and the global-batch assembly path on a virtual mesh."""

import numpy as np
import pytest

from fpn_mt_image_captioning_tpu.parallel import multihost
from fpn_mt_image_captioning_tpu.parallel.mesh import data_sharding, make_mesh
from fpn_mt_image_captioning_tpu.config import MeshConfig


def test_no_env_means_single_process(monkeypatch):
    for k in multihost._COORD_ENV:
        monkeypatch.delenv(k, raising=False)
    assert multihost.maybe_initialize() is False
    assert multihost.process_shard() == (0, 1)
    assert multihost.is_primary() is True


def test_process_shard_never_inits_backend_single_host(monkeypatch):
    """The data layer calls process_shard; it must not touch jax.devices()."""
    for k in multihost._COORD_ENV:
        monkeypatch.delenv(k, raising=False)
    import jax

    def boom(*a, **k):
        raise AssertionError("backend touched")

    monkeypatch.setattr(jax, "process_index", boom)
    monkeypatch.setattr(jax, "process_count", boom)
    assert multihost.process_shard() == (0, 1)
    assert multihost.is_primary() is True


def test_globalize_batch_identity_on_mesh():
    import jax

    mesh = make_mesh(MeshConfig(data_axis_size=8, model_axis_size=1),
                     jax.devices()[:8])
    local = np.arange(8 * 2 * 3, dtype=np.float32).reshape(8, 2, 3)
    arr = multihost.globalize_batch(data_sharding(mesh, 3), local)
    np.testing.assert_array_equal(np.asarray(arr), local)
    assert arr.sharding.is_equivalent_to(data_sharding(mesh, 3), 3)


def test_gather_rows_identity():
    rows = np.arange(12).reshape(4, 3)
    np.testing.assert_array_equal(multihost.gather_rows(rows), rows)


def test_coordinator_env_is_detected(monkeypatch):
    """With a coordinator declared, process_shard consults the runtime (which
    reports one process here) instead of short-circuiting."""
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:12345")
    assert multihost._single_process() is False
    assert multihost.process_shard() == (0, 1)  # runtime says 1 process


def test_predict_batch_refuses_multiprocess(monkeypatch):
    """Pipeline.predict_batch must fail loudly, not mis-order, multi-process."""
    import jax

    from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

    pipe = Pipeline.__new__(Pipeline)  # no heavy init needed for the guard
    pipe.config = __import__(
        "fpn_mt_image_captioning_tpu.config", fromlist=["Config"]
    ).Config()
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(NotImplementedError):
        pipe.predict_batch(np.zeros((1, 32, 32, 3), np.float32))
