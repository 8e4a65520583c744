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


_WORKER = r"""
import os, sys, json
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:" + port
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)
import numpy as np
import jax, jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from fpn_mt_image_captioning_tpu.parallel import multihost as mh

assert mh.maybe_initialize() is True
assert mh.maybe_initialize() is True  # idempotent
assert jax.process_count() == 2 and jax.process_index() == pid
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
assert mh.process_shard() == (pid, 2)
assert mh.is_primary() == (pid == 0)

mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
sharding = NamedSharding(mesh, P("data"))
local = np.arange(8, dtype=np.float32).reshape(4, 2) + 100 * pid
g = mh.globalize_batch(sharding, local)          # global (8, 2) from 2x(4, 2)
assert g.shape == (8, 2)
total = float(jnp.sum(g))                        # XLA collective over both procs

rows = mh.gather_rows(local)                     # host allgather, process order
assert rows.shape == (8, 2)
print(json.dumps({"pid": pid, "sum": total,
                  "first": float(rows[0, 0]), "last": float(rows[-1, 0])}))
"""


@pytest.mark.slow
def test_two_process_distributed_runtime(tmp_path):
    """Launch a REAL 2-process jax.distributed runtime (CPU, 4 virtual devices
    per process = 8 global) and exercise every multi-process branch of
    parallel/multihost.py: initialize, process_shard, is_primary,
    globalize_batch (global array from per-process local rows + a cross-process
    XLA collective over it), and gather_rows ordering."""
    import os
    import socket
    import subprocess
    import sys as _sys

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([_sys.executable, str(worker), str(pid), port],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]

    import json as _json

    def report(out):  # Gloo teardown chatter may follow the JSON line
        line = [l for l in out.splitlines() if l.startswith('{"pid"')][-1]
        return _json.loads(line)

    reports = sorted((report(out) for out, _ in outs), key=lambda r: r["pid"])
    # global batch = concat(p0 rows 0..7, p1 rows 100..107): sum = 28 + 828
    assert reports[0]["sum"] == reports[1]["sum"] == 856.0
    # gather_rows returns ALL rows in process order on BOTH processes
    for r in reports:
        assert (r["first"], r["last"]) == (0.0, 106.0)
