"""Multi-host (multi-process) wiring over the JAX distributed runtime.

The reference has no distributed story at all (SURVEY.md §2.5/§5.8 — single
GPU, no communication backend). The TPU-native scale-out path is one process
per host, a single GLOBAL mesh over every chip in the slice (ICI) or across
slices (DCN), per-process input sharding, and XLA-inserted collectives — no
transport API surface. This module is the only process-topology-aware code in
the framework; everything else sees a global mesh and global arrays.

How the pieces compose on a pod:

  * ``maybe_initialize()`` — call once at entry (train.py does) before any
    device query; brings up ``jax.distributed`` so ``jax.devices()`` is global.
  * ``process_shard()`` — (index, count) for input-pipeline sharding;
    ``get_coco_images_dataset`` applies it automatically so each host decodes
    only its own slice of the corpus.
  * ``globalize_batch(sharding, local)`` — assembles the global batch array
    from each process' host-local rows (``Pipeline.train_step`` under a mesh).
  * ``gather_rows(local_rows)`` — inverse direction for decode outputs: every
    process receives the full (global-batch) result rows.

Single-process behavior is the identity for all of these — the same entry
scripts run unmodified from one chip to a pod.
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = [
    "maybe_initialize",
    "process_shard",
    "is_primary",
    "globalize_batch",
    "localize_rows",
    "gather_rows",
    "barrier",
    "aligned_call",
]

_initialized = False

# Env that marks an explicit multi-process launch. JAX also auto-detects TPU
# pod topologies, but gating on explicit env keeps single-host runs (and CPU
# test processes) away from the distributed runtime entirely.
_COORD_ENV = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")


def maybe_initialize() -> bool:
    """Initialize ``jax.distributed`` when a multi-process launch is declared
    via env (``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, else TPU-pod auto-detection]). No-op (False) on
    single-host runs; idempotent."""
    global _initialized
    if _initialized:
        return True
    coord = next((os.environ[k] for k in _COORD_ENV if os.environ.get(k)), None)
    if coord is None:
        return False
    kwargs = {"coordinator_address": coord}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    # Force the CPU-collectives (Gloo) context to rendezvous NOW, while
    # inter-process skew is ~zero (initialize blocks until every process has
    # connected to the coordinator). Gloo's context init has a hardcoded
    # ~30 s KV-store window; without this, the first real collective fires
    # only after per-process compile work, and any >30 s skew (cold caches,
    # loaded hosts) kills the job with "Gloo context initialization failed:
    # DEADLINE_EXCEEDED" — reproduced by the 2-process CPU tests under
    # 1-core contention. Harmless on TPU backends (one cheap psum).
    try:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("fpn_mt_multihost_init")
    except Exception:  # pragma: no cover - sync is an optimization
        pass
    _initialized = True
    return True


def barrier(name: str, timeout_s: float = 600.0) -> None:
    """Rendezvous every process at the coordination service (pure gRPC — no
    Gloo context, no compile, no hardcoded window). No-op single-process.

    Use this to realign processes after per-process work of uneven duration
    (compiles, data loading): the CPU-collectives (Gloo) backend creates a
    context per compiled collective program at its FIRST execution, with a
    hardcoded ~30 s KV-store rendezvous window, so any >30 s inter-process
    skew at that point kills the job with "Gloo context initialization
    failed: DEADLINE_EXCEEDED" (reproduced by the 2-process CPU tests on a
    loaded 1-core host, where XLA compiles serialize across processes)."""
    if _single_process() or jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # pragma: no cover - initialize() always sets it
        return
    client.wait_at_barrier(name, int(timeout_s * 1000))


def aligned_call(jitted, name: str, cache: dict, *args):
    """Execute a jitted collective program multi-process-safely: AOT-compile
    LOCALLY (no collective, no Gloo), ``barrier`` so every process arrives,
    THEN run the compiled executable — its Gloo context rendezvous happens
    with ~zero skew instead of racing per-process compile times against the
    ~30 s window (see ``barrier``). Compiled executables are memoized in
    ``cache`` by input signature; every process must call with the same
    sequence of signatures (the lockstep contract multi-process decode/train
    already has). Single-process: a plain call."""
    if jax.process_count() == 1:
        return jitted(*args)
    sig = (name,) + tuple(
        (tuple(x.shape), str(x.dtype)) if hasattr(x, "shape") else repr(x)
        for x in jax.tree.leaves(args)
    )
    if sig not in cache:
        compiled = jitted.lower(*args).compile()
        barrier(f"fpn_mt_aligned/{name}/{len(cache)}")
        cache[sig] = compiled
    return cache[sig](*args)


def _single_process() -> bool:
    """True when no multi-process launch is declared. Checked WITHOUT touching
    the JAX backend: the data layer calls ``process_shard`` and must stay
    backend-free on single-host runs (initializing the tunneled TPU backend
    costs ~80 s and pure data jobs never need a device).

    Besides our own ``maybe_initialize`` and the coordinator env vars, this
    also recognizes an EXTERNALLY-initialized ``jax.distributed`` runtime
    (standard pod launchers call ``jax.distributed.initialize()`` directly):
    missing that case split the module into an incoherent half-multi-process
    state — collectives compiled multi-process while ``barrier()`` no-opped
    (losing the Gloo compile-alignment), ``process_shard`` fed every host
    the FULL dataset, and ``is_primary`` made every process a writer."""
    if _initialized or any(os.environ.get(k) for k in _COORD_ENV):
        return False
    try:  # backend-free: the distributed client exists independently of it
        from jax._src import distributed as _jd

        return _jd.global_state.client is None
    except Exception:  # private-API drift: fall back to the declared signals
        return True


def process_shard() -> tuple[int, int]:
    """(shard_index, shard_count) for per-process input sharding."""
    if _single_process():
        return 0, 1
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that should write user-facing artifacts (result
    JSON, TensorBoard events). Checkpoint saves are collective in Orbax and
    must run on ALL processes — don't gate them on this."""
    return _single_process() or jax.process_index() == 0


def globalize_batch(sharding, local: np.ndarray) -> jax.Array:
    """Assemble the global, mesh-sharded batch array from this process'
    host-local rows. Single-process this is ``jax.device_put(local, sharding)``
    (bitwise the same array); multi-process the global batch is the
    concatenation of every process' local rows along axis 0, laid out on the
    global mesh without any cross-host copy of pixel data."""
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def localize_rows(global_arr, mesh) -> np.ndarray:
    """Inverse of ``globalize_batch`` for OUTPUTS: this process' rows of a
    batch-sharded (axis 0 = mesh data axis) global array, as host numpy.
    Single-process: the whole array. Used by the multi-host decode path
    (``Pipeline._predict_chunk``) — a global decode result is not fully
    addressable on any one process, so ``np.asarray`` on it would throw;
    this takes exactly the rows this process contributed, in their original
    local order."""
    if jax.process_count() == 1:
        return np.asarray(global_arr)
    from jax.experimental import multihost_utils

    from .mesh import data_sharding

    # the batch-axis spec comes from the ONE place that defines it
    # (parallel/mesh.py:data_sharding) — renamed data axes stay consistent
    # between globalize_batch and this inverse
    spec = data_sharding(mesh, global_arr.ndim).spec
    local = multihost_utils.global_array_to_host_local_array(
        global_arr, mesh, spec
    )
    return np.asarray(local)


def gather_rows(local_rows: np.ndarray) -> np.ndarray:
    """Give every process the full set of batch rows (concatenation of each
    process' ``local_rows`` in process order). Identity single-process; uses a
    host-level allgather otherwise. Decode outputs are tiny (token ids), so
    this stays well under DCN bandwidth.

    64-bit dtypes (image ids are int64) survive even with ``jax_enable_x64``
    off: ``process_allgather`` round-trips through ``jnp.asarray``, which
    would silently truncate int64→int32 / float64→float32 — instead the rows
    are gathered as uint32 halves and re-viewed, bit-exact.

    0-d input is promoted to one row, so sharing a scalar (the CIDEr gate
    pattern) returns shape ``(process_count,)`` — the naive path used to
    crash reshaping the gathered uint32 halves back around a () shape."""
    arr = np.asarray(local_rows)
    if arr.ndim == 0:
        arr = arr[None]
    if jax.process_count() == 1:
        return arr
    if arr.dtype.itemsize == 8 and not jax.config.jax_enable_x64:
        pairs = np.ascontiguousarray(arr).view(np.uint32).reshape(*arr.shape, 2)
        g = gather_rows(pairs)
        return np.ascontiguousarray(g).view(arr.dtype).reshape(g.shape[:-1])
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(arr)
    return np.reshape(gathered, (-1, *arr.shape[1:]))
