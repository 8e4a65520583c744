"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test process: the axon
TPU plugin registers itself via sitecustomize when ``PALLAS_AXON_POOL_IPS`` is set,
so we clear it and pin ``JAX_PLATFORMS=cpu`` with 8 virtual host devices (the
standard JAX way to test pjit/shardings without real chips — SURVEY.md §4).
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU kills the whole process ("Termination timeout for `collective call`
# ... Exiting to ensure a consistent program state") when the 8 virtual-device
# threads of an in-process collective don't all reach the rendezvous within the
# default window — observed twice as a mid-suite SIGABRT in the dryrun's
# sharded step under heavy concurrent host load. Raise the windows far beyond
# any plausible scheduler starvation.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
os.environ["XLA_FLAGS"] = flags

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the TPU plugin at
# interpreter startup — before this conftest runs — so jax may already be imported
# with platforms "axon,cpu". Re-pin the platform at the config level; this works as
# long as no backend has been initialized yet (no jax.devices() call).
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on CPU"

# Persistent compile cache makes repeated suite runs fast. The directory is
# fingerprinted by the host's CPU feature flags: XLA:CPU persists AOT-compiled
# machine code whose cache key does NOT include the precise host features, so
# a machine change between rounds would execute code compiled for another CPU;
# a feature-keyed directory makes a new machine start cold instead.
# (The cpu_aot_loader "feature +prefer-no-gather not supported ... may SIGILL"
# warning is benign self-noise: probed to fire on every load, even of entries
# this same machine wrote seconds earlier — XLA embeds prefer-no-scatter/gather
# tuning pseudo-features the host checker doesn't recognize.)
import hashlib
import platform

_feats = platform.machine()
try:
    with open("/proc/cpuinfo") as _f:
        for _line in _f:
            if _line.startswith(("flags", "Features")):
                _feats += _line
                break
except OSError:
    pass
_tag = hashlib.sha1(_feats.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_test_cache_{_tag}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# ALSO export via env so subprocess workers (the 2-process jax.distributed
# tests in test_multihost.py inherit os.environ) share the same persistent
# cache — without this they cold-compile on every suite run, which under
# 1-core suite-level contention blew their 600 s subprocess timeout
# (VERDICT r3 weak #1).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", f"/tmp/jax_test_cache_{_tag}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)


def pytest_sessionfinish(session, exitstatus):
    # diagnose any non-daemon threads that would block interpreter exit
    import sys
    import threading

    stray = [t for t in threading.enumerate()
             if t is not threading.main_thread() and not t.daemon]
    if stray:
        print(f"\n[conftest] non-daemon threads at exit: {[t.name for t in stray]}",
              file=sys.stderr)
