"""Profiling / tracing utilities.

The reference has no profiling story (SURVEY.md §5.1 — only ad-hoc
``time.time()``). This module makes tracing first-class:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    TensorBoard-viewable traces of device execution;
  * ``annotate(name)`` — named trace spans (``jax.profiler.TraceAnnotation``);
  * ``StepTimer`` — host-side rolling step timing with percentile summaries,
    synchronizing via device→host copies (``block_until_ready`` is unreliable
    on tunneled backends — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import numpy as np

__all__ = [
    "trace", "annotate", "StepTimer", "sync", "train_step_slope",
    "build_train_run",
]


def sync(tree: Any) -> None:
    """Force completion of device work by copying one leaf to the host."""
    import jax

    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[0])


def train_step_slope(
    model: Any,
    variables: dict,
    *,
    batch: int,
    seq_len: int,
    image_size: int,
    vocab: int,
    k: int,
    schedule_dim: int = 2048,
    seed: int = 0,
) -> dict:
    """Slope-measured teacher-forced training throughput (images/sec/chip).

    Runs K and 2K full optimizer steps (fwd + bwd + AMSGrad update, per-step
    dropout keys folded from the step counter exactly as
    ``train/pipeline.py``'s real step does) back-to-back ON DEVICE inside one
    jit — a ``lax.fori_loop`` carrying the whole ``TrainState`` and
    accumulating the loss so XLA cannot elide any step — and reports
    ``(t(2K) − t(K)) / K``: tunnel latency and dispatch cancel exactly
    (bench.py documents the method; host-side per-step timing measures the
    ~30 ms/sync tunnel RTT instead of the chip).

    ``variables`` must be float32 (the model's compute dtype provides the
    bf16 mixed precision); ``schedule_dim`` defaults to ``dff=2048`` to match
    the reference's ``CustomSchedule(dff)`` quirk (the LR value is irrelevant
    to throughput, but the update arithmetic should match production).
    Shared by ``bench.py --train`` and ``benchmarks/train_throughput.py``.
    """
    import jax.numpy as jnp

    run, state, img, caps = build_train_run(
        model, variables, batch=batch, seq_len=seq_len, image_size=image_size,
        vocab=vocab, schedule_dim=schedule_dim, seed=seed,
    )

    def t(n):
        t0 = time.perf_counter()
        _, acc = run(state, img, caps, jnp.int32(n))
        np.asarray(acc)  # sync (block_until_ready unreliable on tunnel)
        return time.perf_counter() - t0

    t(1)  # warm / compile
    t1, t2 = t(k), t(2 * k)
    step_ms = max((t2 - t1) / k, 1e-9) * 1000
    return {
        "images_per_sec": round(batch / (step_ms / 1000), 2),
        "step_ms": round(step_ms, 2),
        "batch": batch,
    }


def build_train_run(
    model: Any,
    variables: dict,
    *,
    batch: int,
    seq_len: int,
    image_size: int,
    vocab: int,
    schedule_dim: int = 2048,
    seed: int = 0,
):
    """Build the jitted n-step training runner used by ``train_step_slope``.

    Returns ``(run, state, img, caps)`` where ``run(state, img, caps, n)``
    executes n optimizer steps on device and returns ``(final_step,
    loss_sum)``.  The loss sum is a REQUIRED output: it makes every step's
    parameter chain live, so XLA's while-loop dead-code elimination cannot
    strip the gradient/update work and time an empty counter loop.  Exposed
    separately so tests can ``jax.jit(...).lower()`` the runner (trace-only —
    XLA:CPU takes >10 min to actually compile the fwd+bwd loop even at micro
    dims)."""
    import jax
    import jax.numpy as jnp

    from ..train.pipeline import TrainState, build_train_step_fn
    from ..train.schedule import custom_schedule, make_optimizer

    optimizer = make_optimizer(custom_schedule(schedule_dim, 4000))
    state = TrainState(
        variables["params"], variables.get("batch_stats", {}),
        optimizer.init(variables["params"]), jnp.int32(0),
    )

    rng = np.random.default_rng(seed)
    img = jnp.asarray(
        rng.standard_normal((batch, image_size, image_size, 3), dtype=np.float32) * 0.5
    )
    caps = jnp.asarray(
        rng.integers(1, max(vocab - 1, 2), size=(batch, seq_len), dtype=np.int64),
        jnp.int32,
    )

    # the step body is THE production step (train/pipeline.py) — the
    # throughput benchmark must time the real training computation, so any
    # change to the objective flows here automatically
    step_fn = build_train_step_fn(model, optimizer, seed)

    @jax.jit
    def run(state, img, caps, n):
        def body(_, carry):
            st, acc = carry
            st, loss = step_fn(st, img, caps)
            return st, acc + loss

        st, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return st.step, acc

    return run, state, img, caps


@contextlib.contextmanager
def trace(logdir: str = "logs/profile"):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside an active trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTracer:
    """First-class ``--profile_dir`` surface (SURVEY §5.1): capture a
    TensorBoard device-profile trace over a window of training steps.

    Call ``step(i)`` once per step with a running index; the trace opens at
    ``start`` (default 1, skipping the compile step so it doesn't dominate the
    timeline) and closes at ``stop``. ``close()`` is idempotent and ends an
    open trace early (e.g. when the run has fewer steps than the window)."""

    def __init__(self, logdir: str, start: int = 1, stop: int = 4):
        self.logdir = logdir
        self.start = start
        self.stop = stop
        self._active = False
        self._done = False

    def step(self, i: int) -> None:
        import jax

        if self._done:
            return
        if not self._active and i >= self.start:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._active and i >= self.stop:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False
        self._done = True


class StepTimer:
    """Rolling wall-clock timer for training/serving steps."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result: Any = None) -> float:
        if self._t0 is None:
            # silently recording ~0 ms would drag the window's percentiles
            # down with garbage samples — an unpaired stop is a caller bug
            raise RuntimeError("StepTimer.stop() without a matching start()")
        if result is not None:
            sync(result)
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_ms": float(arr.mean() * 1000),
            "p50_ms": float(np.percentile(arr, 50) * 1000),
            "p90_ms": float(np.percentile(arr, 90) * 1000),
            "p99_ms": float(np.percentile(arr, 99) * 1000),
            "steps": len(arr),
        }
