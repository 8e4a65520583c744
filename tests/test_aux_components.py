"""Aux component tests: anchors, figure dumper, profiling, schedules, clipnorm."""

import numpy as np
import pytest

from fpn_mt_image_captioning_tpu.models.anchors import (
    AnchorParameters,
    all_anchors,
    anchors_for_level,
    box_decode,
)


def test_anchor_counts_and_geometry():
    params = AnchorParameters()
    a = anchors_for_level(4, 4, 3, params)
    assert a.shape == (4 * 4 * 9, 4)
    # ratio-1 scale-1 anchor at the first location is a 32×32 box centered at
    # the half-stride point (4, 4)
    first_center = a[3]  # ratios (0.5, 1, 2) × scales → index 3 = ratio 1.0, scale 0
    w = first_center[2] - first_center[0]
    h = first_center[3] - first_center[1]
    np.testing.assert_allclose([w, h], [32, 32], rtol=1e-5)
    np.testing.assert_allclose(
        [(first_center[0] + first_center[2]) / 2, (first_center[1] + first_center[3]) / 2],
        [4.0, 4.0], atol=1e-5,
    )


def test_all_anchors_pyramid_total():
    a = all_anchors(256)
    total = sum((256 // s) ** 2 * 9 for s in (8, 16, 32, 64, 128))
    assert a.shape == (total, 4)


def test_box_decode_clips():
    import jax.numpy as jnp

    anchors = np.array([[0, 0, 32, 32]], np.float32)
    deltas = jnp.asarray([[10.0, 10.0, 10.0, 10.0]])
    boxes = box_decode(anchors, deltas, image_size=64)
    assert float(boxes.max()) <= 64.0
    assert float(boxes.min()) >= 0.0


def test_save_fig_png(tmp_path, np_rng):
    from fpn_mt_image_captioning_tpu.utils.figures import save_fig_png

    arr = np_rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    path = save_fig_png(arr, "test_features", out_dir=str(tmp_path))
    import os

    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_step_timer():
    from fpn_mt_image_captioning_tpu.utils.profiling import StepTimer

    t = StepTimer(window=4)
    for _ in range(6):
        t.start()
        t.stop()
    s = t.summary()
    assert s["steps"] == 4
    assert s["p50_ms"] >= 0
    # an unpaired stop is a caller bug: recording ~0 ms would silently drag
    # the window's percentiles down
    import pytest

    with pytest.raises(RuntimeError, match="without a matching start"):
        t.stop()


def test_varint_negative_terminates():
    """Protobuf varints encode negative int64s as 10-byte two's-complement —
    Python's arithmetic right shift never reaches 0, so the encoder used to
    loop forever on e.g. step=-1."""
    from fpn_mt_image_captioning_tpu.utils.tensorboard import _varint

    b = _varint(-1)
    assert len(b) == 10 and b[-1] == 0x01  # canonical -1 varint
    assert _varint(0) == b"\x00"
    assert _varint(300) == b"\xac\x02"


def test_step_tracer_captures_window(tmp_path):
    """StepTracer (the --profile_dir surface, SURVEY §5.1) opens a
    jax.profiler trace at `start`, closes it at `stop`, and writes a
    TensorBoard profile plugin directory; close() is idempotent."""
    import glob
    import jax
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.utils.profiling import StepTracer

    logdir = str(tmp_path / "profile")
    tracer = StepTracer(logdir, start=1, stop=3)
    x = jnp.ones((8, 8))
    for i in range(5):
        tracer.step(i)
        np.asarray(jax.jit(lambda a: a @ a)(x))
    tracer.close()
    tracer.close()  # idempotent
    traces = glob.glob(f"{logdir}/plugins/profile/*/*")
    assert traces, "no profile trace written"

    # fewer steps than the window: close() must end the open trace
    tracer2 = StepTracer(str(tmp_path / "p2"), start=0, stop=10)
    tracer2.step(0)
    tracer2.close()
    assert glob.glob(f"{tmp_path}/p2/plugins/profile/*/*")


def test_build_train_run_traces_and_keeps_loss_live():
    """Trace (no XLA compile — that takes >10 min on CPU even at micro dims)
    the shared training-throughput runner behind ``bench.py --train`` and
    ``benchmarks/train_throughput.py``.  Asserts the runner (a) lowers cleanly
    at micro dims and (b) returns the accumulated loss — the output that keeps
    every step's parameter chain live so XLA's while-loop DCE cannot strip the
    gradient work and time an empty counter loop."""
    import jax
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.models.positional import create_masks
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer
    from fpn_mt_image_captioning_tpu.utils.profiling import build_train_run

    model = Transformer(
        num_layers=1, d_model=32, num_heads=4, dff=64,
        input_vocab_size=(256 // 16) ** 2, target_vocab_size=50,
        max_seq_len=8, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    img1 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    tar1 = jnp.ones((1, 7), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, img1, tar1, True, create_masks(tar1)
    )

    run, state, img, caps = build_train_run(
        model, variables, batch=2, seq_len=8, image_size=256, vocab=50,
    )
    lowered = run.lower(state, img, caps, jnp.int32(2))
    step_shape, loss_shape = lowered.out_info
    assert loss_shape.dtype == jnp.float32  # loss_sum output present
    text = lowered.as_text()
    assert "while" in text  # the n-step loop actually lowered


def test_custom_schedule_golden_values():
    """Closed-form check of the modified-Noam schedule (reference utils.py:45-50)."""
    from fpn_mt_image_captioning_tpu.train.schedule import custom_schedule

    sched = custom_schedule(2048, warmup_steps=4000)
    d_term = 2048 ** -0.5
    # warmup region: lr = rsqrt(d) · step · w^-1.5
    np.testing.assert_allclose(
        float(sched(100)), d_term * 100 * 4000 ** -1.5, rtol=1e-5
    )
    # far past warmup: arg1 = rsqrt(step)/((step-w)/(2w))
    step = 100_000
    arg1 = step ** -0.5 / ((step - 4000) / 8000)
    np.testing.assert_allclose(float(sched(step)), d_term * arg1, rtol=1e-5)


def test_per_variable_clipnorm():
    import jax
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.train.schedule import clip_by_per_variable_norm

    init, update = clip_by_per_variable_norm(1.0)
    grads = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.3, 0.4])}
    clipped, _ = update(grads, init(grads))
    # ||a|| = 5 → scaled to norm 1; ||b|| = 0.5 → untouched
    np.testing.assert_allclose(np.asarray(clipped["a"]), [0.6, 0.8], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["b"]), [0.3, 0.4], rtol=1e-6)
