"""TF .h5 weight import: synthesize a Keras-layout HDF5 and verify values land
on the right Flax leaves (backbone convs/BN, depthwise transpose, FPN, trunks)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax
import jax.numpy as jnp

from fpn_mt_image_captioning_tpu.models.transformer import Transformer
from fpn_mt_image_captioning_tpu.models.positional import create_masks
from fpn_mt_image_captioning_tpu.utils.weight_import import (
    import_retinanet_weights,
    write_keras_h5,
)


@pytest.fixture(scope="module")
def variables(rng):
    model = Transformer(
        num_layers=1, d_model=32, num_heads=4, dff=64,
        input_vocab_size=256, target_vocab_size=50, max_seq_len=8,
    )
    img = jnp.zeros((1, 256, 256, 3))
    tar = jnp.ones((1, 4), dtype=jnp.int32)
    return model.init({"params": rng, "dropout": rng}, img, tar, True, create_masks(tar))


def test_import_maps_backbone_fpn_and_trunks(variables, tmp_path, np_rng):
    r = lambda *s: np_rng.standard_normal(s).astype(np.float32)
    layers = {
        "Conv1": {"kernel:0": r(3, 3, 3, 32)},
        "bn_Conv1": {
            "gamma:0": r(32), "beta:0": r(32),
            "moving_mean:0": r(32), "moving_variance:0": np.abs(r(32)),
        },
        # expanded_conv (flat block 0) — depthwise kernel arrives (H, W, C, 1)
        "expanded_conv_depthwise": {"depthwise_kernel:0": r(3, 3, 32, 1)},
        "expanded_conv_project": {"kernel:0": r(1, 1, 32, 16)},
        # flat block 3 → our group 2, block 0 (first c=32 block)
        "block_3_expand": {"kernel:0": r(1, 1, 24, 144)},
        "Conv_1": {"kernel:0": r(1, 1, 320, 1280)},
        "C5_reduced": {"kernel:0": r(1, 1, 1280, 256), "bias:0": r(256)},
        "P3": {"kernel:0": r(3, 3, 256, 256), "bias:0": r(256)},
        "conv2d_38": {"kernel:0": r(3, 3, 256, 256)},  # unnamed P6 conv
        "conv2d_39": {"kernel:0": r(3, 3, 256, 256)},  # unnamed P7 conv
        "pyramid_regression_0": {"kernel:0": r(3, 3, 256, 256), "bias:0": r(256)},
        "pyramid_classification_1": {"kernel:0": r(3, 3, 256, 256), "bias:0": r(256)},
    }
    path = str(tmp_path / "coco.h5")
    write_keras_h5(path, layers)

    new_vars, report = import_retinanet_weights(variables, path)
    fe = new_vars["params"]["encoder"]["feature_extractor"]
    fe_stats = new_vars["batch_stats"]["encoder"]["feature_extractor"]

    np.testing.assert_array_equal(
        fe["backbone"]["stem"]["conv"]["kernel"], layers["Conv1"]["kernel:0"]
    )
    np.testing.assert_array_equal(
        fe_stats["backbone"]["stem"]["bn"]["mean"], layers["bn_Conv1"]["moving_mean:0"]
    )
    np.testing.assert_array_equal(
        fe["backbone"]["stem"]["bn"]["scale"], layers["bn_Conv1"]["gamma:0"]
    )
    # depthwise kernel transposed (H, W, C, 1) → (H, W, 1, C)
    np.testing.assert_array_equal(
        fe["backbone"]["block_0_0"]["depthwise"]["conv"]["kernel"],
        np.transpose(layers["expanded_conv_depthwise"]["depthwise_kernel:0"], (0, 1, 3, 2)),
    )
    np.testing.assert_array_equal(
        fe["backbone"]["block_0_0"]["project"]["conv"]["kernel"],
        layers["expanded_conv_project"]["kernel:0"],
    )
    # keras flat block 3 → group 2 block 0
    np.testing.assert_array_equal(
        fe["backbone"]["block_2_0"]["expand"]["conv"]["kernel"],
        layers["block_3_expand"]["kernel:0"],
    )
    np.testing.assert_array_equal(
        fe["fpn"]["C5_reduced"]["kernel"], layers["C5_reduced"]["kernel:0"]
    )
    np.testing.assert_array_equal(
        fe["fpn"]["P6_conv"]["kernel"], layers["conv2d_38"]["kernel:0"]
    )
    np.testing.assert_array_equal(
        fe["fpn"]["P7_conv"]["kernel"], layers["conv2d_39"]["kernel:0"]
    )
    np.testing.assert_array_equal(
        fe["regression_trunk"]["conv_0"]["kernel"],
        layers["pyramid_regression_0"]["kernel:0"],
    )
    np.testing.assert_array_equal(
        fe["classification_trunk"]["conv_1"]["kernel"],
        layers["pyramid_classification_1"]["kernel:0"],
    )

    assert len(report.matched) >= 15
    # untouched leaves stay identical to the fresh initialization
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["decoder"]["embedding"]["embedding"]),
        np.asarray(variables["params"]["decoder"]["embedding"]["embedding"]),
    )


def test_imported_backbone_matches_keras_activations():
    """VERDICT r2 #4 — activation-level golden: weights captured from a REAL
    ``keras.applications.MobileNetV2`` (alpha=0.35, random deterministic
    values; scripts/make_weight_golden.py) imported through the h5 mapper must
    reproduce Keras' C3/C4/C5 tap activations (``block_5_add`` /
    ``block_12_add`` / ``out_relu`` — the taps the reference uses,
    ``/root/reference/models/mobilenet.py:64-66``). Catches BatchNorm
    variance/epsilon conventions, the depthwise-kernel transpose, and stride-2
    SAME-padding alignment — errors invisible to shape-mapping tests."""
    import os

    from fpn_mt_image_captioning_tpu.models.backbones.mobilenet_v2 import (
        MobileNetV2Backbone,
    )

    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    golden = np.load(os.path.join(golden_dir, "mobilenet_v2_a035_golden.npz"))
    x = jnp.asarray(golden["x"])

    backbone = MobileNetV2Backbone(alpha=float(golden["alpha"]))
    variables = backbone.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    # wrap in the encoder/feature_extractor nesting the importer expects;
    # FPN/trunk entries are absent in a backbone-only h5 and must be
    # tolerated as "missed"
    nested = {
        "params": {"encoder": {"feature_extractor": {
            "backbone": variables["params"], "fpn": {},
        }}},
        "batch_stats": {"encoder": {"feature_extractor": {
            "backbone": variables["batch_stats"],
        }}},
    }
    new_vars, report = import_retinanet_weights(
        nested, os.path.join(golden_dir, "mobilenet_v2_a035.h5")
    )
    # every backbone conv + BN quadruple must land (52 weighted keras layers
    # → ≥150 matched leaves); nothing may be dropped for shape mismatch
    assert len(report.matched) >= 150
    assert not any("shape" in m for m in report.missed), report.missed[:5]

    fe = new_vars["params"]["encoder"]["feature_extractor"]
    fe_s = new_vars["batch_stats"]["encoder"]["feature_extractor"]
    c3, c4, c5 = backbone.apply(
        {"params": fe["backbone"], "batch_stats": fe_s["backbone"]}, x, train=False
    )
    np.testing.assert_allclose(np.asarray(c3), golden["C3"], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(c4), golden["C4"], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(c5), golden["C5"], atol=2e-4, rtol=1e-3)


def test_import_shape_mismatch_is_reported_not_fatal(variables, tmp_path, np_rng):
    layers = {
        "Conv1": {"kernel:0": np_rng.standard_normal((3, 3, 3, 99)).astype(np.float32)},
    }
    path = str(tmp_path / "bad.h5")
    write_keras_h5(path, layers)
    new_vars, report = import_retinanet_weights(variables, path)
    assert any("Conv1" in m for m in report.missed)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder"]["feature_extractor"]["backbone"]["stem"]["conv"]["kernel"]),
        np.asarray(variables["params"]["encoder"]["feature_extractor"]["backbone"]["stem"]["conv"]["kernel"]),
    )


def test_nested_submodel_h5_import(variables, tmp_path, np_rng):
    """Keras h5s that wrap the backbone as a SUB-MODEL store every inner
    layer's weights under one top-level group, with weight_names carrying the
    full 'inner_layer/weight:0' paths. Keying by basename used to collapse
    them all onto one 'kernel:0' entry (whole backbone silently left at random
    init); weights must be keyed by the LAYER path component."""
    r = lambda *s: np_rng.standard_normal(s).astype(np.float32)
    inner = {
        "Conv1/kernel:0": r(3, 3, 3, 32),
        "bn_Conv1/gamma:0": r(32),
        "bn_Conv1/beta:0": r(32),
        "bn_Conv1/moving_mean:0": r(32),
        "bn_Conv1/moving_variance:0": np.abs(r(32)),
        "expanded_conv_depthwise/depthwise_kernel:0": r(3, 3, 32, 1),
        "expanded_conv_project/kernel:0": r(1, 1, 32, 16),
    }
    path = str(tmp_path / "nested.h5")
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([b"mobilenetv2_1.00_224"])
        g = f.create_group("mobilenetv2_1.00_224")
        g.attrs["weight_names"] = np.array([k.encode() for k in inner])
        for k, v in inner.items():
            g.create_dataset(k, data=v)

    new_vars, report = import_retinanet_weights(variables, path)
    bb = new_vars["params"]["encoder"]["feature_extractor"]["backbone"]
    bs = new_vars["batch_stats"]["encoder"]["feature_extractor"]["backbone"]
    np.testing.assert_array_equal(
        bb["stem"]["conv"]["kernel"], inner["Conv1/kernel:0"]
    )
    np.testing.assert_array_equal(
        bs["stem"]["bn"]["mean"], inner["bn_Conv1/moving_mean:0"]
    )
    np.testing.assert_array_equal(
        bb["block_0_0"]["depthwise"]["conv"]["kernel"],
        np.transpose(inner["expanded_conv_depthwise/depthwise_kernel:0"],
                     (0, 1, 3, 2)),
    )
    assert any("Conv1" in m for m in report.matched)
    # truncated unnamed-conv matching must SURFACE the gap, not zip past it
    assert any("P6_conv" in m for m in report.missed)
    assert any("P7_conv" in m for m in report.missed)
