"""TF/Keras ``.h5`` weight import for the pretrained MobileNetV2-RetinaNet.

The reference boots its FeatureExtractor from a COCO-pretrained Keras weights
file (``model_weights/mobilenet224_1.0_coco.h5`` —
``/root/reference/models/retinanet.py:277-278``). This tool maps such a file
onto this framework's Flax parameter tree so users can carry their pretrained
backbones over (SURVEY.md §7 hard part (a)).

Keras ``save_weights`` HDF5 layout: top-level groups per layer (listed in the
``layer_names`` attr), each with a ``weight_names`` attr pointing at datasets.
Covered mappings:

  * MobileNetV2 backbone — ``Conv1/bn_Conv1``, ``expanded_conv_*``,
    ``block_<n>_{expand,depthwise,project}[_BN]``, ``Conv_1/Conv_1_bn``
    → ``backbone/{stem,block_<g>_<b>,head}/{conv,bn}`` (the Keras flat block
    index n is re-derived into this framework's (group, block) naming);
  * FPN lateral/output convs — ``C3_reduced/C4_reduced/C5_reduced/P3/P4/P5``
    (named identically in the reference graph) plus the unnamed P6/P7 convs,
    matched by shape and file order;
  * head trunks — ``pyramid_regression_<i>`` / ``pyramid_classification_<i>``
    → ``{regression,classification}_trunk/conv_<i>``.

Weight conversions: conv kernels are HWIO in both frameworks (copied as-is);
Keras DepthwiseConv2D kernels (H, W, C, 1) transpose to Flax's
feature-grouped (H, W, 1, C); BN (γ, β, μ, σ²) split across params
(scale/bias) and batch_stats (mean/var).

Returns updated (params, batch_stats) trees plus a report of
matched/missed entries — import is best-effort by design: anything unmatched
keeps its fresh initialization, mirroring how the reference's graph surgery
discards the pretrained head tails (``retinanet.py:280-288``).
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["load_keras_h5", "write_keras_h5", "import_retinanet_weights", "ImportReport"]

# Keras MobileNetV2 flat block index → (group, block-in-group) for
# _BLOCK_CONFIG in models/backbones/mobilenet_v2.py
_KERAS_BLOCK_TO_GB: dict[int, tuple[int, int]] = {}
_n = 0
for _gi, _reps in enumerate((1, 2, 3, 4, 3, 3, 1)):
    for _bi in range(_reps):
        _KERAS_BLOCK_TO_GB[_n] = (_gi, _bi)
        _n += 1


class ImportReport:
    def __init__(self):
        self.matched: list[str] = []
        self.missed: list[str] = []

    def __repr__(self):
        return f"ImportReport(matched={len(self.matched)}, missed={len(self.missed)})"


def load_keras_h5(path: str) -> dict[str, dict[str, np.ndarray]]:
    """Read a Keras save_weights HDF5 into {layer_name: {weight_name: array}}."""
    import h5py

    out: dict[str, dict[str, np.ndarray]] = {}

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def visit(group):
            names = group.attrs.get("layer_names")
            if names is None:
                return
            for raw in names:
                lname = raw.decode() if isinstance(raw, bytes) else str(raw)
                g = group[lname]
                for wn in g.attrs.get("weight_names", []):
                    wn = wn.decode() if isinstance(wn, bytes) else str(wn)
                    parts = wn.split("/")
                    # '<[nested model/]layer>/<weight>:0' — key by the LAYER
                    # path component, not the group or the basename: a nested
                    # sub-model (e.g. retinanet wrapping the backbone) lists
                    # EVERY inner layer's weights under one top-level group,
                    # so basename keying collapsed them all onto one
                    # 'kernel:0' entry and the inner layer names never
                    # appeared as keys
                    layer = parts[-2] if len(parts) >= 2 else lname
                    out.setdefault(layer, {})[parts[-1]] = np.asarray(g[wn])
                # some writers put layer_names on nested groups too
                visit(g)

        visit(root)
    return out


def write_keras_h5(path: str, layers: dict[str, dict[str, np.ndarray]]) -> None:
    """Write {layer_name: {weight_name: array}} in the legacy Keras
    ``save_weights`` HDF5 layout ``load_keras_h5`` reads (layer groups with
    ``layer_names``/``weight_names`` attrs). Inverse of ``load_keras_h5``;
    used by the golden-fixture capture (scripts/make_weight_golden.py) and the
    synthetic-layout tests."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode() for n in layers])
        for lname, weights in layers.items():
            g = f.create_group(lname)
            wnames = []
            for wn, arr in weights.items():
                full = f"{lname}/{wn}"
                g.create_dataset(full, data=arr)
                wnames.append(full.encode())
            g.attrs["weight_names"] = np.array(wnames)


def _set(tree: dict, path: list[str], value: np.ndarray, report: ImportReport,
         label: str) -> None:
    node = tree
    for k in path[:-1]:
        if k not in node:
            report.missed.append(label)
            return
        node = node[k]
    leaf = path[-1]
    if leaf not in node:
        report.missed.append(label)
        return
    if tuple(node[leaf].shape) != tuple(value.shape):
        report.missed.append(f"{label} (shape {value.shape} vs {node[leaf].shape})")
        return
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    report.matched.append(label)


def _import_convbn(params, stats, layers, keras_conv, keras_bn, our, report):
    """Map a Keras conv(+BN) pair into our _ConvBN module named ``our``."""
    if keras_conv in layers:
        w = layers[keras_conv]
        kernel = w.get("kernel:0", w.get("depthwise_kernel:0"))
        if kernel is not None:
            if "depthwise_kernel:0" in w:
                kernel = np.transpose(kernel, (0, 1, 3, 2))  # (H,W,C,1)→(H,W,1,C)
            _set(params, our + ["conv", "kernel"], kernel, report, keras_conv)
        else:  # layer group exists but carries no conv kernel: surface it —
            report.missed.append(  # the report is the tool's only visibility
                f"{keras_conv} (group has no kernel:0/depthwise_kernel:0)"
            )
        if "bias:0" in w:
            _set(params, our + ["conv", "bias"], w["bias:0"], report, keras_conv + "/bias")
    else:
        report.missed.append(keras_conv)
    if keras_bn and keras_bn in layers:
        b = layers[keras_bn]
        _set(params, our + ["bn", "scale"], b["gamma:0"], report, keras_bn + "/gamma")
        _set(params, our + ["bn", "bias"], b["beta:0"], report, keras_bn + "/beta")
        _set(stats, our + ["bn", "mean"], b["moving_mean:0"], report, keras_bn + "/mean")
        _set(stats, our + ["bn", "var"], b["moving_variance:0"], report, keras_bn + "/var")
    elif keras_bn:
        report.missed.append(keras_bn)


def apply_flat_updates(
    variables: Any, updates: dict[str, np.ndarray]
) -> tuple[Any, ImportReport]:
    """Overwrite parameters by flat ``"a/b/c" -> array`` paths (shape-checked).

    Used by the TF-reference execution-parity harness (tests/tf_reference.py)
    to push weights extracted from the ACTUAL reference Keras model into the
    Flax tree. Paths are relative to ``variables["params"]``."""
    import flax
    import jax

    report = ImportReport()
    params = jax.tree.map(np.asarray, variables["params"])
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    for path, value in updates.items():
        if path not in flat:
            report.missed.append(path)
            continue
        if flat[path].shape != np.shape(value):
            raise ValueError(
                f"shape mismatch at {path}: {flat[path].shape} vs {np.shape(value)}"
            )
        flat[path] = np.asarray(value, dtype=flat[path].dtype)
        report.matched.append(path)
    new_vars = dict(variables)
    new_vars["params"] = flax.traverse_util.unflatten_dict(flat, sep="/")
    return new_vars, report


def import_retinanet_weights(
    variables: Any, h5_path, n_conv_submodule: int = 2
) -> tuple[Any, ImportReport]:
    """Import backbone/FPN/head-trunk weights into a Transformer's variables.

    ``variables``: the flax variables dict ({"params", "batch_stats"}).
    ``h5_path``: a Keras h5 weight file path, or an already-loaded
    ``{layer_name: {weight:0 ...}}`` dict (the in-memory TF-reference parity
    harness builds one from a live Keras model). Returns (new_variables,
    report). Unmatched parameters keep their initialization.
    """
    import jax

    layers = h5_path if isinstance(h5_path, dict) else load_keras_h5(h5_path)
    report = ImportReport()

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    fe_params = params["encoder"]["feature_extractor"]
    fe_stats = stats.get("encoder", {}).get("feature_extractor", {})

    bb_p = fe_params["backbone"]
    bb_s = fe_stats.get("backbone", {})

    # ---- MobileNetV2 backbone ------------------------------------------------
    _import_convbn(bb_p, bb_s, layers, "Conv1", "bn_Conv1", ["stem"], report)
    _import_convbn(bb_p, bb_s, layers, "Conv_1", "Conv_1_bn", ["head"], report)
    for flat, (gi, bi) in _KERAS_BLOCK_TO_GB.items():
        prefix = "expanded_conv" if flat == 0 else f"block_{flat}"
        our = f"block_{gi}_{bi}"
        if flat != 0:
            _import_convbn(bb_p, bb_s, layers, f"{prefix}_expand",
                           f"{prefix}_expand_BN", [our, "expand"], report)
        _import_convbn(bb_p, bb_s, layers, f"{prefix}_depthwise",
                       f"{prefix}_depthwise_BN", [our, "depthwise"], report)
        _import_convbn(bb_p, bb_s, layers, f"{prefix}_project",
                       f"{prefix}_project_BN", [our, "project"], report)

    # ---- FPN -------------------------------------------------------------
    fpn = fe_params["fpn"]
    for name in ("C3_reduced", "C4_reduced", "C5_reduced", "P3", "P4", "P5"):
        if name in layers and "kernel:0" in layers[name]:
            _set(fpn, [name, "kernel"], layers[name]["kernel:0"], report, name)
            if "bias:0" in layers[name]:
                _set(fpn, [name, "bias"], layers[name]["bias:0"], report, name + "/bias")
        else:
            report.missed.append(name)
    # P6/P7 convs are unnamed in the reference graph (auto conv2d_N): match the
    # remaining 3×3 256→256 conv layers by file order
    unnamed = [
        (n, w) for n, w in layers.items()
        if n.startswith("conv2d") and "kernel:0" in w
        and w["kernel:0"].shape == (3, 3, 256, 256)
    ]
    for idx, target in enumerate(("P6_conv", "P7_conv")):
        if idx >= len(unnamed):
            # zip() would truncate silently and the report would show no gap
            report.missed.append(f"(no unnamed 3x3 256x256 conv #{idx})->{target}")
            continue
        n, w = unnamed[idx]
        _set(fpn, [target, "kernel"], w["kernel:0"], report, f"{n}->{target}")
        if "bias:0" in w:
            _set(fpn, [target, "bias"], w["bias:0"], report, f"{n}->{target}/bias")

    # ---- head trunks -------------------------------------------------------
    for i in range(n_conv_submodule):
        for keras_name, our_trunk in (
            (f"pyramid_regression_{i}", "regression_trunk"),
            (f"pyramid_classification_{i}", "classification_trunk"),
        ):
            if keras_name in layers:
                w = layers[keras_name]
                _set(fe_params, [our_trunk, f"conv_{i}", "kernel"],
                     w["kernel:0"], report, keras_name)
                if "bias:0" in w:
                    _set(fe_params, [our_trunk, f"conv_{i}", "bias"],
                         w["bias:0"], report, keras_name + "/bias")
            else:
                report.missed.append(keras_name)

    new_vars = dict(variables)
    new_vars["params"] = params
    if stats:
        new_vars["batch_stats"] = stats
    return new_vars, report
