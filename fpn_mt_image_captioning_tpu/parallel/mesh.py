"""Device mesh and sharding rules.

The reference is strictly single-device (SURVEY.md §2.5 — no tf.distribute, no
communication backend). This module is the framework's parallelism foundation,
expressed the TPU-native way: one ``jax.sharding.Mesh`` with ``data`` (DP) and
``model`` (TP) axes, parameters annotated with ``PartitionSpec`` rules, and XLA
inserting every collective (psum for DP grad reduction, all-gather/reduce-scatter
for TP) over ICI — there is no NCCL-style transport API to call.

Tensor-parallel rules follow the Megatron column→row pattern per block:
  * attention q/k/v projections: column-parallel (heads split over ``model``);
    the output projection: row-parallel;
  * FFN: ``ffn1`` column-parallel over dff, ``ffn2`` row-parallel;
  * embeddings/conv/LayerNorm/small tensors: replicated (the CNN trunk is
    bandwidth-bound and small — sharding it would trade ICI latency for nothing).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

__all__ = ["make_mesh", "param_spec", "param_shardings", "data_sharding", "replicated"]

# (regex over '/'-joined param path, PartitionSpec) — first match wins
_TP_RULES: list[tuple[str, P]] = [
    # batched multi-view attention (stacked per-view weights)
    (r".*/mva/wq$", P(None, None, "model")),
    (r".*/mva/bq$", P(None, "model")),
    (r".*/mva/wo$", P(None, "model", None)),
    (r".*/mva/bo$", P()),
    (r".*/kv_proj$", P(None, None, None, "model")),
    (r".*/kv_bias$", P(None, None, "model")),
    # standard attention
    (r".*/(wq|wk|wv)/kernel$", P(None, "model")),
    (r".*/(wq|wk|wv)/bias$", P("model")),
    (r".*/out/kernel$", P("model", None)),
    (r".*/out/bias$", P()),
    (r".*/ffn1/kernel$", P(None, "model")),
    (r".*/ffn1/bias$", P("model")),
    (r".*/ffn2/kernel$", P("model", None)),
    (r".*/ffn2/bias$", P()),
    (r"(.*/)?final_layer/kernel$", P(None, "model")),
    (r"(.*/)?final_layer/bias$", P("model")),
]


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    model = max(cfg.model_axis_size, 1)
    data = cfg.data_axis_size if cfg.data_axis_size > 0 else n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def param_spec(path: str, leaf=None, tp: bool = True, mesh: Mesh | None = None) -> P:
    """PartitionSpec for a parameter identified by its '/'-joined path.

    When ``leaf`` and ``mesh`` are given, a rule whose sharded dimensions don't
    divide evenly by the mesh axis size falls back to replication (e.g. a vocab
    not divisible by the model axis)."""
    if tp:
        for pattern, spec in _TP_RULES:
            if re.match(pattern, path):
                if mesh is not None and "model" not in mesh.axis_names:
                    if len(mesh.axis_names) < 2:
                        # data-only mesh (no second axis to shard params
                        # over): replicate instead of IndexError-ing on the
                        # positional rename below
                        return P()
                    # MeshConfig.model_axis is configurable; the rules above
                    # are written against the canonical name. make_mesh always
                    # builds (data, model) axis order, so rename positionally.
                    spec = P(*(
                        mesh.axis_names[1] if a == "model" else a for a in spec
                    ))
                if leaf is not None and mesh is not None:
                    shape = getattr(leaf, "shape", ())
                    for dim, axis in enumerate(spec):
                        if axis is not None and shape[dim] % mesh.shape[axis] != 0:
                            return P()
                return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params: Any, tp: bool = True) -> Any:
    """Pytree of NamedShardings matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(_path_str(path), leaf, tp, mesh)),
        params,
    )


def data_sharding(mesh: Mesh, ndim: int = 4, axis: str | None = None) -> NamedSharding:
    """Batch-axis sharding for an ndim-dimensional array (batch leading).
    The data axis defaults to the mesh's FIRST axis (make_mesh's order), so
    renamed axes (``--mesh.data_axis=dp``) work throughout."""
    axis = mesh.axis_names[0] if axis is None else axis
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
