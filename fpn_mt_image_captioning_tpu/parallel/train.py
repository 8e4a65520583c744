"""Sharded (pjit) training step over a device mesh.

Builds the same pure train step as the single-chip Pipeline, but with explicit
input/output shardings: batch arrays sharded over ``data``, parameters sharded by
the TP rules (or replicated), optimizer state following the parameters. XLA
compiles in the gradient psum over ``data`` and the TP collectives over ``model``
— sharded jit is the modern pjit (SURVEY.md §2.5 plan).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import Transformer
from ..train.pipeline import TrainState, build_train_step_fn
from .mesh import data_sharding, param_shardings, replicated

__all__ = [
    "make_sharded_train_step",
    "shard_state",
    "state_shardings",
    "make_sharded_decode_encode",
    "make_sharded_beam_search",
]


def state_shardings(mesh: Mesh, state: TrainState, tp: bool = True) -> TrainState:
    """TrainState-shaped tree of NamedShardings for the mesh rules. ``state``
    leaves may be real arrays OR ShapeDtypeStructs (only shape/ndim are read),
    so AOT compile checks share this exact rule with the training path."""
    from .mesh import _path_str, param_spec

    p_shard = param_shardings(mesh, state.params, tp=tp)
    rep = replicated(mesh)

    # Optimizer state embeds param-shaped trees (KerasAdamState m/v/vhat,
    # train/schedule.py — was optax amsgrad mu/nu/nu_max before r4) whose leaf
    # paths end with the param path, so the same TP rules apply; scalars (count)
    # are replicated.
    def opt_shard(path, leaf):
        if getattr(leaf, "ndim", 0) == 0:
            return rep
        return NamedSharding(mesh, param_spec(_path_str(path), leaf, tp, mesh))

    opt_shardings = jax.tree_util.tree_map_with_path(opt_shard, state.opt_state)
    # batch_stats replicated (the conv trunk is replicated)
    bs_shardings = jax.tree.map(lambda _: rep, state.batch_stats)
    return TrainState(p_shard, bs_shardings, opt_shardings, rep)


def shard_state(mesh: Mesh, state: TrainState, tp: bool = True) -> tuple[TrainState, Any]:
    """Device_put the TrainState according to mesh rules; returns (state, shardings)."""
    shardings = state_shardings(mesh, state, tp=tp)
    placed = jax.device_put(state, shardings)
    return placed, shardings


def make_sharded_train_step(
    mesh: Mesh,
    model: Transformer,
    optimizer: optax.GradientTransformation,
    state_shardings: TrainState,
    seed: int = 0,
) -> Callable[[TrainState, jax.Array, jax.Array], tuple[TrainState, jax.Array]]:
    img_sharding = data_sharding(mesh, 4)
    cap_sharding = data_sharding(mesh, 2)

    # the step BODY is the single-chip one (single source of truth for the
    # objective); only the jit decoration — shardings + donation — differs
    return jax.jit(
        build_train_step_fn(model, optimizer, seed),
        in_shardings=(state_shardings, img_sharding, cap_sharding),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )


def make_sharded_decode_encode(mesh: Mesh, model: Transformer):
    """Batch-sharded encoder forward for parallel serving."""
    img_sharding = data_sharding(mesh, 4)

    @functools.partial(jax.jit, in_shardings=(None, img_sharding))
    def encode(variables, images):
        return model.apply(variables, images, train=False, method=Transformer.encode)

    return encode


def make_sharded_beam_search(
    mesh: Mesh,
    model: Transformer,
    *,
    beam_n: int,
    max_len: int,
    start_token: int,
    end_token: int,
    parity: bool = False,
    fused: bool = True,
    pack_dtype=None,  # fused path's weight/compute dtype (None = engine default)
):
    """Batch-sharded beam search via ``shard_map`` over the ``data`` axis.

    GSPMD cannot partition the hand-written fused Pallas decoder kernel
    (ops/fused_decoder.py), but it doesn't need to: beam search is
    batch-parallel by construction — beams never interact across batch items
    (SURVEY.md §2.5's shard-aware serving requirement). Each device therefore
    runs the FULL engine (encode output slice → fused kernel decode loop) on
    its local batch shard with replicated weights; the decomposition is exact,
    so sequences match the unsharded engine bit-for-bit.

    Variables enter with a replicated spec — under TP-sharded serving state the
    wrapping jit inserts one all-gather per call (decode weights are ~50 MB in
    bf16; negligible against a 60-step decode).
    """
    from ..decode.beam_search import beam_search

    data_axis = mesh.axis_names[0]

    kw = {} if pack_dtype is None else {"pack_dtype": pack_dtype}

    def local(variables, enc):
        return beam_search(
            model, variables, enc,
            beam_n=beam_n, max_len=max_len,
            start_token=start_token, end_token=end_token,
            parity=parity, fused=fused, **kw,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis), P(data_axis)),
        # the fused kernel's pallas_call out_shapes carry no varying-mesh-axes
        # annotation; the engine is collective-free, so rep-checking adds nothing
        check_vma=False,
    )
    return jax.jit(fn)
