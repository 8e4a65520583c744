"""Per-pallas_call fixed overhead on the real chip, slope-measured.

Chains of N dependent pallas calls run inside one jit; cost per call is the
slope (t(2N) - t(N)) / N, so tunnel RTT and dispatch cancel. Three variants:

  A. trivial kernel, 1 operand (256,256) f32, no grid;
  B. trivial kernel, grid=(7,) (the decoder kernel's cell count);
  C. decoder-shaped launch: grid=(7,), scalar prefetch, the fused decoder's
     operand count/shapes/BlockSpecs and scratch allocations, but a trivial
     body — isolates the fixed cost of the real kernel's structure from its
     compute.

Interpretation: (fused decoder at pos=0) - C  ==  actual compute+stall time;
C - A == cost of grid cells + operand streaming.

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/probe_launch_overhead.py > /tmp/probe_lo.log 2>&1 &
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CHAIN = 96
BK, D, DFF, VP, LPAD, LENC, BITEMS, NL, TILE = 512, 512, 2048, 2048, 64, 16, 64, 6, 128


def slope(make_fn, k=N_CHAIN):
    """make_fn(n) -> nullary jitted runner; returns seconds per chain link."""
    f1, f2 = make_fn(k), make_fn(2 * k)

    def t(f):
        np.asarray(f())  # warm/compile
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(f())
        return (time.perf_counter() - t0) / 3

    return (t(f2) - t(f1)) / k


def variant_a():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def call(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    def make(n):
        @jax.jit
        def run(x):
            for _ in range(n):
                x = call(x)
            return x.sum()

        x = jnp.zeros((256, 256), jnp.float32)
        return lambda: run(x)

    return make


def variant_b():
    def kern(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = x_ref[:] + 1.0

    def call(x):
        return pl.pallas_call(
            kern,
            grid=(7,),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec((256, 256), lambda l: (0, 0))],
            out_specs=pl.BlockSpec((256, 256), lambda l: (0, 0)),
        )(x)

    def make(n):
        @jax.jit
        def run(x):
            for _ in range(n):
                x = call(x)
            return x.sum()

        x = jnp.zeros((256, 256), jnp.float32)
        return lambda: run(x)

    return make


def variant_c(compute_dots: int = 0, with_oh: bool = True):
    nl = NL - 1

    def kern(pos_ref, x_ref, *refs):
        # refs: [oh if with_oh], 13 weight blocks, kv_cross, wf, bf, scores,
        # fin, k_hbm, v_hbm, then outputs (tops, topi, k_out, v_out), scratch
        base = 1 if with_oh else 0
        w1_ref = refs[base + 8]   # (1, D, DFF)
        tops_ref = refs[base + 20]
        x_s = refs[base + 24]
        layer = pl.program_id(0)

        @pl.when(layer == 0)
        def _():
            x_s[:] = x_ref[:]

        @pl.when(layer < NL)
        def _():
            # optional per-cell compute load to test DMA/compute overlap
            for i in range(compute_dots):
                h = jnp.dot(
                    x_s[:], w1_ref[0], preferred_element_type=jnp.float32
                )
                x_s[:] = (x_s[:].astype(jnp.float32) + h[:, :D] * 1e-30).astype(
                    x_s.dtype
                )

        @pl.when(layer == NL)
        def _():
            tops_ref[:] = (
                x_s[:, :128].astype(jnp.float32)
                + pos_ref[0].astype(jnp.float32) * 0.0
            )

    dtype = jnp.bfloat16
    oh_spec = (
        [pl.BlockSpec((4, LPAD, TILE, TILE), lambda l, *_: (0, 0, 0, 0))]
        if with_oh else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NL + 1,),
        in_specs=[
            pl.BlockSpec((BK, D), lambda l, *_: (0, 0)),
            *oh_spec,
            pl.BlockSpec((1, D, 3 * D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, 3 * D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, D, D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, D, D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, D, D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, D, DFF), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, DFF), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, DFF, D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 8, D), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec(
                (1, LENC, BITEMS, 2 * D), lambda l, *_: (jnp.minimum(l, nl), 0, 0, 0)
            ),
            pl.BlockSpec((D, VP), lambda l, *_: (0, 0)),
            pl.BlockSpec((1, VP), lambda l, *_: (0, 0)),
            pl.BlockSpec((BK, 1), lambda l, *_: (0, 0)),
            pl.BlockSpec((BK, 1), lambda l, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BK, 128), lambda l, *_: (0, 0)),
            pl.BlockSpec((BK, 128), lambda l, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((BK, D), dtype),
            pltpu.VMEM((2, BK, D), dtype),
            pltpu.VMEM((2, LPAD, TILE, D), dtype),
            pltpu.VMEM((2, LPAD, TILE, D), dtype),
            pltpu.VMEM((BK, D), dtype),
            pltpu.VMEM((LPAD, TILE, 128), jnp.float32),
            pltpu.VMEM((TILE, D), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )

    def call(args, x, k_hbm, v_hbm):
        (oh, ws, kv_cross, wf, bf, scores, fin) = args
        tops, topi, k_new, v_new = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((BK, 128), jnp.float32),
                jax.ShapeDtypeStruct((BK, 128), jnp.int32),
                jax.ShapeDtypeStruct(k_hbm.shape, dtype),
                jax.ShapeDtypeStruct(v_hbm.shape, dtype),
            ],
            input_output_aliases=(
                {21: 2, 22: 3} if with_oh else {20: 2, 21: 3}
            ),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(jnp.zeros((1,), jnp.int32), x, *([oh] if with_oh else []), *ws,
          kv_cross, wf, bf, scores, fin, k_hbm, v_hbm)
        return tops, k_new, v_new

    def make(n):
        dt = dtype
        ws = [
            jnp.zeros((NL, D, 3 * D), dt), jnp.zeros((NL, 1, 3 * D), dt),
            jnp.zeros((NL, D, D), dt), jnp.zeros((NL, 1, D), dt),
            jnp.zeros((NL, D, D), dt), jnp.zeros((NL, 1, D), dt),
            jnp.zeros((NL, D, D), dt), jnp.zeros((NL, 1, D), dt),
            jnp.zeros((NL, D, DFF), dt), jnp.zeros((NL, 1, DFF), dt),
            jnp.zeros((NL, DFF, D), dt), jnp.zeros((NL, 1, D), dt),
            jnp.zeros((NL, 8, D), jnp.float32),
        ]
        oh = jnp.zeros((4, LPAD, TILE, TILE), dt)
        kv_cross = jnp.zeros((NL, LENC, BITEMS, 2 * D), dt)
        wf = jnp.zeros((D, VP), dt)
        bf = jnp.zeros((1, VP), jnp.float32)
        scores = jnp.zeros((BK, 1), jnp.float32)
        fin = jnp.zeros((BK, 1), jnp.float32)
        k_hbm = jnp.zeros((NL, LPAD, BK, D), dt)
        v_hbm = jnp.zeros((NL, LPAD, BK, D), dt)
        x = jnp.zeros((BK, D), dt)
        args = (oh, ws, kv_cross, wf, bf, scores, fin)

        @jax.jit
        def run(args, x, k_hbm, v_hbm):
            # caches flow THROUGH the chain so the aliased buffers donate
            # cleanly — loop-invariant donated operands get copied every call
            # (the first version of this probe measured exactly that artifact)
            for _ in range(n):
                t, k_hbm, v_hbm = call(args, x, k_hbm, v_hbm)
                x = x + (t.sum() * 1e-30).astype(x.dtype)  # dependency
            return x.sum()

        return lambda: run(args, x, k_hbm, v_hbm)

    return make


def main():
    import sys

    variants = [
        ("A trivial", variant_a),
        ("B grid7", variant_b),
        ("C decoder-shaped", variant_c),
        ("D compute-overlap", lambda: variant_c(compute_dots=8)),
        ("E no-oh", lambda: variant_c(with_oh=False)),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, mk in variants:
        if only and not name.startswith(only):
            continue
        t = slope(mk())
        print(f"{name:20s} {t*1e6:8.1f} us/call", flush=True)


if __name__ == "__main__":
    main()
