"""Per-grid-cell cost of a manual-DMA pallas kernel (slope method).

The fused-backbone design runs one grid cell per (image, row-tile) with manual
HBM->VMEM->HBM DMAs. This measures the fixed per-cell cost (DMA issue+wait +
cell dispatch) as a function of grid size at constant total bytes, so tile
sizing can be chosen: cells of size (rows, 272, C) over a (64, 258, 272, C)
bf16 activation — the g1b0 shape.

Run: PYTHONPATH=/root/repo nohup python scripts/probe_grid_cell.py > /tmp/probe_grid.log 2>&1 &
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, HP, WP, C = 64, 258, 272, 32


def make_copy_fn(rows_per_cell: int):
    n_tiles = 256 // rows_per_cell

    def kernel(x_hbm, o_hbm, x_s, o_s, sem):
        idx = pl.program_id(0)
        b = idx // n_tiles
        i = idx % n_tiles
        r0 = i * rows_per_cell + 1
        cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(r0, rows_per_cell)], x_s, sem.at[0])
        cp.start()
        cp.wait()
        o_s[:] = x_s[:] * 2.0 + 1.0
        wb = pltpu.make_async_copy(o_s, o_hbm.at[b, pl.ds(r0, rows_per_cell)], sem.at[1])
        wb.start()
        wb.wait()

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(B * n_tiles,),
            out_shape=jax.ShapeDtypeStruct((B, HP, WP, C), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((rows_per_cell, WP, C), jnp.bfloat16),
                pltpu.VMEM((rows_per_cell, WP, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(x)

    @jax.jit
    def run(x, n):
        def body(_, carry):
            x, acc = carry
            y = call(x)
            s = y[0, 1, 1, 0].astype(jnp.float32)
            return x + (s * 1e-30).astype(x.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    return run, B * n_tiles


def slope(run, x, k=8):
    def t(n):
        t0 = time.perf_counter()
        np.asarray(run(x, jnp.int32(n)))
        return time.perf_counter() - t0

    np.asarray(run(x, jnp.int32(1)))
    t1, t2 = t(k), t(2 * k)
    return (t2 - t1) / k


def main():
    x = jnp.ones((B, HP, WP, C), jnp.bfloat16)
    total_mb = B * 256 * WP * C * 2 * 2 / 1e6  # read + write, real rows only
    for rows in (256, 128, 64, 32, 16):
        run, cells = make_copy_fn(rows)
        t = slope(run, x)
        per_cell = t / cells
        print(
            f"rows/cell={rows:4d} cells={cells:5d}: {t*1e3:7.3f} ms/call "
            f"({per_cell*1e6:6.2f} us/cell, {total_mb/1e3/t:6.1f} GB/s eff)",
            flush=True,
        )


if __name__ == "__main__":
    main()
