"""Probe Mosaic lowering of manual HBM->VMEM DMA patterns for the fused
backbone, plus per-grid-cell overhead (slope method).

v1 finding: a 4D bf16 HBM array (B, Hp, Wp, 32) sliced ``.at[b, pl.ds(r0, R)]``
crashes the Mosaic compiler (tpu.memref_slice with lane dim < 128). This probes
the alternatives:

  A  4D src, explicit 1-sized batch slice, 4D scratch (1, R, Wp, C)
  B  3D src (B*Hp, Wp, C), single ds on dim 0
  C  4D src with lane dim padded to 128, scalar batch index
  D  2D flat src (B*Hp*Wp, C), single ds on dim 0

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/probe_grid_cell.py > /tmp/probe_grid.log 2>&1 &
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, HP, WP, C = 64, 258, 272, 32
ROWS = 64
N_TILES = 256 // ROWS


def run_variant(name, make_call, x):
    try:
        call = make_call()

        @jax.jit
        def run(x, n):
            def body(_, carry):
                x, acc = carry
                y = call(x)
                s = y.reshape(-1)[:8].sum().astype(jnp.float32)
                return x + (s * 1e-30).astype(x.dtype), acc + s

            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc

        def t(n):
            t0 = time.perf_counter()
            np.asarray(run(x, jnp.int32(n)))
            return time.perf_counter() - t0

        np.asarray(run(x, jnp.int32(1)))
        k = 8
        t1, t2 = t(k), t(2 * k)
        per_call = (t2 - t1) / k
        cells = B * N_TILES
        print(f"{name}: {per_call*1e3:7.3f} ms/call ({per_call/cells*1e6:6.2f} us/cell)",
              flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return False


def variant_a():
    def kernel(x_hbm, o_hbm, x_s, sem):
        idx = pl.program_id(0)
        b = idx // N_TILES
        i = idx % N_TILES
        r0 = i * ROWS + 1
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(b, 1), pl.ds(r0, ROWS)], x_s, sem.at[0]
        )
        cp.start()
        cp.wait()
        x_s[:] = x_s[:] * 2.0
        wb = pltpu.make_async_copy(
            x_s, o_hbm.at[pl.ds(b, 1), pl.ds(r0, ROWS)], sem.at[1]
        )
        wb.start()
        wb.wait()

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(B * N_TILES,),
            out_shape=jax.ShapeDtypeStruct((B, HP, WP, C), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((1, ROWS, WP, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(x)

    return call


def variant_b():
    def kernel(x_hbm, o_hbm, x_s, sem):
        idx = pl.program_id(0)
        b = idx // N_TILES
        i = idx % N_TILES
        r0 = b * HP + i * ROWS + 1
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(r0, ROWS)], x_s, sem.at[0])
        cp.start()
        cp.wait()
        x_s[:] = x_s[:] * 2.0
        wb = pltpu.make_async_copy(x_s, o_hbm.at[pl.ds(r0, ROWS)], sem.at[1])
        wb.start()
        wb.wait()

    def call(x):
        x3 = x.reshape(B * HP, WP, C)
        return pl.pallas_call(
            kernel,
            grid=(B * N_TILES,),
            out_shape=jax.ShapeDtypeStruct((B * HP, WP, C), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((ROWS, WP, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(x3)

    return call


def variant_c():
    CP = 128

    def kernel(x_hbm, o_hbm, x_s, sem):
        idx = pl.program_id(0)
        b = idx // N_TILES
        i = idx % N_TILES
        r0 = i * ROWS + 1
        cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(r0, ROWS)], x_s, sem.at[0])
        cp.start()
        cp.wait()
        x_s[:] = x_s[:] * 2.0
        wb = pltpu.make_async_copy(x_s, o_hbm.at[b, pl.ds(r0, ROWS)], sem.at[1])
        wb.start()
        wb.wait()

    def call(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, CP - C)))
        return pl.pallas_call(
            kernel,
            grid=(B * N_TILES,),
            out_shape=jax.ShapeDtypeStruct((B, HP, WP, CP), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((ROWS, WP, CP), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(xp)

    return call


def variant_d():
    def kernel(x_hbm, o_hbm, x_s, sem):
        idx = pl.program_id(0)
        b = idx // N_TILES
        i = idx % N_TILES
        p0 = (b * HP + i * ROWS + 1) * WP
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(p0, ROWS * WP)], x_s, sem.at[0])
        cp.start()
        cp.wait()
        x_s[:] = x_s[:] * 2.0
        wb = pltpu.make_async_copy(x_s, o_hbm.at[pl.ds(p0, ROWS * WP)], sem.at[1])
        wb.start()
        wb.wait()

    def call(x):
        x2 = x.reshape(B * HP * WP, C)
        return pl.pallas_call(
            kernel,
            grid=(B * N_TILES,),
            out_shape=jax.ShapeDtypeStruct((B * HP * WP, C), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((ROWS * WP, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(x2)

    return call


def main():
    x = jnp.ones((B, HP, WP, C), jnp.bfloat16)
    for name, maker in [("A 4D ds-batch", variant_a), ("B 3D fold-batch", variant_b),
                        ("C 4D lane128", variant_c), ("D 2D flat", variant_d)]:
        run_variant(name, maker, x)


if __name__ == "__main__":
    main()
