"""Measure per-pallas_call fixed overhead and a representative fused-IR tile.

Times (a) a trivial pallas kernel called N times sequentially inside one jit,
(b) the same work as pure XLA, (c) an XLA inverted-residual block chain vs its
FLOP/bandwidth bounds. Informs whether per-block pallas calls are viable for
the MobileNetV2 backbone (17 blocks).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    r = fn(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        np.asarray(r)
    return (time.perf_counter() - t0) / iters


def trivial_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def chain_pallas(x, n):
    def call(x):
        return pl.pallas_call(
            trivial_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    for _ in range(n):
        x = call(x)
    return x.sum()


def chain_xla(x, n):
    for _ in range(n):
        x = x + 1.0
    return x.sum()


def main():
    x = jnp.zeros((256, 256), jnp.float32)
    for n in (1, 8, 32):
        tp = timeit(jax.jit(lambda x, n=n: chain_pallas(x, n)), x)
        tx = timeit(jax.jit(lambda x, n=n: chain_xla(x, n)), x)
        per_call = (tp - tx) / n
        print(f"n={n:3d}: pallas {tp*1e3:7.3f} ms, xla {tx*1e3:7.3f} ms, "
              f"per-call overhead ~{per_call*1e6:7.1f} us", flush=True)

    # XLA inverted-residual block timing at the two hottest configs
    for (H, C, T, COUT, S) in [(256, 16, 6, 24, 2), (128, 24, 6, 32, 2),
                               (64, 32, 6, 64, 2), (128, 24, 6, 24, 1)]:
        B = 64
        x = jnp.zeros((B, H, H, C), jnp.bfloat16)
        we = jnp.zeros((1, 1, C, C * T), jnp.bfloat16)
        wd = jnp.zeros((3, 3, 1, C * T), jnp.bfloat16)
        wp = jnp.zeros((1, 1, C * T, COUT), jnp.bfloat16)

        @jax.jit
        def block(x, we, wd, wp, s=S):
            h = jax.lax.conv_general_dilated(
                x, we, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jax.nn.relu6(h)
            h = jax.lax.conv_general_dilated(
                h, wd, (s, s), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C * T)
            h = jax.nn.relu6(h)
            h = jax.lax.conv_general_dilated(
                h, wp, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return h.sum()

        t = timeit(block, x, we, wd, wp, iters=10)
        flops = 2 * B * H * H * (C * C * T + 9 * C * T / (S * S) + C * T * COUT / (S * S))
        traffic = B * H * H * 2 * (C + C * T + C * T / (S * S) + COUT / (S * S))
        print(f"IR {H}x{H}x{C} t{T}->{COUT} s{S}: {t*1e3:7.2f} ms  "
              f"({flops/t/1e12:5.1f} TF/s eff, minimal-traffic bound "
              f"{B*H*H*2*(C + COUT/(S*S))/200e9*1e3:5.2f} ms, "
              f"unfused traffic {traffic/200e9*1e3:5.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
