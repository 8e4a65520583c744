"""Fused inverted-residual MobileNetV2 backbone for TPU serving.

The Flax backbone (models/backbones/mobilenet_v2.py — the counterpart of the
Keras application the reference taps, ``/root/reference/models/mobilenet.py:43-72``)
runs each block as three XLA convs; every expand/depthwise intermediate round-trips
HBM (~4 GB per batch-64 at 512², the measured backbone bottleneck). This module
runs each block — expand 1×1 → relu6 → depthwise 3×3 → relu6 → project 1×1
(+residual) — inside ONE ``pallas_call`` per block, with BatchNorm folded into
the conv weights (inference semantics), so HBM sees only each block's input and
output.

Layout contract between blocks: activations live as ``(B, H+2, Wp, Cp)`` bf16
with one zero border row/column on every side, ``Wp = round_up(W+2, 16)``
(trailing columns also zero) and ``Cp = round_up(C, 128)`` (pad channels zero).
Zero borders give the 3×3 depthwise its SAME padding for free via statically-
shifted flat slices; a mask keeps the borders zero through the pointwise convs
(whose folded BN bias would otherwise leak into them). The 128-lane channel
padding is REQUIRED by Mosaic: manual DMA slices of HBM refs fail to lower
unless the minor dim is tiling-aligned ("Slice shape along dimension 3 must be
aligned to tiling (128)") — and it is free in HBM terms, because XLA's TPU
layout already tile-pads the minor dim of every (…, C<128) array to 128 lanes.
Pad channels stay exactly zero end-to-end: packed weights carry zero pad
rows/columns, so no garbage can propagate into real channels.

Per grid cell (one image × one row-tile): the input row-tile + 1-row halo is
DMA'd to VMEM, the whole block computes in VMEM/registers, and the output tile
is DMA'd back. Stride-2 blocks downsample rows in-kernel (leading-dim reshape
selects even rows) but keep full-x resolution; the cheap column downselect
happens in XLA after the kernel (its traffic is the already-small block output).

TF/Keras SAME-padding parity: stride-1 3×3 pads 1/1; stride-2 on even extents
pads 0 top/left and 1 bottom/right — both match the stored zero borders
(verified against the Flax backbone in tests/test_fused_backbone.py).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.backbones.mobilenet_v2 import _BLOCK_CONFIG

__all__ = [
    "pack_backbone_weights",
    "fused_ir_block",
    "fused_mobilenet_backbone",
    "pad_to_bordered",
    "unpad_bordered",
]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# weight packing: fold inference BatchNorm into conv weights
# ---------------------------------------------------------------------------
def _fold(conv_bn_params: Any, conv_bn_stats: Any, eps: float = 1e-3):
    """(kernel', bias') with BN (scale, bias, mean, var) folded in."""
    k = jnp.asarray(conv_bn_params["conv"]["kernel"], jnp.float32)
    bn = conv_bn_params["bn"]
    g = jnp.asarray(bn["scale"], jnp.float32)
    b = jnp.asarray(bn["bias"], jnp.float32)
    mu = jnp.asarray(conv_bn_stats["bn"]["mean"], jnp.float32)
    var = jnp.asarray(conv_bn_stats["bn"]["var"], jnp.float32)
    s = g * jax.lax.rsqrt(var + eps)
    return k * s, b - mu * s


def pack_backbone_weights(params: Any, batch_stats: Any, dtype=jnp.bfloat16) -> dict:
    """Walk the Flax MobileNetV2 tree -> folded stem/head convs + per-block
    packed kernels. Matmul weights are 2D ``(Cin, Cout)``; depthwise weights
    are ``(16, C)`` float32 (9 taps row-major ``dy*3+dx``, rows 9..15 zero).
    Channel dims that cross the block's HBM boundary (Cin rows of the expand
    matmul, Cout columns of the project matmul) are zero-padded to the
    128-lane bordered-layout contract; for expansion-1 blocks the depthwise
    channel dim IS the HBM channel dim, so it is padded too."""

    def pad_rows(a, m):
        return jnp.zeros((m, a.shape[1]), a.dtype).at[: a.shape[0]].set(a)

    def pad_cols(a, m):
        return jnp.zeros((a.shape[0], m), a.dtype).at[:, : a.shape[1]].set(a)

    blocks = []
    for gi, (t, c, n, s) in enumerate(_BLOCK_CONFIG):
        for bi in range(n):
            name = f"block_{gi}_{bi}"
            p, st = params[name], batch_stats[name]
            blk: dict[str, Any] = {}
            wd, bd = _fold(p["depthwise"], st["depthwise"])
            cexp = wd.shape[-1]
            wp_, bp_ = _fold(p["project"], st["project"])
            cout = wp_.shape[-1]
            if t != 1:
                we, be = _fold(p["expand"], st["expand"])
                cin = we.shape[2]
                cin_p = _round_up(cin, 128)
                blk["w_exp"] = pad_rows(we[0, 0].astype(dtype), cin_p)  # (Cin_p, Cexp)
                blk["b_exp"] = be[None, :]                              # (1, Cexp) f32
                dw_p = cexp
            else:
                cin = cexp
                cin_p = _round_up(cin, 128)
                dw_p = cin_p  # depthwise channels live on the HBM boundary
            wd9 = wd[:, :, 0, :].reshape(9, cexp)
            blk["w_dw"] = jnp.zeros((16, dw_p), jnp.float32).at[:9, :cexp].set(wd9)
            blk["b_dw"] = pad_cols(bd[None, :], dw_p)
            cout_p = _round_up(cout, 128)
            blk["w_proj"] = pad_cols(
                pad_rows(wp_[0, 0].astype(dtype), dw_p), cout_p
            )                                                           # (dw_p, Cout_p)
            blk["b_proj"] = pad_cols(bp_[None, :], cout_p)
            meta = {
                "stride": s if bi == 0 else 1,
                "residual": (s if bi == 0 else 1) == 1 and cin == cout,
                "c_out": cout,
            }
            blocks.append((blk, meta))

    ws, bs = _fold(params["stem"], batch_stats["stem"])
    wh, bh = _fold(params["head"], batch_stats["head"])
    return {
        "stem_k": ws.astype(dtype), "stem_b": bs,               # (3,3,3,C0)
        "head_k": wh[0, 0].astype(dtype), "head_b": bh,         # (Cin, 1280)
        "blocks": blocks,
    }


# ---------------------------------------------------------------------------
# the per-block kernel
# ---------------------------------------------------------------------------
def _ir_kernel(
    x_hbm,                   # (B, Hin+2, Wp, Cin) ANY
    w_exp, b_exp,            # (Cin, Cexp) dtype / (1, Cexp) f32  [dummy if t=1]
    w_dw, b_dw,              # (16, Cexp) f32 / (1, Cexp) f32
    w_proj, b_proj,          # (Cexp, Cout) dtype / (1, Cout) f32
    o_hbm,                   # (B, Hout+2, Wp, Cout) ANY
    x_s,                     # (R, Wp, Cin) VMEM
    h_s,                     # (8 + R*Wp, Cexp) f32 VMEM
    hr_s,                    # (8 + TH*Wp, Cexp) f32 VMEM — stride-2 row staging
    o_s,                     # (TH, Wp, Cout) VMEM (dtype)
    z_s,                     # (1, Wp, Cout) VMEM (dtype) — zero border row
    sem,                     # DMA (2,)
    *,
    stride: int,
    th: int,                 # output rows per cell
    n_tiles: int,
    h_in: int,
    w_in: int,
    has_expand: bool,
    residual: bool,
):
    idx = pl.program_id(0)
    b = idx // n_tiles
    i = idx % n_tiles
    wp = x_s.shape[1]
    cexp = h_s.shape[1]
    f32 = jnp.float32
    dtype = x_s.dtype
    r = x_s.shape[0]         # th+2 (s1) or 2*th+1 (s2)
    npix = r * wp

    # ---- input tile (+halo) --------------------------------------------------
    r0 = i * th if stride == 1 else 2 * i * th + 1
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(r0, r)], x_s, sem.at[0])
    cp.start()
    cp.wait()

    x2 = x_s[:].reshape(npix, x_s.shape[2])

    # ---- expand 1×1 (+BN+relu6) ----------------------------------------------
    if has_expand:
        h = jnp.dot(x2, w_exp[:], preferred_element_type=f32) + b_exp[:]
        h = jnp.clip(h, 0.0, 6.0)
    else:
        h = x2.astype(f32)

    # zero h wherever the INPUT pixel is padding (the depthwise conv must see
    # zeros there, but the folded BN bias makes h = relu6(b_exp) instead).
    # Masks built in 3D (row/col are separate iota dims — no div/mod), then
    # flattened like the data.
    row3 = r0 + jax.lax.broadcasted_iota(jnp.int32, (r, wp, cexp), 0)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (r, wp, cexp), 1)
    real = (
        (row3 >= 1) & (row3 <= h_in) & (col3 >= 1) & (col3 <= w_in)
    ).reshape(npix, cexp)
    h = jnp.where(real, h, 0.0)

    # ---- depthwise 3×3 (+BN+relu6) -------------------------------------------
    # taps are statically-shifted flat slices; the 8-row zero prologue/epilogue
    # make the ±1 shifts of the extreme taps read zeros instead of out-of-bounds
    h_s[8 : 8 + npix, :] = h
    h_s[0:8, :] = jnp.zeros((8, cexp), f32)
    tail = h_s.shape[0] - (8 + npix)
    h_s[8 + npix :, :] = jnp.zeros((tail, cexp), f32)

    opix = th * wp
    acc = b_dw[:] * jnp.ones((opix, cexp), f32)
    if stride == 1:
        for dy in range(3):
            for dx in range(3):
                start = 8 + dy * wp + dx - 1
                acc += w_dw[dy * 3 + dx : dy * 3 + dx + 1, :] * h_s[start : start + opix, :]
    else:
        # rows: tile row 2*y + dy via flat reshape (th, 2wp)[:, :wp], staged in
        # hr_s (a separate buffer — h_s rows are still live for later dy);
        # cols stay full-x — XLA downselects columns after the kernel
        for dy in range(3):
            sel = h_s[8 + dy * wp : 8 + dy * wp + 2 * opix, :]
            sel = sel.reshape(th, 2 * wp, cexp)[:, :wp, :].reshape(opix, cexp)
            hr_s[8 : 8 + opix, :] = sel
            hr_s[0:8, :] = jnp.zeros((8, cexp), f32)
            hr_s[8 + opix :, :] = jnp.zeros((8, cexp), f32)
            for dx in range(3):
                start = 8 + dx - 1
                acc += w_dw[dy * 3 + dx : dy * 3 + dx + 1, :] * hr_s[start : start + opix, :]
    acc = jnp.clip(acc, 0.0, 6.0)

    # ---- project 1×1 (+BN, linear) -------------------------------------------
    out = jnp.dot(acc.astype(dtype), w_proj[:], preferred_element_type=f32)
    out = out + b_proj[:]
    if residual:
        out = out + x2[wp : wp + opix, :].astype(f32)

    # keep the zero-border invariant: borders/padding columns -> 0
    cout = out.shape[-1]
    colo = jax.lax.broadcasted_iota(jnp.int32, (th, wp, cout), 1).reshape(opix, cout)
    out = jnp.where((colo >= 1) & (colo <= w_in), out, 0.0)

    o_s[:, :, :] = out.astype(dtype).reshape(th, wp, cout)
    wb = pltpu.make_async_copy(o_s, o_hbm.at[b, pl.ds(1 + i * th, th)], sem.at[1])
    wb.start()
    wb.wait()

    # border rows (never covered by any tile): first/last cell zero them
    @pl.when(i == 0)
    def _top():
        z_s[:, :, :] = jnp.zeros(z_s.shape, dtype)
        zb = pltpu.make_async_copy(z_s.at[0:1], o_hbm.at[b, pl.ds(0, 1)], sem.at[1])
        zb.start()
        zb.wait()

    @pl.when(i == n_tiles - 1)
    def _bottom():
        z_s[:, :, :] = jnp.zeros(z_s.shape, dtype)
        h_out = h_in if stride == 1 else h_in // 2
        zb = pltpu.make_async_copy(
            z_s.at[0:1], o_hbm.at[b, pl.ds(h_out + 1, 1)], sem.at[1]
        )
        zb.start()
        zb.wait()


def _pick_th(h_out: int, wp: int, cin: int, cexp: int, cout: int, stride: int) -> int:
    """Largest tile height (divisor of h_out, ≤128) whose VMEM footprint fits."""
    budget = 72 * 1024 * 1024
    lane = lambda c: _round_up(c, 128)
    th = min(h_out, 128)
    while th > 1:
        if h_out % th == 0:
            r = th + 2 if stride == 1 else 2 * th + 1
            vm = (
                r * wp * lane(cin) * 2                 # x_s bf16
                + (8 + r * wp) * lane(cexp) * 4        # h_s f32
                + 2 * th * wp * lane(cexp) * 4         # acc + tap temporaries
                + th * wp * lane(cout) * 4             # out f32 value
                + th * wp * lane(cout) * 2             # o_s
            )
            if vm <= budget:
                return th
        th //= 2
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("stride", "h_in", "w_in", "residual", "interpret"),
)
def fused_ir_block(
    x: jax.Array,            # (B, Hin+2, Wp, Cin) bordered layout
    blk: dict,               # array weights only (w_exp/b_exp optional)
    *,
    stride: int,
    h_in: int,
    w_in: int,
    residual: bool,
    interpret: bool = False,
):
    """One inverted-residual block on the bordered layout. Returns the bordered
    output: stride 1 -> (B, Hin+2, Wp, Cout); stride 2 -> (B, Hin/2+2, Wp, Cout)
    still at full x (caller downselects columns)."""
    bsz, hp, wp, cin = x.shape
    has_expand = "w_exp" in blk
    dtype = x.dtype
    cexp = blk["w_dw"].shape[1]
    cout = blk["w_proj"].shape[1]
    if stride == 2 and (h_in % 2 or w_in % 2):
        # the h_in // 2 below and _downselect_cols assume even extents; odd
        # ones need TF SAME's asymmetric ceil-halving, which this layout does
        # not implement — fail loudly instead of silently diverging from the
        # XLA backbone (512/256-class sizes stay even at every stride-2 block)
        raise ValueError(
            f"fused backbone requires even extents at stride-2 blocks, got "
            f"{h_in}x{w_in}; use an image_input_size divisible by 32"
        )
    h_out = h_in if stride == 1 else h_in // 2
    th = _pick_th(h_out, wp, cin, cexp, cout, stride)
    n_tiles = h_out // th
    r = th + 2 if stride == 1 else 2 * th + 1

    w_exp = blk["w_exp"] if has_expand else jnp.zeros((cin, cexp), dtype)
    b_exp = blk["b_exp"] if has_expand else jnp.zeros((1, cexp), jnp.float32)

    kernel = functools.partial(
        _ir_kernel,
        stride=stride, th=th, n_tiles=n_tiles, h_in=h_in, w_in=w_in,
        has_expand=has_expand, residual=residual,
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz * n_tiles,),
        out_shape=jax.ShapeDtypeStruct((bsz, h_out + 2, wp, cout), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((r, wp, cin), dtype),
            # prologue 8 + data + epilogue (8, plus the discarded half of the
            # last even/odd row pair for stride-2 selections)
            pltpu.VMEM((16 + r * wp + (wp if stride == 2 else 0), cexp), jnp.float32),
            pltpu.VMEM((16 + (th * wp if stride == 2 else 0), cexp), jnp.float32),
            pltpu.VMEM((th, wp, cout), dtype),
            pltpu.VMEM((1, wp, cout), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, w_exp, b_exp, blk["w_dw"], blk["b_dw"], blk["w_proj"], blk["b_proj"])


# ---------------------------------------------------------------------------
# bordered-layout helpers + full backbone
# ---------------------------------------------------------------------------
def pad_to_bordered(x: jax.Array, c_pad: int | None = None) -> jax.Array:
    """(B, H, W, C) -> (B, H+2, Wp, Cp) with zero borders, Wp = round_up(W+2, 16)
    and Cp = ``c_pad`` (defaults to C — kernel callers pass round_up(C, 128))."""
    b, h, w, c = x.shape
    wp = _round_up(w + 2, 16)
    cp = c if c_pad is None else c_pad
    return jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, cp - c)))


def unpad_bordered(x: jax.Array, h: int, w: int, c: int | None = None) -> jax.Array:
    return x[:, 1 : h + 1, 1 : w + 1, : (x.shape[-1] if c is None else c)]


def _downselect_cols(y: jax.Array, w_in: int) -> jax.Array:
    """Stride-2 column fix: keep even centered columns (stored 2, 4, ..., w_in),
    then rebuild the bordered width."""
    w_out = w_in // 2
    sel = y[:, :, 2 : w_in + 1 : 2, :]
    wp_out = _round_up(w_out + 2, 16)
    return jnp.pad(sel, ((0, 0), (0, 0), (1, wp_out - w_out - 1), (0, 0)))


def fused_mobilenet_backbone(
    packed: dict, images: jax.Array, *, interpret: bool = False
):
    """Full MobileNetV2 forward on folded weights: images (B, S, S, 3) in [-1, 1]
    -> (C3, C4, C5) exactly like MobileNetV2Backbone.__call__(train=False).
    Stem and head run as XLA convs (MXU-friendly already); the 17 inverted-
    residual blocks run fused."""
    dtype = packed["stem_k"].dtype
    x = jax.lax.conv_general_dilated(
        images.astype(dtype), packed["stem_k"], (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = jnp.clip(x.astype(jnp.float32) + packed["stem_b"], 0.0, 6.0).astype(dtype)

    h = w = x.shape[1]
    x = pad_to_bordered(x, c_pad=_round_up(x.shape[-1], 128))
    taps = {}
    bi = 0
    for gi, (t, c, n, s) in enumerate(_BLOCK_CONFIG):
        for j in range(n):
            blk, meta = packed["blocks"][bi]
            bi += 1
            stride = meta["stride"]
            y = fused_ir_block(
                x, blk, stride=stride, h_in=h, w_in=w,
                residual=meta["residual"], interpret=interpret,
            )
            if stride == 2:
                y = _downselect_cols(y, w)
                h, w = h // 2, w // 2
            x = y
        if gi == 2:
            taps["C3"] = unpad_bordered(x, h, w, c=meta["c_out"])
        elif gi == 4:
            taps["C4"] = unpad_bordered(x, h, w, c=meta["c_out"])

    x5 = unpad_bordered(x, h, w, c=packed["head_k"].shape[0])
    c5 = jnp.dot(x5, packed["head_k"], preferred_element_type=jnp.float32)
    c5 = jnp.clip(c5 + packed["head_b"], 0.0, 6.0).astype(dtype)
    return taps["C3"], taps["C4"], c5


def supports_fused_backbone(backbone_name: str) -> bool:
    return backbone_name.startswith("mobilenet")


def fused_encode(model, variables: Any, images: jax.Array, *, interpret: bool = False):
    """Serving encode with the backbone as fused Pallas blocks: pack+fold the
    MobileNetV2 weights (cheap; traced once under jit), run the fused backbone,
    then FPN/heads/UMV encoder through the regular flax apply
    (``Transformer.encode_from_taps``)."""
    from ..models.layers import normalize_images

    fe_params = variables["params"]["encoder"]["feature_extractor"]
    fe_stats = variables["batch_stats"]["encoder"]["feature_extractor"]
    packed = pack_backbone_weights(
        fe_params["backbone"], fe_stats["backbone"], dtype=model.dtype
    )
    # this path bypasses Encoder.__call__, so apply the uint8 → [-1, 1]
    # on-device normalization here too
    c3, c4, c5 = fused_mobilenet_backbone(
        packed, normalize_images(images), interpret=interpret
    )
    return model.apply(
        variables, c3, c4, c5, train=False, method=type(model).encode_from_taps
    )
