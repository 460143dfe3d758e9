"""Fused CAS sharpen + quantize as a Pallas TPU kernel.

One pass over HBM: reads the pre-CAS f32 image once (plus a halo band per
tile), computes the full CAS stencil (VkResample.cpp:887-923) in VMEM, and
writes uint8 — where the XLA formulation materializes intermediate f32
stencil operands.  Planar (C, H, W) layout in and out.

Grid: (C, H/BH).  Input stays in HBM (ANY memory space); each grid step
DMAs its row band into VMEM scratch.  TPU DMA slices must be 8-row
(sublane) aligned, so the image is pre-padded with 8 edge-replicated rows
top and bottom and each step copies [i*BH, i*BH + BH + 16) — the one-row
stencil halo rides inside the aligned window.  Neighbor rows are built as
full-band shifts so the final output slice [8, 8+BH) stays aligned.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 8  # sublane alignment of DMA slices


def _yshift_up(a):
    return jnp.concatenate([a[:1, :], a[:-1, :]], axis=0)


def _yshift_dn(a):
    return jnp.concatenate([a[1:, :], a[-1:, :]], axis=0)


def _cas_band(band: jnp.ndarray, sharpen: float) -> jnp.ndarray:
    """(R, W) f32 -> (R, W) uint8 CAS output; rows [1, R-1) are valid.

    Temporary count is kept low (VMEM pressure): x-extremes are folded
    before taking y-shifts, so corner mins/maxes derive from two arrays
    instead of eight.
    """
    W = band.shape[1]
    ln = jnp.clip(jnp.abs(band), 0.0, 1.0)

    west = jnp.concatenate([ln[:, :1], ln[:, : W - 1]], axis=1)
    east = jnp.concatenate([ln[:, 1:], ln[:, W - 1 :]], axis=1)
    xmin = jnp.minimum(west, east)  # min(w, e) per row
    xmax = jnp.maximum(west, east)
    wpe = west + east  # for the cross sum later
    del west, east

    n = _yshift_up(ln)
    s = _yshift_dn(ln)
    min_cross = jnp.minimum(jnp.minimum(n, s), jnp.minimum(ln, xmin))
    max_cross = jnp.maximum(jnp.maximum(n, s), jnp.maximum(ln, xmax))
    # corners = y-shifts of the x-extremes
    min_all = jnp.minimum(
        min_cross, jnp.minimum(_yshift_up(xmin), _yshift_dn(xmin))
    )
    max_all = jnp.maximum(
        max_cross, jnp.maximum(_yshift_up(xmax), _yshift_dn(xmax))
    )
    c = ln

    minlen = 0.5 * (min_cross + min_all)
    maxlen = 0.5 * (max_cross + max_all)

    one = jnp.float32(1.0)
    lo = minlen / (one - minlen)
    hi = (one - maxlen) / maxlen
    sc = jnp.where(lo < hi, lo, hi)
    sc = jnp.where(jnp.isnan(sc), jnp.float32(0.0), sc)
    sc = -jnp.float32(sharpen) * jnp.sqrt(jnp.maximum(sc, 0.0))

    out = (c + sc * (n + s + wpe)) / (one + 4.0 * sc)
    return jnp.clip(out * 255.0, 0.0, 255.0)


def _cas_kernel(v_hbm, out_ref, scratch, sem, *, sharpen: float, bh: int, H: int):
    c = pl.program_id(0)
    i = pl.program_id(1)
    # clamped 8-aligned window [start, start+bh+16): interior blocks carry
    # an 8-row halo on each side; the first/last block shift the window
    # inward and the in-band edge-duplicating shifts provide the clamp
    # semantics (VkResample.cpp:889-892) for the true image border.
    start = pl.multiple_of(
        jnp.clip(i * bh - _PAD, 0, H - (bh + 2 * _PAD)), _PAD
    )
    dma = pltpu.make_async_copy(
        v_hbm.at[c, pl.ds(start, bh + 2 * _PAD), :], scratch, sem
    )
    dma.start()
    dma.wait()
    out = _cas_band(scratch[:], sharpen)
    # offset in {0, 8, 16}; Mosaic can't slice values dynamically, so
    # branch over the three static (sublane-aligned) slices
    offset = i * bh - start

    def _store(o):
        @pl.when(offset == o)
        def _():
            out_ref[0] = (
                out[o : o + bh, :].astype(jnp.int32).astype(jnp.uint8)
            )

    _store(0)
    _store(_PAD)
    _store(2 * _PAD)


def _phases_kernel(
    s_hbm, ns_hbm, os_hbm, ons_hbm, out_ref, sc0, sc1, sc2, sc3, sems,
    *, sharpen: float, bt: int, h: int
):
    """u=2 phase-fused output stage: weave 4 phase tiles in VMEM, CAS,
    quantize, store one uint8 band.  out[2t+p, 2s+r] = phase[p][r][t, s]."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    ts = pl.multiple_of(jnp.clip(i * bt - _PAD, 0, h - (bt + 2 * _PAD)), _PAD)
    rows = bt + 2 * _PAD
    copies = []
    for k, (src, dst) in enumerate(
        [(s_hbm, sc0), (ns_hbm, sc1), (os_hbm, sc2), (ons_hbm, sc3)]
    ):
        dma = pltpu.make_async_copy(
            src.at[c, pl.ds(ts, rows), :], dst, sems.at[k]
        )
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()

    w = sc0.shape[1]
    # x weave: (rows, w, 2) -> (rows, 2w) ; y weave: (rows, 2, W) -> (2rows, W)
    top = jnp.stack([sc0[:], sc1[:]], axis=-1).reshape(rows, 2 * w)
    bot = jnp.stack([sc2[:], sc3[:]], axis=-1).reshape(rows, 2 * w)
    band = jnp.stack([top, bot], axis=-2).reshape(2 * rows, 2 * w)

    out = _cas_band(band, sharpen)
    bh = 2 * bt
    offset = i * bt - ts  # 0 / 8 / 16 in phase rows -> x2 in out rows

    def _store(o):
        @pl.when(offset == o)
        def _():
            out_ref[0] = (
                out[2 * o : 2 * o + bh, :].astype(jnp.int32).astype(jnp.uint8)
            )

    _store(0)
    _store(_PAD)
    _store(2 * _PAD)


def cas_quantize_phases_u2(
    S, NS, OS, ONS, sharpen: float, block_rows: int = 64, interpret: bool = False
):
    """Fused weave+CAS+quantize for the u=2 phase form: four (C, h, w) f32
    phase arrays -> (C, 2h, 2w) uint8 in ONE HBM pass (no interleaved f32
    image is ever materialized)."""
    C, h, w = S.shape
    H, W = 2 * h, 2 * w
    bh = block_rows
    while H % bh or bh % 2:
        bh //= 2
    bt = bh // 2
    if bt < _PAD or w % 64 or h < bt + 2 * _PAD:
        # degenerate shapes: weave in XLA + plain kernel/XLA CAS
        top = jnp.stack([S, NS], -1).reshape(C, h, W)
        bot = jnp.stack([OS, ONS], -1).reshape(C, h, W)
        v = jnp.stack([top, bot], -2).reshape(C, H, W)
        return cas_quantize_pallas(v, sharpen, interpret=interpret)

    kern = functools.partial(_phases_kernel, sharpen=float(sharpen), bt=bt, h=h)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.uint8),
        grid=(C, H // bh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec(
            (1, bh, W), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((bt + 2 * _PAD, w), jnp.float32),
            pltpu.VMEM((bt + 2 * _PAD, w), jnp.float32),
            pltpu.VMEM((bt + 2 * _PAD, w), jnp.float32),
            pltpu.VMEM((bt + 2 * _PAD, w), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(S, NS, OS, ONS)


def cas_quantize_pallas(
    v: jnp.ndarray, sharpen: float, block_rows: int = 64, interpret: bool = False
) -> jnp.ndarray:
    """(C, H, W) f32 pre-CAS image (already u^2-scaled) -> (C, H, W) uint8."""
    C, H, W = v.shape
    bh = block_rows
    while H % bh:
        bh //= 2
    if bh < 8 or W % 128 or H < bh + 2 * _PAD:  # degenerate: XLA fallback
        from . import cas as cas_ops

        return cas_ops.quantize_u8(cas_ops.cas_sharpen(v, sharpen))

    kern = functools.partial(_cas_kernel, sharpen=float(sharpen), bh=bh, H=H)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.uint8),
        grid=(C, H // bh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, bh, W), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * _PAD, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(v)
