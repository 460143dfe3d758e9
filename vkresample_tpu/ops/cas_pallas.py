"""Fused CAS sharpen + quantize as a Pallas TPU kernel.

One pass over HBM: reads the pre-CAS f32 image once (plus a halo band per
tile), computes the full CAS stencil (VkResample.cpp:887-923) in VMEM, and
writes uint8 — where the XLA formulation materializes intermediate f32
stencil operands.  Planar (C, H, W) layout in and out.

Inputs stay in HBM (ANY memory space); each grid step DMAs its row band
into VMEM scratch with 2-slot double buffering.  TPU DMA slices must be
8-row (sublane) aligned, so windows are clamped-aligned and carry the
one-row stencil halo inside; neighbor rows are built as full-band shifts
whose edge duplication realizes the clamp-to-edge semantics at the true
image border.  Leading batch dims fold into the channel grid axis (vmap's
pallas_call batching rule can't handle ANY-memspace refs).

Variant inventory (all oracle-tested; same-process A/B on v5e is a
statistical wash between them — the cost is intrinsic DMA/VMEM behavior,
not kernel structure):
  cas_quantize_pallas   — manual-DMA grid kernel, double-buffered (DEFAULT)
  cas_quantize_blocked  — Mosaic-managed block pipeline, XLA halo rows
  cas_quantize_mono     — single invocation, in-kernel band loop
  cas_quantize_rows_u   — consumes U/O row-split form, in-kernel y-weave
  cas_quantize_parity_u2— per-parity evaluation, no woven f32 image
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pad_for(dtype) -> int:
    """Sublane alignment of DMA slices: 8 rows for f32, 16 for 16-bit."""
    return 16 if dtype in (jnp.bfloat16, jnp.float16, jnp.int16) else 8


def _pallas_platform(interpret: bool) -> bool:
    """Whether a (compiled or interpret) pallas_call can actually run —
    gates the replicate-pad reroutes, which must fall through to the
    XLA fallbacks on CPU where compiled Mosaic kernels cannot lower
    (and where the woven stack's 64x lane padding costs nothing)."""
    if interpret:
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


_PAD = 8  # f32 sublane alignment (kept for the rows kernel)


def _fit_block(block_rows: int, h: int, align: int) -> int:
    """Largest multiple of `align` that is <= block_rows and divides h
    (0 if none).  DMA slice starts are declared `pl.multiple_of(align)`,
    so an unaligned caller-passed block size would make that hint a lie
    (misaligned DMA on real TPU)."""
    bt = int(block_rows) - int(block_rows) % align
    while bt >= align and h % bt:
        bt -= align
    return max(bt, 0)


def _lane_pad_target(W: int, wsb_pref: int, full_cap: int) -> int:
    """Padded plane width for the replicate-pad reroutes.

    The minimal 128-multiple is the wrong pad target when the column-
    strip kernels serve the padded plane: the strip width Wsb must
    DIVIDE the padded width, and a width with no large 128-multiple
    divisor collapses Wsb toward _CHALO, whose column-halo
    amplification (Wsb + 2*_CHALO)/Wsb dominates the kernel's reads.
    At 8640 the minimal pad 4320->4352 = 2^8*17 admits only Wsb=256
    (2.0x reads) and measured 24.2 ms of the 73.4 ms na8640 program
    (round-5 profile_tier attribution); 4608 admits Wsb=768 (1.33x at
    +6% width).  Model the per-output traffic of each candidate —
    width x halo amplification, with widths at or under `full_cap`
    paying no column halo — and pad to the cheapest 128-multiple
    within 8 vregs.  VKRESAMPLE_PAD_TARGET=min restores the minimal
    pad (A/B knob, scripts/na8640_ab.py)."""
    import os

    base = W + (-W % _CHALO)
    if os.environ.get("VKRESAMPLE_PAD_TARGET") == "min":
        return base
    best, best_cost = base, None
    for cand in range(base, base + 8 * _CHALO + 1, _CHALO):
        if cand <= full_cap:
            cost = float(cand)
        else:
            wsb = _fit_block(wsb_pref, cand, _CHALO)
            if wsb < _CHALO or cand < wsb + 2 * _CHALO:
                continue
            cost = cand * (wsb + 2 * _CHALO) / wsb
        if best_cost is None or cost < best_cost - 1e-9:
            best, best_cost = cand, cost
    return best


def _vmem_row_cap(W: int, in_bytes: int, pad: int, n_tiles: int = 2) -> int:
    """Max band height whose working set fits the ~16 MB VMEM budget for a
    full-width kernel: n_tiles double-buffered input tiles of (bh+2*pad, W)
    plus ~4 live f32 band temporaries.  Kernels at W=16384 previously
    requested >16 MB and crashed the remote compiler outright."""
    budget = 11 * 2**20
    per_row = W * (2 * n_tiles * in_bytes + 4 * 4)
    rows = budget // max(per_row, 1)
    return max(int(rows) - 2 * pad, 0)


def _yshift_up(a):
    return jnp.concatenate([a[:1, :], a[:-1, :]], axis=0)


def _yshift_dn(a):
    return jnp.concatenate([a[1:, :], a[-1:, :]], axis=0)


def _to_f32(band: jnp.ndarray) -> jnp.ndarray:
    """Cast a VMEM tile to f32 (16-bit ints hop via i32 — Mosaic has no
    direct i16->f32 convert, same class of limit as the f32->u8 cast)."""
    if band.dtype in (jnp.int16, jnp.int8):
        return band.astype(jnp.int32).astype(jnp.float32)
    return band.astype(jnp.float32)


def _in_scale_for(dtype) -> float:
    """Fixed-point de-scale applied inside the kernel for int16 Q2.14
    pre-CAS storage (ops/cas.py I16_SCALE); 1.0 for float inputs."""
    return (1.0 / 16384.0) if dtype == jnp.int16 else 1.0


def _cas_band(
    band: jnp.ndarray, sharpen: float, scale: float = 1.0, ts=None,
    Himg: int = None,
) -> jnp.ndarray:
    """(R, W) float -> (R, W) 0..255 f32 CAS output; rows [1, R-1) valid.

    Temporary count is kept low (VMEM pressure): x-extremes are folded
    before taking y-shifts, so corner mins/maxes derive from two arrays
    instead of eight.

    Without ts, the image top/bottom clamp comes from the caller's
    window clipping (edge bands re-cover in-range rows, so the
    _yshift edge duplication IS the border clamp).  With (ts, Himg)
    given — slot-resident callers whose edge-band halo rows hold
    garbage — row r is global image row ts + r and the y-shifts are
    masked at the true image border instead.
    """
    W = band.shape[1]
    f = _to_f32(band)
    if scale != 1.0:
        f = f * jnp.float32(scale)
    ln = jnp.minimum(jnp.abs(f), 1.0)  # abs>=0: the 0-clamp is dead

    west = jnp.concatenate([ln[:, :1], ln[:, : W - 1]], axis=1)
    east = jnp.concatenate([ln[:, 1:], ln[:, W - 1 :]], axis=1)
    xmin = jnp.minimum(west, east)  # min(w, e) per row
    xmax = jnp.maximum(west, east)
    wpe = west + east  # for the cross sum later
    del west, east

    if ts is not None:
        row = jax.lax.broadcasted_iota(jnp.int32, (band.shape[0], 1), 0)
        gtop = (row + ts) == 0
        gbot = (row + ts) == Himg - 1
        up = lambda a: jnp.where(gtop, a, _yshift_up(a))
        dn = lambda a: jnp.where(gbot, a, _yshift_dn(a))
    else:
        up, dn = _yshift_up, _yshift_dn

    n = up(ln)
    s = dn(ln)
    min_cross = jnp.minimum(jnp.minimum(n, s), jnp.minimum(ln, xmin))
    max_cross = jnp.maximum(jnp.maximum(n, s), jnp.maximum(ln, xmax))
    # corners = y-shifts of the x-extremes
    min_all = jnp.minimum(min_cross, jnp.minimum(up(xmin), dn(xmin)))
    max_all = jnp.maximum(max_cross, jnp.maximum(up(xmax), dn(xmax)))
    c = ln

    minlen = 0.5 * (min_cross + min_all)
    maxlen = 0.5 * (max_cross + max_all)

    one = jnp.float32(1.0)
    # min(minlen/(1-minlen), (1-maxlen)/maxlen): pick the smaller quotient
    # by cross-multiplication, then evaluate it with ONE rsqrt.  The
    # selected denominator is provably nonzero (minlen=1 forces the other
    # branch; maxlen=0 likewise), which also removes the reference
    # formula's inf/NaN corner cases.
    a, b = minlen, one - minlen
    cq, d = one - maxlen, maxlen
    pred = a * d < cq * b
    num = jnp.where(pred, a, cq)
    den = jnp.where(pred, b, d)
    # sqrt(num/den) = num * rsqrt(num*den); see _cas_core for the A/B
    sc = (-jnp.float32(sharpen)) * num * jax.lax.rsqrt(
        jnp.maximum(num * den, jnp.float32(1e-30))
    )

    out = (c + sc * (n + s + wpe)) / (one + 4.0 * sc)
    return jnp.clip(out * 255.0, 0.0, 255.0)


def _cas_kernel(
    v_hbm, out_ref, scratch, sem, *, sharpen: float, bh: int, H: int,
    nb: int, scale: float = 1.0
):
    """1-D grid over (C * nb) bands with 2-slot double buffering: block
    g+1's DMA is in flight while block g computes.

    Windows are clamped 8-aligned [start, start+bh+16): interior blocks
    carry an 8-row halo on each side; the first/last block shift the
    window inward and the in-band edge-duplicating shifts provide the
    clamp semantics (VkResample.cpp:889-892) for the true image border.
    """
    g = pl.program_id(0)
    pad = _pad_for(scratch.dtype)

    def window(gg):
        cc = gg // nb
        ii = gg % nb
        start = pl.multiple_of(
            jnp.clip(ii * bh - pad, 0, H - (bh + 2 * pad)), pad
        )
        return cc, start

    def dma(gg, slot):
        cc, start = window(gg)
        return pltpu.make_async_copy(
            v_hbm.at[cc, pl.ds(start, bh + 2 * pad), :],
            scratch.at[slot],
            sem.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        dma(g + 1, jax.lax.rem(g + 1, 2)).start()

    dma(g, slot).wait()
    out = _cas_band(scratch[slot], sharpen, scale)
    # offset in {0, 8, 16}; Mosaic can't slice values dynamically, so
    # branch over the three static (sublane-aligned) slices
    _, start = window(g)
    offset = (g % nb) * bh - start

    def _store(o):
        @pl.when(offset == o)
        def _():
            out_ref[0] = (
                out[o : o + bh, :].astype(jnp.int32).astype(jnp.uint8)
            )

    _store(0)
    _store(pad)
    _store(2 * pad)


def _slot_schedule(g, dmas):
    """Shared DMA rotation for the slot-resident kernels: a 4-deep slot
    buffer where program g computes on bands {g-1, g, g+1} while band
    g+2's DMA is in flight.  `dmas(gg, slot)` returns the copy list for
    band gg into slot `slot`.  Requires the grid to sweep bands
    vertically fastest and nb >= 2 (band 1 exists).  Returns the
    (prev, current, next) slot indices for program g."""

    @pl.when(g == 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()
        for dma in dmas(1, 1):
            dma.start()
        for dma in dmas(0, 0):
            dma.wait()

    @pl.when(g + 2 < pl.num_programs(0))
    def _():
        for dma in dmas(g + 2, jax.lax.rem(g + 2, 4)):
            dma.start()

    @pl.when(jnp.logical_and(g > 0, g + 1 < pl.num_programs(0)))
    def _():
        for dma in dmas(g + 1, jax.lax.rem(g + 1, 4)):
            dma.wait()

    @pl.when(g == 0)
    def _():
        for dma in dmas(1, 1):
            dma.wait()

    return jax.lax.rem(g + 3, 4), jax.lax.rem(g, 4), jax.lax.rem(g + 1, 4)


def _cas_slots_kernel(
    v_hbm, out_ref, scratch, sem, *, sharpen: float, bh: int, H: int,
    nb: int, scale: float
):
    """Slot-resident variant of _cas_kernel: bands are DMA'd WITHOUT row
    halos (exactly bh rows) into a 4-deep rotating buffer; the one-row
    halos come from the neighbor bands' still-resident slots, and the
    image top/bottom clamp comes from _cas_band's (ts, Himg) masks
    (band-edge garbage rows coincide with the border)."""
    g = pl.program_id(0)
    i = g % nb

    def dmas(gg, slot):
        cc = gg // nb
        ii = gg % nb
        ts = pl.multiple_of(ii * bh, _pad_for(scratch.dtype))
        return [
            pltpu.make_async_copy(
                v_hbm.at[cc, pl.ds(ts, bh), :], scratch.at[slot],
                sem.at[slot],
            )
        ]

    sp, sc, sn = _slot_schedule(g, dmas)
    band = jnp.concatenate(
        [
            scratch[sp, pl.ds(bh - 1, 1), :],
            scratch[sc],
            scratch[sn, pl.ds(0, 1), :],
        ],
        axis=0,
    )
    ts = i * bh - 1  # global image row of band row 0
    out = _cas_band(band, sharpen, scale, ts=ts, Himg=H)
    out_ref[0] = out[1 : 1 + bh, :].astype(jnp.int32).astype(jnp.uint8)


def _rows_kernel(
    u_hbm, o_hbm, out_ref, scu, sco, sems, *, sharpen: float, bt: int,
    h: int, u: int, nb: int
):
    """Row-split fused output stage: U holds sample rows (out[u*t]), O the
    non-sample row groups (out[u*t+k+1] = O[t*(u-1)+k]).  Each grid step
    DMAs double-buffered U/O tiles, y-weaves in VMEM (sublane interleave),
    applies CAS and stores one uint8 band."""
    g = pl.program_id(0)
    c = g // nb
    i = g % nb
    rows = bt + 2 * _PAD

    def start(gg, slot):
        cc = gg // nb
        ii = gg % nb
        ts = pl.multiple_of(
            jnp.clip(ii * bt - _PAD, 0, h - rows), _PAD
        )
        to = pl.multiple_of(ts * (u - 1), _PAD)
        du = pltpu.make_async_copy(
            u_hbm.at[cc, pl.ds(ts, rows), :], scu.at[slot], sems.at[slot, 0]
        )
        do = pltpu.make_async_copy(
            o_hbm.at[cc, pl.ds(to, rows * (u - 1)), :],
            sco.at[slot],
            sems.at[slot, 1],
        )
        du.start()
        do.start()
        return du, do

    def waiter(gg, slot):
        cc = gg // nb
        ii = gg % nb
        ts = pl.multiple_of(jnp.clip(ii * bt - _PAD, 0, h - rows), _PAD)
        to = pl.multiple_of(ts * (u - 1), _PAD)
        pltpu.make_async_copy(
            u_hbm.at[cc, pl.ds(ts, rows), :], scu.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            o_hbm.at[cc, pl.ds(to, rows * (u - 1)), :],
            sco.at[slot],
            sems.at[slot, 1],
        ).wait()

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        start(0, 0)

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        start(g + 1, jax.lax.rem(g + 1, 2))

    waiter(g, slot)

    W = scu.shape[-1]
    # y-weave: (rows, u, W) -> (rows*u, W)  [sublane interleave]
    ut = scu[slot]  # (rows, W)
    ot = sco[slot].reshape(rows, u - 1, W)
    band = jnp.concatenate([ut[:, None, :], ot], axis=1).reshape(rows * u, W)

    out = _cas_band(band, sharpen)
    bh = bt * u
    ts = jnp.clip(i * bt - _PAD, 0, h - rows)
    offset = i * bt - ts  # 0 / _PAD / 2*_PAD in U-row units

    def _store(o):
        @pl.when(offset == o)
        def _():
            out_ref[0] = (
                out[u * o : u * o + bh, :].astype(jnp.int32).astype(jnp.uint8)
            )

    _store(0)
    _store(_PAD)
    _store(2 * _PAD)


def _rows_slots_kernel(
    u_hbm, o_hbm, out_ref, scu, sco, sems, *, sharpen: float, bt: int,
    h: int, u: int, nb: int
):
    """Slot-resident variant of _rows_kernel: U/O bands are DMA'd WITHOUT
    row halos (exactly bt / bt*(u-1) rows) into 4-deep rotating buffers;
    the one-row woven halos come from the neighbor bands' still-resident
    slots (north = prev band's last O row, south = next band's first U
    row).  Band-edge garbage coincides with the image top/bottom, where
    _cas_band's (ts, Himg) masks clamp."""
    g = pl.program_id(0)
    i = g % nb

    def dmas(gg, slot):
        cc = gg // nb
        ii = gg % nb
        ts = pl.multiple_of(ii * bt, _PAD)
        to = pl.multiple_of(ts * (u - 1), _PAD)
        return [
            pltpu.make_async_copy(
                u_hbm.at[cc, pl.ds(ts, bt), :], scu.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                o_hbm.at[cc, pl.ds(to, bt * (u - 1)), :], sco.at[slot],
                sems.at[slot, 1],
            ),
        ]

    sp, sc, sn = _slot_schedule(g, dmas)

    W = scu.shape[-1]
    # y-weave: (bt, u, W) -> (bt*u, W)  [sublane interleave], then one
    # woven halo row from each vertical neighbor's slot
    ut = scu[sc]  # (bt, W)
    ot = sco[sc].reshape(bt, u - 1, W)
    band = jnp.concatenate(
        [
            sco[sp, pl.ds(bt * (u - 1) - 1, 1), :],
            jnp.concatenate([ut[:, None, :], ot], axis=1).reshape(
                bt * u, W
            ),
            scu[sn, pl.ds(0, 1), :],
        ],
        axis=0,
    )

    ts = i * bt * u - 1  # global woven row of band row 0 (-1 at the top
    # band never matches the gtop mask)
    out = _cas_band(band, sharpen, ts=ts, Himg=u * h)
    out_ref[0] = (
        out[1 : 1 + bt * u, :].astype(jnp.int32).astype(jnp.uint8)
    )


def cas_quantize_rows_u(
    U, O, u: int, sharpen: float, block_rows: int = None, interpret: bool = False
):
    """Fused weave+CAS+quantize for the row-split form: U (..., h, W)
    sample rows + O (..., h*(u-1), W) non-sample rows -> (..., u*h, W)
    uint8 in one HBM pass (the interleaved f32 image is never
    materialized).  Leading dims fold into the channel grid axis."""
    lead = U.shape[:-2]
    U = U.reshape((-1,) + U.shape[-2:])
    O = O.reshape((-1,) + O.shape[-2:])
    C, h, W = U.shape
    H = u * h
    if block_rows is None:
        from ..core.tuning import current

        block_rows = current().rows_block
    bt = _fit_block(block_rows, h, _PAD)
    if bt < _PAD or W % 128 or h < bt + 2 * _PAD:
        from . import cas as cas_ops
        from ..fft.dense import weave_rows

        v = weave_rows(U, O, u)
        return cas_quantize_pallas(v, sharpen, interpret=interpret).reshape(
            lead + (H, W)
        )

    nb = h // bt
    rows = bt + 2 * _PAD
    import os

    if (
        os.environ.get("VKRESAMPLE_ROWS_KERNEL", "slots") == "slots"
        and nb >= 2
    ):
        # slot-resident bands (same scheme as the quad/grid slots
        # kernels): exact-height U/O DMAs, woven halos from neighbor
        # slots, image edges clamped by _cas_band's (ts, Himg) masks
        kern = functools.partial(
            _rows_slots_kernel, sharpen=float(sharpen), bt=bt, h=h, u=u,
            nb=nb,
        )
        scratch = [
            pltpu.VMEM((4, bt, W), jnp.float32),
            pltpu.VMEM((4, bt * (u - 1), W), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2)),
        ]
    else:
        kern = functools.partial(
            _rows_kernel, sharpen=float(sharpen), bt=bt, h=h, u=u, nb=nb
        )
        scratch = [
            pltpu.VMEM((2, rows, W), jnp.float32),
            pltpu.VMEM((2, rows * (u - 1), W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.uint8),
        grid=(C * nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(
            (1, bt * u, W),
            lambda g, nb=nb: (g // nb, g % nb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(U, O).reshape(lead + (H, W))


def cas_quantize_pallas(
    v: jnp.ndarray, sharpen: float, block_rows: int = None, interpret: bool = False
) -> jnp.ndarray:
    """(..., C, H, W) f32 pre-CAS image (already u^2-scaled) -> uint8.

    Leading batch dims fold into the channel grid axis (Pallas kernels are
    made batch-polymorphic here rather than via vmap, whose pallas_call
    batching rule cannot handle ANY-memspace refs)."""
    lead = v.shape[:-2]
    v = v.reshape((-1,) + v.shape[-2:])
    C, H, W = v.shape
    pad = _pad_for(v.dtype)
    if block_rows is None:
        from ..core.tuning import current

        block_rows = current().cas_block_rows
    bh = _fit_block(
        min(block_rows, _vmem_row_cap(W, v.dtype.itemsize, pad, 1)), H, pad
    )
    if bh < pad or W % 128 or H < bh + 2 * pad:  # degenerate: XLA fallback
        from . import cas as cas_ops

        f = (
            cas_ops.from_i16_storage(v)
            if v.dtype == jnp.int16
            else v.astype(jnp.float32)
        )
        return cas_ops.quantize_u8(
            cas_ops.cas_sharpen(f, sharpen)
        ).reshape(lead + (H, W))

    nb = H // bh
    import os

    if (
        os.environ.get("VKRESAMPLE_CAS_KERNEL", "slots") == "slots"
        and nb >= 2
    ):
        kern = functools.partial(
            _cas_slots_kernel, sharpen=float(sharpen), bh=bh, H=H, nb=nb,
            scale=_in_scale_for(v.dtype),
        )
        scratch = [
            pltpu.VMEM((4, bh, W), v.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ]
    else:
        kern = functools.partial(
            _cas_kernel, sharpen=float(sharpen), bh=bh, H=H, nb=nb,
            scale=_in_scale_for(v.dtype),
        )
        scratch = [
            pltpu.VMEM((2, bh + 2 * pad, W), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.uint8),
        grid=(C * nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, bh, W),
            lambda g, nb=nb: (g // nb, g % nb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(v).reshape(lead + (H, W))


# ---------------------------------------------------------------------------
# per-parity fused CAS (u=2): no woven f32 image at all
# ---------------------------------------------------------------------------
#
# For u=2 the output rows alternate U (even, = sample rows) and O (odd).
# CAS evaluates per parity directly on the U/O tiles:
#   even row 2t:  n = O[t-1] (top clamp -> center), s = O[t]
#   odd row 2t+1: n = U[t],  s = U[t+1] (bottom clamp -> center)
# x-neighbors stay within the row; corner extremes are y-shifts of the
# neighbor tiles' x-extremes (separable clamps, like the reference's
# independent id_x_m/id_y_m clamping).  Outputs are two uint8 planes that
# the caller interleaves (u8 traffic only — the f32 weave disappears).


def _cas_core(c, n, s, xmin, xmax, wpe, cmin, cmax, sharpen):
    min_cross = jnp.minimum(jnp.minimum(n, s), jnp.minimum(c, xmin))
    max_cross = jnp.maximum(jnp.maximum(n, s), jnp.maximum(c, xmax))
    min_all = jnp.minimum(min_cross, cmin)
    max_all = jnp.maximum(max_cross, cmax)
    minlen = 0.5 * (min_cross + min_all)
    maxlen = 0.5 * (max_cross + max_all)
    return _cas_blend(c, n + s + wpe, minlen, maxlen, sharpen)


def _cas_blend(c, nsum, minlen, maxlen, sharpen):
    """Shared CAS tail: scale from the min/max window lengths, rational
    blend, quantize.  c/nsum/minlen/maxlen are f32."""
    one = jnp.float32(1.0)
    a, b = minlen, one - minlen
    cq, d = one - maxlen, maxlen
    pred = a * d < cq * b
    num = jnp.where(pred, a, cq)
    den = jnp.where(pred, b, d)
    # sqrt(num/den) = num * rsqrt(num*den) for num, den >= 0 — saves the
    # divide (rsqrt is a native VPU op; divide is reciprocal + Newton).
    # The tiny floor makes num==0 yield 0 instead of 0*inf=NaN.
    # Same-process A/B: 0.638 ms vs 0.764 for the divide+sqrt form at the
    # flagship quad shape (scripts/cas_rsqrt_ab.py), ±1 u8 LSB rounding
    # shift on ~boundary pixels.
    sc = (-jnp.float32(sharpen)) * num * jax.lax.rsqrt(
        jnp.maximum(num * den, jnp.float32(1e-30))
    )
    out = (c + sc * nsum) / (one + 4.0 * sc)
    return jnp.clip(out * 255.0, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def _xstruct(t):
    """x-clamped west/east and their min/max/sum for one tile."""
    W = t.shape[1]
    west = jnp.concatenate([t[:, :1], t[:, : W - 1]], axis=1)
    east = jnp.concatenate([t[:, 1:], t[:, W - 1 :]], axis=1)
    return jnp.minimum(west, east), jnp.maximum(west, east), west + east


def _parity_planes(lu, lo_, ts, h, sharpen):
    """Even/odd uint8 CAS planes from clipped U/O tiles covering global
    rows [ts, ts+rows) of an h-row half image."""
    rows = lu.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    gtop = (row + ts) == 0  # global image top (even row 0: n clamps to self)
    gbot = (row + ts) == h - 1  # global bottom (odd row H-1: s clamps to self)

    uxmin, uxmax, uwpe = _xstruct(lu)
    oxmin, oxmax, owpe = _xstruct(lo_)

    # even parity: center U[t]
    nE = jnp.where(gtop, lu, _yshift_up(lo_))
    nE_min = jnp.where(gtop, uxmin, _yshift_up(oxmin))
    nE_max = jnp.where(gtop, uxmax, _yshift_up(oxmax))
    even = _cas_core(
        lu, nE, lo_, uxmin, uxmax, uwpe,
        jnp.minimum(nE_min, oxmin), jnp.maximum(nE_max, oxmax), sharpen,
    )

    # odd parity: center O[t]
    sO = jnp.where(gbot, lo_, _yshift_dn(lu))
    sO_min = jnp.where(gbot, oxmin, _yshift_dn(uxmin))
    sO_max = jnp.where(gbot, oxmax, _yshift_dn(uxmax))
    odd = _cas_core(
        lo_, lu, sO, oxmin, oxmax, owpe,
        jnp.minimum(uxmin, sO_min), jnp.maximum(uxmax, sO_max), sharpen,
    )
    return even, odd


def _parity_kernel(
    u_hbm, o_hbm, e_ref, d_ref, scu, sco, sems, *, sharpen: float, bt: int,
    h: int, nb: int, pad: int, scale: float
):
    g = pl.program_id(0)
    rows = bt + 2 * pad

    def window(gg):
        cc = gg // nb
        ii = gg % nb
        ts = pl.multiple_of(jnp.clip(ii * bt - pad, 0, h - rows), pad)
        return cc, ts

    def dmas(gg, slot):
        cc, ts = window(gg)
        return (
            pltpu.make_async_copy(
                u_hbm.at[cc, pl.ds(ts, rows), :], scu.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                o_hbm.at[cc, pl.ds(ts, rows), :], sco.at[slot], sems.at[slot, 1]
            ),
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        for dma in dmas(g + 1, jax.lax.rem(g + 1, 2)):
            dma.start()

    for dma in dmas(g, slot):
        dma.wait()

    _, ts = window(g)

    def _clip(t):
        f = _to_f32(t)
        if scale != 1.0:
            f = f * jnp.float32(scale)
        return jnp.minimum(jnp.abs(f), 1.0)  # abs>=0: the 0-clamp is dead

    even, odd = _parity_planes(
        _clip(scu[slot]), _clip(sco[slot]), ts, h, sharpen
    )

    i = g % nb
    offset = i * bt - jnp.clip(i * bt - pad, 0, h - rows)

    def _store(o):
        @pl.when(offset == o)
        def _():
            e_ref[0] = even[o : o + bt, :]
            d_ref[0] = odd[o : o + bt, :]

    _store(0)
    _store(pad)
    _store(2 * pad)


def cas_quantize_parity_u2(
    U, O, sharpen: float, block_rows: int = None, interpret: bool = False
):
    """u=2 per-parity fused CAS: U (..., h, W) sample rows + O (..., h, W)
    odd rows -> (..., 2h, W) uint8.  The f32 interleaved image is never
    materialized; only the final uint8 planes are woven (XLA, 1/4 the
    bytes)."""
    E, D = cas_parity_planes_u2(
        U, O, sharpen, block_rows=block_rows, interpret=interpret
    )
    out = jnp.stack([E, D], axis=-2)  # (..., h, 2, W)
    return out.reshape(out.shape[:-3] + (out.shape[-3] * 2, out.shape[-1]))


def cas_parity_planes_u2(
    U, O, sharpen: float, block_rows: int = None, interpret: bool = False
):
    """u=2 per-parity fused CAS returning the two uint8 PLANES (E even
    rows, D odd rows), each (..., h, W) — no device-side weave at all.
    Consumers that can address rows indirectly (the native PNG encoder's
    row pointers, host numpy) assemble the image for free.  Accepts f32 or
    int16 Q2.14 pre-CAS inputs."""
    lead = U.shape[:-2]
    U = U.reshape((-1,) + U.shape[-2:])
    O = O.reshape((-1,) + O.shape[-2:])
    C, h, W = U.shape
    pad = _pad_for(U.dtype)
    if block_rows is None:
        from ..core.tuning import current

        block_rows = current().parity_block
        if U.dtype != jnp.int16:
            # f32 tiles double the scratch bytes: halve the band to stay
            # inside the 16 MB VMEM budget
            block_rows = max(pad, block_rows // 2)
    bt = _fit_block(
        min(block_rows, _vmem_row_cap(W, U.dtype.itemsize, pad, 2)), h, pad
    )
    if (
        bt < pad
        or W % 128
        or h < bt + 2 * pad
        or U.dtype not in (jnp.float32, jnp.int16)
    ):
        from ..fft.dense import weave_rows

        v = weave_rows(U, O, 2)
        out = cas_quantize_pallas(v, sharpen, interpret=interpret)
        out4 = out.reshape((C, h, 2, W))
        return (
            out4[:, :, 0].reshape(lead + (h, W)),
            out4[:, :, 1].reshape(lead + (h, W)),
        )

    nb = h // bt
    rows = bt + 2 * pad
    kern = functools.partial(
        _parity_kernel, sharpen=float(sharpen), bt=bt, h=h, nb=nb, pad=pad,
        scale=_in_scale_for(U.dtype),
    )
    E, D = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((C, h, W), jnp.uint8),
            jax.ShapeDtypeStruct((C, h, W), jnp.uint8),
        ),
        grid=(C * nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(
            pl.BlockSpec(
                (1, bt, W), lambda g, nb=nb: (g // nb, g % nb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bt, W), lambda g, nb=nb: (g // nb, g % nb, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, W), U.dtype),
            pltpu.VMEM((2, rows, W), O.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(U, O)
    return E.reshape(lead + (h, W)), D.reshape(lead + (h, W))


# ---------------------------------------------------------------------------
# quad-parity fused CAS (u=2): rows AND columns split by parity
# ---------------------------------------------------------------------------
#
# With the x matmul restricted to odd output columns (even columns are
# exact samples + a rank-1 correction — see dense.r2c_quad), the pipeline
# carries four pre-CAS parity planes P[ry][rx] and CAS evaluates each
# output parity class directly: every stencil neighbor of a pixel in
# plane (ry, rx) is a one-step row/column shift of a SIBLING plane, so no
# interleave exists anywhere — the PNG encoder assembles rows from the
# four uint8 planes via its row loop (both axes, free).
#
# Separable clamps (reference id_x_m/id_y_m independence,
# VkResample.cpp:889-892) resolve exactly:
#   col 0 west -> the center column's own value; col W-1 east likewise;
#   corner extremes are row-shifts of the neighbor columns' x-extremes
#   with the same clamp fallbacks.


def _shiftL(t):
    return jnp.concatenate([t[:, :1], t[:, :-1]], axis=1)


def _shiftR(t):
    return jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)


def _quad_planes(p, ts, h, sharpen, ws=0, Wh=None):
    """p[ry][rx]: clipped tiles covering global rows [ts, ts+rows) and
    global columns [ws, ws+Wsw) of the four parity planes (each h x Wh
    globally).  Returns the four uint8 output tiles; valid wherever the
    row/col halo is inside the tile (global edges handled by clamps).

    gleft/gright are the col == 0 / col == Wh-1 clamp masks."""
    rows, Wsw = p[0][0].shape
    if Wh is None:
        Wh = Wsw
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Wsw), 1) + ws
    gleft = col == 0
    gright = col == Wh - 1
    gtop = (row + ts) == 0
    gbot = (row + ts) == h - 1

    # west/east values + extremes for centers living in (rho, rx)
    wv = [[None, None], [None, None]]
    ev = [[None, None], [None, None]]
    xmin = [[None, None], [None, None]]
    xmax = [[None, None], [None, None]]
    wpe = [[None, None], [None, None]]
    for ry in (0, 1):
        a, b = p[ry][0], p[ry][1]
        wv[ry][0] = jnp.where(gleft, a, _shiftL(b))
        ev[ry][0] = b
        wv[ry][1] = a
        ev[ry][1] = jnp.where(gright, b, _shiftR(a))
        for rx in (0, 1):
            xmin[ry][rx] = jnp.minimum(wv[ry][rx], ev[ry][rx])
            xmax[ry][rx] = jnp.maximum(wv[ry][rx], ev[ry][rx])
            wpe[ry][rx] = wv[ry][rx] + ev[ry][rx]

    out = [[None, None], [None, None]]
    for ry in (0, 1):
        for rx in (0, 1):
            c = p[ry][rx]
            sib = p[1 - ry][rx]
            if ry == 0:
                n = jnp.where(gtop, c, _yshift_up(sib))
                s = sib
                nmin = jnp.where(gtop, xmin[0][rx], _yshift_up(xmin[1][rx]))
                nmax = jnp.where(gtop, xmax[0][rx], _yshift_up(xmax[1][rx]))
                smin, smax = xmin[1][rx], xmax[1][rx]
            else:
                n = sib
                s = jnp.where(gbot, c, _yshift_dn(sib))
                nmin, nmax = xmin[0][rx], xmax[0][rx]
                smin = jnp.where(gbot, xmin[1][rx], _yshift_dn(xmin[0][rx]))
                smax = jnp.where(gbot, xmax[1][rx], _yshift_dn(xmax[0][rx]))
            out[ry][rx] = _cas_core(
                c, n, s, xmin[ry][rx], xmax[ry][rx], wpe[ry][rx],
                jnp.minimum(nmin, smin), jnp.maximum(nmax, smax), sharpen,
            )
    return out


def _imin(a, b):
    # Mosaic has no i16 vector min/max (arith.minsi/maxsi fail to
    # legalize on the packed 8x128x2xi16 layout); cmp+select does
    return jnp.where(a < b, a, b)


def _imax(a, b):
    return jnp.where(a < b, b, a)


def _iabs(t):
    # |t| with the one wrapping code pinned: -32768 negates to itself in
    # int16, so clamp to -32767 first (still clips to CLIP afterwards)
    t = _imax(t, jnp.int16(-32767))
    return jnp.where(t < 0, jnp.int16(0) - t, t)


def _quad_planes_i16(q, ts, h, sharpen, ws=0, Wh=None):
    """i16-extremes variant of _quad_planes for int16 Q2.14 tiles: the
    stored fixed-point code is monotone in the signal, so the whole
    min/max tree runs on int16 (2x VPU lanes) with BIT-EXACT selections
    (clip bound 16384 = 1.0, exact in f32); only the final window-length
    sums widen to i32 (16384+16384 would overflow int16) before the f32
    convert.  q[ry][rx] holds the RAW int16 tiles."""
    rows, Wsw = q[0][0].shape
    if Wh is None:
        Wh = Wsw
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    gtop = (row + ts) == 0
    gbot = (row + ts) == h - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Wsw), 1) + ws
    gleft = col == 0
    gright = col == Wh - 1

    CLIP = jnp.int16(16384)
    scale = jnp.float32(1.0 / 16384.0)
    # the pre-abs max guards the one wrapping code (abs(int16 -32768)
    # stays negative); -32767 still clips to CLIP, so results are exact
    ci = [
        [
            _imin(_iabs(t), CLIP)
            for t in rowq
        ]
        for rowq in q
    ]
    cf = [
        [x.astype(jnp.int32).astype(jnp.float32) * scale for x in rowq]
        for rowq in ci
    ]

    # west/east in BOTH domains: i16 for extremes, f32 for the sums
    wvi = [[None, None], [None, None]]
    evi = [[None, None], [None, None]]
    xmin = [[None, None], [None, None]]
    xmax = [[None, None], [None, None]]
    wpe = [[None, None], [None, None]]
    for ry in (0, 1):
        ai, bi = ci[ry][0], ci[ry][1]
        af, bf = cf[ry][0], cf[ry][1]
        wvi[ry][0] = jnp.where(gleft, ai, _shiftL(bi))
        evi[ry][0] = bi
        wvi[ry][1] = ai
        evi[ry][1] = jnp.where(gright, bi, _shiftR(ai))
        wpe[ry][0] = jnp.where(gleft, af, _shiftL(bf)) + bf
        wpe[ry][1] = af + jnp.where(gright, bf, _shiftR(af))
        for rx in (0, 1):
            xmin[ry][rx] = _imin(wvi[ry][rx], evi[ry][rx])
            xmax[ry][rx] = _imax(wvi[ry][rx], evi[ry][rx])

    out = [[None, None], [None, None]]
    for ry in (0, 1):
        for rx in (0, 1):
            c_i = ci[ry][rx]
            sib_i = ci[1 - ry][rx]
            if ry == 0:
                n_i = jnp.where(gtop, c_i, _yshift_up(sib_i))
                s_i = sib_i
                nmin = jnp.where(gtop, xmin[0][rx], _yshift_up(xmin[1][rx]))
                nmax = jnp.where(gtop, xmax[0][rx], _yshift_up(xmax[1][rx]))
                smin, smax = xmin[1][rx], xmax[1][rx]
                nsum = jnp.where(
                    gtop, cf[0][rx], _yshift_up(cf[1][rx])
                ) + cf[1][rx]
            else:
                n_i = sib_i
                s_i = jnp.where(gbot, c_i, _yshift_dn(sib_i))
                nmin, nmax = xmin[0][rx], xmax[0][rx]
                smin = jnp.where(gbot, xmin[1][rx], _yshift_dn(xmin[0][rx]))
                smax = jnp.where(gbot, xmax[1][rx], _yshift_dn(xmax[0][rx]))
                nsum = cf[0][rx] + jnp.where(
                    gbot, cf[1][rx], _yshift_dn(cf[0][rx])
                )
            min_cross = _imin(
                _imin(n_i, s_i), _imin(c_i, xmin[ry][rx])
            )
            max_cross = _imax(
                _imax(n_i, s_i), _imax(c_i, xmax[ry][rx])
            )
            min_all = _imin(min_cross, _imin(nmin, smin))
            max_all = _imax(max_cross, _imax(nmax, smax))
            # widen to i32 for the sums (2*16384 overflows int16)
            minlen = (
                min_cross.astype(jnp.int32) + min_all.astype(jnp.int32)
            ).astype(jnp.float32) * (0.5 * scale)
            maxlen = (
                max_cross.astype(jnp.int32) + max_all.astype(jnp.int32)
            ).astype(jnp.float32) * (0.5 * scale)
            out[ry][rx] = _cas_blend(
                cf[ry][rx], nsum + wpe[ry][rx], minlen, maxlen, sharpen
            )
    return out


def _quad_planes_i32(q, ts, h, sharpen, ws=0, Wh=None):
    """i32 extremes tree: sign-extend the int16 Q2.14 tiles to i32 and
    run the min/max tree with NATIVE i32 vector min/max — Mosaic lowers
    `arith.minsi/maxsi` on i32 (the i16 forms do not legalize on v5e,
    and the cmp+select rewrite has no 16-bit vector compare either, see
    docs/STATUS.md round 2).  Same lane width as f32 but the decode
    shrinks: no per-input f32 convert/scale — only c, nsum and the two
    window lengths cross to f32, and the neighbor sums stay EXACT in
    i32 (<= 4*16384).  The clipped codes and all their <=17-bit sums are
    exactly representable in f32, so every selection and all blend
    INPUTS agree with the f32 tree to the bit; outputs can still shift
    by 1 u8 LSB on quantization-boundary pixels where the compiler
    contracts the blend's c + sc*nsum to an FMA in one lowering and not
    the other (tests/test_cas_tree.py pins <=1).

    Per-tile-set VPU op count vs the f32 tree (recorded for the verdict
    r4 item-7 adjudication): decode 4->8 tiles x (convert,mul,abs,min)=
    16 ops -> 4 x (widen,abs,min)=12; tree identical shape (34 min/max
    + shifts/selects) in i32; boundary crossings grow from 0 to 4 x
    (3 widened adds + 4 convert+mul pairs) = ~44; net ~+40 integer ops
    per 4-plane tile set against 4 saved f32 muls.  REJECTED on-chip
    (scripts/cas_tree_ab.py, 3 interleaved passes, 2026-08-20):
    flagship quad 0.293-0.316 vs f32 0.224-0.290 ms; big strip
    11.06-11.18 vs 9.43-9.60 — 15-30% slower, matching the ledger.
    Kept as the env knob for backends whose convert/compare cost
    ratios differ."""
    rows, Wsw = q[0][0].shape
    if Wh is None:
        Wh = Wsw
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    gtop = (row + ts) == 0
    gbot = (row + ts) == h - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Wsw), 1) + ws
    gleft = col == 0
    gright = col == Wh - 1

    CLIP = jnp.int32(16384)
    scale = jnp.float32(1.0 / 16384.0)
    ci = [
        [jnp.minimum(jnp.abs(t.astype(jnp.int32)), CLIP) for t in rowq]
        for rowq in q
    ]

    wvi = [[None, None], [None, None]]
    evi = [[None, None], [None, None]]
    xmin = [[None, None], [None, None]]
    xmax = [[None, None], [None, None]]
    wpe = [[None, None], [None, None]]
    for ry in (0, 1):
        ai, bi = ci[ry][0], ci[ry][1]
        wvi[ry][0] = jnp.where(gleft, ai, _shiftL(bi))
        evi[ry][0] = bi
        wvi[ry][1] = ai
        evi[ry][1] = jnp.where(gright, bi, _shiftR(ai))
        for rx in (0, 1):
            xmin[ry][rx] = jnp.minimum(wvi[ry][rx], evi[ry][rx])
            xmax[ry][rx] = jnp.maximum(wvi[ry][rx], evi[ry][rx])
            wpe[ry][rx] = wvi[ry][rx] + evi[ry][rx]  # exact in i32

    out = [[None, None], [None, None]]
    for ry in (0, 1):
        for rx in (0, 1):
            c_i = ci[ry][rx]
            sib_i = ci[1 - ry][rx]
            if ry == 0:
                n_i = jnp.where(gtop, c_i, _yshift_up(sib_i))
                s_i = sib_i
                nmin = jnp.where(gtop, xmin[0][rx], _yshift_up(xmin[1][rx]))
                nmax = jnp.where(gtop, xmax[0][rx], _yshift_up(xmax[1][rx]))
                smin, smax = xmin[1][rx], xmax[1][rx]
            else:
                n_i = sib_i
                s_i = jnp.where(gbot, c_i, _yshift_dn(sib_i))
                nmin, nmax = xmin[0][rx], xmax[0][rx]
                smin = jnp.where(gbot, xmin[1][rx], _yshift_dn(xmin[0][rx]))
                smax = jnp.where(gbot, xmax[1][rx], _yshift_dn(xmax[0][rx]))
            min_cross = jnp.minimum(
                jnp.minimum(n_i, s_i), jnp.minimum(c_i, xmin[ry][rx])
            )
            max_cross = jnp.maximum(
                jnp.maximum(n_i, s_i), jnp.maximum(c_i, xmax[ry][rx])
            )
            min_all = jnp.minimum(min_cross, jnp.minimum(nmin, smin))
            max_all = jnp.maximum(max_cross, jnp.maximum(nmax, smax))
            minlen = (min_cross + min_all).astype(jnp.float32) * (0.5 * scale)
            maxlen = (max_cross + max_all).astype(jnp.float32) * (0.5 * scale)
            nsum = (n_i + s_i + wpe[ry][rx]).astype(jnp.float32) * scale
            out[ry][rx] = _cas_blend(
                c_i.astype(jnp.float32) * scale, nsum, minlen, maxlen,
                sharpen,
            )
    return out


_TREE_PLANES = {"i16": _quad_planes_i16, "i32": _quad_planes_i32}


def _tree_mode(dt) -> str:
    """Quad-kernel extremes-tree selection (trace-time env
    VKRESAMPLE_CAS_TREE): 'f32' default; 'i16' (cmp+select codes, does
    NOT lower on v5e — kept for future backends); 'i32' (native integer
    min/max on sign-extended codes).  A/B'd by scripts/cas_tree_ab.py."""
    import os

    v = os.environ.get("VKRESAMPLE_CAS_TREE", "f32")
    return v if dt == jnp.int16 and v in _TREE_PLANES else "f32"


def _quad_kernel(
    p00_hbm, p01_hbm, p10_hbm, p11_hbm,
    o00_ref, o01_ref, o10_ref, o11_ref,
    s00, s01, s10, s11, sems,
    *, sharpen: float, bt: int, h: int, nb: int, pad: int, scale: float,
    tree: str = "f32",
):
    g = pl.program_id(0)
    rows = bt + 2 * pad
    ins = (p00_hbm, p01_hbm, p10_hbm, p11_hbm)
    scr = (s00, s01, s10, s11)

    def window(gg):
        cc = gg // nb
        ii = gg % nb
        ts = pl.multiple_of(jnp.clip(ii * bt - pad, 0, h - rows), pad)
        return cc, ts

    def dmas(gg, slot):
        cc, ts = window(gg)
        return [
            pltpu.make_async_copy(
                ins[j].at[cc, pl.ds(ts, rows), :], scr[j].at[slot],
                sems.at[slot, j],
            )
            for j in range(4)
        ]

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        for dma in dmas(g + 1, jax.lax.rem(g + 1, 2)):
            dma.start()

    for dma in dmas(g, slot):
        dma.wait()

    _, ts = window(g)

    def _clip(t):
        f = _to_f32(t)
        if scale != 1.0:
            f = f * jnp.float32(scale)
        return jnp.minimum(jnp.abs(f), 1.0)  # abs>=0: the 0-clamp is dead

    if tree != "f32":
        q = [[s00[slot], s01[slot]], [s10[slot], s11[slot]]]
        out = _TREE_PLANES[tree](q, ts, h, sharpen)
    else:
        p = [
            [_clip(s00[slot]), _clip(s01[slot])],
            [_clip(s10[slot]), _clip(s11[slot])],
        ]
        out = _quad_planes(p, ts, h, sharpen)

    i = g % nb
    offset = i * bt - jnp.clip(i * bt - pad, 0, h - rows)
    refs = (o00_ref, o01_ref, o10_ref, o11_ref)

    def _store(o):
        @pl.when(offset == o)
        def _():
            for ref, (ry, rx) in zip(refs, ((0, 0), (0, 1), (1, 0), (1, 1))):
                ref[0] = out[ry][rx][o : o + bt, :]

    _store(0)
    _store(pad)
    _store(2 * pad)


_CHALO = 128  # column halo (lane alignment) for the strip variant


def _quad_strip_kernel(
    p00_hbm, p01_hbm, p10_hbm, p11_hbm,
    o00_ref, o01_ref, o10_ref, o11_ref,
    s00, s01, s10, s11, sems,
    *, sharpen: float, bt: int, h: int, nb: int, pad: int, scale: float,
    Wh: int, Wsb: int, nsW: int, tree: str = "f32",
):
    """Column-strip variant for planes too wide for full-width tiles
    (Wh * band bytes would blow VMEM): 1-D grid over (C, row band, col
    strip); windows carry 128-column halos for the CAS x-neighbors."""
    g = pl.program_id(0)
    rows = bt + 2 * pad
    Wsw = Wsb + 2 * _CHALO
    ins = (p00_hbm, p01_hbm, p10_hbm, p11_hbm)
    scr = (s00, s01, s10, s11)

    def window(gg):
        cc = gg // (nb * nsW)
        rem = gg % (nb * nsW)
        ii = rem // nsW
        ss = rem % nsW
        ts = pl.multiple_of(jnp.clip(ii * bt - pad, 0, h - rows), pad)
        ws = pl.multiple_of(jnp.clip(ss * Wsb - _CHALO, 0, Wh - Wsw), _CHALO)
        return cc, ii, ss, ts, ws

    def dmas(gg, slot):
        cc, _, _, ts, ws = window(gg)
        return [
            pltpu.make_async_copy(
                ins[j].at[cc, pl.ds(ts, rows), pl.ds(ws, Wsw)],
                scr[j].at[slot],
                sems.at[slot, j],
            )
            for j in range(4)
        ]

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        for dma in dmas(g + 1, jax.lax.rem(g + 1, 2)):
            dma.start()

    for dma in dmas(g, slot):
        dma.wait()

    _, ii, ss, ts, ws = window(g)

    def _clip(t):
        f = _to_f32(t)
        if scale != 1.0:
            f = f * jnp.float32(scale)
        return jnp.minimum(jnp.abs(f), 1.0)  # abs>=0: the 0-clamp is dead

    if tree != "f32":
        q = [[s00[slot], s01[slot]], [s10[slot], s11[slot]]]
        out = _TREE_PLANES[tree](q, ts, h, sharpen, ws=ws, Wh=Wh)
    else:
        p = [
            [_clip(s00[slot]), _clip(s01[slot])],
            [_clip(s10[slot]), _clip(s11[slot])],
        ]
        out = _quad_planes(p, ts, h, sharpen, ws=ws, Wh=Wh)

    roffset = ii * bt - ts
    coffset = ss * Wsb - ws
    refs = (o00_ref, o01_ref, o10_ref, o11_ref)

    for ro in (0, pad, 2 * pad):
        for co in (0, _CHALO, 2 * _CHALO):
            @pl.when(jnp.logical_and(roffset == ro, coffset == co))
            def _(ro=ro, co=co):
                for ref, (ry, rx) in zip(
                    refs, ((0, 0), (0, 1), (1, 0), (1, 1))
                ):
                    ref[0] = out[ry][rx][ro : ro + bt, co : co + Wsb]


def _quad_strip_slots_kernel(
    p00_hbm, p01_hbm, p10_hbm, p11_hbm,
    o00_ref, o01_ref, o10_ref, o11_ref,
    *scr_all,
    sharpen: float, bt: int, h: int, nb: int, pad: int, scale: float,
    Wh: int, Wsb: int, nsW: int, tree: str = "f32", y4d_nd: int = 0,
):
    """Slot-resident column-strip variant: bands are DMA'd WITHOUT row
    halos (exactly bt rows each) into a 4-deep rotating buffer, and the
    one-row halos come from the neighbor bands' still-resident slots.

    y4d_nd: P10/P11 arrive in the staged transform's transposed-row 4D
    form (C, nd, n2, Wh) — natural row e*nd + d lives at [d, e], so the
    natural nd-row band ii is exactly the contiguous e-slice [:, ii, :].
    Requires bt == nd (asserted at trace); the VMEM slot contents are
    IDENTICAL to the flat form, so the stencil below never changes.
    The grid sweeps bands vertically within each column strip (ii
    fastest), so vertical neighbors occupy adjacent slots; 4 slots cover
    the {prev, current, next, inflight} working set.  This removes the
    2*pad-row-per-side DMA+compute overhead the aligned-halo scheme pays
    (DMA slices need pad-row alignment, so a 1-row halo costs pad=16
    rows at i16): band amplification (bt+2*pad)/bt -> (bt+2)/bt.
    Strip-edge slots hold garbage rows (previous strip / uninitialized),
    but those rows coincide exactly with the image top/bottom, where
    _quad_planes' gtop/gbot clamp masks discard them.  nsW == 1 runs
    full-width tiles (no column halo) — the flagship regime."""
    g = pl.program_id(0)
    strips = nsW > 1
    Wsw = Wsb + 2 * _CHALO if strips else Wh
    ins = (p00_hbm, p01_hbm, p10_hbm, p11_hbm)
    scr = scr_all[:4]
    sems = scr_all[-1]
    if y4d_nd:
        assert y4d_nd == bt, "transposed-row consumption requires bt == nd"

    def window(gg):
        cc = gg // (nb * nsW)
        ss = (gg % (nb * nsW)) // nb
        ii = gg % nb
        if strips:
            ws = pl.multiple_of(
                jnp.clip(ss * Wsb - _CHALO, 0, Wh - Wsw), _CHALO
            )
        else:
            ws = 0
        return cc, ii, ss, ws

    def dmas(gg, slot):
        cc, ii, _, ws = window(gg)
        ts = pl.multiple_of(ii * bt, pad)
        srcs = []
        for j in range(4):
            if y4d_nd and j >= 2:
                # transposed-row plane flattened to (C, nd, n2*Wh):
                # natural band ii == lane window [ii*Wh + ws, +Wsw).
                # (Slicing the unflattened e axis is Mosaic-illegal —
                # sublane slices need 8-row alignment; the flatten is
                # free and turns it into an aligned lane slice.)
                off = pl.multiple_of(ii * Wh + ws, _CHALO)
                srcs.append(ins[j].at[cc, :, pl.ds(off, Wsw)])
            elif strips:
                srcs.append(ins[j].at[cc, pl.ds(ts, bt), pl.ds(ws, Wsw)])
            else:
                srcs.append(ins[j].at[cc, pl.ds(ts, bt), :])
        return [
            pltpu.make_async_copy(srcs[j], scr[j].at[slot], sems.at[slot, j])
            for j in range(4)
        ]

    sp, sc, sn = _slot_schedule(g, dmas)
    _, ii, ss, ws = window(g)

    def _tile(sref):
        # (bt+2, Wsw): one halo row from each vertical neighbor's slot
        return jnp.concatenate(
            [
                sref[sp, pl.ds(bt - 1, 1), :],
                sref[sc],
                sref[sn, pl.ds(0, 1), :],
            ],
            axis=0,
        )

    def _clip(t):
        f = _to_f32(t)
        if scale != 1.0:
            f = f * jnp.float32(scale)
        return jnp.minimum(jnp.abs(f), 1.0)  # abs>=0: the 0-clamp is dead

    ts = ii * bt - 1  # global plane row of tile row 0 (only feeds the
    # gtop/gbot iota masks; -1 at the top band never matches)
    if tree != "f32":
        q = [[_tile(scr[0]), _tile(scr[1])], [_tile(scr[2]), _tile(scr[3])]]
        out = _TREE_PLANES[tree](q, ts, h, sharpen, ws=ws, Wh=Wh)
    else:
        p = [
            [_clip(_tile(scr[0])), _clip(_tile(scr[1]))],
            [_clip(_tile(scr[2])), _clip(_tile(scr[3]))],
        ]
        out = _quad_planes(p, ts, h, sharpen, ws=ws, Wh=Wh)

    coffset = ss * Wsb - ws
    refs = (o00_ref, o01_ref, o10_ref, o11_ref)

    for co in (0, _CHALO, 2 * _CHALO) if strips else (0,):
        @pl.when(coffset == co)
        def _(co=co):
            for ref, (ry, rx) in zip(
                refs, ((0, 0), (0, 1), (1, 0), (1, 1))
            ):
                ref[0] = out[ry][rx][1 : 1 + bt, co : co + Wsb]


def cas_parity4_planes_u2(
    P00, P01, P10, P11, sharpen: float, block_rows: int = None,
    interpret: bool = False, fac_split: tuple = None, y4d: tuple = None,
):
    """u=2 quad-parity fused CAS: four pre-CAS planes (..., h, Wh) — rows
    split by output row parity, columns by output column parity (see
    dense.r2c_quad) — to four uint8 planes of the same shape.  Accepts
    f32 or int16 Q2.14 inputs.

    fac_split=(n1, n2): the planes arrive (and the u8 outputs return) in
    the staged transform's FACTORED column layout (fft/staged.py
    scramble_cols, r2c_quad_staged(factored=True)).  Correctness-only:
    decodes to natural, runs the natural kernel, re-encodes.  The
    in-kernel factored geometry was REJECTED on-chip in round 4 and
    pruned — the d-boundary wrap slabs and the n2-wide column halo cost
    ~7 ms over the natural kernel at the 8K strips geometry (fac CAS
    16.7-17.4 vs nat 9.6-10.1 ms, scripts/factored_cas_sweep.py) while
    the production factored transform also lost (25.5 vs 22.3 ms,
    scripts/fac_decide_ab.py; e2e 42.7 vs 31.0) — see docs/STATUS.md.

    y4d=(nd, n2): P10/P11 arrive in the staged transform's
    TRANSPOSED-ROW 4D form (..., nd, n2, Wh) — natural row e*nd + d at
    [d, e] (fft/staged.py conv_apply_rows emit4d, the S3 dot's
    copy-free emission).  The slot kernels consume the e-slices
    directly as natural nd-row bands (bt = nd); any path that can't
    (halo/XLA variants, degenerate geometry) decodes to flat rows
    first — paying exactly the transpose this layout avoids."""
    import os

    lead = P00.shape[:-2]
    ynd = 0
    if y4d is not None:
        nd4, n24 = int(y4d[0]), int(y4d[1])
        pad4 = _pad_for(P00.dtype)

        def _flat_rows(p):
            # (..., nd, n2, W) -> (..., nd*n2, W), row e*nd + d
            return p.swapaxes(-3, -2).reshape(
                p.shape[:-3] + (nd4 * n24, p.shape[-1])
            )

        native = (
            fac_split is None
            and block_rows is None
            and os.environ.get("VKRESAMPLE_QUAD_CAS") != "xla"
            and os.environ.get("VKRESAMPLE_QUAD_STRIP", "slots") == "slots"
            and P10.shape[-3:-1] == (nd4, n24)
            and P11.shape[-3:-1] == (nd4, n24)
            and P10.shape[-1] == P00.shape[-1]
            and P11.shape[-1] == P00.shape[-1]
            and P01.shape == P00.shape
            and P00.shape[-2] == nd4 * n24
            and n24 >= 2
            and nd4 >= pad4
            and nd4 % pad4 == 0
            and nd4 * n24 >= nd4 + 2 * pad4
            and P00.dtype in (jnp.float32, jnp.int16)
            and all(x.dtype == P00.dtype for x in (P01, P10, P11))
            and P00.shape[-1] % 128 == 0
        )
        if not native:
            return cas_parity4_planes_u2(
                P00, P01, _flat_rows(P10), _flat_rows(P11), sharpen,
                block_rows=block_rows, interpret=interpret,
                fac_split=fac_split,
            )
        ynd = nd4
        # flatten (..., nd, n2, W) -> (C, nd, n2*W): free (the two minor
        # dims merge in canonical layout) and it turns the kernel's
        # e-slice DMA into an aligned lane-window slice
        planes = [
            P00.reshape((-1,) + P00.shape[-2:]),
            P01.reshape((-1,) + P01.shape[-2:]),
            P10.reshape((-1, nd4, n24 * P10.shape[-1])),
            P11.reshape((-1, nd4, n24 * P11.shape[-1])),
        ]
    else:
        planes = [
            x.reshape((-1,) + x.shape[-2:]) for x in (P00, P01, P10, P11)
        ]
    C, h, Wh = planes[0].shape
    dt = planes[0].dtype
    pad = _pad_for(dt)

    if fac_split is not None:
        from ..fft import staged as _staged

        n1f, n2f = int(fac_split[0]), int(fac_split[1])
        nat = cas_parity4_planes_u2(
            *(
                _staged.defactor_cols(x, n1f, n2f)
                for x in (P00, P01, P10, P11)
            ),
            sharpen, block_rows=block_rows, interpret=interpret,
        )
        return tuple(_staged.scramble_cols(x, n1f, n2f) for x in nat)
    if os.environ.get("VKRESAMPLE_QUAD_CAS") == "xla":
        # full-array XLA evaluation of the same quad stencil (A/B knob:
        # lets XLA's own fusion/tiling compete with the Pallas band
        # kernels — scripts/big_cas_ab.py)
        from . import cas as cas_ops

        f = [
            cas_ops.from_i16_storage(x) if x.dtype == jnp.int16
            else x.astype(jnp.float32)
            for x in planes
        ]
        p = [
            [jnp.minimum(jnp.abs(f[0]), 1.0), jnp.minimum(jnp.abs(f[1]), 1.0)],
            [jnp.minimum(jnp.abs(f[2]), 1.0), jnp.minimum(jnp.abs(f[3]), 1.0)],
        ]

        def _one(c):
            out = _quad_planes(
                [[p[0][0][c], p[0][1][c]], [p[1][0][c], p[1][1][c]]],
                0, h, sharpen,
            )
            return out

        outs = jax.vmap(_one)(jnp.arange(C))
        return tuple(
            outs[ry][rx].reshape(lead + (h, Wh))
            for ry, rx in ((0, 0), (0, 1), (1, 0), (1, 1))
        )
    wpadq = -Wh % 128
    hpadq = -h % pad
    if (
        (wpadq or hpadq)
        and ynd == 0
        and _pallas_platform(interpret)
        and dt in (jnp.float32, jnp.int16)
        and all(x.dtype == dt and x.shape == planes[0].shape for x in planes)
    ):
        # Lane/sublane-pad to kernel alignment and crop after (round 5:
        # serves the non-128-aligned big widths the route gates now
        # admit).  CAS is a 3x3 clamp-to-edge stencil on the WOVEN
        # image, so a real output cell reads at most the FIRST pad
        # column/row, whose correct clamped value is the wrap-partner
        # plane's last column/row: east of woven col 2*Wh-1 clamps to
        # itself = P*1[:, Wh-1], which the kernel reads as P*0[:, Wh];
        # south of woven row 2*h-1 clamps to P1*[h-1, :], read as
        # P0*[h, :].  Deeper pad cells are replicate fill no real
        # output ever reads (the corner composes: row-pad of the
        # col-padded planes).  Without this, misaligned planes fell to
        # the woven XLA fallback, whose (C, h, 2, Wh, 2) stack
        # lane-pads 64x on TPU (a 229 GB allocation at 8640).  The pad
        # target is geometry-aware (_lane_pad_target): wide planes land
        # on the strip kernels, whose Wsb must divide the padded width.
        from ..core.tuning import current as _cur

        try:
            wsb_pref = int(os.environ.get("VKRESAMPLE_QUAD_WSB", "0"))
        except ValueError:
            wsb_pref = 0
        wsb_pref = wsb_pref or _cur().quad_wsb
        if wpadq:
            wpadq = _lane_pad_target(Wh, wsb_pref, _cur().quad_wmax) - Wh

        def _cpad(p, first):
            fill = jnp.broadcast_to(first, p.shape[:-1] + (wpadq,))
            return jnp.concatenate([p, fill], axis=-1)

        def _rpad(p, first):
            fill = jnp.broadcast_to(
                first, p.shape[:-2] + (hpadq, p.shape[-1])
            )
            return jnp.concatenate([p, fill], axis=-2)

        q00, q01, q10, q11 = planes
        if wpadq:
            q00 = _cpad(q00, q01[..., -1:])
            q01 = _cpad(q01, q01[..., -1:])
            q10 = _cpad(q10, q11[..., -1:])
            q11 = _cpad(q11, q11[..., -1:])
        if hpadq:
            q00 = _rpad(q00, q10[..., -1:, :])
            q01 = _rpad(q01, q11[..., -1:, :])
            q10 = _rpad(q10, q10[..., -1:, :])
            q11 = _rpad(q11, q11[..., -1:, :])
        outs = cas_parity4_planes_u2(
            q00, q01, q10, q11, sharpen, block_rows=block_rows,
            interpret=interpret,
        )
        return tuple(o[..., :h, :Wh].reshape(lead + (h, Wh)) for o in outs)
    default_block = block_rows is None
    if default_block:
        from ..core.tuning import current

        block_rows = current().quad_block
        if dt != jnp.int16:
            block_rows = max(pad, block_rows // 2)
    bt = _fit_block(ynd or block_rows, h, pad)
    if ynd == 0 and (
        bt < pad
        or Wh % 128
        or h < bt + 2 * pad
        or dt not in (jnp.float32, jnp.int16)
        or any(x.dtype != dt or x.shape != planes[0].shape for x in planes)
    ):
        # degenerate geometry: evaluate via the XLA CAS on the woven image
        from . import cas as cas_ops

        f = [
            cas_ops.from_i16_storage(x) if x.dtype == jnp.int16
            else x.astype(jnp.float32)
            for x in planes
        ]
        v = jnp.stack(
            [jnp.stack([f[0], f[1]], axis=-1), jnp.stack([f[2], f[3]], axis=-1)],
            axis=-3,
        )  # (C, h, 2, Wh, 2)
        v = v.reshape(C, 2 * h, 2 * Wh)
        out = cas_quantize_pallas(v, sharpen, interpret=interpret)
        o4 = out.reshape(C, h, 2, Wh, 2)
        return tuple(
            o4[:, :, ry, :, rx].reshape(lead + (h, Wh))
            for ry, rx in ((0, 0), (0, 1), (1, 0), (1, 1))
        )

    nb = h // bt
    rows = bt + 2 * pad

    from ..core.tuning import current

    wmax = current().quad_wmax
    if Wh > wmax:
        # wide planes: column strips (full-width tiles would blow VMEM).
        # ~24 live f32 row-tiles peak in _quad_planes: keep strips narrow
        # and bands short.  The band cost is halo amplification
        # ((bt+2*pad)/bt x (Wsb+2*_CHALO)/Wsb reads+compute per output
        # element), so the env knobs let scripts/big_cas_ab.py sweep the
        # (bt, Wsb) trade within the VMEM cap.
        import os

        def _env_int(name):
            # malformed values fall back to the tuned defaults instead of
            # crashing the pipeline trace
            try:
                return int(os.environ.get(name, "0"))
            except ValueError:
                return 0

        wsb_req = _env_int("VKRESAMPLE_QUAD_WSB")
        bt_req = _env_int("VKRESAMPLE_QUAD_BT")
        if ynd:
            # transposed-row planes: bands ARE the e-slices, so bt = nd;
            # at bt=64 the wider strip wins the slots-era sweep
            # (bt64/wsb2048 9.19 ~ bt128/wsb1024 9.17, cas_sweep8k.py)
            bt_req, wsb_req = ynd, wsb_req or 2048
        Wsb = _fit_block(wsb_req or current().quad_wsb, Wh, _CHALO)
        # bt=128 with wsb=1024 (rows=160): halo amplification 1.56x vs
        # 2.25x at the round-2 bt32/wsb2048 — 10.7 vs 16.4 ms at the
        # 8K->16K plane geometry, bit-identical (scripts/big_cas_ab.py;
        # bt128/wsb2048 and bt256 blow VMEM, XLA full-array is 78 ms).
        # The strip default is its own tuning entry, not the (possibly
        # slots-halved) full-width bt.
        bt = _fit_block(bt_req or current().quad_strip_block, h, pad)
        if Wsb >= _CHALO and Wh >= Wsb + 2 * _CHALO and bt >= pad:
            nb = h // bt
            rows = bt + 2 * pad
            nsW = Wh // Wsb
            # slot-resident is the default: bit-identical to the halo
            # kernel (on-chip maxdiff 0) and ~5% faster at the big-tier
            # production config (9.26 vs 9.75 ms, scripts/slots_ab.py);
            # VKRESAMPLE_QUAD_STRIP=halo keeps the padded-window kernel
            # for A/B
            slots = (
                os.environ.get("VKRESAMPLE_QUAD_STRIP", "slots") == "slots"
                and nb >= 2
            )
            if slots:
                # slot-resident bands: row halos come from neighbor
                # slots instead of re-DMA'd pad-aligned windows; the
                # grid sweeps bands vertically within each column strip
                kern = functools.partial(
                    _quad_strip_slots_kernel, sharpen=float(sharpen),
                    bt=bt, h=h, nb=nb, pad=pad, scale=_in_scale_for(dt),
                    Wh=Wh, Wsb=Wsb, nsW=nsW, tree=_tree_mode(dt),
                    y4d_nd=ynd,
                )
                ospec = pl.BlockSpec(
                    (1, bt, Wsb),
                    lambda g, nb=nb, nsW=nsW: (
                        g // (nb * nsW),
                        g % nb,
                        (g % (nb * nsW)) // nb,
                    ),
                    memory_space=pltpu.VMEM,
                )
                scratch = [pltpu.VMEM((4, bt, Wsb + 2 * _CHALO), dt)] * 4 + [
                    pltpu.SemaphoreType.DMA((4, 4))
                ]
            else:
                kern = functools.partial(
                    _quad_strip_kernel, sharpen=float(sharpen), bt=bt,
                    h=h, nb=nb, pad=pad, scale=_in_scale_for(dt), Wh=Wh,
                    Wsb=Wsb, nsW=nsW, tree=_tree_mode(dt),
                )
                ospec = pl.BlockSpec(
                    (1, bt, Wsb),
                    lambda g, nb=nb, nsW=nsW: (
                        g // (nb * nsW),
                        (g % (nb * nsW)) // nsW,
                        g % nsW,
                    ),
                    memory_space=pltpu.VMEM,
                )
                scratch = [
                    pltpu.VMEM((2, rows, Wsb + 2 * _CHALO), dt)
                ] * 4 + [pltpu.SemaphoreType.DMA((2, 4))]
            outs = pl.pallas_call(
                kern,
                out_shape=tuple(
                    jax.ShapeDtypeStruct((C, h, Wh), jnp.uint8)
                    for _ in range(4)
                ),
                grid=(C * nb * nsW,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
                out_specs=(ospec, ospec, ospec, ospec),
                scratch_shapes=scratch,
                interpret=interpret,
            )(*planes)
            return tuple(x.reshape(lead + (h, Wh)) for x in outs)
        # no usable strip width: degrade to the XLA fallback
        # (transposed-row planes decode to flat natural rows first)
        def _unflat(p):
            if ynd and p.shape[-2] == ynd:
                return (
                    p.reshape(C, ynd, -1, Wh)
                    .swapaxes(-3, -2)
                    .reshape(C, h, Wh)
                )
            return p

        return cas_parity4_planes_u2(
            *(_unflat(p).reshape(lead + (h, Wh)) for p in planes),
            sharpen, block_rows=1, interpret=interpret,
        )

    if (
        os.environ.get("VKRESAMPLE_QUAD_STRIP", "slots") == "slots"
        and nb >= 2
    ):
        # full-width slot-resident bands (nsW=1): the flagship-regime
        # version of the same scheme — the halo kernel DMAs and computes
        # (bt + 2*pad) rows per bt-row band (1.5x at bt=64/pad=16).
        # Band height from the tuning table (quad_fw_slots_block, sweep
        # numbers there); VKRESAMPLE_QUAD_FW_BT overrides for A/B.
        try:
            fw_bt = int(os.environ.get("VKRESAMPLE_QUAD_FW_BT", "0"))
        except ValueError:
            fw_bt = 0
        if ynd:
            pass  # bands are the e-slices: bt pinned to nd
        elif fw_bt:
            bt = _fit_block(fw_bt, h, pad)
            nb = h // bt
        elif default_block and bt > pad:
            fw = current().quad_fw_slots_block
            if dt != jnp.int16:
                fw = fw // 2
            bt = _fit_block(max(pad, min(fw, bt)), h, pad)
            nb = h // bt
        kern = functools.partial(
            _quad_strip_slots_kernel, sharpen=float(sharpen), bt=bt, h=h,
            nb=nb, pad=pad, scale=_in_scale_for(dt), Wh=Wh, Wsb=Wh,
            nsW=1, tree=_tree_mode(dt), y4d_nd=ynd,
        )
        ospec = pl.BlockSpec(
            (1, bt, Wh), lambda g, nb=nb: (g // nb, g % nb, 0),
            memory_space=pltpu.VMEM,
        )
        outs = pl.pallas_call(
            kern,
            out_shape=tuple(
                jax.ShapeDtypeStruct((C, h, Wh), jnp.uint8)
                for _ in range(4)
            ),
            grid=(C * nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=(ospec, ospec, ospec, ospec),
            scratch_shapes=[pltpu.VMEM((4, bt, Wh), dt)] * 4
            + [pltpu.SemaphoreType.DMA((4, 4))],
            interpret=interpret,
        )(*planes)
        return tuple(x.reshape(lead + (h, Wh)) for x in outs)

    kern = functools.partial(
        _quad_kernel, sharpen=float(sharpen), bt=bt, h=h, nb=nb, pad=pad,
        scale=_in_scale_for(dt), tree=_tree_mode(dt),
    )
    ospec = pl.BlockSpec(
        (1, bt, Wh), lambda g, nb=nb: (g // nb, g % nb, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct((C, h, Wh), jnp.uint8) for _ in range(4)
        ),
        grid=(C * nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(ospec, ospec, ospec, ospec),
        scratch_shapes=[pltpu.VMEM((2, rows, Wh), dt)] * 4
        + [pltpu.SemaphoreType.DMA((2, 4))],
        interpret=interpret,
    )(*planes)
    return tuple(x.reshape(lead + (h, Wh)) for x in outs)


# ---------------------------------------------------------------------------
# u-generic grid-parity fused CAS (u >= 2): u^2 phase planes
# ---------------------------------------------------------------------------
#
# The quad stencil algebra generalizes: for u^2 phase planes P[ry][rx]
# (output pixel (u*t + ry, u*s + rx) lives at plane (ry, rx) index (t, s)),
# every 3x3 CAS neighbor is a SIBLING plane at the same index or a one-step
# row/column shift of one:
#   west  of (ry, rx): plane (ry, rx-1) same s       (rx > 0)
#                      plane (ry, u-1) shifted left  (rx == 0; gleft clamps)
#   north of (ry, rx): plane (ry-1, rx) same t       (ry > 0)
#                      plane (u-1, rx) shifted up    (ry == 0; gtop clamps)
# Interior phases (0 < r < u-1) need no shifts or edge clamps at all —
# only the boundary phases touch the image border.  u=2 is the fully-
# boundary special case (_quad_planes).


def _grid_planes(p, u, ts, h, sharpen, ws=0, Wh=None):
    """p[ry][rx]: clipped f32 tiles covering global rows [ts, ts+rows) and
    global columns [ws, ws+Wsw) of the u x u phase planes (each h x Wh
    globally).  Returns the u x u uint8 output tiles; valid wherever the
    row/col halo is inside the tile."""
    rows, Wsw = p[0][0].shape
    if Wh is None:
        Wh = Wsw
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    gtop = (row + ts) == 0
    gbot = (row + ts) == h - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Wsw), 1) + ws
    gleft = col == 0
    gright = col == Wh - 1

    xmin = [[None] * u for _ in range(u)]
    xmax = [[None] * u for _ in range(u)]
    wpe = [[None] * u for _ in range(u)]
    for ry in range(u):
        for rx in range(u):
            if rx > 0:
                wv = p[ry][rx - 1]
            else:
                wv = jnp.where(gleft, p[ry][0], _shiftL(p[ry][u - 1]))
            if rx < u - 1:
                ev = p[ry][rx + 1]
            else:
                ev = jnp.where(gright, p[ry][u - 1], _shiftR(p[ry][0]))
            xmin[ry][rx] = jnp.minimum(wv, ev)
            xmax[ry][rx] = jnp.maximum(wv, ev)
            wpe[ry][rx] = wv + ev

    out = [[None] * u for _ in range(u)]
    for ry in range(u):
        for rx in range(u):
            c = p[ry][rx]
            if ry > 0:
                n = p[ry - 1][rx]
                nmin, nmax = xmin[ry - 1][rx], xmax[ry - 1][rx]
            else:
                n = jnp.where(gtop, c, _yshift_up(p[u - 1][rx]))
                nmin = jnp.where(
                    gtop, xmin[0][rx], _yshift_up(xmin[u - 1][rx])
                )
                nmax = jnp.where(
                    gtop, xmax[0][rx], _yshift_up(xmax[u - 1][rx])
                )
            if ry < u - 1:
                s = p[ry + 1][rx]
                smin, smax = xmin[ry + 1][rx], xmax[ry + 1][rx]
            else:
                s = jnp.where(gbot, c, _yshift_dn(p[0][rx]))
                smin = jnp.where(gbot, xmin[u - 1][rx], _yshift_dn(xmin[0][rx]))
                smax = jnp.where(gbot, xmax[u - 1][rx], _yshift_dn(xmax[0][rx]))
            out[ry][rx] = _cas_core(
                c, n, s, xmin[ry][rx], xmax[ry][rx], wpe[ry][rx],
                jnp.minimum(nmin, smin), jnp.maximum(nmax, smax), sharpen,
            )
    return out


def _grid_strip_kernel(
    *refs,
    u: int, sharpen: float, bt: int, h: int, nb: int, pad: int,
    scale: float, Wh: int, Wsb: int, nsW: int,
):
    """Strip kernel over (C, row band, col strip) for u^2 phase planes:
    refs = n inputs (HBM) + n outputs (VMEM blocks) + n scratch + 1 sem,
    n = u^2.  nsW == 1 runs full-width tiles (no column halo)."""
    n = u * u
    ins = refs[:n]
    outs = refs[n : 2 * n]
    scr = refs[2 * n : 3 * n]
    sems = refs[3 * n]
    g = pl.program_id(0)
    rows = bt + 2 * pad
    strips = nsW > 1
    Wsw = Wsb + 2 * _CHALO if strips else Wh

    def window(gg):
        cc = gg // (nb * nsW)
        rem = gg % (nb * nsW)
        ii = rem // nsW
        ss = rem % nsW
        ts = pl.multiple_of(jnp.clip(ii * bt - pad, 0, h - rows), pad)
        if strips:
            ws = pl.multiple_of(
                jnp.clip(ss * Wsb - _CHALO, 0, Wh - Wsw), _CHALO
            )
        else:
            ws = 0
        return cc, ii, ss, ts, ws

    def dmas(gg, slot):
        cc, _, _, ts, ws = window(gg)
        if strips:
            srcs = [
                ins[j].at[cc, pl.ds(ts, rows), pl.ds(ws, Wsw)]
                for j in range(n)
            ]
        else:
            srcs = [ins[j].at[cc, pl.ds(ts, rows), :] for j in range(n)]
        return [
            pltpu.make_async_copy(srcs[j], scr[j].at[slot], sems.at[slot, j])
            for j in range(n)
        ]

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        for dma in dmas(g + 1, jax.lax.rem(g + 1, 2)):
            dma.start()

    for dma in dmas(g, slot):
        dma.wait()

    _, ii, ss, ts, ws = window(g)

    def _clip(t):
        f = _to_f32(t)
        if scale != 1.0:
            f = f * jnp.float32(scale)
        return jnp.minimum(jnp.abs(f), 1.0)

    p = [
        [_clip(scr[ry * u + rx][slot]) for rx in range(u)]
        for ry in range(u)
    ]
    out = _grid_planes(p, u, ts, h, sharpen, ws=ws, Wh=Wh)

    roffset = ii * bt - ts
    coffset = ss * Wsb - ws
    for ro in (0, pad, 2 * pad):
        cos = (0, _CHALO, 2 * _CHALO) if strips else (0,)
        for co in cos:
            @pl.when(jnp.logical_and(roffset == ro, coffset == co))
            def _(ro=ro, co=co):
                for j in range(n):
                    outs[j][0] = out[j // u][j % u][
                        ro : ro + bt, co : co + Wsb
                    ]


def _grid_strip_slots_kernel(
    *refs,
    u: int, sharpen: float, bt: int, h: int, nb: int, pad: int,
    scale: float, Wh: int, Wsb: int, nsW: int,
):
    """Slot-resident variant of the grid strip kernel (same scheme as
    `_quad_strip_slots_kernel`): bands are DMA'd WITHOUT row halos
    (exactly bt rows each) into a 4-deep rotating buffer per plane, and
    the one-row vertical halos come from the neighbor bands'
    still-resident slots.  The grid sweeps bands vertically within each
    column strip (ii fastest) so vertical neighbors occupy adjacent
    slots; strip-edge slots hold garbage rows that coincide exactly with
    the image top/bottom, where `_grid_planes`' gtop/gbot clamp masks
    discard them.  The u^2-plane grid pays worse halo amplification than
    the quad kernel (bt shrinks as n grows to fit VMEM), so removing the
    2*pad-per-side windows matters more here."""
    n = u * u
    ins = refs[:n]
    outs = refs[n : 2 * n]
    scr = refs[2 * n : 3 * n]
    sems = refs[3 * n]
    g = pl.program_id(0)
    strips = nsW > 1
    Wsw = Wsb + 2 * _CHALO if strips else Wh

    def window(gg):
        cc = gg // (nb * nsW)
        ss = (gg % (nb * nsW)) // nb
        ii = gg % nb
        if strips:
            ws = pl.multiple_of(
                jnp.clip(ss * Wsb - _CHALO, 0, Wh - Wsw), _CHALO
            )
        else:
            ws = 0
        return cc, ii, ss, ws

    def dmas(gg, slot):
        cc, ii, _, ws = window(gg)
        ts = pl.multiple_of(ii * bt, pad)
        if strips:
            srcs = [
                ins[j].at[cc, pl.ds(ts, bt), pl.ds(ws, Wsw)]
                for j in range(n)
            ]
        else:
            srcs = [ins[j].at[cc, pl.ds(ts, bt), :] for j in range(n)]
        return [
            pltpu.make_async_copy(srcs[j], scr[j].at[slot], sems.at[slot, j])
            for j in range(n)
        ]

    sp, sc, sn = _slot_schedule(g, dmas)
    _, ii, ss, ws = window(g)

    def _tile(sref):
        # (bt+2, Wsw): one halo row from each vertical neighbor's slot
        return jnp.concatenate(
            [
                sref[sp, pl.ds(bt - 1, 1), :],
                sref[sc],
                sref[sn, pl.ds(0, 1), :],
            ],
            axis=0,
        )

    def _clip(t):
        f = _to_f32(t)
        if scale != 1.0:
            f = f * jnp.float32(scale)
        return jnp.minimum(jnp.abs(f), 1.0)

    ts = ii * bt - 1  # global plane row of tile row 0 (only feeds the
    # gtop/gbot iota masks; -1 at the top band never matches)
    p = [
        [_clip(_tile(scr[ry * u + rx])) for rx in range(u)]
        for ry in range(u)
    ]
    out = _grid_planes(p, u, ts, h, sharpen, ws=ws, Wh=Wh)

    coffset = ss * Wsb - ws
    cos = (0, _CHALO, 2 * _CHALO) if strips else (0,)
    for co in cos:
        @pl.when(coffset == co)
        def _(co=co):
            for j in range(n):
                outs[j][0] = out[j // u][j % u][1 : 1 + bt, co : co + Wsb]


_GRID_VMEM_BUDGET = 14 * 2**20


def _grid_geometry(n, h, Wp, pad, dt, bt_req, wsb_req):
    """(bt, Wsb, nsW, Wsw) for the grid CAS band kernels, or None when no
    geometry fits the scoped-VMEM budget (callers fall back to XLA).

    Shrinks the band height first, then the strip width: large plane
    counts (exotic fractions, e.g. p=7 -> 49 planes) exceed the budget
    even at bt=pad — the p=7 c2c -validate OOM'd scoped VMEM at the
    u=3-tuned Wsb=1024 (onchip_r4 bigexotic_p7) because the pre-fix
    estimate could accept over-budget geometries once bt hit its floor.
    Enforced here in plan-time Python because interpret-mode tests never
    see Mosaic's VMEM limit."""
    bt = _fit_block(bt_req, h, pad)
    if Wp > wsb_req + 2 * _CHALO:
        Wsb = _fit_block(wsb_req, Wp, _CHALO)
        nsW = Wp // Wsb if Wsb else 0
        Wsw = Wsb + 2 * _CHALO
    else:
        Wsb, nsW, Wsw = Wp, 1, Wp

    def est(bt_, Wsw_):
        # calibrated against the compiler's own scoped-VMEM report at
        # the p=7 failure (28.05 MB at n=49, bt=16, Wsw=1088, i16):
        # 4-deep slot scratch + ~6 live f32 band temporaries per plane
        # = n*Wsw*bt*(4*itemsize + 24), which predicts 27.3 MB there and
        # stays under the report at the on-chip-verified p=5 and u=3
        # geometries
        return n * Wsw_ * bt_ * (4 * dt.itemsize + 24)

    while bt > pad and est(bt, Wsw) > _GRID_VMEM_BUDGET:
        bt = _fit_block(bt - pad, h, pad)
    while Wsb > _CHALO and est(bt, Wsw) > _GRID_VMEM_BUDGET:
        Wsb = _fit_block(Wsb - _CHALO, Wp, _CHALO)
        if not Wsb:
            break
        nsW = Wp // Wsb
        Wsw = Wsb + 2 * _CHALO
    if (
        bt < pad
        or h < bt + 2 * pad
        or not Wsb
        or (nsW > 1 and Wsb < _CHALO)
        # the width-shrink loop can strip-ify a full-width origin
        # (nsW 1 -> >1) on a plane too narrow to hold a halo'd strip
        # window; the strip kernel's window start clip(ss*Wsb - _CHALO,
        # 0, Wp - Wsw) would then get a negative upper bound
        or (nsW > 1 and Wsw > Wp)
        or est(bt, Wsw) > _GRID_VMEM_BUDGET
    ):
        return None
    return bt, Wsb, nsW, Wsw


def cas_parity_grid_planes(
    planes, u: int, sharpen: float, interpret: bool = False,
):
    """u-generic grid-parity fused CAS: u^2 pre-CAS phase planes (row-major
    (ry, rx), each (..., h, w)) to u^2 uint8 planes of the same shape.
    Accepts f32 or int16 Q2.14 inputs.  The u=2 quad kernel remains the
    tuned specialization; this serves u >= 3."""
    import os

    n = u * u
    if len(planes) != n:
        raise ValueError(f"expected {n} planes for u={u}, got {len(planes)}")
    lead = planes[0].shape[:-2]
    ps = [x.reshape((-1,) + x.shape[-2:]) for x in planes]
    C, h, Wp = ps[0].shape
    dt = ps[0].dtype
    pad = _pad_for(dt)

    def _weave():
        # weave on device + full-array CAS: the correctness path for CPU
        # tests / degenerate geometries (the stack+reshape weave is the
        # known-pathological layout on TPU — the Pallas path avoids it)
        from . import cas as cas_ops

        f = [
            cas_ops.from_i16_storage(x) if x.dtype == jnp.int16
            else x.astype(jnp.float32)
            for x in ps
        ]
        g = jnp.stack(f, axis=1).reshape(C, u, u, h, Wp)
        g = jnp.transpose(g, (0, 3, 1, 4, 2))  # (C, h, ry, Wp, rx)
        return g.reshape(C, u * h, u * Wp)

    def _split(out):
        o = out.reshape(C, h, u, Wp, u)
        return tuple(
            o[:, :, ry, :, rx].reshape(lead + (h, Wp))
            for ry in range(u)
            for rx in range(u)
        )

    wpadq = -Wp % 128
    hpadq = -h % pad
    if (
        (wpadq or hpadq)
        and os.environ.get("VKRESAMPLE_GRID_CAS") != "xla"
        and _pallas_platform(interpret)
        and dt in (jnp.float32, jnp.int16)
        and all(x.dtype == dt and x.shape == ps[0].shape for x in ps)
    ):
        # Lane/sublane-pad to kernel alignment and crop after (round 5:
        # the quad kernel's replicate-pad path generalized to u x u —
        # see cas_parity4_planes_u2).  Plane (ry, rx) holds woven cells
        # [ry::u, rx::u] of the (u*h, u*Wp) image; the 3x3 clamp-to-
        # edge stencil makes a real cell read at most the FIRST pad
        # column/row: east of woven col u*Wp-1 clamps to itself =
        # P[ry][u-1][:, Wp-1], which the kernel reads as P[ry][0][:,
        # Wp]; south of woven row u*h-1 clamps to P[u-1][rx][h-1, :],
        # read as P[0][rx][h, :].  Deeper pad cells are replicate fill
        # no real output reads (the corner composes: row-pad of the
        # col-padded planes).  Without this, non-128-aligned widths
        # fell to the woven XLA fallback whose stack lane-pads u*64x
        # on TPU.  The pad target is geometry-aware (_lane_pad_target):
        # wide planes land on the strip kernels, whose Wsb must divide
        # the padded width.
        from ..core.tuning import current as _cur

        def _ei(name):
            try:
                return int(os.environ.get(name, "0"))
            except ValueError:
                return 0

        wsb_pref = _ei("VKRESAMPLE_GRID_WSB") or _cur().quad_wsb
        if wpadq:
            wpadq = (
                _lane_pad_target(Wp, wsb_pref, wsb_pref + 2 * _CHALO) - Wp
            )

        def _cpad(p, first):
            fill = jnp.broadcast_to(first, p.shape[:-1] + (wpadq,))
            return jnp.concatenate([p, fill], axis=-1)

        def _rpad(p, first):
            fill = jnp.broadcast_to(
                first, p.shape[:-2] + (hpadq, p.shape[-1])
            )
            return jnp.concatenate([p, fill], axis=-2)

        qs = list(ps)
        if wpadq:
            qs = [
                _cpad(
                    p,
                    qs[(i // u) * u + (u - 1)][..., -1:]
                    if i % u == 0 else p[..., -1:],
                )
                for i, p in enumerate(qs)
            ]
        if hpadq:
            qs = [
                _rpad(
                    p,
                    qs[(u - 1) * u + (i % u)][..., -1:, :]
                    if i // u == 0 else p[..., -1:, :],
                )
                for i, p in enumerate(qs)
            ]
        outs = cas_parity_grid_planes(qs, u, sharpen, interpret=interpret)
        return tuple(o[..., :h, :Wp].reshape(lead + (h, Wp)) for o in outs)

    from ..core.tuning import current

    def _env_int(name):
        try:
            return int(os.environ.get(name, "0"))
        except ValueError:
            return 0

    # band-height request comes from the tuning table's grid row (sweep-
    # sourced, scripts/grid_cas_sweep.py: bt=32/wsb=1024 beats the old
    # (quad_block*4)/n heuristic 7.88 vs 9.07 ms at big u=3, bit-exact);
    # _grid_geometry shrinks to the scoped-VMEM budget for larger plane
    # counts (exotic fractions, e.g. p=7 -> 49 planes)
    bt_req = _env_int("VKRESAMPLE_GRID_BT") or max(
        pad, _fit_block(current().grid_block, h, pad)
    )
    wsb_req = _env_int("VKRESAMPLE_GRID_WSB") or current().quad_wsb

    usable = (
        not os.environ.get("VKRESAMPLE_GRID_CAS") == "xla"
        and Wp % 128 == 0
        and dt in (jnp.float32, jnp.int16)
        and all(x.dtype == dt and x.shape == ps[0].shape for x in ps)
    )
    if usable:
        geom = _grid_geometry(n, h, Wp, pad, dt, bt_req, wsb_req)
        if geom is None:
            usable = False
        else:
            bt, Wsb, nsW, Wsw = geom
    if not usable:
        # degenerate geometry / opted-out: evaluate the XLA CAS on the
        # woven image (same pattern as the quad kernel's fallback — must
        # NOT route through cas_quantize_pallas, whose own gate could
        # re-enter a compiled pallas_call on CPU test geometries)
        from . import cas as cas_ops

        out = cas_ops.quantize_u8(cas_ops.cas_sharpen(_weave(), sharpen))
        return _split(out)

    nb = h // bt
    # slot-resident is the default: on-chip bit-exact vs the halo kernel
    # and 28% faster at the big u=3 geometry (9.47 vs 13.20 ms,
    # scripts/grid_slots_ab.py — the u^2-plane VMEM budget shrinks bt,
    # so the halo scheme's 2*pad rows-per-side cost more here than at
    # u=2); VKRESAMPLE_GRID_STRIP=halo keeps the padded-window kernel
    slots = (
        os.environ.get("VKRESAMPLE_GRID_STRIP", "slots") == "slots"
        and nb >= 2
    )
    if slots:
        # slot-resident bands (see _grid_strip_slots_kernel): the grid
        # sweeps bands vertically within each column strip
        kern = functools.partial(
            _grid_strip_slots_kernel, u=u, sharpen=float(sharpen), bt=bt,
            h=h, nb=nb, pad=pad, scale=_in_scale_for(dt), Wh=Wp, Wsb=Wsb,
            nsW=nsW,
        )
        ospec = pl.BlockSpec(
            (1, bt, Wsb),
            lambda g, nb=nb, nsW=nsW: (
                g // (nb * nsW),
                g % nb,
                (g % (nb * nsW)) // nb,
            ),
            memory_space=pltpu.VMEM,
        )
        scratch = [pltpu.VMEM((4, bt, Wsw), dt)] * n + [
            pltpu.SemaphoreType.DMA((4, n))
        ]
    else:
        kern = functools.partial(
            _grid_strip_kernel, u=u, sharpen=float(sharpen), bt=bt, h=h,
            nb=nb, pad=pad, scale=_in_scale_for(dt), Wh=Wp, Wsb=Wsb,
            nsW=nsW,
        )
        ospec = pl.BlockSpec(
            (1, bt, Wsb),
            lambda g, nb=nb, nsW=nsW: (
                g // (nb * nsW),
                (g % (nb * nsW)) // nsW,
                g % nsW,
            ),
            memory_space=pltpu.VMEM,
        )
        scratch = [pltpu.VMEM((2, bt + 2 * pad, Wsw), dt)] * n + [
            pltpu.SemaphoreType.DMA((2, n))
        ]
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct((C, h, Wp), jnp.uint8) for _ in range(n)
        ),
        grid=(C * nb * nsW,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n,
        out_specs=(ospec,) * n,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ps)
    return tuple(x.reshape(lead + (h, Wp)) for x in outs)


# ---------------------------------------------------------------------------
# block-pipelined CAS (automatic Mosaic prefetch, no manual DMA)
# ---------------------------------------------------------------------------
#
# The manual-DMA kernel pays ~10 us of sequencing per grid step (measured:
# a trivial copy kernel with the same structure costs ~0.65 ms at the
# flagship size).  This variant uses BlockSpec-managed inputs — Mosaic's
# own double-buffered pipeline — with the one-row halos precomputed in XLA
# as separate (C, nb, W) arrays (clamped row gather, a few KB).  Neighbor
# rows are built by concatenating the halo row with a shifted center block,
# so no misaligned slices and no edge branches exist at all.


def _cas_blk_kernel(v_ref, top_ref, bot_ref, out_ref, *, sharpen: float):
    ln = jnp.clip(jnp.abs(v_ref[0]), 0.0, 1.0)  # (bh, W)
    # halo blocks are padded to 8 sublanes (TPU block constraint); row 0 is
    # the real halo row
    lt = jnp.clip(jnp.abs(top_ref[0, 0, :1]), 0.0, 1.0)  # (1, W)
    lb = jnp.clip(jnp.abs(bot_ref[0, 0, :1]), 0.0, 1.0)

    W = ln.shape[1]
    west = jnp.concatenate([ln[:, :1], ln[:, : W - 1]], axis=1)
    east = jnp.concatenate([ln[:, 1:], ln[:, W - 1 :]], axis=1)
    xmin = jnp.minimum(west, east)
    xmax = jnp.maximum(west, east)
    wpe = west + east
    del west, east

    def xmm(row):
        wst = jnp.concatenate([row[:, :1], row[:, : W - 1]], axis=1)
        est = jnp.concatenate([row[:, 1:], row[:, W - 1 :]], axis=1)
        return jnp.minimum(wst, est), jnp.maximum(wst, est)

    tmin, tmax = xmm(lt)
    bmin, bmax = xmm(lb)

    n = jnp.concatenate([lt, ln[:-1]], axis=0)
    s = jnp.concatenate([ln[1:], lb], axis=0)
    nmin = jnp.concatenate([tmin, xmin[:-1]], axis=0)
    nmax = jnp.concatenate([tmax, xmax[:-1]], axis=0)
    smin = jnp.concatenate([xmin[1:], bmin], axis=0)
    smax = jnp.concatenate([xmax[1:], bmax], axis=0)

    min_cross = jnp.minimum(jnp.minimum(n, s), jnp.minimum(ln, xmin))
    max_cross = jnp.maximum(jnp.maximum(n, s), jnp.maximum(ln, xmax))
    min_all = jnp.minimum(min_cross, jnp.minimum(nmin, smin))
    max_all = jnp.maximum(max_cross, jnp.maximum(nmax, smax))

    minlen = 0.5 * (min_cross + min_all)
    maxlen = 0.5 * (max_cross + max_all)
    one = jnp.float32(1.0)
    a, b = minlen, one - minlen
    cq, d = one - maxlen, maxlen
    pred = a * d < cq * b
    sc = jnp.where(pred, a, cq) / jnp.where(pred, b, d)
    sc = -jnp.float32(sharpen) * jnp.sqrt(jnp.maximum(sc, 0.0))
    out = (ln + sc * (n + s + wpe)) / (one + 4.0 * sc)
    out_ref[0] = (
        jnp.clip(out * 255.0, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
    )


def cas_quantize_blocked(
    v: jnp.ndarray, sharpen: float, block_rows: int = 64, interpret: bool = False
) -> jnp.ndarray:
    """(..., C, H, W) f32 pre-CAS image -> uint8, Mosaic-pipelined blocks."""
    lead = v.shape[:-2]
    v = v.reshape((-1,) + v.shape[-2:])
    C, H, W = v.shape
    bh = _fit_block(block_rows, H, 8)
    if bh < 8 or W % 128:
        from . import cas as cas_ops

        return cas_ops.quantize_u8(
            cas_ops.cas_sharpen(v.astype(jnp.float32), sharpen)
        ).reshape(lead + (H, W))
    nb = H // bh

    # clamped one-row halos per block, gathered in XLA and padded to 8
    # sublanes (TPU block-shape constraint): top[c, i, 0] = v[c,
    # max(i*bh - 1, 0)], bot[c, i, 0] = v[c, min((i+1)*bh, H-1)]
    idx = jnp.arange(nb)
    top = v[:, jnp.clip(idx * bh - 1, 0, H - 1), :][:, :, None, :]
    bot = v[:, jnp.clip((idx + 1) * bh, 0, H - 1), :][:, :, None, :]
    top = jnp.broadcast_to(top, (C, nb, 8, W))  # (C, nb, 8, W)
    bot = jnp.broadcast_to(bot, (C, nb, 8, W))

    kern = functools.partial(_cas_blk_kernel, sharpen=float(sharpen))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.uint8),
        grid=(C, nb),
        in_specs=[
            pl.BlockSpec((1, bh, W), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, 8, W), lambda c, i: (c, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 8, W), lambda c, i: (c, i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, W), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(v, top, bot).reshape(lead + (H, W))


# ---------------------------------------------------------------------------
# mono-kernel CAS: ONE invocation, in-kernel band loop
# ---------------------------------------------------------------------------
#
# Per-grid-step sequencing costs ~10 us on this toolchain (~0.65 ms at the
# flagship size).  This variant runs the whole image in a single kernel
# invocation: a fori_loop drives double-buffered HBM->VMEM input DMAs,
# the CAS band compute, and double-buffered VMEM->HBM uint8 output DMAs.


def _cas_mono_kernel(
    v_hbm, out_hbm, scin, scout, sem_in, sem_out,
    *, sharpen: float, bh: int, H: int, nb: int, total: int
):
    rows = bh + 2 * _PAD

    def window(g):
        c = g // nb
        i = g % nb
        ts = pl.multiple_of(jnp.clip(i * bh - _PAD, 0, H - rows), _PAD)
        return c, i, ts

    def in_dma(g, slot):
        c, _, ts = window(g)
        return pltpu.make_async_copy(
            v_hbm.at[c, pl.ds(ts, rows), :], scin.at[slot], sem_in.at[slot]
        )

    def out_dma(g, slot):
        c, i, _ = window(g)
        return pltpu.make_async_copy(
            scout.at[slot],
            out_hbm.at[c, pl.ds(i * bh, bh), :],
            sem_out.at[slot],
        )

    in_dma(0, 0).start()

    def body(g, carry):
        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < total)
        def _():
            in_dma(g + 1, jax.lax.rem(g + 1, 2)).start()

        in_dma(g, slot).wait()
        out = _cas_band(scin[slot], sharpen)

        # the slot's previous output DMA must land before overwriting
        @pl.when(g >= 2)
        def _():
            out_dma(g - 2, slot).wait()

        _, i, ts = window(g)
        offset = i * bh - ts
        for sl in (0, 1):
            for off in (0, _PAD, 2 * _PAD):
                @pl.when(jnp.logical_and(slot == sl, offset == off))
                def _(sl=sl, off=off):
                    scout[sl] = (
                        out[off : off + bh, :]
                        .astype(jnp.int32)
                        .astype(jnp.uint8)
                    )

        out_dma(g, slot).start()
        return carry

    jax.lax.fori_loop(0, total, body, 0)

    @pl.when(total >= 2)
    def _():
        out_dma(total - 2, jax.lax.rem(total - 2, 2)).wait()

    out_dma(total - 1, jax.lax.rem(total - 1, 2)).wait()


def cas_quantize_mono(
    v: jnp.ndarray, sharpen: float, block_rows: int = 128, interpret: bool = False
) -> jnp.ndarray:
    """(..., C, H, W) f32 pre-CAS -> uint8 in ONE kernel invocation."""
    lead = v.shape[:-2]
    v = v.reshape((-1,) + v.shape[-2:])
    C, H, W = v.shape
    bh = _fit_block(block_rows, H, 32)
    if bh < 32 or W % 128 or H < bh + 2 * _PAD:  # u8 out DMA needs 32-align
        return cas_quantize_pallas(v, sharpen, interpret=interpret).reshape(
            lead + (H, W)
        )
    nb = H // bh
    total = C * nb
    rows = bh + 2 * _PAD
    kern = functools.partial(
        _cas_mono_kernel, sharpen=float(sharpen), bh=bh, H=H, nb=nb, total=total
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, rows, W), jnp.float32),
            pltpu.VMEM((2, bh, W), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(v).reshape(lead + (H, W))
