"""Per-device tuning table.

The reference keys a small tuning table off the GPU vendor ID — coalesced
memory width, warp size, 4-step swap (VkResample.cpp:1371-1408).  The TPU
analog keys off the device generation: VMEM-driven kernel band sizes and
the dense-DFT size cap.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache


@dataclasses.dataclass(frozen=True)
class DeviceTuning:
    cas_block_rows: int = 64  # plain CAS kernel band height
    rows_block: int = 16  # fused rows kernel band height (pre-weave)
    dense_max: int = 8192  # largest axis the dense engine builds a matrix for
    ycas_wb: int = 256  # fused y+CAS strip width (i16; 512 OOMs 16M VMEM)
    ycas_bo: int = 128  # fused y+CAS kernel row-band height
    parity_block: int = 64  # per-parity CAS band height (1.62 ms on v5e)
    quad_block: int = 64  # quad-parity halo-kernel band height (i16; f32
    # halves it — VMEM is per-byte) (1.57 ms on v5e)
    quad_wmax: int = 4096  # widest full-width quad tile; wider -> col strips
    # --- geometry-class table, each entry sourced from a recorded
    # same-process on-chip sweep (the analog of the reference's vendor
    # tuning rows, VkResample.cpp:1371-1408):
    quad_wsb: int = 1024  # quad column-strip width (with bt=128: 10.7 ms
    # at 8K->16K planes vs 11.6 for bt64/wsb2048, 16.4 for the round-2
    # bt32/wsb2048 — scripts/big_cas_ab.py; wider strips at bt>=128 blow
    # VMEM, narrower raise the column-halo share)
    quad_strip_block: int = 128  # strip-regime band height (pairs with
    # quad_wsb; same sweep as above — halo amplification 1.56x vs 2.25x
    # at the round-2 bt32)
    quad_fw_slots_block: int = 32  # full-width slot-resident band height
    # (i16; f32 halves it): freed from the halo tax, shorter bands win on
    # DMA/compute overlap — flagship CAS 0.29 (bt=32) vs 0.51 (bt=64),
    # pipeline 1.262 vs 1.459 (scripts/slots_flagship_ab*.py, 3
    # interleaved passes; bt=128 blows VMEM)
    grid_block: int = 32  # u>=3 grid-CAS band height request (i16, u=3
    # class): 7.88 ms vs 9.07 for the old (quad_block*4)/u^2 heuristic
    # (=16) at big u=3, min-over-pass2+, 3 interleaved passes, all
    # geometries bit-identical (scripts/grid_cas_sweep.py); larger plane
    # counts (exotic fractions) are shrunk to budget by _grid_geometry


_TABLE = {
    # device_kind substring -> tuning
    "v5 lite": DeviceTuning(cas_block_rows=128, rows_block=16, dense_max=8192),
    "v5p": DeviceTuning(cas_block_rows=128, rows_block=32, dense_max=8192),
    "v4": DeviceTuning(cas_block_rows=128, rows_block=32, dense_max=8192),
    "v6": DeviceTuning(cas_block_rows=128, rows_block=32, dense_max=8192),
}


@lru_cache(maxsize=1)
def current() -> DeviceTuning:
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return DeviceTuning()
    for key, t in _TABLE.items():
        if key in kind:
            return t
    return DeviceTuning()
