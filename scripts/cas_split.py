"""Split the CAS kernel cost: same DMA/store structure with trivial math."""
import functools, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, ".")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vkresample_tpu.core.config import Engine, Precision
from vkresample_tpu.core.plan import UpscalePlan
from vkresample_tpu.fft import dense, mxu_pipeline
from vkresample_tpu.ops import cas_pallas
from vkresample_tpu.pipeline.bench_util import time_device

HIGH = jax.lax.Precision.HIGH
_PAD = cas_pallas._PAD


def _copy_kernel(v_hbm, out_ref, scratch, sem, *, bh, H, nb):
    g = pl.program_id(0)

    def window(gg):
        cc = gg // nb
        ii = gg % nb
        start = pl.multiple_of(jnp.clip(ii * bh - _PAD, 0, H - (bh + 2 * _PAD)), _PAD)
        return cc, start

    def dma(gg, slot):
        cc, start = window(gg)
        return pltpu.make_async_copy(
            v_hbm.at[cc, pl.ds(start, bh + 2 * _PAD), :], scratch.at[slot], sem.at[slot]
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        dma(g + 1, jax.lax.rem(g + 1, 2)).start()

    dma(g, slot).wait()
    out = jnp.clip(scratch[slot] * 255.0, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
    _, start = window(g)
    offset = (g % nb) * bh - start

    def _store(o):
        @pl.when(offset == o)
        def _():
            out_ref[0] = out[o : o + bh, :]

    _store(0)
    _store(_PAD)
    _store(2 * _PAD)


def copy_quantize(v, bh=128):
    C, H, W = v.shape
    nb = H // bh
    kern = functools.partial(_copy_kernel, bh=bh, H=H, nb=nb)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.uint8),
        grid=(C * nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, bh, W), lambda g, nb=nb: (g // nb, g % nb, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, bh + 2 * _PAD, W), jnp.float32), pltpu.SemaphoreType.DMA((2,))],
    )(v)


h, w = 1024, 2048
plan = UpscalePlan(h=h, w=w, upscale=2.0, precision=Precision.HALF, engine=Engine.MXU)
banks = jax.device_put(mxu_pipeline.make_dense_banks(plan))
img = np.random.default_rng(0).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
x = jax.device_put(img)


def upto_weave(xx, bb):
    U, O = dense.r2c_rows(jnp.moveaxis(xx, -1, 0), bb, HIGH)
    return dense.weave_rows(U, O, 2)


def v_copy(xx, bb):
    return copy_quantize(upto_weave(xx, bb))


def v_cas(xx, bb):
    return cas_pallas.cas_quantize_pallas(upto_weave(xx, bb), 0.2)


for name, fn in [("copy-kernel (structure only)", v_copy), ("full CAS kernel", v_cas),
                 ("copy again", v_copy), ("CAS again", v_cas)]:
    ms = time_device(fn, x, aux=banks, k1=4, k2=24)
    print(f"{name:30s} {ms:8.3f} ms", flush=True)
