"""Empirical comparison of FFT execution strategies on the device.

Axes: factorization (mixed-radix 128 vs full-DFT single matmul) and
matmul precision (HIGHEST vs HIGH vs DEFAULT).  Times the flagship
forward+inverse transform load; checks accuracy vs numpy.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import vkresample_tpu.fft.mixed_radix as mr
from vkresample_tpu.fft.mixed_radix import fft


def timed(name, fn, x, k1=3, k2=9):
    def run(xx, k):
        def body(i, carry):
            xi = (xx[0].at[0, 0, 0].set(carry), xx[1])
            out = fn(xi)
            return out[0][0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    runj = jax.jit(run)
    float(runj(x, k1))
    t0 = time.perf_counter(); float(runj(x, k1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(runj(x, k2)); t2 = time.perf_counter() - t0
    ms = max(t2 - t1, 1e-9) * 1000.0 / (k2 - k1)
    print(f"{name:44s} {ms:8.3f} ms", flush=True)


def accuracy(fn, x_np):
    x = (jnp.asarray(x_np.real, jnp.float32), jnp.asarray(x_np.imag, jnp.float32))
    got = np.asarray(fn(x)[0]) + 1j * np.asarray(fn(x)[1])
    want = np.fft.fft(x_np, axis=-1)
    return np.max(np.abs(got - want)) / np.max(np.abs(want))


def main():
    rng = np.random.default_rng(0)
    # flagship-like load: x-axis transforms, batch 3*1024 rows of 1024
    xb = rng.normal(size=(3, 1024, 1024)).astype(np.float32)
    x = (jnp.asarray(xb), jnp.zeros_like(jnp.asarray(xb)))
    # y-axis load
    yb = rng.normal(size=(3, 1024, 1024)).astype(np.float32)
    y = (jnp.asarray(yb), jnp.zeros_like(jnp.asarray(yb)))

    small = (rng.normal(size=(2, 4, 1024)) + 1j * rng.normal(size=(2, 4, 1024)))

    for prec_name, prec in [
        ("HIGHEST", jax.lax.Precision.HIGHEST),
        ("HIGH", jax.lax.Precision.HIGH),
        ("DEFAULT", jax.lax.Precision.DEFAULT),
    ]:
        mr._HIGH = prec
        mr._dft_mats.cache_clear()
        mr._twiddle.cache_clear()
        for strat_name, mf in [("mixed-radix<=128", 128), ("full-DFT", 4096)]:
            err = accuracy(lambda z: fft(z, max_factor=mf), small)
            timed(
                f"x-axis n=1024 b=3072  {strat_name:18s} {prec_name:8s} relerr={err:.1e}",
                lambda z, mf=mf: fft(z, axis=-1, max_factor=mf),
                x,
            )
            timed(
                f"y-axis n=1024 b=3072  {strat_name:18s} {prec_name:8s}",
                lambda z, mf=mf: fft(z, axis=-2, max_factor=mf),
                y,
            )


if __name__ == "__main__":
    main()
