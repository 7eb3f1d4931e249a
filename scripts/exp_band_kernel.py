"""Prototype: HBM-streamed banded V matvec inside a Pallas kernel.

The 10k fused-PCG attack re-expresses the landmark fill factor V as a
pose-banded slab (every landmark's observations live in a width-W window
of poses, window bases unique per landmark after a parking-style
assignment — measured: W=576 covers 100% of the 10k laps=1 workload).
One PCG matvec then streams the slab ONCE:

  per base-chunk c (B bases):   t[b, p] = sum_{w,a} slab[c,w,a*dl+b,p] *
                                          x[a, cB+p+w]
                                w[a, cB+p+w] += sum_b slab[...] * t[b, p]

This script measures the streamed matvec in isolation (fake slab data) to
pick B and validate the ~DMA-bound cost model before wiring it into
ops/fused_pcg.py.  Cross-checked against a numpy oracle.
"""

import functools
import json
import sys
import time

import _bootstrap  # noqa: F401,E402

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tputime import report

DP, DL = 3, 2


def band_matvec_kernel(x_ref, slab_hbm, out_ref,
                       xext, wacc, xw6, acc6, buf, sem,
                       *, n_chunks, W, B, reps):
    np_ = x_ref.shape[1]

    def dma(slot, c):
        return pltpu.make_async_copy(
            slab_hbm.at[c], buf.at[slot], sem.at[slot]
        )

    def one_matvec(_, carry_out):
        del carry_out
        xext[:, :np_] = x_ref[:]
        xext[:, np_:] = jnp.zeros((DP, W), jnp.float32)
        wacc[:] = jnp.zeros((DP, np_ + W), jnp.float32)
        dma(0, 0).start()

        def chunk_body(c, carry):
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                dma((c + 1) % 2, c + 1).start()

            dma(slot, c).wait()
            # x window rows replicated per (a, b): [6, B+W] in scratch so
            # the per-w reads are static REF slices (Mosaic has no
            # dynamic_slice on values)
            xw = xext[:, pl.ds(c * B, B + W)]
            xw6[:] = jnp.concatenate(
                [xw[a:a + 1] for a in range(DP) for _ in range(DL)],
                axis=0,
            )
            # t-pass: t[b] = sum_{w,a} slab * xw
            t = jnp.zeros((DL, B), jnp.float32)
            for w in range(W):
                prod = buf[slot, w] * xw6[:, w:w + B]
                t = t + prod[0:DL] + prod[DL:2 * DL] + prod[2 * DL:3 * DL]
            # w-pass: acc6[a*dl+b, w:w+B] += slab[w, a*dl+b] * t[b]
            trep = jnp.concatenate([t, t, t], axis=0)   # [6, B]
            acc6[:] = jnp.zeros((DP * DL, B + W), jnp.float32)
            for w in range(W):
                acc6[:, w:w + B] += buf[slot, w] * trep
            a6 = acc6[:]
            a3 = jnp.concatenate(
                [a6[2 * a:2 * a + 1] + a6[2 * a + 1:2 * a + 2]
                 for a in range(DP)], axis=0,
            )                                           # [3, B+W]
            wacc[:, pl.ds(c * B, B + W)] += a3
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        return 0

    jax.lax.fori_loop(0, reps, one_matvec, 0)  # noqa: arg-order (i, carry)
    out_ref[:] = wacc[:, :np_]


def make_fn(np_, W, B, reps):
    n_chunks = np_ // B
    kernel = functools.partial(
        band_matvec_kernel, n_chunks=n_chunks, W=W, B=B, reps=reps
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((DP, np_), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DP, np_ + W), jnp.float32),       # xext
            pltpu.VMEM((DP, np_ + W), jnp.float32),       # wacc
            pltpu.VMEM((DP * DL, B + W), jnp.float32),    # xw6
            pltpu.VMEM((DP * DL, B + W), jnp.float32),    # acc6
            pltpu.VMEM((2, W, DP * DL, B), jnp.float32),  # buf
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=jax.default_backend() != "tpu",
    )


def oracle(slab, x, np_, W, B):
    n_chunks = np_ // B
    xe = np.concatenate([x, np.zeros((DP, W), np.float32)], axis=1)
    wacc = np.zeros((DP, np_ + W), np.float32)
    for c in range(n_chunks):
        sb = slab[c]                                      # [W, 6, B]
        t = np.zeros((DL, B), np.float32)
        for w in range(W):
            for a in range(DP):
                for b in range(DL):
                    t[b] += sb[w, a * DL + b] * xe[a, c * B + w:
                                                   c * B + w + B]
        for w in range(W):
            for a in range(DP):
                for b in range(DL):
                    wacc[a, c * B + w: c * B + w + B] += (
                        sb[w, a * DL + b] * t[b]
                    )
    return wacc[:, :np_]


def main():
    np_ = 10240
    rng = np.random.default_rng(0)
    x = rng.normal(size=(DP, np_)).astype(np.float32)

    # correctness first, small shapes, interpret/TPU both
    Ws, Bs = (64,), (256,)
    slab_s = rng.normal(size=(np_ // 256, 64, 6, 256)).astype(np.float32)
    got = np.asarray(make_fn(np_, 64, 256, 1)(x, slab_s))
    want = oracle(slab_s, x, np_, 64, 256)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    print(f"correctness W=64 B=256: rel err {err:.2e}")
    assert err < 1e-5

    if jax.default_backend() != "tpu":
        print("CPU interpret mode: skipping timing")
        return

    reps = 8
    for W in (320, 576):
        for B in (512, 1024):
            if np_ % B:
                continue
            slab = rng.normal(
                size=(np_ // B, W, 6, B)
            ).astype(np.float32)
            mb = slab.nbytes / 2**20
            fn = make_fn(np_, W, B, reps)
            t = report(f"band matvec W={W} B={B} ({mb:.0f} MB)",
                       fn, x, slab, reps=3)
            per = t / reps
            bw = slab.nbytes / per / 1e9
            print(f"  -> {per*1e6:.0f} us/matvec, {bw:.0f} GB/s effective",
                  flush=True)


if __name__ == "__main__":
    main()
