"""Microbench: op-dispatch latency vs gather cost on the 10k-scale arrays."""

import sys, os

import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax
import jax.numpy as jnp
import numpy as np

from tputime import report, rtt


def main():
    print(f"rtt={rtt()*1e3:.2f} ms")
    n = 10240
    x = jnp.ones((n, 3), jnp.float32)
    idx9 = jnp.asarray(np.random.default_rng(0).integers(0, n, (n, 9)), jnp.int32)
    idx1 = jnp.asarray(np.random.default_rng(1).integers(0, n, (n,)), jnp.int32)
    big = jnp.ones((n, 9, 3), jnp.float32)

    report("1 multiply [10240,3]", jax.jit(lambda a: a * 1.5), x, reps=50)

    def chain10(a):
        for _ in range(10):
            a = a * 1.000001 + 0.0
        return a
    report("10 chained multiplies", jax.jit(chain10), x, reps=50)

    def chain40(a):
        for _ in range(40):
            a = a * 1.000001 + 0.0
        return a
    report("40 chained multiplies", jax.jit(chain40), x, reps=50)

    report("gather [10240,9] rows of [10240,3]",
           jax.jit(lambda a, i: a[i]), x, idx9, reps=50)
    report("gather [10240] rows", jax.jit(lambda a, i: a[i]), x, idx1, reps=50)
    report("gather+mul+sum (table_sum shape)",
           jax.jit(lambda a, i, b: jnp.sum(a[i] * b[..., 0], axis=1)),
           x, idx9, big, reps=50)

    # scalar reduction (PCG dot)
    report("vdot [10240,3]", jax.jit(lambda a: jnp.vdot(a, a)), x, reps=50)


if __name__ == "__main__":
    main()
