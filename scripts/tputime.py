"""Honest device timing through the remote-TPU ('axon') tunnel.

``jax.block_until_ready`` does NOT block on this platform (measured: returns
in 0.2 ms while the enqueued program runs for seconds) — every timing that
relied on it (including round-1 artifacts) measured *enqueue* cost, not
device time.  The only reliable fence is fetching bytes to the host:
device execution is in-order per stream, so fetching any output of the
LAST enqueued program bounds the wall time of the whole batch.

Usage:  t = timeit(fn, *args, reps=R) -> seconds per call.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out) -> float:
    """Force completion by pulling one scalar of the output tree to host."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).ravel()[0])


def rtt(reps: int = 5) -> float:
    """One enqueue+fetch round trip of a trivial program (the fixed cost
    subtracted from batched measurements)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((1,), jnp.float32)
    _fetch(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, *args, reps: int = 10, rounds: int = 3,
           warmup: int = 1) -> float:
    """Best-of-rounds mean device seconds per call.

    Enqueues ``reps`` calls back-to-back and fetches one scalar from the
    last output; subtracts the measured single-call RTT so the figure is
    per-call device time (plus per-call enqueue, which for device-resident
    args is tens of microseconds).
    """
    for _ in range(max(warmup, 1)):
        _fetch(fn(*args))
    base = rtt()
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        _fetch(out)
        best = min(best, (time.perf_counter() - t0 - base) / reps)
    return max(best, 0.0)


def report(name: str, fn, *args, reps: int = 10, rounds: int = 3) -> float:
    t = timeit(fn, *args, reps=reps, rounds=rounds)
    print(f"{name:52s} {t*1e3:10.3f} ms")
    return t
