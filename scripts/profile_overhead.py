"""Measure per-XLA-op sequencing overhead on this TPU (axon relay).

Chains N trivial dependent ops on a tiny [8,128] array inside ONE jit
(both unrolled and as fori_loop), plus the same on a large array, to
separate per-op overhead from bandwidth.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

REPS = 5


def timeit(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / REPS


def chain(n, shape):
    @jax.jit
    def f(x):
        for i in range(n):
            x = x * 1.000001 + 1e-9  # one fused op? force two: separate
            x = jnp.sin(x) * 1e-3 + x  # prevent fusion collapse w/ transcendental
        return x
    return f


def loop(n, shape):
    @jax.jit
    def f(x):
        def body(_, x):
            return jnp.sin(x) * 1e-3 + x
        return jax.lax.fori_loop(0, n, body, x)
    return f


def main():
    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    for shape in [(8, 128), (1024, 1024)]:
        x = jnp.ones(shape, jnp.float32)
        for n in [100, 400]:
            t_u = timeit(chain(n, shape), x)
            t_l = timeit(loop(n, shape), x)
            print(json.dumps({
                "shape": list(shape), "n": n,
                "unrolled_us_per_step": round(1e6 * t_u / n, 2),
                "fori_us_per_step": round(1e6 * t_l / n, 2),
            }), flush=True)
    # matmul throughput sanity: big matmul per-op cost
    a = jnp.ones((384, 6144), jnp.float32)

    @jax.jit
    def mm(a):
        def body(_, s):
            s = jnp.dot(a * (1.0 + s[0, 0] * 1e-12), a.T,
                        preferred_element_type=jnp.float32)
            return s[:384, :384] * 1e-6
        return jax.lax.fori_loop(0, 50, body, jnp.zeros((384, 384), jnp.float32))
    t = timeit(mm, a)
    print(json.dumps({"matmul_384x6144x384_us": round(1e6 * t / 50, 1)}), flush=True)

    # small cholesky in chained loop (honest, not hoistable)
    S0 = jnp.eye(384, dtype=jnp.float32) * 4.0

    @jax.jit
    def ch(S0):
        def body(_, v):
            L, low = jax.scipy.linalg.cho_factor(
                S0 + v[0] * 1e-12 * jnp.eye(384, jnp.float32.dtype and jnp.float32), lower=True)
            return jax.scipy.linalg.cho_solve((L, low), v)
        return jax.lax.fori_loop(0, 20, body, jnp.ones((384,), jnp.float32))
    t = timeit(ch, S0)
    print(json.dumps({"chol384_chained_us": round(1e6 * t / 20, 1)}), flush=True)


if __name__ == "__main__":
    main()
