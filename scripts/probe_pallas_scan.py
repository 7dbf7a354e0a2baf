"""Minimal repro matrix for the Pallas-inside-scan remote-compiler bug.

CLAUDE.md / pallas_kernels.py cite this probe: on this TPU toolchain any
GRIDDED ``pallas_call`` inside ``lax.scan`` crashes the remote compile
helper (HTTP 500) — including a trivial doubling kernel with
``grid=(1,)`` — while whole-block (no grid) calls inside scan, and
gridded calls inside ``lax.while_loop``, compile and run. Each case runs
in its own subprocess (a compile crash must not take down the matrix);
run ``python scripts/probe_pallas_scan.py`` on TPU and commit the output
as results/r5/probe_pallas_scan.log.
"""
from __future__ import annotations

import subprocess
import sys

CASES = ["grid_in_scan", "grid1_in_scan", "whole_block_in_scan",
         "grid_in_while"]


def run_case(case: str) -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def double_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    N = 512
    x = jnp.arange(2 * N, dtype=jnp.float32).reshape(2, N)

    def call(x, grid):
        if grid is None:  # whole-block: no grid at all
            return pl.pallas_call(
                double_kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            )(x)
        return pl.pallas_call(
            double_kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((2, N // grid), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2, N // grid), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    if case == "grid_in_while":
        @jax.jit
        def f(x):
            def cond(c):
                return c[1] < 3

            def body(c):
                return call(c[0], 4), c[1] + 1

            return jax.lax.while_loop(cond, body, (x, 0))[0]
    else:
        grid = {"grid_in_scan": 4, "grid1_in_scan": 1,
                "whole_block_in_scan": None}[case]

        @jax.jit
        def f(x):
            def step(carry, _):
                return call(carry, grid), None

            return jax.lax.scan(step, x, None, length=3)[0]

    out = f(x)
    print(case, "OK", float(out.sum()))


def main():
    if len(sys.argv) > 1:
        run_case(sys.argv[1])
        return
    for case in CASES:
        r = subprocess.run([sys.executable, __file__, case],
                           capture_output=True, text=True, timeout=600)
        if r.returncode == 0:
            print(r.stdout.strip().splitlines()[-1], flush=True)
        else:
            tail = [ln for ln in r.stderr.strip().splitlines()
                    if "Error" in ln or "error" in ln][-1:]
            print(case, "FAILED:", tail[0][:160] if tail else
                  f"exit {r.returncode}", flush=True)


if __name__ == "__main__":
    main()
