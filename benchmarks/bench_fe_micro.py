"""Microbenchmark the in-kernel field ops (fe_tile) on the real TPU.

Times a Pallas kernel that runs N chained ops of one kind on a resident
[NLIMBS, 8, 128] tile, at two different N; the slope (t_N2 - t_N1)/(N2 - N1)
isolates the per-op cost from launch/transfer overhead. This is the TPU
analogue of the reference's per-primitive cycle counts (speed_test,
test/curve25519_test.c:130-321) and feeds the PERF.md roofline section.

Usage: python benchmarks/bench_fe_micro.py [G]   (G = grid tiles, default 8)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curve25519_tpu.config import NLIMBS
from curve25519_tpu.ops.pallas import fe_tile as ft


def _chain_kernel(x_ref, y_ref, o_ref, *, op, n):
    pad = ft.t_pad()
    x = x_ref[0]
    y = y_ref[0]

    def body(_, x):
        if op == "mul":
            return ft.t_mul(x, y)
        if op == "sqr":
            return ft.t_sqr(x)
        if op == "add":
            return ft.t_add(x, y)
        if op == "sub":
            return ft.t_sub(x, y, pad)
        if op == "msa":
            return ft.t_mul_small_add(x, 121665, y)
        if op == "carry2":
            return ft._carry2(x + y)
        raise ValueError(op)

    o_ref[0] = jax.lax.fori_loop(0, n, body, x)


@functools.partial(jax.jit, static_argnames=("op", "n"))
def chain(x_t, y_t, op, n):
    g = x_t.shape[0]
    spec = pl.BlockSpec((1, NLIMBS, ft.TILE_S, ft.TILE_L),
                        lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_chain_kernel, op=op, n=n),
        grid=(g,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x_t.shape, jnp.int32),
    )(x_t, y_t)


def _time(fn, reps=7):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        # fetch ONE element: it still closes the dispatch chain (FIFO), but
        # a full [G, 20, 8, 128] fetch costs ~16 ms at the tunnel's
        # ~40 MB/s with enough variance to swamp the chain-length delta
        # (negative slopes observed)
        np.asarray(fn()[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, 9500, (g, NLIMBS, 8, 128), np.int32))
    y = jnp.asarray(rng.integers(0, 9500, (g, NLIMBS, 8, 128), np.int32))

    lanes = g * ft.TILE_BATCH
    out = {"backend": jax.default_backend(), "tiles": g, "lanes": lanes}
    # per-op deltas sized so the timed difference is ~10-50 ms, far above
    # the ~3 ms tunnel dispatch floor and its fluctuation
    plan = {"mul": (512, 4608), "sqr": (512, 4608), "add": (2048, 18432),
            "sub": (2048, 18432), "msa": (2048, 18432),
            "carry2": (2048, 18432)}
    for op, (n1, n2) in plan.items():
        t1 = _time(lambda: chain(x, y, op, n1))
        t2 = _time(lambda: chain(x, y, op, n2))
        per_op = (t2 - t1) / (n2 - n1)
        out[op + "_ns_per_op_per_tile"] = round(per_op / g * 1e9, 2)
        out[op + "_ps_per_op_per_lane"] = round(per_op / lanes * 1e12, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
