"""Does Mosaic support vectorized computed-index gathers from a
VMEM-resident table, and at what rate?  This decides whether the hot
association/decode paths can be Pallas kernels.

Ramps table and index sizes; prints each result immediately.
Usage: python scripts/bench_pallas_gather.py
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from veloslam_tpu.utils import compilecache
    compilecache.enable()

    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.device_get(jnp.zeros(8))
    print(f"# backend up after {time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)

    def timed(name, fn, *a, reps=8):
        try:
            out = fn(*a)
            jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])
        except Exception as e:
            print(f"{name:52s} FAILED: {str(e)[:160]}", flush=True)
            return None
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:52s} {dt*1e3:9.3f} ms", flush=True)
        return dt

    def make_gather(table_n, n_idx, tile):
        def kernel(table_ref, idx_ref, out_ref):
            out_ref[:] = table_ref[idx_ref[:]]

        @jax.jit
        def run(table, idx):
            return pl.pallas_call(
                kernel,
                grid=(n_idx // tile,),
                in_specs=[
                    pl.BlockSpec((table_n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_idx,), jnp.int32),
            )(table, idx)
        return run

    # ramp: small first
    for table_n, n_idx, tile in ((65536, 8192, 8192),
                                 (1 << 21, 131072, 8192),
                                 (256 * 256 * 32, 1572864, 16384)):
        table = jnp.asarray(
            rng.integers(-1, 32768, table_n).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, table_n, n_idx).astype(np.int32))
        dt = timed(f"pallas vmem gather tbl={table_n} n={n_idx}",
                   make_gather(table_n, n_idx, tile), table, idx)
        if dt is None:
            break

    # 2D row gather variant: rows of 8 lanes from a (V, 8) table
    def make_rowgather(V, n_idx, tile):
        def kernel(table_ref, idx_ref, out_ref):
            out_ref[:] = table_ref[idx_ref[:], :]

        @jax.jit
        def run(table, idx):
            return pl.pallas_call(
                kernel,
                grid=(n_idx // tile,),
                in_specs=[
                    pl.BlockSpec((V, 8), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_idx, 8), jnp.float32),
            )(table, idx)
        return run

    V = 32768
    rows = jnp.asarray(rng.standard_normal((V, 8)).astype(np.float32))
    idxr = jnp.asarray(rng.integers(0, V, 1572864).astype(np.int32))
    timed("pallas vmem ROW gather (32K,8) n=1.57M",
          make_rowgather(V, 1572864, 16384), rows, idxr)


if __name__ == "__main__":
    main()
