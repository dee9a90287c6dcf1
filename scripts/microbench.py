"""Ground-truth cost model of the primitives the SLAM engine leans on,
measured on the real chip.

Axon-tunnel discipline (learned the hard way):
  * backend claim at interpreter startup can wait minutes — print
    progress early and often, never kill a running client (server-side
    work continues and wedges the next claim);
  * every timed region closes with a scalar device->host transfer
    (block_until_ready does not gate on remote execution);
  * sizes ramp up gradually so a pathological lowering is caught at a
    small size instead of wedging the tunnel for 10 minutes.

Usage: python scripts/microbench.py [--reps N] [--only SUBSTR]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()

    from veloslam_tpu.utils import compilecache
    compilecache.enable()

    t_boot = time.perf_counter()
    import jax
    import jax.numpy as jnp
    x = jnp.zeros(8)
    jax.device_get(x)
    print(f"# backend up after {time.perf_counter()-t_boot:.1f}s "
          f"({jax.default_backend()})", flush=True)

    rng = np.random.default_rng(0)

    def timed(name, make_fn, inputs, bytes_moved=None, reps=args.reps):
        """make_fn() -> jitted fn(*inputs) returning a small array.
        Times reps dispatches between two syncs (dependency-chained where
        the fn supports a `salt` first arg)."""
        if args.only and args.only not in name:
            return None
        fn = make_fn
        t0 = time.perf_counter()
        out = fn(jnp.int32(0), *inputs)
        jax.device_get(jax.tree.leaves(out)[0])
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        salt = out if isinstance(out, jax.Array) and out.dtype == jnp.int32 \
            else jnp.int32(1)
        for r in range(reps):
            out = fn(salt, *inputs)
        jax.device_get(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / reps
        gbs = f"  {bytes_moved / dt / 1e9:8.1f} GB/s" if bytes_moved else ""
        print(f"{name:46s} {dt*1e3:9.3f} ms{gbs}   (first {t_first:.1f}s)",
              flush=True)
        return dt

    P_FULL = 96 * 16384
    V = 32768

    # ramp: gather from a big int32 table
    N_big = 256 * 256 * 64
    table_big = jnp.asarray(rng.integers(-1, V, N_big).astype(np.int32))
    gather = jax.jit(lambda s, t, i: jnp.sum(t[i + s]).astype(jnp.int32))
    for P in (16384, 131072, P_FULL):
        idx = jnp.asarray(rng.integers(0, N_big - 8, P).astype(np.int32))
        timed(f"gather P={P} from 16MB i32 table", gather,
              (table_big, idx), bytes_moved=P * 4)

    # smaller table (VMEM-sized)
    N_med = 192 * 192 * 32
    table_med = jnp.asarray(rng.integers(-1, V, N_med).astype(np.int32))
    idx_med = jnp.asarray(
        rng.integers(0, N_med - 8, P_FULL).astype(np.int32))
    timed("gather P=1.57M from 4.7MB i32 table", gather,
          (table_med, idx_med), bytes_moved=P_FULL * 4)

    # row gather (V, 3) f32
    rows3 = jnp.asarray(rng.standard_normal((V, 3)).astype(np.float32))
    idx_v = jnp.asarray(rng.integers(0, V - 8, P_FULL).astype(np.int32))
    growsum = jax.jit(
        lambda s, t, i: jnp.sum(t[i + s], dtype=jnp.float32).astype(
            jnp.int32))
    timed("gather P=1.57M rows from (32K,3) f32", growsum,
          (rows3, idx_v), bytes_moved=P_FULL * 12)

    # gather with SORTED indices (locality)
    idx_sorted = jnp.sort(idx_med)
    timed("gather P=1.57M 4.7MB table SORTED idx", gather,
          (table_med, idx_sorted), bytes_moved=P_FULL * 4)

    # scatter-add ramp
    vals = jnp.asarray(rng.standard_normal(P_FULL).astype(np.float32))
    scat = jax.jit(lambda s, i, v: jnp.sum(
        jnp.zeros(V, jnp.float32).at[i + s].add(v)).astype(jnp.int32))
    for P in (131072, P_FULL):
        idxs = jnp.asarray(rng.integers(0, V - 8, P).astype(np.int32))
        timed(f"scatter-add P={P} into 32K bins", scat,
              (idxs, vals[:P]), bytes_moved=P * 4)

    scat_big = jax.jit(lambda s, i, v: jnp.sum(
        jnp.zeros(N_med, jnp.float32).at[i + s].add(v)).astype(jnp.int32))
    timed("scatter-add P=1.57M into 1.2M bins", scat_big,
          (idx_med, vals), bytes_moved=P_FULL * 4)

    vals4 = jnp.asarray(
        rng.standard_normal((P_FULL, 4)).astype(np.float32))
    scat_ch = jax.jit(lambda s, i, v: jnp.sum(
        jnp.zeros((N_med, 4), jnp.float32).at[i + s].add(v)
    ).astype(jnp.int32))
    timed("scatter-add P=1.57M x4ch into 1.2M cells", scat_ch,
          (idx_med, vals4), bytes_moved=P_FULL * 16)

    seg = jax.jit(lambda s, i, v: jnp.sum(jax.ops.segment_sum(
        v, i + s, num_segments=V)).astype(jnp.int32))
    timed("segment_sum P=1.57M -> 32K", seg,
          (idx_v, vals), bytes_moved=P_FULL * 4)

    # sorts / scans
    keys_full = jnp.asarray(
        rng.integers(0, 2**30, P_FULL).astype(np.int32))
    argsort = jax.jit(
        lambda s, k: jnp.argsort(k + s)[:8].astype(jnp.int32).sum())
    for P in (131072, P_FULL):
        timed(f"argsort P={P} i32", argsort, (keys_full[:P],),
              bytes_moved=P * 8)
    timed("argsort 49K i32 (merge_stats)", argsort,
          (keys_full[:49152],), bytes_moved=49152 * 8)
    cumsum = jax.jit(lambda s, k: jnp.cumsum(k + s)[-1].astype(jnp.int32))
    timed("cumsum P=1.57M i32", cumsum, (keys_full,),
          bytes_moved=P_FULL * 8)
    timed("cumsum 65536 i32", cumsum, (keys_full[:65536],),
          bytes_moved=65536 * 8)

    srt = jnp.sort(jnp.asarray(rng.integers(0, 2**30, V).astype(np.int32)))
    ss = jax.jit(lambda s, a, q: jnp.searchsorted(
        a, q + s).astype(jnp.int32)[:8].sum())
    timed("searchsorted P=1.57M in 32K", ss, (srt, keys_full),
          bytes_moved=P_FULL * 4)

    # MXU sanity + production einsum
    a = jnp.asarray(
        rng.standard_normal((4096, 4096)).astype(np.float32)
    ).astype(jnp.bfloat16)
    mm = jax.jit(lambda s, m: jnp.dot(
        m, m, preferred_element_type=jnp.float32)[:2, :2].sum()
        .astype(jnp.int32) + s)
    timed("matmul 4Kx4Kx4K bf16 (137 GFLOP)", mm, (a,),
          bytes_moved=3 * 4096 * 4096 * 2)

    J = jnp.asarray(
        rng.standard_normal((96, 16384, 6)).astype(np.float32))
    ein = jax.jit(lambda s, j: jnp.einsum(
        "fpi,fpj->fij", j, j)[:, 0, 0].sum().astype(jnp.int32) + s)
    timed("einsum (96,16K,6)^2->(96,6,6)", ein, (J,),
          bytes_moved=96 * 16384 * 6 * 4)

    big = jnp.asarray(
        rng.standard_normal(P_FULL * 8).astype(np.float32))
    ew = jax.jit(lambda s, x: (x * 1.0001 + 2.0)[:8].sum()
                 .astype(jnp.int32) + s)
    timed("elementwise mul+add 12.6M f32", ew, (big,),
          bytes_moved=P_FULL * 8 * 8)

    print("# done", flush=True)


if __name__ == "__main__":
    main()
