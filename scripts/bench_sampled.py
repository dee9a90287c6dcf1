"""Quick A/B of the bulk odometry batch: scatter-assembly vs gather
sampling, on the current backend.  Usage: python scripts/bench_sampled.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from veloslam_tpu.utils import compilecache
    compilecache.enable()

    t0 = time.perf_counter()
    import jax
    jax.device_get(jax.numpy.zeros(8))
    print(f"# backend up after {time.perf_counter()-t0:.1f}s "
          f"({jax.default_backend()})", flush=True)

    import jax.numpy as jnp

    import bench
    from veloslam_tpu.runtime import odometry as odo

    inputs = bench._build_inputs()
    (pkts, calib, rel_s, track_rel, track_q, track_t, track_v) = inputs
    zero = jnp.asarray(0.0, jnp.float32)

    for sample in (True, False):
        state = odo.init_state(32, map_capacity=bench.MAP_CAPACITY,
                               sample_assembly=sample)
        step = functools.partial(
            odo.odometry_step_batched, model="hdl32", n_beams=32,
            reg_points=bench.REG_POINTS,
            reg_iterations=bench.REG_ITERATIONS,
            max_frames_batch=bench.MAX_FRAMES_BATCH,
            use_dense=True, reassociate_every=8, sample_assembly=sample)

        def once():
            return step(state, pkts, calib, rel_s, zero, zero,
                        track_rel, track_q, track_t, track_v)
        out = once()
        jax.device_get(out[0].n_frames)
        t0 = time.perf_counter()
        for _ in range(4):
            out = once()
        jax.device_get(out[0].n_frames)
        dt = (time.perf_counter() - t0) / 4
        fps = bench.FRAMES_PER_BATCH / dt
        print(f"sample_assembly={sample}: {dt*1e3:.1f} ms/batch = "
              f"{fps:.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
