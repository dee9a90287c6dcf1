"""Benchmark: HDL-32 full-SLAM throughput (frames/s per chip).

Measures the production bulk-replay fast path
(runtime.odometry.odometry_step_batched) as ONE jitted device program per
16384-packet batch (≈ 90.6 HDL-32 revolutions): packet decode → INS
motion compensation → frame assembly → vmapped scan-to-map point-to-plane
GICP (96 frame slots × 32768 points × 16 Gauss-Newton iterations against
the rolling 32768-voxel local map) → batched map merge with decay.
frames/s = frames_per_batch / t_step.  Accuracy at this batch size is
validated on simulated drives vs ground truth: ATE 0.019 m over an
18.5 s drive at 16384/96 (sequential 512-pkt path: 0.42 m on a 9 s
drive) — INS priors absorb within-batch motion and the 64-sample INS
window is evenly subsampled across the batch.
For live low-latency use the streaming path feeds 512-packet batches;
this config is the offline/bulk-processing rate.

vs_baseline compares against a single-CPU-core run of the same program
(BASELINE.md target: >10x single-CPU-core frames/s per chip), measured
once with `taskset -c 0 python bench.py --cpu-reference` (single-threaded
XLA) on this machine and recorded in REFERENCE_CPU_FPS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

# Single-CPU-core frames/s of the same fused SLAM step, measured with:
#   taskset -c 0 env XLA_FLAGS="--xla_cpu_multi_thread_eigen=false \
#     intra_op_parallelism_threads=1" JAX_PLATFORMS=cpu \
#     python bench.py --cpu-reference
# on this container's host CPU (see BASELINE.md).  Measured for the
# 16384-packet / 96-slot config (51.3 s/batch single-core).
REFERENCE_CPU_FPS = 1.766

BATCH_PACKETS = 16384    # ≈ 90.6 HDL-32 revolutions per dispatched program
MAX_FRAMES_BATCH = 96
HDL32_PACKETS_PER_SECOND = 1e6 / 46.08 / 12      # ≈ 1808.4
FRAMES_PER_BATCH = BATCH_PACKETS / HDL32_PACKETS_PER_SECOND * 10.0
REG_POINTS = 32768
REG_ITERATIONS = 16
MAP_CAPACITY = 32768


def _build_inputs(seed=0, batch_packets=BATCH_PACKETS):
    """Construct all bench inputs WITHOUT any device→host readback.

    On the tunneled axon backend the first readback permanently degrades
    dispatch latency ~500x, so everything here is host-numpy construction
    and host→device uploads only.  (Also: never close device arrays into a
    jit — pass them as arguments.)
    """
    import jax.numpy as jnp

    from veloslam_tpu.decode import calibration
    from veloslam_tpu.decode.decode import DeviceCalib
    from veloslam_tpu.io import simulate as sim

    seq = sim.generate_sequence(duration_s=0.35, model="hdl32", seed=seed,
                                world=sim.World.demo(1))
    pkts = np.concatenate([seq["packets"]] *
                          (batch_packets // len(seq["packets"]) + 1)
                          )[:batch_packets]
    rel_s = (np.arange(batch_packets) / HDL32_PACKETS_PER_SECOND
             ).astype(np.float32)

    m = 64
    track_rel = np.linspace(-0.1, rel_s[-1] + 0.1, m).astype(np.float32)
    track_q = np.zeros((m, 4), np.float32)
    track_q[:, 0] = 1.0
    track_t = np.stack([5.0 * track_rel, np.zeros(m), np.full(m, 2.0)],
                       -1).astype(np.float32)
    track_v = np.tile(np.array([5.0, 0, 0], np.float32), (m, 1))

    calib = DeviceCalib.from_host(calibration.hdl32())
    return (jnp.asarray(pkts), calib, jnp.asarray(rel_s),
            jnp.asarray(track_rel), jnp.asarray(track_q),
            jnp.asarray(track_t), jnp.asarray(track_v))


def _block(out):
    import jax
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def run_bench(iters=8, warmup=2, batch_packets=BATCH_PACKETS,
              max_frames_batch=MAX_FRAMES_BATCH):
    import jax.numpy as jnp

    from veloslam_tpu.runtime import odometry as odo

    frames_per_batch = batch_packets / HDL32_PACKETS_PER_SECOND * 10.0
    (pkts, calib, rel_s, track_rel, track_q, track_t,
     track_v) = _build_inputs(batch_packets=batch_packets)
    state = odo.init_state(32, map_capacity=MAP_CAPACITY)
    zero = jnp.asarray(0.0, jnp.float32)
    step = functools.partial(
        odo.odometry_step_batched, model="hdl32", n_beams=32,
        reg_points=REG_POINTS, reg_iterations=REG_ITERATIONS,
        max_frames_batch=max_frames_batch)

    def once():
        # Fixed pre-built state: steady-state per-batch cost, no
        # state-dependent recompiles, no host round-trips.
        return step(state, pkts, calib, rel_s, zero, zero,
                    track_rel, track_q, track_t, track_v)

    for _ in range(warmup):
        out = once()
    _block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = once()
    _block(out)
    t_step = (time.perf_counter() - t0) / iters
    return frames_per_batch / t_step, t_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-reference", action="store_true",
                    help="measure the single-core CPU reference number")
    args = ap.parse_args()
    if args.cpu_reference:
        import jax
        jax.config.update("jax_platforms", "cpu")
        fps, t_step = run_bench(iters=3, warmup=1)
        print(f"# cpu reference: {fps:.3f} frames/s "
              f"({t_step*1e3:.1f} ms/batch)")
        return 0
    fps, t_step = run_bench()
    result = {
        "metric": "hdl32_full_slam_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_CPU_FPS, 3),
    }
    print(json.dumps(result))
    print(f"# fused SLAM step ({BATCH_PACKETS} pkts = "
          f"{FRAMES_PER_BATCH:.1f} frames, {MAX_FRAMES_BATCH} reg slots x "
          f"{REG_POINTS} pts x {REG_ITERATIONS} GN iters): "
          f"{t_step*1e3:.2f} ms/batch", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
