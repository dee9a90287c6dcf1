"""Benchmark: HDL-32 SLAM pipeline throughput (frames/s per chip).

Measures the steady-state device compute of the per-frame hot path:
  A) packet decode + INS motion compensation + frame assembly (one jitted
     program over a 512-packet batch ≈ 2.83 HDL-32 revolutions), and
  B) scan-to-map point-to-plane registration (32768 points vs a
     16384-voxel plane grid, 16 Gauss-Newton iterations),
then reports frames/s = 1 / (t_A/frames_per_batch + t_B).

vs_baseline compares against a single-CPU-core reference of the same
pipeline (BASELINE.md target: >10x single-CPU-core frames/s per chip),
measured once with `python bench.py --cpu-reference` pinned to one core
(taskset -c 0, single-threaded XLA) on this machine and recorded in
REFERENCE_CPU_FPS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import numpy as np

# Single-CPU-core frames/s of the same two-stage pipeline, measured with:
#   taskset -c 0 env XLA_FLAGS="--xla_cpu_multi_thread_eigen=false \
#     intra_op_parallelism_threads=1" JAX_PLATFORMS=cpu \
#     python bench.py --cpu-reference
# on this container's host CPU (see BASELINE.md).
REFERENCE_CPU_FPS = 4.046    # re-measured at BATCH_PACKETS=2048

BATCH_PACKETS = 2048     # ≈ 11.3 HDL-32 revolutions per dispatched program
MAX_FRAMES_BATCH = 16
HDL32_PACKETS_PER_SECOND = 1e6 / 46.08 / 12      # ≈ 1808.4
FRAMES_PER_BATCH = BATCH_PACKETS / HDL32_PACKETS_PER_SECOND * 10.0
REG_POINTS = 32768
GRID_CAPACITY = 16384


def _build_inputs(seed=0):
    """Construct all bench inputs WITHOUT any device→host readback.

    On the tunneled axon backend the first readback permanently degrades
    dispatch latency ~500x, so everything here is host-numpy construction,
    host→device uploads, and device-side selection ops only.
    """
    import jax
    import jax.numpy as jnp

    from veloslam_tpu.decode import calibration
    from veloslam_tpu.decode.decode import DeviceCalib, decode_packets
    from veloslam_tpu.io import simulate as sim
    from veloslam_tpu.registration import gicp

    seq = sim.generate_sequence(duration_s=0.35, model="hdl32", seed=seed,
                                world=sim.World.demo(1))
    pkts = np.concatenate([seq["packets"]] *
                          (BATCH_PACKETS // len(seq["packets"]) + 1)
                          )[:BATCH_PACKETS]
    times = np.arange(BATCH_PACKETS) / HDL32_PACKETS_PER_SECOND
    rel_s = times.astype(np.float32)

    m = 64
    track_rel = np.linspace(-0.1, times[-1] + 0.1, m).astype(np.float32)
    track_q = np.zeros((m, 4), np.float32)
    track_q[:, 0] = 1.0
    track_t = np.stack([5.0 * track_rel, np.zeros(m), np.full(m, 2.0)],
                       -1).astype(np.float32)
    track_v = np.tile(np.array([5.0, 0, 0], np.float32), (m, 1))

    calib = DeviceCalib.from_host(calibration.hdl32())
    jpkts = jnp.asarray(pkts)
    dec = decode_packets(jpkts, calib, model="hdl32")

    @jax.jit
    def select(xyz, valid):
        flat = xyz.reshape(-1, 3)
        msk = valid.reshape(-1)
        order = jnp.argsort(~msk)          # valid points first (stable)
        idx = order[:REG_POINTS]
        return flat[idx], msk[idx]

    reg_pts, reg_mask = select(dec.xyz, dec.valid)
    grid = gicp.build_plane_grid(reg_pts, reg_mask, np.zeros(3), 1.0,
                                 capacity=GRID_CAPACITY)
    return (jpkts, calib, jnp.asarray(rel_s),
            jnp.asarray(track_rel), jnp.asarray(track_q),
            jnp.asarray(track_t), jnp.asarray(track_v),
            reg_pts, reg_mask, grid)


def _timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return (time.perf_counter() - t0) / iters


def _block(out):
    import jax
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def run_bench():
    import jax
    import jax.numpy as jnp

    from veloslam_tpu import constants as C
    from veloslam_tpu.core import se3
    from veloslam_tpu.decode.decode import compensate, decode_packets
    from veloslam_tpu.decode.frames import AssemblyCarry, assemble_frames
    from veloslam_tpu.registration import gicp

    (pkts, calib, rel_s, track_rel, track_q, track_t, track_v,
     reg_pts, reg_mask, grid) = _build_inputs()

    # NOTE: device arrays (calib, grid) must be jit ARGUMENTS, never
    # closure captures — capturing a committed device array poisons the
    # axon backend (minutes-long compiles + 27 ms/dispatch thereafter).
    @jax.jit
    def stage_a(pkts, calib, rel_s, track_rel, track_q, track_t, track_v,
                carry):
        dec = decode_packets(pkts, calib, model="hdl32")
        xyz_w, _ = compensate(dec, rel_s, track_rel, track_q, track_t,
                              track_v)
        fb, n_done, starts, carry2, open_start = assemble_frames(
            dec, xyz_w, rel_s, carry, jnp.asarray(0.0, jnp.float32),
            model="hdl32", n_beams=32, max_frames=MAX_FRAMES_BATCH)
        return fb.n_points, n_done, carry2

    @jax.jit
    def stage_b(pts, mask, grid, init_q, init_t):
        res = gicp.register(pts, mask, grid, se3.Pose(init_q, init_t),
                            iterations=16)
        return res.pose.q, res.pose.t, res.n_matched

    carry = AssemblyCarry.init(32)
    t_a = _timeit(stage_a, pkts, calib, rel_s, track_rel, track_q, track_t,
                  track_v, carry)
    iq = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    it = jnp.zeros(3, jnp.float32)
    t_b = _timeit(stage_b, reg_pts, reg_mask, grid, iq, it)

    per_frame = t_a / FRAMES_PER_BATCH + t_b
    fps = 1.0 / per_frame
    return fps, t_a, t_b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-reference", action="store_true",
                    help="measure the single-core CPU reference number")
    args = ap.parse_args()
    if args.cpu_reference:
        import jax
        jax.config.update("jax_platforms", "cpu")
    fps, t_a, t_b = run_bench()
    result = {
        "metric": "hdl32_pipeline_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_CPU_FPS, 3),
    }
    print(json.dumps(result))
    print(f"# stage_a(decode+comp+assemble, {BATCH_PACKETS} pkts): "
          f"{t_a*1e3:.1f} ms  stage_b(register 16 it): {t_b*1e3:.1f} ms",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
