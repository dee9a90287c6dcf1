"""Benchmarks: bulk odometry throughput + FULL SLAM pipeline throughput.

Two configs, named honestly:

1. `hdl32_bulk_odometry_frames_per_s_per_chip` (headline `value`): the
   production bulk-replay odometry path (runtime.odometry.
   odometry_step_batched) as ONE jitted device program per 16384-packet
   batch (≈90.6 HDL-32 revolutions): decode → INS motion compensation →
   frame assembly → vmapped scan-to-map point-to-plane GICP (96 slots ×
   16384 pts × 16 GN iters vs the rolling 65536-row 0.5 m-voxel map) →
   map merge with decay + rebase check.  No keyframes/closures — pure
   odometry.

2. `full_slam_frames_per_s` (in `extra`): END-TO-END
   SlamPipeline.run_offline_batched + finalize() on a simulated loop
   drive with drifting INS — device-resident keyframe ring + scan-context
   descriptors in the same program, then loop-closure proposal
   (descriptor matmuls) + batched GICP verification + pose-graph solve +
   tiled-map rebuild + per-frame trajectory correction.  Wall-clock of
   everything after the pcap is in memory (ONE measured run; the jit
   cache is pre-warmed by a short scout drive).

Output protocol (driver-budget-safe): the headline JSON line is printed
and FLUSHED immediately after the bulk stage, so a timeout in a later
stage can never erase the measured number.  After the optional stages an
extended JSON line (same metric/value, richer `extra`) is printed; parsing
either the first or the last JSON line of stdout yields a valid record.
Every optional stage runs under the `--full-budget-s` wall-clock guard
and is skipped (recorded as such) once the budget is spent.

vs_baseline compares the bulk metric against a single-CPU-core run of the
same program (BASELINE.md target: >10x single-CPU-core frames/s), measured
with `taskset -c 0 python bench.py --cpu-reference` (single-threaded XLA)
and recorded in REFERENCE_CPU_FPS.  The constant is guarded by a config
signature: if the bulk config changes, vs_baseline is reported as null
until the reference is re-measured (it cannot silently go stale).

MEASUREMENT VALIDITY (round 3): on the tunneled axon backend
`block_until_ready` returns without waiting for remote execution, so all
earlier block-gated numbers measured DISPATCH latency, not runtime.  Every
timed region here now closes with a scalar device→host transfer (`_sync`),
which provably gates on execution.  The production registration config was
re-tuned under honest timing (dense O(1) index + reassociate-every-8; see
config.RegistrationConfig) — association gathers, not FLOPs, dominate this
workload on TPU.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

BATCH_PACKETS = 16384    # ≈ 90.6 HDL-32 revolutions per dispatched program
MAX_FRAMES_BATCH = 96
HDL32_PACKETS_PER_SECOND = 1e6 / 46.08 / 12      # ≈ 1808.4
FRAMES_PER_BATCH = BATCH_PACKETS / HDL32_PACKETS_PER_SECOND * 10.0
REG_POINTS = 16384
REG_ITERATIONS = 16
MAP_CAPACITY = 65536         # rolling-map rows (production r5: 0.5 m voxels)
VOXEL_SIZE = 0.5
REASSOCIATE_EVERY = 8
SAMPLE_ASSEMBLY = True

# Single-CPU-core frames/s of the same bulk step, measured with:
#   taskset -c 0 env XLA_FLAGS="--xla_cpu_multi_thread_eigen=false \
#     intra_op_parallelism_threads=1" \
#     python bench.py --cpu-reference
# on this container's host CPU (see BASELINE.md).  REFERENCE_CPU_CONFIG
# pins the bulk config the number was measured under; main() nulls
# vs_baseline if the live config no longer matches.  NOTE: --cpu-reference
# now force-resets the platform BEFORE any backend init — earlier rounds'
# recorded "CPU" numbers (79.8 fps in r3) were actually the tunneled TPU
# (the JAX_PLATFORMS env var is overridden by the session's sitecustomize
# hook and the config.update ran too late), so r3's vs_baseline=0.93
# compared the chip against itself.  The honest single-core number for
# the current program (r5: 0.5 m voxels, 65536-row map) is 22.5 fps
# (4.03 s/batch); the r4 1.0 m-voxel config measured 17.7 fps.
REFERENCE_CPU_FPS = 22.495
REFERENCE_CPU_CONFIG = ("pkts16384-slots96-pts16384-iters16-map65536"
                        "-vox0.5-dense-ra8-sampled")


def config_signature() -> str:
    samp = "-sampled" if SAMPLE_ASSEMBLY else ""
    return (f"pkts{BATCH_PACKETS}-slots{MAX_FRAMES_BATCH}-pts{REG_POINTS}"
            f"-iters{REG_ITERATIONS}-map{MAP_CAPACITY}-vox{VOXEL_SIZE}"
            f"-dense-ra{REASSOCIATE_EVERY}{samp}")


class Budget:
    """Wall-clock guard for the optional stages: once `spent()` crosses
    the limit, later stages are skipped (and say so in `extra`)."""

    def __init__(self, seconds: float):
        self.limit = seconds
        self.t0 = time.perf_counter()

    def spent(self) -> float:
        return time.perf_counter() - self.t0

    def remaining(self) -> float:
        return self.limit - self.spent()


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


def _sync(out):
    """Gate on EXECUTION, not dispatch: transfer one scalar leaf.

    On the tunneled axon backend `block_until_ready` returns immediately
    (it does not wait for the remote execution), so any block-based timing
    measures dispatch latency only — a 58-second batch "measured" as
    0.3 ms.  A device→host transfer genuinely waits for every queued
    program on the device (in-order execution), so timing regions are
    closed with a scalar transfer instead.  Verified with a known-FLOPs
    program: dispatch 0.000 s / block 0.000 s / transfer = true runtime.
    """
    import jax

    leaves = jax.tree.leaves(out)
    scalar = min(leaves, key=lambda a: getattr(a, "size", 1 << 30))
    return jax.device_get(scalar)


def run_bulk(iters=4, warmup=1, batch_packets=BATCH_PACKETS,
             max_frames_batch=MAX_FRAMES_BATCH, use_pallas=False,
             use_dense=True, reassociate_every=REASSOCIATE_EVERY,
             sample_assembly=SAMPLE_ASSEMBLY, inputs=None):
    import jax.numpy as jnp

    from veloslam_tpu.runtime import odometry as odo

    frames_per_batch = batch_packets / HDL32_PACKETS_PER_SECOND * 10.0
    (pkts, calib, rel_s, track_rel, track_q, track_t,
     track_v) = inputs or _build_inputs(batch_packets=batch_packets)
    state = odo.init_state(32, map_capacity=MAP_CAPACITY,
                           voxel_size=VOXEL_SIZE,
                           sample_assembly=sample_assembly)
    zero = jnp.asarray(0.0, jnp.float32)
    step = functools.partial(
        odo.odometry_step_batched, model="hdl32", n_beams=32,
        reg_points=REG_POINTS, reg_iterations=REG_ITERATIONS,
        max_frames_batch=max_frames_batch, use_pallas=use_pallas,
        use_dense=use_dense, reassociate_every=reassociate_every,
        sample_assembly=sample_assembly)

    def once():
        # Fixed pre-built state: steady-state per-batch cost, no
        # state-dependent recompiles, no host round-trips.
        return step(state, pkts, calib, rel_s, zero, zero,
                    track_rel, track_q, track_t, track_v)

    for _ in range(warmup):
        out = once()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = once()
    _sync(out)
    t_step = (time.perf_counter() - t0) / iters
    return frames_per_batch / t_step, t_step


def _make_drive(duration_s, seed=3, drift=1.0):
    """Simulated loop drive with drifting INS (closures must fire).
    Radius 8 m at 8 m/s → one lap every ~6.3 s, so even a short
    budget-friendly drive completes the loop.  Returns (paths, seq)."""
    import tempfile

    from veloslam_tpu.io import packets as pkmod
    from veloslam_tpu.io import simulate as sim

    d = tempfile.mkdtemp()
    seq = sim.generate_sequence(
        duration_s=duration_s, model="hdl32", seed=seed,
        world=sim.World.demo(3, extent=40.0, n_posts=40, n_walls=16),
        trajectory=sim.circle_trajectory(radius=8.0, speed=8.0))
    paths = sim.write_sequence(seq, d, name="bench")
    ins = pkmod.read_ins_txt(paths["ins"])
    ts = (ins["t_us"] - ins["t_us"][0]) * 1e-6
    pkmod.write_ins_txt(paths["ins"], ins["t_us"],
                        ins["pos_xy"] + np.stack(
                            [np.zeros_like(ts), drift * ts], -1),
                        np.deg2rad(ins["yaw_deg"]), speed=ins["speed"])
    return paths, seq


def _slam_cfg():
    from veloslam_tpu.config import GraphConfig, SlamConfig
    return SlamConfig(graph=GraphConfig(loop_closure_min_gap=12,
                                        sc_min_score=0.55))


def run_full_slam(duration_s=7.0, batch=4096, warm_s=None):
    # batch=4096 (≈2.3 s of sensor data): within-batch prior error after
    # the constant-velocity extrapolation is rate-noise × dt (~0.1 m/s ×
    # dt), and at 9-second batches that reaches the 0.5 m correspondence
    # basin; 2.3 s keeps it ~0.25 m with negligible dispatch overhead
    # (bootstrap ramp covers the stream head).
    """End-to-end full SLAM: run_offline_batched + finalize on a loop
    drive.  ONE measured run; the jit cache is warmed READBACK-FREE first
    (SlamPipeline.warmup_batched) — an ordinary warm run would read its
    results back and permanently poison dispatch for the measured run on
    the axon backend.  The warm drive uses the SAME duration as the
    measured one: shape buckets (keyframe ring capacity, trajectory
    length) derive from the recording length, and a shorter warm drive
    lands in different buckets, so the measured run would pay tens of
    seconds of remote compiles (measured: 50 s hiding in the readback
    stage).  Wall time covers everything after packets are in host
    memory."""
    from veloslam_tpu.runtime.evaluate import ate, interpolate_positions
    from veloslam_tpu.runtime.pipeline import SlamPipeline

    if warm_s is None:
        warm_s = duration_s
    if warm_s:
        SlamPipeline(_slam_cfg()).warmup_batched(duration_s=warm_s,
                                                 batch=batch)

    paths, seq = _make_drive(duration_s)
    pipe = SlamPipeline(_slam_cfg())
    t0 = time.perf_counter()
    pipe.run_offline_batched(paths["pcap"], paths["ins"], batch=batch,
                             defer_map=True)
    res = pipe.finalize()
    wall = time.perf_counter() - t0
    ref = interpolate_positions(res["times_us"], seq["ins_t_us"],
                                seq["ins_pos"])
    m = ate(res["positions"][:, :2], ref[:, :2], align=False)
    return {
        "frames_per_s": round(res["n_frames"] / wall, 1),
        "wall_s": round(wall, 3),
        "n_frames": res["n_frames"],
        "n_keyframes": res["n_keyframes"],
        "n_closures": res["n_closures"],
        "map_patches": res["map_patches"],
        "ate_rmse_m": round(m["rmse"], 4),
        "x_realtime": round(res["n_frames"] / wall / 10.0, 2),
        "stage_s": {k: round(v["total_s"], 2)
                    for k, v in sorted(res.get("timing", {}).items())},
    }


def run_roofline(bulk_ms: float) -> dict:
    """Achieved-vs-ceiling statement for the measured bulk batch
    (VERDICT r4 #9 / r3 #2): how far is the 16384-packet batch from the
    speed of light of this chip, and WHICH light?

    Two floors are reported:

    * `hbm_floor_ms` — pure HBM-bandwidth roofline: every byte the
      algorithm must move (packets in, decoded points, per-iteration
      voxel-statistic reads, sort payloads once, map moments) streamed at
      the v5e's ~819 GB/s.  This is the number a perfectly fused custom
      kernel could approach.
    * `primitive_floor_ms` — the floor with XLA's primitives as given:
      the batch is dominated by compiler sorts (multi-pass bitonic) and
      random gathers whose ACHIEVED rates were measured on this chip
      (scripts/microbench.py, ROADMAP perf notes): (key,val) pair sort
      ~1.0 GB/s of payload, random row gathers ~8-16 GB/s, elementwise
      fused streams near HBM rate.  This is the number THIS decomposition
      cannot beat without hand-written kernels.

    Byte accounting (per batch: N=16384 packets, Ncat≈6.3M decoded
    points, Psel=96·16384≈1.57M selected points, I=16 GN iterations,
    V=32768 map voxels):
      decode        : 19.8 MB packets read + ~151 MB xyz/aux written
      compensate    : ~151 MB read+write
      select (sort) : Ncat·8 B (key,src) pair-sort payload ≈ 50 MB
                      + rank gathers Psel·16 B ≈ 25 MB
      gicp          : per iteration Psel·(12 B query + ~40 B voxel
                      stats + 12 B residual) ≈ 100 MB; I iterations
                      + 2 dense re-associations (Psel·~24 B each)
      map update    : Psel·13 ch·4 B moments ≈ 82 MB sorted+segsummed
    """
    MB = 1e6
    n_cat = BATCH_PACKETS * 12 * 32
    p_sel = MAX_FRAMES_BATCH * REG_POINTS
    it = REG_ITERATIONS
    decode_b = (BATCH_PACKETS * 1206 + n_cat * 24)
    comp_b = n_cat * 24 * 2
    sort_b = n_cat * 8
    rankg_b = p_sel * 16
    gicp_stream_b = p_sel * 64 * it
    assoc_b = p_sel * 24 * max(it // REASSOCIATE_EVERY, 1)
    map_sort_b = p_sel * (13 * 4 + 8)
    total_b = (decode_b + comp_b + sort_b + rankg_b + gicp_stream_b
               + assoc_b + map_sort_b)

    HBM_GBPS = 819.0          # v5e HBM peak
    SORT_GBPS = 1.0           # measured: 1.57M (key,val) pairs ≈ 8 ms
    GATHER_GBPS = 10.0        # measured: row gathers (32K,3) ≈ 4 ms
    hbm_floor_ms = total_b / (HBM_GBPS * 1e9) * 1e3
    prim_floor_ms = (
        (decode_b + comp_b + gicp_stream_b) / (HBM_GBPS * 1e9) * 1e3
        + (sort_b + map_sort_b) / (SORT_GBPS * 1e9) * 1e3
        + (rankg_b + assoc_b) / (GATHER_GBPS * 1e9) * 1e3)
    return {
        "measured_bulk_ms": round(bulk_ms, 1),
        "bytes_per_batch_MB": round(total_b / MB, 1),
        "hbm_floor_ms": round(hbm_floor_ms, 2),
        "primitive_floor_ms": round(prim_floor_ms, 2),
        "fraction_of_primitive_floor": round(prim_floor_ms / bulk_ms, 3),
        "fraction_of_hbm_floor": round(hbm_floor_ms / bulk_ms, 3),
        "conclusion": (
            "The batch moves ~{:.0f} MB; a perfectly fused kernel could "
            "run it in ~{:.1f} ms (HBM roofline), XLA's sort/gather "
            "primitives bound this decomposition at ~{:.0f} ms. Measured "
            "{:.0f} ms = {:.0%} of the primitive floor — the remaining "
            "gap is dispatch overhead + non-overlapped stages; closing "
            "the 10x to the HBM roofline needs hand-written Pallas "
            "selection/association kernels (measured to lose to XLA "
            "fusion at this batch size in the r2 A/B — revisit on "
            "untunneled hardware)."
        ).format(total_b / MB, hbm_floor_ms, prim_floor_ms, bulk_ms,
                 prim_floor_ms / bulk_ms),
    }


def run_live(duration_s=5.0, rate=1.0):
    """Live-mode measurement on this backend: loopback-replay a simulated
    drive through run_online at `rate`x the sensor's packet rate; record
    sustained pkt/s, drops, and whether the pipeline kept up (the
    reference's pacing baseline, PacketFileSender.cxx:78)."""
    from veloslam_tpu.apps.replay import measure_live_loopback
    return measure_live_loopback(duration_s=duration_s, rate=rate)


def run_live_sweep(budget, duration_s=5.0, rates=(1.0, 2.0, 4.0)):
    """Live headroom sweep: where does live ingest saturate?  The
    reference's own replay tooling paces ~2.8x the HDL-32's packet rate
    (PacketFileSender.cxx:78 → ~5 kpkt/s vs 1.8 k), so 1x alone proves
    nothing about margin — this records 1x/2x/4x loopback runs (sustained
    pkt/s, drops, feed latency vs batch budget) until the stage budget is
    spent (VERDICT r4 #4)."""
    out = []
    for rate in rates:
        if budget.remaining() <= 0:
            out.append({"rate_x_sensor": rate, "skipped": "budget spent"})
            continue
        try:
            out.append(run_live(duration_s=duration_s, rate=rate))
        except Exception as e:          # record, never fail the bench
            out.append({"rate_x_sensor": rate,
                        "error": f"{e}"[:200]})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-reference", action="store_true",
                    help="measure the single-core CPU reference number")
    ap.add_argument("--skip-full", action="store_true",
                    help="bulk stage only")
    ap.add_argument("--ab", action="store_true",
                    help="run the Pallas/dense-index A/B (a documented "
                         "loser on this backend — off by default)")
    ap.add_argument("--live", action="store_true", default=True,
                    help="measure live loopback ingest on this backend "
                         "(default ON so the committed bench records it; "
                         "--no-live disables)")
    ap.add_argument("--no-live", dest="live", action="store_false")
    # 20 s ≈ 3.2 laps: the finalize sweep + host tail are FIXED costs
    # (closure verify, graph solve, map build) while the stream cost is
    # marginal per second — a 7 s drive measured mostly overhead, not
    # throughput.  stage_s in the output keeps the split visible.
    ap.add_argument("--full-duration-s", type=float, default=20.0)
    ap.add_argument("--full-budget-s", type=float, default=600.0,
                    help="wall-clock budget for the optional stages; "
                         "stages are skipped once it is spent")
    args = ap.parse_args()
    if args.cpu_reference:
        # MUST run before anything initializes a backend: the
        # sitecustomize hook pins the tunneled TPU platform, and
        # compilecache.enable() reads jax.default_backend().  Round 3's
        # recorded "CPU" references (79.8 fps) were in fact the TPU —
        # config.update ran after the backend was already up, so
        # vs_baseline compared the chip against itself.
        import jax
        jax.config.update("jax_platforms", "cpu")
        try:
            import jax.extend.backend
            jax.extend.backend.clear_backends()
        except Exception:
            pass
        assert jax.default_backend() == "cpu", jax.default_backend()
        fps, t_step = run_bulk(iters=3, warmup=1)
        print(f"# cpu reference: {fps:.3f} frames/s "
              f"({t_step*1e3:.1f} ms/batch)  config={config_signature()}")
        return 0

    # Persistent XLA compilation cache: the batched full-SLAM path
    # compiles dozens of programs; on the remote-compile backend a cold
    # process pays tens of seconds each.  With the cache, any process
    # after the first (test runs, driver bench runs) loads the compiled
    # executables from disk instead.
    from veloslam_tpu.utils import compilecache, hostdev
    hostdev.ensure_cpu_platform()   # host-CPU finalize solves (GraphConfig)
    compilecache.enable()

    inputs = _build_inputs()
    fps, t_step = run_bulk(inputs=inputs)
    extra = {"bulk_ms_per_batch": round(t_step * 1e3, 3),
             "config": config_signature(),
             "roofline": run_roofline(t_step * 1e3),
             "scaling_note": (
                 ">=70% scaling at >=2 hosts remains model-based "
                 "(SCALING_r05.json): no multi-chip TPU in this "
                 "environment; Gloo-TCP process runs validate the "
                 "collective paths, the ICI projection is analytic")}
    vs = (round(fps / REFERENCE_CPU_FPS, 3)
          if config_signature() == REFERENCE_CPU_CONFIG else None)
    result = {
        "metric": "hdl32_bulk_odometry_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": vs,
        "extra": extra,
    }
    # Headline line FIRST — a later-stage timeout can never erase it.
    print(json.dumps(result), flush=True)
    print(f"# bulk odometry ({BATCH_PACKETS} pkts = "
          f"{FRAMES_PER_BATCH:.1f} frames, {MAX_FRAMES_BATCH} reg slots x "
          f"{REG_POINTS} pts x {REG_ITERATIONS} GN iters): "
          f"{t_step*1e3:.2f} ms/batch", file=sys.stderr, flush=True)
    if vs is None:
        print("# vs_baseline null: bulk config changed since the CPU "
              "reference was measured — rerun --cpu-reference",
              file=sys.stderr)

    budget = Budget(args.full_budget_s)

    if args.ab:
        # A/B vs the production default (dense index + reassociate-every-8):
        # binary-search lookup, classical per-iteration re-association, and
        # the fused-Pallas normal equations (recorded per backend so the
        # default can be chosen from a committed measurement).
        import jax
        extra["ab"] = {"dense_ra8_ms": round(t_step * 1e3, 3)}
        for key, kw in (("searchsorted_ra8_ms", dict(use_dense=False)),
                        ("dense_ra1_ms", dict(reassociate_every=1))):
            try:
                _, t_ab = run_bulk(iters=2, warmup=1, inputs=inputs, **kw)
                extra["ab"][key] = round(t_ab * 1e3, 3)
            except Exception as e:     # record, never fail the bench
                extra["ab"][key] = f"error: {e}"[:200]
        if jax.default_backend() == "tpu":
            # pallas interpret mode (non-TPU) is orders slower — only
            # meaningful compiled on the real chip
            try:
                _, t_pallas = run_bulk(iters=2, warmup=1, use_pallas=True,
                                       inputs=inputs)
                extra["ab"]["pallas_fused_ms"] = round(t_pallas * 1e3, 3)
            except Exception as e:
                extra["ab"]["pallas_fused_ms"] = f"error: {e}"[:200]

    if not args.skip_full:
        if budget.remaining() > 0:
            # Hard wall-clock guard: a SIGALRM raise inside the stage still
            # reaches the extended-JSON print below (stage recorded as a
            # timeout instead of the whole process dying at the driver's
            # timeout with the extended line unprinted).
            import signal

            def _alarm(signum, frame):
                raise TimeoutError(
                    "full-slam stage exceeded its sub-budget (min of "
                    f"remaining and 480 s of --full-budget-s "
                    f"{args.full_budget_s:.0f})")

            old = signal.signal(signal.SIGALRM, _alarm)
            # Sub-budget: on an aged tunnel session (dispatch can degrade
            # to ~30 s/program, ROADMAP perf notes) the full-SLAM stage
            # alone could eat the whole budget and the live sweep would
            # be skipped; cap it so every stage leaves a record.
            signal.alarm(max(min(int(budget.remaining()), 480), 1))
            try:
                extra["full_slam"] = run_full_slam(
                    duration_s=args.full_duration_s)
                extra["full_slam_frames_per_s"] = \
                    extra["full_slam"]["frames_per_s"]
                fs = extra["full_slam"]
                print(f"# full SLAM (keyframes+closures+graph+map): "
                      f"{fs['frames_per_s']} frames/s = "
                      f"{fs['x_realtime']}x realtime, "
                      f"ATE {fs['ate_rmse_m']} m, "
                      f"{fs['n_closures']} closures",
                      file=sys.stderr, flush=True)
            except Exception as e:
                extra["full_slam"] = f"error: {e}"[:300]
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
        else:
            extra["full_slam"] = "skipped: budget spent"

    if args.live:
        if budget.remaining() > 0:
            try:
                extra["live"] = run_live_sweep(budget)
            except Exception as e:
                extra["live"] = f"error: {e}"[:300]
        else:
            extra["live"] = "skipped: budget spent"

    # Extended line LAST — same metric/value; parsing either the first or
    # the last JSON line of stdout yields a valid record.
    result["extra"] = extra
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
