"""Device-resident streaming odometry: accuracy vs ground truth."""

import numpy as np
import pytest

from veloslam_tpu.core import se3
from veloslam_tpu.core.timeline import PoseTrack
from veloslam_tpu.decode import calibration
from veloslam_tpu.decode.decode import DeviceCalib
from veloslam_tpu.io import simulate as sim
from veloslam_tpu.runtime.evaluate import ate, interpolate_positions
from veloslam_tpu.runtime.odometry import StreamingOdometry


@pytest.fixture(scope="module")
def drive():
    return sim.generate_sequence(duration_s=1.2, model="hdl32", seed=23,
                                 world=sim.World.demo(6))


def _track(seq, drift_rate=0.0):
    track = PoseTrack()
    t0 = seq["ins_t_us"][0]
    for t_us, p, yaw, v in zip(seq["ins_t_us"], seq["ins_pos"],
                               seq["ins_yaw"], seq["ins_vel"]):
        q = se3.euler_deg_to_quat_np(0.0, 0.0, np.rad2deg(yaw))
        dp = np.array([0.0, drift_rate * (t_us - t0) * 1e-6, 0.0])
        track.add(int(t_us), q=q, t=np.asarray(p) + dp, v=v)
    return track


@pytest.mark.slow
def test_streaming_odometry_tracks_truth(drive):
    odo = StreamingOdometry(DeviceCalib.from_host(calibration.hdl32()),
                            reg_iterations=8)
    res = odo.run(drive["packets"], drive["pkt_times_us"], _track(drive),
                  batch=256)
    assert res["n_frames"] >= 8
    ref = interpolate_positions(res["times_us"], drive["ins_t_us"],
                                drive["ins_pos"])
    m = ate(res["positions"], ref, align=False)
    assert m["rmse"] < 0.15, m


@pytest.mark.slow
def test_streaming_odometry_corrects_drifting_ins():
    """Drift correction needs lateral structure; use a dense world (the
    sparse default leaves the drift direction weakly observable — scan
    odometry cannot correct what the scene does not constrain)."""
    world = sim.World.demo(seed=8, extent=40.0, n_posts=60, n_walls=24)
    drive = sim.generate_sequence(duration_s=1.2, model="hdl32", seed=23,
                                  world=world)
    odo = StreamingOdometry(DeviceCalib.from_host(calibration.hdl32()),
                            reg_iterations=10)
    drift_rate = 0.3            # m/s of INS drift
    res = odo.run(drive["packets"], drive["pkt_times_us"],
                  _track(drive, drift_rate), batch=256)
    ref = interpolate_positions(res["times_us"], drive["ins_t_us"],
                                drive["ins_pos"])
    m = ate(res["positions"], ref, align=False)
    # raw INS would be off by up to drift_rate * duration ≈ 0.36 m at the
    # end; odometry must hold much tighter
    t_rel = (res["times_us"] - drive["ins_t_us"][0]) * 1e-6
    ins_err = np.sqrt(np.mean((drift_rate * t_rel) ** 2))
    assert m["rmse"] < ins_err * 0.7, (m, ins_err)
    assert m["rmse"] < 0.25, m


@pytest.mark.slow
def test_batched_odometry_matches_sequential(drive):
    """The batched step (all frame slots registered in one vmapped GICP
    dispatch against the batch-start map) must track ground truth and agree
    with the sequential fused step to centimeters."""
    calib = DeviceCalib.from_host(calibration.hdl32())
    seq_odo = StreamingOdometry(calib, reg_iterations=8)
    bat_odo = StreamingOdometry(calib, reg_iterations=8, batched=True)
    track = _track(drive)
    res_seq = seq_odo.run(drive["packets"], drive["pkt_times_us"], track,
                          batch=256)
    res_bat = bat_odo.run(drive["packets"], drive["pkt_times_us"], track,
                          batch=256)
    assert res_bat["n_frames"] == res_seq["n_frames"]
    np.testing.assert_allclose(res_bat["times_us"], res_seq["times_us"])
    # Registration on noisy sim scans has nearby per-frame minima; the two
    # paths may pick slightly different ones.  Require close agreement AND
    # the same accuracy-vs-truth bound as the sequential test.
    d = np.linalg.norm(res_bat["positions"] - res_seq["positions"], axis=1)
    assert d.max() < 0.35, d.max()
    ref = interpolate_positions(res_bat["times_us"], drive["ins_t_us"],
                                drive["ins_pos"])
    m = ate(res_bat["positions"], ref, align=False)
    assert m["rmse"] < 0.15, m


def test_pad_window_even_subsampling():
    """Oversized INS windows must be subsampled evenly (not head-truncated)
    so priors stay accurate across large packet batches."""
    from veloslam_tpu.decode.calibration import hdl32
    from veloslam_tpu.decode.decode import DeviceCalib

    odo = StreamingOdometry(DeviceCalib.from_host(hdl32()))
    n = 450
    w = {"rel_s": np.linspace(0.0, 4.5, n).astype(np.float32),
         "q": np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
         "t": np.linspace([0, 0, 0], [22.5, 0, 0], n).astype(np.float32),
         "v": np.tile(np.array([5, 0, 0], np.float32), (n, 1))}
    out = odo._pad_window(w)
    L = odo.WINDOW_LEN
    assert len(out["rel_s"]) == L
    # endpoints kept, spacing stays uniform to within one source sample
    assert out["rel_s"][0] == w["rel_s"][0]
    assert out["rel_s"][-1] == w["rel_s"][-1]
    gaps = np.diff(out["rel_s"])
    assert gaps.max() < 2.5 * gaps.min()
    # undersized windows still edge-pad
    w2 = {k: v[:10] for k, v in w.items()}
    out2 = odo._pad_window(w2)
    assert len(out2["rel_s"]) == L
    assert out2["rel_s"][-1] == w2["rel_s"][-1]


@pytest.mark.slow
def test_streaming_run_processes_tail_and_short_recordings(drive):
    """run() must not drop the trailing partial batch: a batch size larger
    than the whole recording (the old silent-0-frames failure) and a
    non-divisible batch must both produce the full trajectory."""
    calib = DeviceCalib.from_host(calibration.hdl32())
    track = _track(drive)
    ref = StreamingOdometry(calib, reg_iterations=8).run(
        drive["packets"], drive["pkt_times_us"], track, batch=256)
    assert ref["n_frames"] >= 8

    # batch larger than the recording: everything is "tail"
    big = StreamingOdometry(calib, reg_iterations=8).run(
        drive["packets"], drive["pkt_times_us"], track,
        batch=len(drive["packets"]) + 500)
    assert big["n_frames"] == ref["n_frames"]

    # non-divisible batch loses no tail frames
    odd = StreamingOdometry(calib, reg_iterations=8).run(
        drive["packets"], drive["pkt_times_us"], track, batch=300)
    assert odd["n_frames"] == ref["n_frames"]
    np.testing.assert_allclose(odd["times_us"], ref["times_us"])


@pytest.mark.slow
def test_streaming_run_grows_trajectory_capacity(drive):
    """A state created with tiny max_frames must still record every frame
    (run() grows the device buffers from the recording length)."""
    calib = DeviceCalib.from_host(calibration.hdl32())
    odo = StreamingOdometry(calib, reg_iterations=8, max_frames=2)
    res = odo.run(drive["packets"], drive["pkt_times_us"], _track(drive),
                  batch=256)
    assert res["n_frames"] >= 8
    assert np.all(np.diff(res["times_us"]) > 0)


@pytest.mark.slow
def test_unbounded_drive_rebases_rolling_map():
    """A straight drive crossing the +/-512 m packed-key window must keep
    registering: the rolling map re-keys itself around the vehicle
    (voxel.rebase_grid).  Before the rebase existed, every map update
    beyond the window silently dropped and the tail degraded to raw INS
    (here: drifting INS, so the tail error would exceed ~1 m)."""
    speed = 40.0
    dur = 16.5                                  # 660 m > 512 m window
    rng = np.random.default_rng(11)
    n_posts = 90
    posts = np.column_stack([
        rng.uniform(-30, speed * dur + 60, n_posts),
        np.where(rng.uniform(size=n_posts) < 0.5, -1, 1)
        * rng.uniform(4.0, 25.0, n_posts),
        rng.uniform(0.2, 0.5, n_posts),
        np.zeros(n_posts),
        rng.uniform(4.0, 9.0, n_posts)])
    # continuous walls on BOTH sides so the lateral drift direction is
    # well-observed everywhere along the corridor
    walls = []
    for k in range(18):
        x0 = -20 + k * 40.0
        for side in (-1, 1):
            walls.append([x0, side * (16.0 + (k % 3)), x0 + 32.0,
                          side * (20.0 + (k % 3)), 0.0, 5.0])
    world = sim.World(posts=posts, walls=np.asarray(walls))
    seq = sim.generate_sequence(
        duration_s=dur, model="hdl32", seed=11, world=world,
        trajectory=sim.straight_trajectory(speed=speed))

    drift_rate = 0.3
    odo = StreamingOdometry(DeviceCalib.from_host(calibration.hdl32()),
                            reg_iterations=8, batched=True)
    # batch ~0.3 s of data: within a batch all frames register against the
    # batch-START map, so drift correction chains only across batches —
    # large batches are for drift-free INS replay (see odometry module doc)
    res = odo.run(seq["packets"], seq["pkt_times_us"],
                  _track(seq, drift_rate), batch=512)
    assert res["n_frames"] >= 150
    ref = interpolate_positions(res["times_us"], seq["ins_t_us"],
                                seq["ins_pos"])
    err = np.linalg.norm(res["positions"][:, :2] - ref[:, :2], axis=1)
    x = ref[:, 0]
    tail = x > 520.0          # beyond the original ±512 m packed-key window
    mid = (x > 280.0) & (x <= 500.0)
    assert tail.sum() > 20 and mid.sum() > 20
    rms = lambda e: float(np.sqrt(np.mean(e ** 2)))
    # Rolling-map odometry under continuous INS drift leaks a fraction of
    # the drift everywhere (it anchors to its own past estimates); the
    # REBASE regression signal is the tail: without it, registration dies
    # past the window and the tail error GROWS at the full drift rate
    # toward raw INS.  With it, the tail behaves like the middle.
    t_tail = x[tail] / speed
    slope = float(np.polyfit(t_tail, err[tail], 1)[0])   # m/s of growth
    assert slope < 0.5 * drift_rate, (
        slope, "tail error grows at drift rate — rebase did not happen?")
    assert rms(err[tail]) < rms(err[mid]) * 1.5 + 0.15, (
        rms(err[tail]), rms(err[mid]))
    # and nowhere near raw INS (drift reaches ~5 m by the end)
    assert rms(err[tail]) < 0.55 * rms(drift_rate * t_tail), (
        rms(err[tail]))
