import numpy as np
import pytest

from veloslam_tpu.config import (GraphConfig, PipelineConfig,
                                 RegistrationConfig, SensorConfig,
                                 SlamConfig)
from veloslam_tpu.io import packets as pk
from veloslam_tpu.io import simulate as sim
from veloslam_tpu.runtime.evaluate import ate, interpolate_positions
from veloslam_tpu.runtime.framestore import FrameStore
from veloslam_tpu.runtime.pipeline import SlamPipeline


def _cfg(**kw):
    return SlamConfig(
        sensor=SensorConfig(model="hdl32"),
        pipeline=PipelineConfig(packets_per_batch=128),
        registration=RegistrationConfig(max_points=16384,
                                        max_iterations=10),
        **kw)


@pytest.fixture(scope="module")
def sim_drive(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("drive"))
    seq = sim.generate_sequence(duration_s=1.5, model="hdl32", seed=13,
                                world=sim.World.demo(4))
    paths = sim.write_sequence(seq, out, name="drive")
    return seq, paths


def test_framestore_cache_and_spill(tmp_path):
    fs = FrameStore(capacity=3, spill_dir=str(tmp_path / "spill"))
    for k in range(6):
        frame = {"xyz": np.full((2, 4, 3), k, np.float32),
                 "mask": np.ones((2, 4), bool)}
        fs.add_frame(1000 * k, frame)
    assert len(fs) == 6
    assert len(fs._frames) <= 3
    # exact + near + range queries, with transparent reload of spilled
    f0 = fs.get_frame_at(0)
    assert f0 is not None and f0["xyz"][0, 0, 0] == 0
    assert fs.get_frame_at(1) is None
    fn = fs.get_frame_near(1400)
    assert fn["xyz"][0, 0, 0] == 1
    rng = fs.get_range_between(2000, 5000)
    assert len(rng) == 3
    assert fs.get_recent_frame()["xyz"][0, 0, 0] == 5


def test_framestore_wait_for_frame():
    """Blocking frame query (waitForFrame, HDLManager.cxx:213-225):
    consumer blocks until a producer thread adds a newer frame."""
    import threading
    import time as _time

    fs = FrameStore(capacity=4)
    frame = {"xyz": np.zeros((2, 4, 3), np.float32),
             "mask": np.ones((2, 4), bool)}
    fs.add_frame(1000, dict(frame))

    # already-satisfied wait returns immediately
    got = fs.wait_for_frame(after_us=-1, timeout_s=0.0)
    assert got is not None

    # timeout path: no frame newer than 1000 yet
    assert fs.wait_for_frame(after_us=1000, timeout_s=0.05) is None

    def producer():
        _time.sleep(0.1)
        fs.add_frame(2000, dict(frame))

    th = threading.Thread(target=producer)
    t0 = _time.monotonic()
    th.start()
    got = fs.wait_for_frame(after_us=1000, timeout_s=2.0)
    th.join()
    assert got is not None
    assert _time.monotonic() - t0 >= 0.08


def test_framestore_meta_resume(tmp_path):
    spill = str(tmp_path / "spill")
    fs = FrameStore(capacity=1, spill_dir=spill)
    for k in range(4):
        fs.add_frame(1000 * k, {"xyz": np.full((1, 2, 3), k, np.float32),
                                "mask": np.ones((1, 2), bool)})
    meta = str(tmp_path / "frames_meta.npz")
    fs.save_meta(meta)
    # a fresh store resumes from meta + spill dir alone
    fs2 = FrameStore(capacity=2, spill_dir=spill)
    fs2.load_meta(meta)
    assert len(fs2) == 4
    f = fs2.get_frame_at(2000)
    assert f is not None and f["xyz"][0, 0, 0] == 2


def test_pipeline_with_accurate_ins(sim_drive):
    """With exact INS priors the pipeline must track ground truth tightly
    and register nearly every frame."""
    seq, paths = sim_drive
    pipe = SlamPipeline(_cfg())
    res = pipe.run_offline(paths["pcap"], paths["ins"])
    assert res["n_frames"] >= 10
    assert res["registered_fraction"] > 0.8
    ref = interpolate_positions(res["times_us"], seq["ins_t_us"],
                                seq["ins_pos"])
    # the reference INS text format has no z column (the track sits at
    # z=0), so evaluate in the plane it observes
    m = ate(res["positions"][:, :2], ref[:, :2], align=False)
    assert m["rmse"] < 0.15, m


def test_pipeline_corrects_ins_drift(sim_drive, tmp_path):
    """Inject linear INS drift; scan-to-map registration must hold the
    estimate near ground truth (the point of SLAM)."""
    seq, paths = sim_drive
    ins = pk.read_ins_txt(paths["ins"])
    ts = (ins["t_us"] - ins["t_us"][0]) * 1e-6
    drift_rate = 0.25                    # 0.25 m/s lateral drift
    drift = np.stack([np.zeros_like(ts), drift_rate * ts], -1)
    drifted = str(tmp_path / "ins_drifted.txt")
    pk.write_ins_txt(drifted, ins["t_us"], ins["pos_xy"] + drift,
                     np.deg2rad(ins["yaw_deg"]), speed=ins["speed"])

    pipe = SlamPipeline(_cfg())
    res = pipe.run_offline(paths["pcap"], drifted)
    ref = interpolate_positions(res["times_us"], seq["ins_t_us"],
                                seq["ins_pos"])
    m_slam = ate(res["positions"][:, :2], ref[:, :2], align=False)
    # raw drifted INS error at the same timestamps
    drift_at = interpolate_positions(
        res["times_us"], ins["t_us"],
        np.concatenate([ins["pos_xy"] + drift,
                        np.zeros((len(ts), 1))], 1))
    m_ins = ate(drift_at[:, :2], ref[:, :2], align=False)
    assert m_slam["rmse"] < m_ins["rmse"] * 0.6, (m_slam, m_ins)
    assert m_slam["rmse"] < 0.3, m_slam


def test_pipeline_checkpoint_roundtrip(sim_drive, tmp_path):
    seq, paths = sim_drive
    pipe = SlamPipeline(_cfg(), spill_dir=str(tmp_path / "spill"))
    pipe.run_offline(paths["pcap"], paths["ins"], max_packets=512)
    ck = str(tmp_path / "ckpt")
    pipe.save_checkpoint(ck)
    pipe2 = SlamPipeline(_cfg())
    pipe2.load_checkpoint(ck)
    assert len(pipe2.frames) == len(pipe.frames)
    assert len(pipe2.track) == len(pipe.track)
    assert pipe2.graph.n_poses == pipe.graph.n_poses
    assert pipe2.map.n_patches == pipe.map.n_patches


def test_slam_run_cli(tmp_path):
    from veloslam_tpu.apps import slam_run
    out = str(tmp_path / "out")
    rc = slam_run.main(["--simulate", "0.6", "--out-dir", out,
                        "--platform", "cpu"])
    assert rc == 0
    import json
    import os
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["n_frames"] >= 3
    assert "ate" in metrics
    traj = np.loadtxt(os.path.join(out, "trajectory.txt"))
    assert traj.shape[1] == 8


@pytest.mark.slow
def test_slam_run_cli_fast(tmp_path):
    """--fast: bulk batched odometry through the CLI (bench.py's
    configuration at reduced scale) still writes trajectory + ATE."""
    from veloslam_tpu.apps import slam_run
    out = str(tmp_path / "out")
    rc = slam_run.main(["--simulate", "1.2", "--out-dir", out,
                        "--platform", "cpu", "--fast", "--batch", "1024"])
    assert rc == 0
    import json
    import os
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["n_frames"] >= 5
    assert metrics["ate"]["rmse"] < 0.25
    traj = np.loadtxt(os.path.join(out, "trajectory.txt"))
    assert traj.shape[1] == 8


def test_framestore_async_spill(tmp_path):
    """Background writer parity (HDLManager.cxx:321-389): eviction never
    blocks, queued frames stay readable, flush() lands them on disk."""
    import os

    spill = str(tmp_path / "spill")
    fs = FrameStore(capacity=2, spill_dir=spill, async_spill=True)
    for k in range(8):
        fs.add_frame(1000 * k, {"xyz": np.full((1, 2, 3), k, np.float32),
                                "mask": np.ones((1, 2), bool)})
    # evicted frames readable immediately (pending or already written)
    for k in range(8):
        f = fs.get_frame_at(1000 * k)
        assert f is not None and f["xyz"][0, 0, 0] == k
    fs.flush()
    on_disk = {p for p in os.listdir(spill)}
    # capacity=2 in RAM; at least the 6 evicted frames must be files
    assert len(on_disk) >= 6, on_disk
    # full checkpoint resumes after async writes
    meta = str(tmp_path / "m.npz")
    fs.save_meta(meta)
    fs2 = FrameStore(capacity=2, spill_dir=spill)
    fs2.load_meta(meta)
    for k in range(8):
        f = fs2.get_frame_at(1000 * k)
        assert f is not None and f["xyz"][0, 0, 0] == k


def test_pipeline_d2d_method(sim_drive):
    """The D2D registration method (RegistrationConfig.method="d2d") must
    track ground truth at least as well as point-to-plane end-to-end."""
    import dataclasses

    seq, paths = sim_drive
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, registration=dataclasses.replace(cfg.registration,
                                              method="d2d"))
    pipe = SlamPipeline(cfg)
    res = pipe.run_offline(paths["pcap"], paths["ins"])
    assert res["n_frames"] >= 10
    assert res["registered_fraction"] > 0.8, res["registered_fraction"]
    ref = interpolate_positions(res["times_us"], seq["ins_t_us"],
                                seq["ins_pos"])
    m = ate(res["positions"][:, :2], ref[:, :2], align=False)
    assert m["rmse"] < 0.15, m


def test_pipeline_ndt_method(sim_drive):
    """The NDT registration method (RegistrationConfig.method="ndt") must
    track ground truth end-to-end."""
    import dataclasses

    seq, paths = sim_drive
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, registration=dataclasses.replace(cfg.registration,
                                              method="ndt"))
    pipe = SlamPipeline(cfg)
    res = pipe.run_offline(paths["pcap"], paths["ins"])
    assert res["n_frames"] >= 10
    assert res["registered_fraction"] > 0.8, res["registered_fraction"]
    ref = interpolate_positions(res["times_us"], seq["ins_t_us"],
                                seq["ins_pos"])
    m = ate(res["positions"][:, :2], ref[:, :2], align=False)
    assert m["rmse"] < 0.2, m


def test_offline_gps_grounding_overrides_capture_latency(tmp_path):
    """run_offline must resolve HDL stamps from position-packet GPS
    grounding, not pcap capture timestamps: a pcap whose record times are
    shifted +7 s (capture latency) still yields frame times on the true
    GPS clock."""
    from veloslam_tpu.config import PipelineConfig, SensorConfig, SlamConfig
    from veloslam_tpu.io import simulate as sim
    from veloslam_tpu.io.pcap import PcapReader, PcapWriter

    seq = sim.generate_sequence(duration_s=0.5, model="hdl32", seed=9,
                                world=sim.World.demo(2))
    paths = sim.write_sequence(seq, str(tmp_path), name="g",
                               position_packet_period_s=0.2)
    # rewrite with +7 s record (capture) times; payloads unchanged
    shifted = str(tmp_path / "shifted.pcap")
    with PcapReader(paths["pcap"]) as r, PcapWriter(shifted) as w:
        for payload, t_us, _ in r:
            w.write(payload, t_us + 7_000_000)
    pipe = SlamPipeline(SlamConfig(
        sensor=SensorConfig(model="hdl32"),
        pipeline=PipelineConfig(packets_per_batch=256)))
    res = pipe.run_offline(shifted, paths["ins"])
    assert res["gps_health"]["grounded"]
    assert res["gps_health"]["ground_correction_us"] == -7_000_000
    assert res["n_frames"] >= 3
    t0 = int(seq["pkt_times_us"][0])
    # frame stamps on the true GPS clock (within the 0.5 s drive), not +7 s
    assert np.all(res["times_us"] >= t0 - 200_000)
    assert np.all(res["times_us"] <= t0 + 1_000_000), res["times_us"][:3]


def test_frame_redecode_from_pcap_offsets(sim_drive, tmp_path):
    """Frames whose payload was dropped (tiny cache, no spill dir) must
    re-materialize by decoding from their pcap byte offsets — the
    reference's getFrame contract (HDLParser.cxx:505-544): pcap + meta
    alone rebuilds the session."""
    seq, paths = sim_drive
    # Reference run: big cache keeps every payload in RAM.
    ref = SlamPipeline(_cfg())
    ref.run_offline(paths["pcap"], paths["ins"])
    assert ref.frames.get_recent_frame() is not None

    # Constrained run: payloads beyond a 2-frame cache are DROPPED.
    pipe = SlamPipeline(_cfg())
    pipe.frames.capacity = 2
    pipe.run_offline(paths["pcap"], paths["ins"])
    times, _ = pipe.frames.all_frame_meta()
    assert len(times) >= 5
    # every long-evicted frame re-materializes exactly (incl. frames that
    # stayed open across n_done==0 batches — a past offset-tracking bug)
    for i in range(1, len(times) - 1):
        got = pipe.frames.get_frame_at(int(times[i]))
        assert got is not None, f"re-decode failed for frame {i}"
        want = ref.frames.get_frame_at(int(times[i]))
        np.testing.assert_array_equal(got["mask"], want["mask"])
        np.testing.assert_allclose(got["xyz"][got["mask"]],
                                   want["xyz"][want["mask"]],
                                   rtol=1e-5, atol=1e-4)
    early = int(times[1])
    want = ref.frames.get_frame_at(early)

    # Checkpoint with sources, resume a FRESH pipeline from meta + pcap
    # alone (delete the spilled payloads) — loadHDLMeta contract.
    ck = str(tmp_path / "ck")
    pipe.save_checkpoint(ck)
    import glob
    import os
    for f in glob.glob(os.path.join(ck, "frames", "*.npz")):
        os.remove(f)
    pipe2 = SlamPipeline(_cfg())
    pipe2.load_checkpoint(ck)
    got2 = pipe2.frames.get_frame_at(early)
    assert got2 is not None, "resume-from-pcap re-decode failed"
    np.testing.assert_array_equal(got2["mask"], want["mask"])
    np.testing.assert_allclose(got2["xyz"][got2["mask"]],
                               want["xyz"][want["mask"]],
                               rtol=1e-5, atol=1e-4)
