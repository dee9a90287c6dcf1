"""Device-resident full SLAM (runtime.fullslam): throughput path accuracy,
keyframe ring, and drift-independent loop closure."""

import numpy as np
import pytest

from veloslam_tpu.config import (GraphConfig, RegistrationConfig,
                                 SensorConfig, SlamConfig)
from veloslam_tpu.graph import loopclosure
from veloslam_tpu.io import simulate as sim
from veloslam_tpu.runtime.evaluate import ate, interpolate_positions
from veloslam_tpu.runtime.pipeline import SlamPipeline


def _write_drift_ins(paths, seq, drift_rate):
    """Corrupt the INS log with a linear lateral drift (m/s)."""
    from veloslam_tpu.io import packets as pkmod
    ins = pkmod.read_ins_txt(paths["ins"])
    ts = (ins["t_us"] - ins["t_us"][0]) * 1e-6
    drift = np.stack([np.zeros_like(ts), drift_rate * ts], -1)
    pkmod.write_ins_txt(paths["ins"], ins["t_us"], ins["pos_xy"] + drift,
                        np.deg2rad(ins["yaw_deg"]), speed=ins["speed"])


def test_batched_full_slam_tracks_truth(tmp_path):
    """run_offline_batched (device keyframe ring) reproduces the per-frame
    path's accuracy and produces keyframes + a tiled map."""
    seq = sim.generate_sequence(duration_s=2.0, model="hdl32", seed=5,
                                world=sim.World.demo(5))
    paths = sim.write_sequence(seq, str(tmp_path), name="f")
    cfg = SlamConfig(graph=GraphConfig(keyframe_translation_m=1.0))
    pipe = SlamPipeline(cfg)
    res = pipe.run_offline_batched(paths["pcap"], paths["ins"], batch=4096)
    assert res["n_frames"] >= 15
    assert res["n_keyframes"] >= 5
    assert res["map_patches"] >= 1
    ref = interpolate_positions(res["times_us"], seq["ins_t_us"],
                                seq["ins_pos"])
    m = ate(res["positions"][:, :2], ref[:, :2], align=False)
    assert m["rmse"] < 0.15, m
    # keyframe scans in the ring are real (enough valid points to verify)
    assert all(msk.sum() > 2000 for _, msk in pipe.keyframe_scans)


def test_descriptor_loop_closure_under_large_drift(tmp_path):
    """THE drift case position-based proposal provably misses: a loop
    drive whose INS (and therefore odometry prior) drifts ~18 m by the
    revisit.  Registration is disabled (0 GN iterations) so the odometry
    trajectory IS the drifted INS.  A position-only control run shows the
    radius channel closes nothing (drift > radius); with the scan-context
    channel enabled the device sweep inside run_offline_batched must close
    the true revisit and pull ATE down."""
    world = sim.World.demo(seed=7, extent=35.0, n_posts=36, n_walls=14)
    seq = sim.generate_sequence(
        duration_s=9.6, model="hdl32", seed=7, world=world,
        trajectory=sim.circle_trajectory(radius=12.0, speed=8.0))
    paths = sim.write_sequence(seq, str(tmp_path), name="loop")
    drift_rate = 2.0                     # m/s -> ~19 m at the revisit
    _write_drift_ins(paths, seq, drift_rate)

    def cfg(use_sc):
        return SlamConfig(
            registration=RegistrationConfig(max_iterations=0),  # INS odo
            graph=GraphConfig(keyframe_translation_m=2.0,
                              loop_closure_min_gap=12,
                              sc_min_score=0.55, use_scan_context=use_sc,
                              use_landmarks=False))

    # Control: position channel only.  Wrong pairs (spiraled estimates
    # within the radius) may be proposed but must be REJECTED by the
    # verifier; the drifted trajectory stays drifted.
    ctrl = SlamPipeline(cfg(use_sc=False))
    res0 = ctrl.run_offline_batched(paths["pcap"], paths["ins"],
                                    batch=4096)
    ref0 = interpolate_positions(res0["times_us"], seq["ins_t_us"],
                                 seq["ins_pos"])
    m_before = ate(res0["positions"][:, :2], ref0[:, :2], align=False)
    assert m_before["rmse"] > 5.0, m_before     # really drifted
    assert res0["n_closures"] == 0

    # The TRUE revisit pairs: keyframes whose ground-truth positions are
    # within 3 m but whose drifted estimates are far apart.  The position
    # channel (search over estimates) provably cannot propose them.
    _, t_kf = ctrl.graph.poses()
    kf_true = interpolate_positions(
        np.asarray(ctrl.keyframe_times, np.int64),
        seq["ins_t_us"], seq["ins_pos"])
    gap = 12
    K = len(t_kf)
    revisit = {(i, j) for i in range(K) for j in range(i + gap, K)
               if np.linalg.norm(kf_true[i, :2] - kf_true[j, :2]) < 3.0
               and np.linalg.norm(t_kf[i, :2] - t_kf[j, :2]) > 15.0}
    assert revisit, "fixture produced no drifted revisit"
    pos_cands = set(loopclosure.find_candidates(
        t_kf, radius=15.0, min_gap=gap))
    assert not (pos_cands & revisit), "position channel can't see these"

    # Scan-context enabled: the device sweep closes the revisit.
    pipe = SlamPipeline(cfg(use_sc=True))
    res2 = pipe.run_offline_batched(paths["pcap"], paths["ins"],
                                    batch=4096)
    assert res2["n_closures"] >= 1, "descriptor channel closed no loop"
    closed = set(pipe.closures)
    assert closed & revisit, (closed, revisit)
    ref2 = interpolate_positions(res2["times_us"], seq["ins_t_us"],
                                 seq["ins_pos"])
    m_after = ate(res2["positions"][:, :2], ref2[:, :2], align=False)
    # the solve must pull the loop substantially back toward truth
    assert m_after["rmse"] < 0.5 * m_before["rmse"], (m_before, m_after)
    # finalize() (landmark/residual pass) must not regress it
    res3 = pipe.finalize()
    ref3 = interpolate_positions(res3["times_us"], seq["ins_t_us"],
                                 seq["ins_pos"])
    m_fin = ate(res3["positions"][:, :2], ref3[:, :2], align=False)
    assert m_fin["rmse"] < 0.6 * m_before["rmse"], (m_before, m_fin)


def test_landmark_aided_finalize_beats_pose_only(tmp_path):
    """Pipeline-level landmark story (the unit version lives in
    tests/test_graph.py): posts extracted per keyframe become Schur-
    eliminated graph landmarks; on a drifted drive WITHOUT loop closures,
    the landmark-aided solve must beat the pose-only result."""
    rng = np.random.default_rng(4)
    n = 16
    posts = np.column_stack([rng.uniform(-10, 50, n),
                             rng.uniform(-14, 14, n),
                             np.full(n, 0.35), np.zeros(n),
                             np.full(n, 6.0)])
    world = sim.World.demo(seed=4, n_posts=0, n_walls=6, extent=45)
    world.posts = posts
    seq = sim.generate_sequence(
        duration_s=6.0, model="hdl32", seed=4, world=world,
        trajectory=sim.straight_trajectory(speed=6.0))
    paths = sim.write_sequence(seq, str(tmp_path), name="lm")
    _write_drift_ins(paths, seq, 0.5)          # 3 m of drift by the end

    def run(use_landmarks):
        cfg = SlamConfig(
            registration=RegistrationConfig(max_iterations=0),  # INS-only
            graph=GraphConfig(keyframe_translation_m=2.0,
                              use_scan_context=False,   # isolate landmarks
                              use_landmarks=use_landmarks,
                              # high position uncertainty (drifting INS)
                              odom_edge_info=(1e6,) * 3 + (1.0,) * 3))
        pipe = SlamPipeline(cfg)
        pipe.run_offline_batched(paths["pcap"], paths["ins"], batch=4096)
        res = pipe.finalize()
        ref = interpolate_positions(res["times_us"], seq["ins_t_us"],
                                    seq["ins_pos"])
        return res, ate(res["positions"][:, :2], ref[:, :2],
                        align=False)["rmse"]

    res_lm, ate_lm = run(True)
    res_po, ate_po = run(False)
    assert res_lm["n_landmarks"] >= 3, res_lm["n_landmarks"]
    assert res_lm["n_landmark_obs"] >= 2 * res_lm["n_landmarks"]
    assert res_po["n_landmarks"] == 0
    # pose-only has no information to correct drift; landmarks do
    assert ate_lm < 0.7 * ate_po, (ate_lm, ate_po)
