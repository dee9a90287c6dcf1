import numpy as np
import pytest

from veloslam_tpu.decode import calibration
from veloslam_tpu.runtime.evaluate import ate, rpe, umeyama_align
from veloslam_tpu.utils import dumps
from veloslam_tpu.utils.profiling import StageTimers


def test_calibration_xml_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    cal = calibration.LaserCalib(
        rot_correction_deg=rng.normal(0, 3, 32),
        vert_correction_deg=np.linspace(-30, 10, 32),
        dist_correction_m=rng.normal(0, 0.1, 32),
        vert_offset_m=rng.normal(0, 0.2, 32),
        horiz_offset_m=rng.normal(0, 0.05, 32))
    path = str(tmp_path / "calib.xml")
    calibration.to_xml(cal, path)
    back = calibration.from_xml(path)
    assert back.n_lasers == 32
    for field in cal._fields:
        np.testing.assert_allclose(getattr(back, field),
                                   getattr(cal, field), rtol=1e-12)


def test_beam_order():
    cal = calibration.hdl32()
    order = cal.beam_order()
    sorted_vert = cal.vert_correction_deg[order]
    assert np.all(np.diff(sorted_vert) > 0)
    assert sorted_vert[0] == -30.67 and sorted_vert[-1] == 10.67


def test_umeyama_alignment_recovers_transform():
    rng = np.random.default_rng(1)
    ref = rng.normal(0, 10, (50, 3))
    ang = 0.7
    R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t_true = np.array([3.0, -2.0, 1.0])
    est = (ref - t_true) @ R_true          # est = R⁻¹(ref − t)
    R, t, s = umeyama_align(est, ref)
    np.testing.assert_allclose(R, R_true, atol=1e-10)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    m = ate(est, ref, align=True)
    assert m["rmse"] < 1e-9
    m2 = ate(est, ref, align=False)
    assert m2["rmse"] > 1.0


def test_rpe_detects_scale_drift():
    ref = np.stack([np.arange(20.0), np.zeros(20), np.zeros(20)], -1)
    est = ref * 1.1                          # 10% odometry scale error
    m = rpe(est, ref, delta=1)
    np.testing.assert_allclose(m["mean"], 0.1, atol=1e-9)


def test_dumps_roundtrip(tmp_path):
    frame = {
        "xyz": np.array([[[1.0, 2.0, 0.5], [3.0, -1.0, 0.1]],
                         [[0.0, 0.0, 0.0], [5.0, 5.0, 1.0]]], np.float32),
        "mask": np.array([[True, True], [False, True]]),
        "intensity": np.array([[100.0, 200.0], [0.0, 50.0]], np.float32),
    }
    n = dumps.dump_txt(frame, str(tmp_path / "f.txt"))
    assert n == 3
    rows = np.loadtxt(str(tmp_path / "f.txt"))
    assert rows.shape == (3, 4)
    n = dumps.dump_pcd(frame, str(tmp_path / "f.pcd"))
    content = open(tmp_path / "f.pcd").read()
    assert "POINTS 3" in content and content.count("\n") >= 13
    img = dumps.bev_image(frame, range_m=10, px_per_m=2)
    assert img.shape == (40, 40) and img.max() > 0
    out = dumps.dump_bev(frame, str(tmp_path / "bev"))
    import os
    assert os.path.exists(out)


def test_stage_timers():
    t = StageTimers()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert "a" in t.report()


def test_pipeline_finalize_rebuilds_map(tmp_path):
    """finalize() after closures must produce a map consistent with the
    optimized keyframe poses."""
    import jax.numpy as jnp

    from veloslam_tpu.config import SlamConfig, GraphConfig
    from veloslam_tpu.core import se3
    from veloslam_tpu.runtime.pipeline import SlamPipeline

    pipe = SlamPipeline(SlamConfig(graph=GraphConfig(
        keyframe_translation_m=0.1)))
    # fabricate keyframes directly: two scans of a tiny synthetic cloud
    rng = np.random.default_rng(0)
    pts = np.zeros((1024, 3), np.float32)
    pts[:512] = rng.uniform(-5, 5, (512, 3))
    mask = np.zeros(1024, bool)
    mask[:512] = True
    for k in range(3):
        pose = se3.Pose(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                        jnp.asarray([k * 2.0, 0, 0], jnp.float32))
        pipe.graph.add_pose(np.asarray(pose.q), np.asarray(pose.t))
        pipe.keyframe_scans.append((pts, mask))
        pipe.keyframe_times.append(k)
    pipe.rebuild_map()
    assert pipe.map.n_patches >= 1
    roi = pipe.map.roi_grid(2.0, 0.0)
    assert roi is not None
    assert int(np.asarray(roi.occupied).sum()) > 50


def test_bev_viewer_artifact(tmp_path):
    """utils.viewer writes a self-contained HTML artifact with valid
    embedded JSON (the headless SLAMViewer replacement)."""
    import json
    import re

    import numpy as np

    from veloslam_tpu.utils.viewer import write_bev_html

    res = {
        "times_us": np.arange(5, dtype=np.int64) * 100000 + 10**15,
        "positions": np.stack([np.arange(5.0), np.zeros(5),
                               np.zeros(5)], -1),
        "keyframe_positions": np.array([[0.0, 0, 0], [4.0, 0, 0]]),
        "n_frames": 5, "n_keyframes": 2, "n_closures": 1,
        "registered_fraction": 1.0, "map_patches": 3,
    }
    path = write_bev_html(str(tmp_path / "bev.html"), res,
                          ins_xy=np.array([[0.0, 0], [4.0, 0.1]]),
                          landmarks_xy=np.array([[1.0, 2.0]]),
                          occupancy_xy=np.array([[0.5, 0.5], [1.5, 0.5]]),
                          closures=[(0, 1)])
    html = open(path).read()
    d = re.search(r"const D = (\{.*?\});\n", html, re.S)
    data = json.loads(d.group(1))
    assert len(data["traj"]) == 5
    assert data["traj"][-1]["x"] == 4.0
    assert data["traj"][-1]["t"] == 0.4      # rebased to stream start
    assert data["kf"] == [[0.0, 0.0], [4.0, 0.0]]
    assert data["closures"] == [[0, 1]]
    assert data["stats"]["registered"] == 1.0
    # artifact is self-contained: no external resource references
    assert "http://" not in html and "https://" not in html
