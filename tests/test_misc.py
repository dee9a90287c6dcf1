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


def test_real_veloview_db_xml_fixture(tmp_path):
    """Parse a VeloView-style db.xml with boost-serialization noise the
    reference's loader tolerates (class_id/tracking_level/version
    attributes, extra per-laser fields like minIntensity_) — not just our
    own writer's output (reference HDLParser.cxx:771-858)."""
    import numpy as np

    from veloslam_tpu.decode import calibration

    rng = np.random.default_rng(5)
    vert = np.concatenate([np.linspace(2.0, -8.33, 32),
                           np.linspace(-8.83, -24.33, 32)])
    rot = rng.uniform(-3, 3, 64)
    dist_cm = rng.uniform(100, 160, 64)      # centimeters in the file
    voff_cm = rng.uniform(19, 22, 64)
    hoff_cm = rng.uniform(-3, 3, 64)

    items = []
    for i in range(64):
        items.append(f"""
      <item class_id="3" tracking_level="0" version="1">
        <px class_id="4" tracking_level="1" version="0" object_id="_{i}">
          <id_>{i}</id_>
          <rotCorrection_>{rot[i]:.6f}</rotCorrection_>
          <vertCorrection_>{vert[i]:.6f}</vertCorrection_>
          <distCorrection_>{dist_cm[i]:.6f}</distCorrection_>
          <distCorrectionX_>{dist_cm[i] + 1:.6f}</distCorrectionX_>
          <distCorrectionY_>{dist_cm[i] + 2:.6f}</distCorrectionY_>
          <vertOffsetCorrection_>{voff_cm[i]:.6f}</vertOffsetCorrection_>
          <horizOffsetCorrection_>{hoff_cm[i]:.6f}</horizOffsetCorrection_>
          <focalDistance_>0</focalDistance_>
          <focalSlope_>0</focalSlope_>
          <minIntensity_>0</minIntensity_>
          <maxIntensity_>255</maxIntensity_>
        </px>
      </item>""")
    enabled = "\n".join("<item>1</item>" for _ in range(64))
    xml = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes" ?>
<!DOCTYPE boost_serialization>
<boost_serialization signature="serialization::archive" version="9">
  <DB class_id="0" tracking_level="1" version="1" object_id="_0">
    <distLSB_>0.2</distLSB_>
    <points_ class_id="2" tracking_level="0" version="0">
      <count>64</count>
      <item_version>1</item_version>
      {''.join(items)}
    </points_>
    <enabled_>
      <count>64</count>
      {enabled}
    </enabled_>
  </DB>
</boost_serialization>"""
    path = str(tmp_path / "db.xml")
    open(path, "w").write(xml)

    cal = calibration.from_xml(path)
    assert cal.n_lasers == 64
    np.testing.assert_allclose(cal.vert_correction_deg, vert, atol=1e-5)
    np.testing.assert_allclose(cal.rot_correction_deg, rot, atol=1e-5)
    # centimeter fields converted to meters (HDLParser.cxx:837-839)
    np.testing.assert_allclose(cal.dist_correction_m, dist_cm / 100.0,
                               atol=1e-7)
    np.testing.assert_allclose(cal.vert_offset_m, voff_cm / 100.0,
                               atol=1e-7)
    # beam re-sort LUT orders bottom->top across both blocks
    order = cal.beam_order()
    assert np.all(np.diff(cal.vert_correction_deg[order]) >= 0)

    # decode an HDL-64 packet through this calibration: the distance
    # correction must shift ranges by exactly dist_correction_m
    import jax.numpy as jnp

    from veloslam_tpu import constants as C
    from veloslam_tpu.decode.decode import DeviceCalib, decode_packets
    from veloslam_tpu.io import packets as pk

    az = np.zeros((1, 12), np.uint32)
    block_ids = np.tile(np.array([[C.BLOCK_ID_0_TO_31,
                                   C.BLOCK_ID_32_TO_63]], np.uint32),
                        (1, 6))
    dist_raw = np.full((1, 12, 32), 5000, np.uint32)   # 10 m nominal
    inten = np.full((1, 12, 32), 100, np.uint32)
    pkt = pk.encode_lidar_packets(az, dist_raw, inten,
                                  np.array([0], np.uint32), block_ids)
    dec = decode_packets(jnp.asarray(pkt), DeviceCalib.from_host(cal),
                         model="hdl64")
    rng_m = np.asarray(dec.dist_m)[0]                  # (12, 32)
    # upper-block firing 0 uses lasers 0..31; lower-block firing 1 32..63
    np.testing.assert_allclose(rng_m[0], 10.0 + dist_cm[:32] / 100.0,
                               rtol=1e-6)
    np.testing.assert_allclose(rng_m[1], 10.0 + dist_cm[32:] / 100.0,
                               rtol=1e-6)
