import numpy as np
import jax.numpy as jnp

from veloslam_tpu.core import se3
from veloslam_tpu.core.timeline import Timeline, PoseTrack, interpolate_poses


def test_timeline_add_and_query():
    tl = Timeline(("x",))
    for i in range(10):
        tl.add(i * 1000, x=np.array([float(i)]))
    times, vals = tl.arrays()
    assert times.tolist() == [i * 1000 for i in range(10)]
    assert tl.nearest(4400) == 4
    assert tl.nearest(4600) == 5
    lo, hi = tl.bracket(np.array([2500]))
    assert (lo[0], hi[0]) == (2, 3)
    # out-of-range brackets clamp to single-sided
    lo, hi = tl.bracket(np.array([-5, 99999]))
    assert (lo[0], hi[0]) == (0, 0)
    assert (lo[1], hi[1]) == (9, 9)
    sl = tl.range_between(2000, 5000)
    assert times[sl].tolist() == [2000, 3000, 4000]


def test_timeline_out_of_order_and_duplicates():
    tl = Timeline(("x",))
    tl.add(5, x=1.0)
    tl.add(3, x=2.0)
    tl.add(5, x=9.0)   # overwrite after sort keeps the later value
    times, vals = tl.arrays()
    assert times.tolist() == [3, 5]
    assert vals["x"].tolist() == [2.0, 9.0]


def test_timeline_save_load(tmp_path):
    tl = Timeline(("a", "b"))
    tl.add(1, a=np.ones(3), b=2.0)
    tl.add(2, a=np.zeros(3), b=3.0)
    p = str(tmp_path / "tl.npz")
    tl.save(p)
    tl2 = Timeline.load(p)
    t2, v2 = tl2.arrays()
    assert t2.tolist() == [1, 2]
    np.testing.assert_allclose(v2["a"], [[1, 1, 1], [0, 0, 0]])


def test_interpolate_poses_midpoint():
    # Straight-line motion east at 2 m/s with a 90° yaw over 1 s.
    rel = jnp.array([0.0, 1.0], jnp.float32)
    q = jnp.stack([se3.euler_deg_to_quat(0.0, 0.0, 0.0),
                   se3.euler_deg_to_quat(0.0, 0.0, 90.0)])
    t = jnp.array([[0, 0, 0], [2, 0, 0]], jnp.float32)
    v = jnp.array([[2, 0, 0], [2, 0, 0]], jnp.float32)
    out = interpolate_poses(rel, q, t, v, jnp.array([0.5], jnp.float32))
    np.testing.assert_allclose(np.asarray(out.t[0]), [1, 0, 0], atol=1e-6)
    expect_q = np.asarray(se3.euler_deg_to_quat(0.0, 0.0, 45.0))
    got = np.asarray(out.q[0])
    assert min(np.linalg.norm(got - expect_q), np.linalg.norm(got + expect_q)) < 1e-5


def test_interpolate_poses_extrapolation():
    rel = jnp.array([0.0, 1.0], jnp.float32)
    q = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], jnp.float32), (2, 4))
    t = jnp.array([[0, 0, 0], [1, 0, 0]], jnp.float32)
    v = jnp.array([[1, 0, 0], [1, 0, 0]], jnp.float32)
    out = interpolate_poses(rel, q, t, v,
                            jnp.array([-0.5, 1.5], jnp.float32))
    np.testing.assert_allclose(np.asarray(out.t),
                               [[-0.5, 0, 0], [1.5, 0, 0]], atol=1e-6)


def test_pose_track_window():
    pt = PoseTrack()
    for i in range(100):
        pt.add(1_000_000 * i, q=np.array([1.0, 0, 0, 0]),
               t=np.array([i, 0.0, 0.0]))
    w = pt.window(10_000_000, 20_000_000, anchor_us=10_000_000)
    assert w["rel_s"][0] <= 0.0 <= w["rel_s"][-1] - 9.9
    assert w["q"].dtype == np.float32
    # pad extends beyond the strict range
    assert len(w["rel_s"]) >= 13
