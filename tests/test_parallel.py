"""Multi-device tests on the 8-way virtual CPU mesh (conftest forces
--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veloslam_tpu.config import MeshConfig
from veloslam_tpu.core import se3
from veloslam_tpu.decode import calibration
from veloslam_tpu.decode.decode import DeviceCalib, decode_packets
from veloslam_tpu.graph.posegraph import PoseGraph
from veloslam_tpu.io import packets as pk
from veloslam_tpu.io import simulate as sim
from veloslam_tpu.parallel import mesh as mesh_mod
from veloslam_tpu.parallel import sharded
from veloslam_tpu.registration import gicp

from test_graph import _noisy_circle_graph  # noqa: E402
from test_registration import _pad, _static_scan  # noqa: E402


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return mesh_mod.make_mesh(MeshConfig(data_axis=2, map_axis=4))


@pytest.fixture(scope="module")
def world():
    return sim.World.demo(seed=5, n_posts=30, n_walls=10)


@pytest.mark.slow
def test_sharded_register_matches_single_device(mesh8, world):
    """Map-sharded registration must agree with the single-device solver."""
    tgt = _static_scan(world, np.array([0.0, 0.0, 2.0]), 0.0)
    t_gt = np.array([0.1, 0.4, 0.03], np.float32)
    src = _static_scan(world, np.array([0.0, 0.0, 2.0]) + t_gt,
                       np.deg2rad(2.0))
    P = 32768
    tp, tm = _pad(tgt, P)
    sp, sm = _pad(src, P)
    grid = gicp.build_plane_grid(tp, tm, np.zeros(3), 1.0, capacity=8192)

    res_single = gicp.register(sp, sm, grid, se3.Pose.identity(),
                               iterations=16)
    # place grid rows across the "map" axis
    from jax.sharding import NamedSharding
    specs = sharded.plane_grid_specs("map")
    grid_sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh8, s)), grid, specs)
    res_sharded = sharded.register_sharded(mesh8, sp, sm, grid_sharded,
                                           se3.Pose.identity(),
                                           iterations=16)
    np.testing.assert_allclose(np.asarray(res_sharded.pose.t),
                               np.asarray(res_single.pose.t), atol=2e-3)
    assert int(res_sharded.n_matched) == int(res_single.n_matched)
    np.testing.assert_allclose(np.asarray(res_sharded.pose.t), t_gt,
                               atol=0.05)


def test_sharded_register_matches_production_schedule(mesh8, world):
    """Regression for VERDICT r3 weak #1: the sharded kernel must honor
    the PRODUCTION association schedule (use_dense_index=True,
    reassociate_every=8) and agree with the single-device path under it —
    the r3 MULTICHIP red gate was exactly this drift (kernel re-associated
    every iteration while the oracle held correspondences for 8)."""
    from veloslam_tpu.config import RegistrationConfig
    rc = RegistrationConfig()
    assert rc.use_dense_index and rc.reassociate_every == 8, \
        "production defaults moved — update this test AND the kernels"
    tgt = _static_scan(world, np.array([0.0, 0.0, 2.0]), 0.0)
    t_gt = np.array([0.15, 0.3, 0.02], np.float32)
    src = _static_scan(world, np.array([0.0, 0.0, 2.0]) + t_gt,
                       np.deg2rad(1.5))
    P = 32768
    tp, tm = _pad(tgt, P)
    sp, sm = _pad(src, P)
    grid = gicp.build_plane_grid(tp, tm, np.zeros(3), 1.0, capacity=8192)

    from veloslam_tpu.registration import voxel as vx
    dense = vx.build_dense_index(grid.grid)
    res_single = gicp.register(
        sp, sm, grid, se3.Pose.identity(), iterations=rc.max_iterations,
        dense=dense, reassociate_every=rc.reassociate_every,
        dense_approx_centers=False)
    from jax.sharding import NamedSharding
    specs = sharded.plane_grid_specs("map")
    grid_sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh8, s)), grid, specs)
    res_sharded = sharded.register_sharded(
        mesh8, sp, sm, grid_sharded, se3.Pose.identity(),
        iterations=rc.max_iterations,
        reassociate_every=rc.reassociate_every,
        use_dense=rc.use_dense_index)
    np.testing.assert_allclose(np.asarray(res_sharded.pose.t),
                               np.asarray(res_single.pose.t), atol=2e-3)
    np.testing.assert_allclose(np.asarray(res_sharded.pose.t), t_gt,
                               atol=0.05)


def test_sharded_decode_matches_single(mesh8):
    seq = sim.generate_sequence(duration_s=0.1, model="hdl32", seed=2)
    pkts = seq["packets"][:64]
    cal = DeviceCalib.from_host(calibration.hdl32())
    xyz_sharded = sharded.decode_packets_sharded(
        mesh8, jnp.asarray(pkts), cal, model="hdl32")
    xyz_single = decode_packets(jnp.asarray(pkts), cal, model="hdl32").xyz
    np.testing.assert_allclose(np.asarray(xyz_sharded),
                               np.asarray(xyz_single), atol=1e-5)


def test_sharded_graph_step_matches_single(mesh8):
    rng = np.random.default_rng(3)
    g, true = _noisy_circle_graph(rng, n=24, drift=0.03, yaw_drift=0.01,
                                  max_poses=32, max_edges=64)
    from veloslam_tpu.graph.posegraph import relative_pose_measurement
    rel_q, rel_t = relative_pose_measurement(true[23], true[0])
    g.add_edge(23, 0, rel_q, rel_t, info=(1000.0,) * 6)
    arrays = g.arrays()

    from veloslam_tpu.graph import optimize
    single, _ = optimize.solve(arrays, max_poses=g.K, iterations=1)
    stepped, cost = sharded.solve_graph_step_sharded(mesh8, arrays,
                                                     max_poses=g.K)
    np.testing.assert_allclose(np.asarray(stepped.t), np.asarray(single.t),
                               atol=1e-3)
    assert float(cost) > 0


def test_compiled_programs_are_cached(mesh8):
    """Same (mesh, statics) must return the SAME compiled callable —
    rebuilding per call would make jax.jit recompile every invocation."""
    from veloslam_tpu.parallel import halo
    assert sharded._register_program(mesh8, 8, 1e-6, 0.5, 2.0, 8, True) \
        is sharded._register_program(mesh8, 8, 1e-6, 0.5, 2.0, 8, True)
    assert sharded._decode_program(mesh8, "hdl32", 8) is \
        sharded._decode_program(mesh8, "hdl32", 8)
    assert sharded._graph_step_program(mesh8, 32, 1e-4, 1e6) is \
        sharded._graph_step_program(mesh8, 32, 1e-4, 1e6)
    assert halo._halo_register_program(mesh8, "map", 8, 1e-6, 0.5, 2.0,
                                       64, 1) is \
        halo._halo_register_program(mesh8, "map", 8, 1e-6, 0.5, 2.0, 64, 1)
    # different statics miss
    assert sharded._register_program(mesh8, 8, 1e-6, 0.5, 2.0, 8, True) \
        is not sharded._register_program(mesh8, 16, 1e-6, 0.5, 2.0, 8, True)


@pytest.mark.slow
def test_sharded_graph_solve_matches_host(mesh8):
    """Full distributed Gauss-Newton (edges + landmark observations
    sharded, Schur over psum) must match the host solvers — the
    production session's _solve_graph path (BASELINE configs[3])."""
    rng = np.random.default_rng(11)
    g, true = _noisy_circle_graph(rng, n=24, drift=0.04, yaw_drift=0.01,
                                  max_poses=32, max_edges=64)
    from veloslam_tpu.graph.posegraph import relative_pose_measurement
    rel_q, rel_t = relative_pose_measurement(true[23], true[0])
    g.add_edge(23, 0, rel_q, rel_t, info=(1000.0,) * 6)
    # a few landmarks observed from several poses
    for lx, ly in ((5.0, 8.0), (30.0, 20.0), (15.0, 35.0)):
        li = g.add_landmark(np.array([lx, ly, 1.0], np.float32))
        for k in range(0, 24, 3):
            z = se3.apply(se3.inverse(true[k]),
                          jnp.asarray([lx, ly, 1.0], jnp.float32))
            g.add_observation(k, li, np.asarray(z), info=8.0)
    arrays = g.arrays()

    from veloslam_tpu.graph import optimize
    host, _ = optimize.solve_with_landmarks(
        arrays, max_poses=g.K, max_landmarks=g.M, iterations=6)
    from jax.sharding import NamedSharding
    dev = jax.tree.map(
        lambda a, sp: jax.device_put(np.asarray(a),
                                     NamedSharding(mesh8, sp)),
        arrays, sharded._graph_specs())
    dist, _ = sharded.solve_graph_sharded(
        mesh8, dev, max_poses=g.K, max_landmarks=g.M, iterations=6,
        with_landmarks=True)
    np.testing.assert_allclose(np.asarray(dist.t), np.asarray(host.t),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(dist.l_pos),
                               np.asarray(host.l_pos), atol=1e-3)
    # pose-only variant too
    host2, _ = optimize.solve(arrays, max_poses=g.K, iterations=6)
    dist2, _ = sharded.solve_graph_sharded(
        mesh8, dev, max_poses=g.K, iterations=6)
    np.testing.assert_allclose(np.asarray(dist2.t), np.asarray(host2.t),
                               atol=1e-3)
