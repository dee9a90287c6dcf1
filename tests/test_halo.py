"""Halo exchange: boundary voxels from ring neighbors make spatially-
sharded queries correct at shard edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from veloslam_tpu.config import MeshConfig
from veloslam_tpu.core import se3
from veloslam_tpu.parallel import halo
from veloslam_tpu.parallel import mesh as mesh_mod
from veloslam_tpu.registration import gicp
from veloslam_tpu.registration import voxel as vx


@pytest.fixture(scope="module")
def mesh4():
    assert len(jax.devices()) >= 4
    return mesh_mod.make_mesh(MeshConfig(data_axis=1, map_axis=4))


def _scene(rng, n_per=24):
    """Plane-rich clusters spanning a wide x range (many shard
    boundaries in the sorted key table)."""
    pts = []
    for x in range(-60, 60, 1):
        base = np.array([x + 0.5, 0.5, 0.5])
        pts.append(base + rng.normal(0, 0.1, (n_per, 3))
                   * [0.25, 0.25, 0.02])
        # vertical wall slabs every 8 m constrain x and z
        if x % 8 == 0:
            base = np.array([x + 0.5, 4.0, 1.0])
            pts.append(base + rng.normal(0, 0.1, (n_per, 3))
                       * [0.02, 0.3, 0.3])
    return np.concatenate(pts).astype(np.float32)


@pytest.mark.slow
def test_register_halo_sharded_matches_unsharded(mesh4):
    """Production path: points routed by key-range ownership + haloed map
    shards reproduce the single-device GICP result."""
    rng = np.random.default_rng(1)
    pts = _scene(rng)
    P = 1 << int(np.ceil(np.log2(len(pts))))
    pad = np.zeros((P, 3), np.float32)
    msk = np.zeros(P, bool)
    pad[:len(pts)] = pts
    msk[:len(pts)] = True
    target = gicp.build_plane_grid(jnp.asarray(pad), jnp.asarray(msk),
                                   np.zeros(3), 1.0, capacity=1024)

    # source scan: the scene observed under a small SE(3) offset
    T = se3.Pose(se3.quat_from_axis_angle(
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(0.02)),
        jnp.asarray([0.2, -0.15, 0.05]))
    src = np.asarray(se3.apply(T, jnp.asarray(pad)))
    oracle = gicp.register(jnp.asarray(src), jnp.asarray(msk), target,
                           se3.Pose.identity(), iterations=12)

    n_shards = 4
    specs = halo._plane_specs("map")
    tgt_sh = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh4, s)),
        target, specs)
    table_keys = np.asarray(target.grid.keys)
    # 2x: routing happened at the prior pose; the correction can move a
    # point's own voxel ±1, doubling the worst-case key distance.
    h = 2 * halo.required_halo(table_keys, n_shards) + 16
    p_r, m_r = halo.partition_points_by_key_ranges(
        table_keys, src, msk, np.zeros(3), 1.0, n_shards)
    res = halo.register_halo_sharded(
        mesh4, jnp.asarray(p_r), jnp.asarray(m_r), tgt_sh,
        se3.Pose.identity(), iterations=12, halo=h)

    assert int(res.n_matched) == int(oracle.n_matched)
    np.testing.assert_allclose(np.asarray(res.pose.t),
                               np.asarray(oracle.pose.t), atol=1e-3)
    qdot = abs(float(np.sum(np.asarray(res.pose.q)
                            * np.asarray(oracle.pose.q))))
    assert qdot > 1.0 - 1e-6
    # and both recover the injected offset
    rec = se3.compose(se3.Pose(res.pose.q, res.pose.t), T)
    np.testing.assert_allclose(np.asarray(rec.t), 0.0, atol=0.05)


def test_halo_exchange_fixes_boundary_lookups(mesh4):
    rng = np.random.default_rng(0)
    # Dense plane-like clusters along x so the sorted key table spans a
    # wide contiguous x range; 4 shards → 3 interior boundaries.
    pts = []
    for x in range(-60, 60, 1):
        base = np.array([x + 0.5, 0.5, 0.5])
        pts.append(base + rng.normal(0, 0.1, (24, 3)) * [0.25, 0.25, 0.02])
    pts = np.concatenate(pts).astype(np.float32)
    P = 4096
    pad = np.zeros((P, 3), np.float32)
    msk = np.zeros(P, bool)
    pad[:len(pts)] = pts[:P]
    msk[:min(len(pts), P)] = True
    target = gicp.build_plane_grid(jnp.asarray(pad), jnp.asarray(msk),
                                   np.zeros(3), 1.0, capacity=1024)

    # Shard the table rows over the map axis.
    from jax.sharding import NamedSharding, PartitionSpec as Pspec
    specs = halo._plane_specs("map")
    tgt_sh = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh4, s)),
        target, specs)

    extended = halo.exchange_and_extend(mesh4, tgt_sh)
    # Every shard gained 2*HALO rows.
    assert extended.grid.keys.shape[0] == \
        target.grid.keys.shape[0] + 2 * halo.HALO * 4

    # Query points sitting at shard key-range boundaries, assigned to the
    # *lower* shard: without halos the +1-x neighbor voxel is missing.
    keys = np.asarray(target.grid.keys)
    occ = keys != 2**31 - 1
    n_rows = len(keys)
    per = n_rows // 4
    qpts = np.zeros((4 * 64, 3), np.float32)
    qmask = np.zeros(4 * 64, bool)
    means = np.asarray(target.grid.mean)
    for shard in range(3):
        # last occupied voxel of this shard's range
        rows = np.arange(shard * per, (shard + 1) * per)
        rows = rows[occ[rows]]
        if len(rows) == 0:
            continue
        edge = rows[-1]
        qpts[shard * 64] = means[edge]          # on the boundary voxel
        qmask[shard * 64] = True

    ext_mu, ext_hit = halo.sharded_query_local(
        mesh4, extended, jnp.asarray(qpts), jnp.asarray(qmask))
    # All boundary queries hit through the extended shard tables, and the
    # matched voxel mean agrees with the unsharded nearest lookup.
    full_idx = np.asarray(vx.lookup_nearest(
        target.grid, jnp.asarray(qpts), jnp.asarray(qmask), target.usable))
    hits = np.asarray(ext_hit)
    for shard in range(3):
        k = shard * 64
        if not qmask[k]:
            continue
        assert hits[k], f"boundary query on shard {shard} missed"
        if full_idx[k] >= 0:
            np.testing.assert_allclose(np.asarray(ext_mu)[k],
                                       means[full_idx[k]], atol=1e-5)


def test_required_halo_covers_gap_voxel_queries():
    """ADVICE r2: a query can sit in an UNOCCUPIED voxel in the key gap
    spanning a shard boundary — routing assigns keys in
    [left_last+1, right_first) to the left shard, so its probes reach up
    to right_first-1+stride.  The band must be bounded from the gap
    endpoints, not from occupied keys only."""
    bits = 10
    stride = 1 << (2 * bits)
    # Boundary at row 4: left_last = 8, right_first = stride + 200 — the
    # gap spans a whole x-plane, so LEFT-shard queries exist at gap keys
    # up to stride+199 whose +x probes reach up to 2*stride+199.
    keys = np.array([5, 6, 7, 8,
                     stride + 200, 2 * stride + 100, 2 * stride + 199,
                     4 * stride], np.int64)
    need = halo.required_halo(keys, 2, bits=bits)
    # A gap query at key stride+199 (left shard: < right_first) probes +x
    # at 2*stride+199 — the 3rd row of the right half.  The pre-fix
    # occupied-keys-only bound (left_last + stride = stride + 8) covered
    # ZERO right-head rows.
    assert need >= 3


def test_exchange_clamp_warns(mesh4):
    """Requesting a halo wider than rows-per-shard is clamped WITH a
    warning instead of silently degrading (ADVICE r2)."""
    rng = np.random.default_rng(2)
    pts = _scene(rng)
    P = 1 << int(np.ceil(np.log2(len(pts))))
    pad = np.zeros((P, 3), np.float32)
    msk = np.zeros(P, bool)
    pad[:len(pts)] = pts
    msk[:len(pts)] = True
    target = gicp.build_plane_grid(jnp.asarray(pad), jnp.asarray(msk),
                                   np.zeros(3), 1.0, capacity=1024)
    from jax.sharding import NamedSharding
    specs = halo._plane_specs("map")
    tgt_sh = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh4, s)),
        target, specs)
    per = target.grid.keys.shape[0] // 4
    with pytest.warns(RuntimeWarning, match="clamped"):
        halo.exchange_and_extend(mesh4, tgt_sh, halo=per + 100)
    # halo_is_exact reflects the clamp
    keys = np.asarray(target.grid.keys)
    assert halo.halo_is_exact(keys, 4, halo.required_halo(keys, 4))
    assert not halo.halo_is_exact(keys, 4, 0)


def test_host_router_matches_device_pack_precision():
    """ADVICE r2: the host router floors the quotient in float32 to match
    voxel.pack_keys device semantics — a coordinate that rounds
    differently across precisions must not be routed off-shard."""
    # 4.8 / 0.1 in float64 floors to 47 (4.8/0.1 = 47.999...9); in
    # float32 the quotient rounds to exactly 48.0.
    pts = np.array([[4.8, 0.05, 0.05]], np.float32)
    msk = np.ones(1, bool)
    dev = np.asarray(vx.pack_keys(
        jnp.asarray(pts), jnp.asarray(msk), jnp.zeros(3),
        jnp.asarray(0.1, jnp.float32)))
    host = halo._pack_keys_np(pts, msk, np.zeros(3), 0.1)
    assert int(host[0]) == int(dev[0])
