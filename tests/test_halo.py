"""Halo exchange: boundary voxels from ring neighbors make spatially-
sharded queries correct at shard edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veloslam_tpu.config import MeshConfig
from veloslam_tpu.parallel import halo
from veloslam_tpu.parallel import mesh as mesh_mod
from veloslam_tpu.registration import gicp
from veloslam_tpu.registration import voxel as vx


@pytest.fixture(scope="module")
def mesh4():
    assert len(jax.devices()) >= 4
    return mesh_mod.make_mesh(MeshConfig(data_axis=1, map_axis=4))


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
