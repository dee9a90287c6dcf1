"""Cross-shard halo exchange for spatially-sharded correspondence search.

The default distributed registration (parallel.sharded) replicates the
scan and shards the map — no halos needed, collective traffic is 42
floats/iteration.  That is the right trade at LiDAR-scan scale.  This
module implements the complementary pattern for when the *queries* are
also sharded (giant multi-sensor sweeps, map-maintenance passes over
billions of points): each device owns a contiguous key range of the
sorted voxel table, and the ±1-voxel neighbor lookups of points near a
range boundary need the neighbor shard's edge voxels.  A ring `ppermute`
sends each shard's boundary band to its neighbors once per target build —
the SLAM-shaped analog of ring-attention block exchange (SURVEY.md §5
long-context).

Shards stay fixed-capacity: the local table (V/D rows) is augmented with
two HALO-row bands received from the left and right ring neighbors.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from veloslam_tpu.registration import voxel as vx
from veloslam_tpu.registration.gicp import PlaneGrid

HALO = 256          # boundary rows exchanged per side


class HaloedShard(NamedTuple):
    """A shard's local voxel rows + neighbor boundary bands, re-sorted."""

    grid: vx.VoxelGrid
    normal: jax.Array
    usable: jax.Array


def exchange_and_extend(mesh: Mesh, target: PlaneGrid, axis: str = "map"
                        ) -> PlaneGrid:
    """Given a row-sharded PlaneGrid, return one whose every shard also
    contains its ring neighbors' boundary bands (capacity grows by
    2·HALO rows per shard).

    After this, a point whose voxel lies within HALO rows of a shard
    boundary finds its ±1-neighbor voxels locally — queries can then be
    sharded by key range instead of replicated.
    """

    specs_in = _plane_specs(axis)
    specs_out = _plane_specs(axis)

    @functools.partial(shard_map, mesh=mesh, in_specs=(specs_in,),
                       out_specs=specs_out, check_vma=False)
    def f(shard: PlaneGrid) -> PlaneGrid:
        g = shard.grid
        n_dev = jax.lax.axis_size(axis)

        def band(lo: bool):
            sl = slice(0, HALO) if lo else slice(-HALO, None)
            return (g.keys[sl], g.count[sl], g.mean[sl], g.cov[sl],
                    shard.normal[sl], shard.usable[sl])

        # Send my low band to the left neighbor (they extend upward) and
        # my high band to the right neighbor.
        right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        from_left = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis, right), band(False))
        from_right = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis, left), band(True))

        # Ring wrap: shard 0's "left neighbor" is the last shard — its
        # keys are all larger, harmless (sorted-merge keeps correctness,
        # lookups simply never match them).  Concatenate and re-sort.
        keys = jnp.concatenate([from_left[0], g.keys, from_right[0]])
        count = jnp.concatenate([from_left[1], g.count, from_right[1]])
        mean = jnp.concatenate([from_left[2], g.mean, from_right[2]])
        cov = jnp.concatenate([from_left[3], g.cov, from_right[3]])
        normal = jnp.concatenate([from_left[4], shard.normal,
                                  from_right[4]])
        usable = jnp.concatenate([from_left[5], shard.usable,
                                  from_right[5]])
        order = jnp.argsort(keys)
        new_grid = vx.VoxelGrid(
            keys=keys[order], count=count[order], mean=mean[order],
            cov=cov[order], origin=g.origin, voxel_size=g.voxel_size)
        return PlaneGrid(grid=new_grid, normal=normal[order],
                         usable=usable[order])

    return f(target)


def _plane_specs(axis: str) -> PlaneGrid:
    return PlaneGrid(
        grid=vx.VoxelGrid(keys=P(axis), count=P(axis), mean=P(axis),
                          cov=P(axis), origin=P(), voxel_size=P()),
        normal=P(axis), usable=P(axis))


def sharded_query_local(mesh: Mesh, extended: PlaneGrid, pts, mask,
                        axis: str = "map"):
    """Demonstration query: points sharded by rows, each shard matching
    only against its (haloed) local table.  Returns per-point voxel means
    and hit mask, gathered back."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(_plane_specs(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)), check_vma=False)
    def f(shard: PlaneGrid, p, m):
        idx = vx.lookup_nearest(shard.grid, p, m, shard.usable)
        hit = idx >= 0
        mu = shard.grid.mean[jnp.maximum(idx, 0)]
        return jnp.where(hit[:, None], mu, 0.0), hit

    return f(extended, pts, mask)
