"""Pallas TPU kernels for the registration hot path.

`point_to_plane_normal_equations` fuses, per point tile held in VMEM:
residual r = nᵀ(p′ − μ), Jacobian J = [p′ × n | n], Huber weighting, and
the (6, 6) + (6,) normal-equation reduction — J is never materialized in
HBM (the XLA einsum path streams a (P, 6) Jacobian through HBM twice).
The 6×6 partial products run on the MXU via dot_general; accumulation
lives in a VMEM scratch that persists across the sequential point-tile
grid.

Data layout: points arrive as a dense (8, P) matrix — rows
[px′, py′, pz′, nx, ny, nz, r, w] — matching the (8, 128) float32 tile
exactly; the caller (gicp.normal_equations with use_pallas=True) prepares
rows with ordinary XLA ops (transform, lookup, gather) which XLA fuses.

Outputs an (8, 128) block: [:6, :6] = H, [:6, 6] = b, [6, 0] = Σ w·|r|,
[6, 1] = Σ 1[hit].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512          # points per grid step (lanes)


def _ne_kernel(data_ref, out_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    d = data_ref[:]                      # (8, TILE)
    px, py, pz = d[0, :], d[1, :], d[2, :]
    nx, ny, nz = d[3, :], d[4, :], d[5, :]
    r, w = d[6, :], d[7, :]

    # J rows: [p' x n | n]  → (6, TILE)
    J = jnp.stack([
        py * nz - pz * ny,
        pz * nx - px * nz,
        px * ny - py * nx,
        nx, ny, nz,
    ], axis=0)
    Jw = J * w[None, :]

    H = jax.lax.dot_general(Jw, J, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (6, 6)
    b = jax.lax.dot_general(Jw, (r)[:, None], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (6, 1)

    # Assemble the (8, 128) delta without scatter ops (unsupported in the
    # Pallas TPU lowering): static concatenation only.
    top = jnp.concatenate(
        [H, b, jnp.zeros((6, 121), jnp.float32)], axis=1)     # (6, 128)
    scalars = jnp.concatenate([
        jnp.sum(w * jnp.abs(r)).reshape(1, 1),
        jnp.sum((w > 0).astype(jnp.float32)).reshape(1, 1),
        jnp.sum(w).reshape(1, 1),
        jnp.zeros((1, 125), jnp.float32)], axis=1)            # (1, 128)
    delta = jnp.concatenate(
        [top, scalars, jnp.zeros((1, 128), jnp.float32)], axis=0)
    acc_ref[:] = acc_ref[:] + delta

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_normal_equations(rows: jax.Array, *, interpret: bool = False):
    """rows: (8, P) float32, P a multiple of TILE.

    Returns (H (6,6), b (6,), err_sum (), n_hit (), w_sum ()).
    """
    P = rows.shape[1]
    grid = (P // TILE,)
    out = pl.pallas_call(
        _ne_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((8, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(rows)
    H = out[:6, :6]
    b = out[:6, 6]
    return H, b, out[6, 0], out[6, 1].astype(jnp.int32), out[6, 2]
