"""WGS-84 geodesy: llh ↔ ECEF ↔ ENU, Euler → DCM.

Same capability surface as the reference's CoordiTran (reference
CoordiTran.h:7-15): llh2xyz / xyz2llh / xyz2enu / enu2xyz / llh2enu /
enu2llh / eulr2dcm — reimplemented from the standard WGS-84 closed forms
(Heikkinen's exact ECEF→geodetic solution), not ported.  The reference's
`HDL2enu` is intentionally not replicated: it contains an uninitialized
Euler-array bug and an index typo (reference CoordiTran.cpp:232,248-251);
its job (sensor→vehicle lever-arm + attitude to ENU) is covered by
`lever_arm_to_enu` below with explicit, configurable extrinsics.

Every function is written against a generic array namespace so the same
code runs in float64 numpy on the host (where absolute-coordinate precision
matters — Earth-radius magnitudes need fp64) and as jittable jax.numpy for
device use on relative coordinates.  Angles are radians throughout, matching
the reference contract (reference INSSource.cxx:306-308 converts degrees to
radians before calling llh2enu).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# WGS-84 ellipsoid
WGS84_A = 6378137.0          # semi-major axis (m)
WGS84_B = 6356752.3142       # semi-minor axis (m)
WGS84_E2 = 1.0 - (WGS84_B / WGS84_A) ** 2     # first eccentricity squared
WGS84_EP2 = (WGS84_A / WGS84_B) ** 2 - 1.0    # second eccentricity squared


def _llh2xyz(llh, xp):
    lat, lon, h = llh[..., 0], llh[..., 1], llh[..., 2]
    sin_lat, cos_lat = xp.sin(lat), xp.cos(lat)
    n = WGS84_A / xp.sqrt(1.0 - WGS84_E2 * sin_lat * sin_lat)  # prime vertical
    x = (n + h) * cos_lat * xp.cos(lon)
    y = (n + h) * cos_lat * xp.sin(lon)
    z = (n * (1.0 - WGS84_E2) + h) * sin_lat
    return xp.stack([x, y, z], axis=-1)


def _xyz2llh(xyz, xp):
    """Heikkinen's exact closed-form ECEF → geodetic solution."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    a, b, e2, ep2 = WGS84_A, WGS84_B, WGS84_E2, WGS84_EP2
    r2 = x * x + y * y
    r = xp.sqrt(r2)
    z2 = z * z
    F = 54.0 * b * b * z2
    G = r2 + (1.0 - e2) * z2 - e2 * (a * a - b * b)
    c = e2 * e2 * F * r2 / (G * G * G)
    s = (1.0 + c + xp.sqrt(c * c + 2.0 * c)) ** (1.0 / 3.0)
    P = F / (3.0 * (s + 1.0 / s + 1.0) ** 2 * G * G)
    Q = xp.sqrt(1.0 + 2.0 * e2 * e2 * P)
    r0 = -(P * e2 * r) / (1.0 + Q) + xp.sqrt(
        xp.maximum(0.5 * a * a * (1.0 + 1.0 / Q)
                   - P * (1.0 - e2) * z2 / (Q * (1.0 + Q))
                   - 0.5 * P * r2, 0.0))
    t = (r - e2 * r0) ** 2
    U = xp.sqrt(t + z2)
    V = xp.sqrt(t + (1.0 - e2) * z2)
    z0 = b * b * z / (a * V)
    h = U * (1.0 - b * b / (a * V))
    lat = xp.arctan2(z + ep2 * z0, r)
    lon = xp.arctan2(y, x)
    return xp.stack([lat, lon, h], axis=-1)


def _enu_rotation(orgllh, xp):
    """Rows transform ECEF deltas into (east, north, up) at the origin."""
    lat, lon = orgllh[..., 0], orgllh[..., 1]
    sl, cl = xp.sin(lat), xp.cos(lat)
    so, co = xp.sin(lon), xp.cos(lon)
    row_e = xp.stack([-so, co, xp.zeros_like(so)], -1)
    row_n = xp.stack([-sl * co, -sl * so, cl], -1)
    row_u = xp.stack([cl * co, cl * so, sl], -1)
    return xp.stack([row_e, row_n, row_u], -2)


def _xyz2enu(xyz, orgxyz, xp):
    R = _enu_rotation(_xyz2llh(orgxyz, xp), xp)
    d = xyz - orgxyz
    return xp.einsum("...ij,...j->...i", R, d)


def _enu2xyz(enu, orgxyz, xp):
    R = _enu_rotation(_xyz2llh(orgxyz, xp), xp)
    return orgxyz + xp.einsum("...ji,...j->...i", R, enu)


def _llh2enu(llh, orgxyz, xp):
    return _xyz2enu(_llh2xyz(llh, xp), orgxyz, xp)


def _enu2llh(enu, orgxyz, xp):
    return _xyz2llh(_enu2xyz(enu, orgxyz, xp), xp)


def _eulr2dcm(eul, xp):
    """Body→navigation DCM from (roll, pitch, yaw), INS convention.

    Contract parity with reference CoordiTran.cpp:4-49: the body→nav matrix
    is the transpose of Rx(-roll)·Ry(-theta)·Rz(-psi) built there.
    """
    phi, theta, psi = -eul[..., 0], -eul[..., 1], -eul[..., 2]
    cps, sps = xp.cos(psi), xp.sin(psi)
    cth, sth = xp.cos(theta), xp.sin(theta)
    cph, sph = xp.cos(phi), xp.sin(phi)
    z = xp.zeros_like(phi)
    o = xp.ones_like(phi)
    C1 = xp.stack([xp.stack([cps, sps, z], -1),
                   xp.stack([-sps, cps, z], -1),
                   xp.stack([z, z, o], -1)], -2)
    C2 = xp.stack([xp.stack([cth, z, -sth], -1),
                   xp.stack([z, o, z], -1),
                   xp.stack([sth, z, cth], -1)], -2)
    C3 = xp.stack([xp.stack([o, z, z], -1),
                   xp.stack([z, cph, sph], -1),
                   xp.stack([z, -sph, cph], -1)], -2)
    dcm_nb = C3 @ (C2 @ C1)
    return xp.swapaxes(dcm_nb, -1, -2)


def _lever_arm_to_enu(pts_sensor, R_sensor2body, t_sensor2body, eul_body,
                      body_enu, xp):
    """Sensor-frame points → ENU via sensor→body extrinsics + body attitude.

    This is what reference CoordiTran.cpp:220-261 (`HDL2enu`) intends, with
    the extrinsics passed in instead of hardcoded and its bugs fixed.
    """
    body = xp.einsum("...ij,...j->...i", R_sensor2body, pts_sensor) + t_sensor2body
    dcm = _eulr2dcm(eul_body, xp)
    return body_enu + xp.einsum("...ij,...j->...i", dcm, body)


def _bind(fn, xp):
    return functools.partial(fn, xp=xp)


# Host (float64 numpy) versions — use these for absolute coordinates.
llh2xyz_np = _bind(_llh2xyz, np)
xyz2llh_np = _bind(_xyz2llh, np)
xyz2enu_np = _bind(_xyz2enu, np)
enu2xyz_np = _bind(_enu2xyz, np)
llh2enu_np = _bind(_llh2enu, np)
enu2llh_np = _bind(_enu2llh, np)
eulr2dcm_np = _bind(_eulr2dcm, np)
lever_arm_to_enu_np = _bind(_lever_arm_to_enu, np)

# Device (jax.numpy) versions — jittable; precision follows input dtypes.
llh2xyz = _bind(_llh2xyz, jnp)
xyz2llh = _bind(_xyz2llh, jnp)
xyz2enu = _bind(_xyz2enu, jnp)
enu2xyz = _bind(_enu2xyz, jnp)
llh2enu = _bind(_llh2enu, jnp)
enu2llh = _bind(_enu2llh, jnp)
eulr2dcm = _bind(_eulr2dcm, jnp)
lever_arm_to_enu = _bind(_lever_arm_to_enu, jnp)
