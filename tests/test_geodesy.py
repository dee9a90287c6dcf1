import numpy as np
import pytest

from veloslam_tpu.core import geodesy as geo


# A few spread-out geodetic points (lat, lon in radians, height m).
LLH_CASES = np.array([
    [np.deg2rad(31.0), np.deg2rad(121.5), 18.9],     # Shanghai-ish (ref origin area)
    [np.deg2rad(-33.9), np.deg2rad(151.2), 50.0],
    [np.deg2rad(0.0), np.deg2rad(0.0), 0.0],
    [np.deg2rad(75.0), np.deg2rad(-45.0), 1200.0],
    [np.deg2rad(-10.0), np.deg2rad(179.9), -30.0],
])


def test_llh_xyz_roundtrip_fp64():
    xyz = geo.llh2xyz_np(LLH_CASES)
    llh = geo.xyz2llh_np(xyz)
    np.testing.assert_allclose(llh[:, :2], LLH_CASES[:, :2], atol=1e-12)
    np.testing.assert_allclose(llh[:, 2], LLH_CASES[:, 2], atol=1e-6)


def test_known_ecef_point():
    # Equator / prime meridian at h=0 → (a, 0, 0).
    xyz = geo.llh2xyz_np(np.array([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(xyz, [geo.WGS84_A, 0.0, 0.0], atol=1e-6)
    # North pole at h=0 → (0, 0, b).
    xyz = geo.llh2xyz_np(np.array([np.pi / 2, 0.0, 0.0]))
    np.testing.assert_allclose(xyz, [0.0, 0.0, geo.WGS84_B], atol=1e-6)


def test_enu_roundtrip_and_locality():
    org = geo.llh2xyz_np(LLH_CASES[0])
    # A point 100 m east should land at enu ≈ (100, 0, 0).
    east_llh = LLH_CASES[0].copy()
    # dlon = de / ((N + h) cos(lat))
    n = geo.WGS84_A / np.sqrt(1 - geo.WGS84_E2 * np.sin(east_llh[0]) ** 2)
    east_llh[1] += 100.0 / ((n + east_llh[2]) * np.cos(east_llh[0]))
    enu = geo.llh2enu_np(east_llh, org)
    np.testing.assert_allclose(enu, [100.0, 0.0, 0.0], atol=2e-3)
    # roundtrip
    back = geo.enu2llh_np(enu, org)
    np.testing.assert_allclose(back, east_llh, atol=1e-12)


def test_enu_up_axis():
    org = geo.llh2xyz_np(LLH_CASES[1])
    up_llh = LLH_CASES[1].copy()
    up_llh[2] += 25.0
    enu = geo.llh2enu_np(up_llh, org)
    np.testing.assert_allclose(enu, [0.0, 0.0, 25.0], atol=1e-6)


def test_jnp_matches_numpy_under_x64():
    """The jnp geodesy path operates on absolute Earth-radius magnitudes, so
    it is only meaningful in float64 (SURVEY.md §7 'fp precision'); verify it
    reproduces the numpy oracle under the x64 context."""
    import jax

    org = geo.llh2xyz_np(LLH_CASES[0])
    enu_np = geo.xyz2enu_np(geo.llh2xyz_np(LLH_CASES), org)
    with jax.enable_x64(True):
        enu_j = np.asarray(geo.xyz2enu(geo.llh2xyz_np(LLH_CASES), org))
    np.testing.assert_allclose(enu_j, enu_np, rtol=1e-12, atol=1e-9)


def test_eulr2dcm_orthonormal_and_identity():
    dcm = geo.eulr2dcm_np(np.zeros(3))
    np.testing.assert_allclose(dcm, np.eye(3), atol=1e-15)
    eul = np.array([0.1, -0.2, 0.7])
    d = geo.eulr2dcm_np(eul)
    np.testing.assert_allclose(d @ d.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(d), 1.0, atol=1e-12)


def test_eulr2dcm_pure_yaw():
    """Yaw-only: body x maps into the navigation frame rotated by -psi about
    z transposed — verify against the direct construction used by the
    reference (CoordiTran.cpp:4-49 contract)."""
    psi = 0.3
    d = geo.eulr2dcm_np(np.array([0.0, 0.0, psi]))
    c, s = np.cos(psi), np.sin(psi)
    # DCMnb = Rz(-psi) (with their sign convention), body->nav is transpose.
    dcm_nb = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    np.testing.assert_allclose(d, dcm_nb.T, atol=1e-12)


def test_lever_arm_identity_extrinsics():
    pts = np.array([[1.0, 2.0, 3.0]])
    out = geo.lever_arm_to_enu_np(pts, np.eye(3), np.zeros(3),
                                  np.zeros(3), np.array([10.0, 20.0, 30.0]))
    np.testing.assert_allclose(out, [[11.0, 22.0, 33.0]], atol=1e-12)
