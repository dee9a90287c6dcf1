import jax.numpy as jnp
import numpy as np

from veloslam_tpu.decode import calibration
from veloslam_tpu.decode.decode import (DeviceCalib, apply_dual_return_filter,
                                        decode_packets, dual_return_flags)
from veloslam_tpu.io import packets as pk


def _dual_packets():
    """One packet with 6 dual pairs: blocks (0,1), (2,3), ... share
    azimuth; the second return is farther on laser 0, nearer on laser 1,
    identical on laser 2, missing on laser 3."""
    az = np.repeat(np.arange(6) * 600, 2).reshape(1, 12)
    dist = np.full((1, 12, 32), 5000)
    inten = np.full((1, 12, 32), 100)
    dist[0, 1::2, 0] = 6000       # second return farther (laser 0)
    dist[0, 1::2, 1] = 4000       # second return nearer (laser 1)
    inten[0, 1::2, 1] = 180       # and brighter
    # laser 2: identical duplicate
    dist[0, 1::2, 3] = 0          # laser 3: no second return
    return pk.encode_lidar_packets(az, dist, inten, np.zeros(1))


def test_dual_flags():
    pkts = _dual_packets()
    dec = decode_packets(jnp.asarray(pkts),
                         DeviceCalib.from_host(calibration.hdl32()),
                         model="hdl32")
    dflag, iflag, dual = (np.asarray(a) for a in dual_return_flags(dec))
    # laser 0: first near (-1), second far (+1)
    assert dflag[0, 0, 0] == -1 and dflag[0, 1, 0] == 1
    # laser 1: first far, second near; second brighter
    assert dflag[0, 0, 1] == 1 and dflag[0, 1, 1] == -1
    assert iflag[0, 0, 1] == -1 and iflag[0, 1, 1] == 1
    # laser 2: identical duplicate → tie flags
    assert dflag[0, 0, 2] == 0 and dflag[0, 1, 2] == 0
    assert dual[0, 0, 2] and dual[0, 1, 2]
    # laser 3: second missing → single return, not dual
    assert not dual[0, 0, 3] and not dual[0, 1, 3]


def test_dual_filters():
    pkts = _dual_packets()
    dec = decode_packets(jnp.asarray(pkts),
                         DeviceCalib.from_host(calibration.hdl32()),
                         model="hdl32")
    near = np.asarray(apply_dual_return_filter(dec, "near").valid)
    far = np.asarray(apply_dual_return_filter(dec, "far").valid)
    high = np.asarray(apply_dual_return_filter(dec, "high").valid)
    # near keeps first on laser 0, second on laser 1
    assert near[0, 0, 0] and not near[0, 1, 0]
    assert not near[0, 0, 1] and near[0, 1, 1]
    # far keeps the opposite members
    assert not far[0, 0, 0] and far[0, 1, 0]
    assert far[0, 0, 1] and not far[0, 1, 1]
    # identical duplicates keep only the first member in any mode
    assert near[0, 0, 2] and not near[0, 1, 2]
    assert far[0, 0, 2] and not far[0, 1, 2]
    # single return (laser 3 first block) always passes
    assert near[0, 0, 3] and far[0, 0, 3] and high[0, 0, 3]
    # laser 31 has equal returns everywhere → duplicate-drop keeps half
    assert near[0, ::2, 31].all() and not near[0, 1::2, 31].any()
