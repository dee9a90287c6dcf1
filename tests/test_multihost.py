"""Multi-host execution tests: real multi-PROCESS runs over the Gloo CPU
backend — the closest no-pod approximation of multi-host TPU (each process
owns its devices and its map shard; collectives cross process boundaries).

The reference has no distributed execution at all (SURVEY.md §2b); its
loopback-fake-backend testing idea (§4.2) is applied here to the
collective runtime instead of UDP."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from veloslam_tpu.parallel.dist import tile_owner

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_tile_owner_balanced_and_deterministic():
    ix, iy = np.meshgrid(np.arange(-50, 50), np.arange(-50, 50))
    own = tile_owner(ix.ravel(), iy.ravel(), 4)
    # deterministic
    np.testing.assert_array_equal(own,
                                  tile_owner(ix.ravel(), iy.ravel(), 4))
    # all shards used, roughly balanced (hash quality)
    counts = np.bincount(own, minlength=4)
    assert counts.min() > 0.8 * counts.mean(), counts
    # neighbors spread (no giant contiguous blocks): a tile and its +x
    # neighbor should usually differ in owner
    same = np.mean(tile_owner(ix.ravel(), iy.ravel(), 4)
                   == tile_owner(ix.ravel() + 1, iy.ravel(), 4))
    assert same < 0.5, same


def test_two_process_sharded_registration(tmp_path):
    """Two OS processes, each owning the map tiles that hash to it, run
    the shard_map registration kernel over a global mesh and recover a
    known SE(3) perturbation."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_WORKER))
    env.pop("JAX_PLATFORMS", None)      # worker pins cpu itself
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    res = np.load(tmp_path / "result.npz")
    # registration recovered the injected pose
    np.testing.assert_allclose(res["t"], res["true_t"], atol=0.03)
    dq = abs(float(np.dot(res["q"], res["true_q"])))
    assert dq > 0.99999, (res["q"], res["true_q"])
    assert res["n_matched"] > 1000
