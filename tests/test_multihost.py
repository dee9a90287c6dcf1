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


@pytest.mark.slow
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


_SESSION_WORKER = os.path.join(os.path.dirname(__file__),
                               "multihost_session_worker.py")


@pytest.mark.slow
def test_two_process_slam_session(tmp_path):
    """The full SLAM SESSION across two processes (configs[4] as a
    pipeline, not a kernel demo): simulated drive in, map tiles
    partitioned by dist.tile_owner, ROI targets assembled globally,
    registration via the shard_map kernel, scan updates written only to
    owned tiles.  Both processes must produce the identical trajectory,
    matching a single-process run; tile ownership must be disjoint."""
    from veloslam_tpu.config import (PipelineConfig, RegistrationConfig,
                                     SensorConfig, SlamConfig)
    from veloslam_tpu.io import simulate as sim
    from veloslam_tpu.runtime.pipeline import SlamPipeline

    seq = sim.generate_sequence(duration_s=1.0, model="hdl32", seed=21,
                                world=sim.World.demo(9))
    sim_paths = sim.write_sequence(seq, str(tmp_path), name="mh")

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_SESSION_WORKER))
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, _SESSION_WORKER, str(pid), "2", str(port),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    r0 = np.load(tmp_path / "session_p0.npz")
    r1 = np.load(tmp_path / "session_p1.npz")
    assert r0["positions"].shape[0] >= 5
    # no leader: both processes computed the identical trajectory
    np.testing.assert_array_equal(r0["times_us"], r1["times_us"])
    np.testing.assert_allclose(r0["positions"], r1["positions"], atol=1e-4)
    assert float(r0["registered_fraction"]) > 0.7

    # disjoint tile ownership matching the hash
    t0 = {tuple(t) for t in r0["tiles"]}
    t1 = {tuple(t) for t in r1["tiles"]}
    assert not (t0 & t1), (t0, t1)
    for tiles, pid in ((t0, 0), (t1, 1)):
        for tx, ty in tiles:
            assert int(tile_owner(tx, ty, 2)) == pid

    # single-process oracle: same pipeline config, plain SlamPipeline
    cfg = SlamConfig(
        sensor=SensorConfig(model="hdl32"),
        pipeline=PipelineConfig(packets_per_batch=128),
        registration=RegistrationConfig(max_points=16384,
                                        max_iterations=8))
    oracle = SlamPipeline(cfg)
    ores = oracle.run_offline(sim_paths["pcap"], sim_paths["ins"])
    np.testing.assert_array_equal(r0["times_us"], ores["times_us"])
    d = np.linalg.norm(r0["positions"] - ores["positions"], axis=1)
    assert d.max() < 0.05, d.max()
    # the union of owned tiles covers the oracle's map
    oracle_tiles = {t for t in oracle.map._patches} | \
        {t for t in oracle.map._spilled}
    assert (t0 | t1) == oracle_tiles, (t0 | t1, oracle_tiles)
