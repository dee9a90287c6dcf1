"""Profile the full-SLAM stage on the real chip: stage timers + wall split.

Usage: python scripts/profile_fullslam.py [duration_s]
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    duration_s = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    from veloslam_tpu.config import GraphConfig, SlamConfig
    from veloslam_tpu.io import packets as pkmod
    from veloslam_tpu.io import simulate as sim
    from veloslam_tpu.runtime.pipeline import SlamPipeline

    d = tempfile.mkdtemp()
    seq = sim.generate_sequence(
        duration_s=duration_s, model="hdl32", seed=3,
        world=sim.World.demo(3, extent=40.0, n_posts=40, n_walls=16),
        trajectory=sim.circle_trajectory(radius=15.0, speed=8.0))
    paths = sim.write_sequence(seq, d, name="bench")
    ins = pkmod.read_ins_txt(paths["ins"])
    ts = (ins["t_us"] - ins["t_us"][0]) * 1e-6
    pkmod.write_ins_txt(paths["ins"], ins["t_us"],
                        ins["pos_xy"] + np.stack(
                            [np.zeros_like(ts), 1.0 * ts], -1),
                        np.deg2rad(ins["yaw_deg"]), speed=ins["speed"])

    cfg = SlamConfig(graph=GraphConfig(loop_closure_min_gap=12,
                                       sc_min_score=0.55))
    pipe = SlamPipeline(cfg)
    t0 = time.perf_counter()
    pipe.run_offline_batched(paths["pcap"], paths["ins"], batch=16384)
    t1 = time.perf_counter()
    res = pipe.finalize()
    t2 = time.perf_counter()
    print(f"wall run_offline_batched: {t1-t0:.2f} s")
    print(f"wall finalize:           {t2-t1:.2f} s")
    print(f"n_frames={res['n_frames']} n_keyframes={res['n_keyframes']} "
          f"n_closures={res['n_closures']}")
    for name, st in sorted(res["timing"].items()):
        print(f"  {name:16s} total={st['total_s']:8.3f}s "
              f"count={st['count']:5.0f} mean={st['mean_ms']:8.2f}ms")


if __name__ == "__main__":
    main()
