"""The SLAM pipeline: packets → frames → odometry → map → pose graph.

This is the central runtime — the role HDLManager plays in the reference
(wiring all components, reference HDLManager.cxx:62-72) plus the SLAM loop
the reference never implemented.  The reference's thread-per-stage design
(SURVEY.md §2b) becomes a host-driven loop over jitted device steps:

    packet batch ─jit→ decode ─jit→ compensate(INS) ─jit→ assemble
       per completed frame (host orchestration):
         localize:  GICP against the map ROI, INS-relative prior
         integrate: corrected scan → voxel map
         keyframe:  threshold → pose-graph node + odometry edge
         closure:   periodic candidate check → GICP verify → edge → solve

Estimation frame model: the INS track provides motion compensation and
relative priors; scan-to-map registration corrects absolute drift.  Frames
are de-skewed in the INS world frame, then re-expressed relative to the
frame-start INS pose ("local frame"); the corrected world pose of each
frame is T_est = registration(local cloud, map ROI, prior), with
prior = T_est_prev ∘ (T_ins_prev⁻¹ ∘ T_ins_cur).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from veloslam_tpu import constants as C
from veloslam_tpu.config import SlamConfig
from veloslam_tpu.core import se3, timesync
from veloslam_tpu.core.timeline import PoseTrack
from veloslam_tpu.decode import calibration as calib_mod
from veloslam_tpu.decode.decode import (DeviceCalib, compensate,
                                        decode_packets)
from veloslam_tpu.decode.frames import AssemblyCarry, assemble_frames
from veloslam_tpu.graph import loopclosure, optimize
from veloslam_tpu.graph.posegraph import PoseGraph
from veloslam_tpu.io import packets as pk
from veloslam_tpu.io.pcap import read_lidar_packets
from veloslam_tpu.map.voxelmap import VoxelMap
from veloslam_tpu.registration import gicp
from veloslam_tpu.registration import voxel as vx
from veloslam_tpu.runtime.framestore import FrameStore
from veloslam_tpu.utils.profiling import StageTimers


@dataclasses.dataclass
class FrameResult:
    start_us: int
    pose_q: np.ndarray
    pose_t: np.ndarray
    n_points: int
    n_matched: int
    mean_error: float
    registered: bool


def _np_pose(q, t) -> se3.Pose:
    return se3.Pose(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))


class SlamPipeline:
    def __init__(self, config: Optional[SlamConfig] = None,
                 spill_dir: Optional[str] = None):
        self.cfg = config or SlamConfig()
        sc = self.cfg.sensor
        self.calib = (calib_mod.from_xml(sc.calibration_path)
                      if sc.calibration_path
                      else calib_mod.default_for(sc.model))
        self.dcalib = DeviceCalib.from_host(self.calib,
                                            enabled=sc.enabled_lasers())
        self.track = PoseTrack()                 # INS prior track
        self.map = VoxelMap(self.cfg.map, spill_dir=spill_dir)
        self.frames = FrameStore(self.cfg.pipeline.frame_cache_capacity,
                                 spill_dir=spill_dir)
        self.graph = PoseGraph(max_poses=self.cfg.graph.max_keyframes)
        self.keyframe_scans: List[Tuple[np.ndarray, np.ndarray]] = []
        self.keyframe_descs: List[np.ndarray] = []   # scan-context (R, S)
        self.keyframe_times: List[int] = []
        self._kf_map_pose: List[Tuple[np.ndarray, np.ndarray]] = []
        # How each keyframe's scan stats entered the map ("stream" =
        # per-frame integrate_points, "batch" = integrate_scans_batch):
        # downdating replays the matching program so the subtraction is
        # the exact inverse (same compiled program + same inputs).
        self._kf_integrated_via: List[str] = []
        # Keyframe pose at CREATION (immutable): the per-frame trajectory
        # was recorded against these; finalize() corrects it by the total
        # keyframe motion since creation, across however many graph solves.
        self._kf_pose_at_creation: List[Tuple[np.ndarray, np.ndarray]] = []
        self.trajectory: List[FrameResult] = []
        self.timers = StageTimers()
        self.closures: List[Tuple[int, int]] = []
        self._carry = AssemblyCarry.init(sc.n_lasers,
                                         sc.max_firings_per_frame)
        self._open_start_abs: Optional[float] = None
        self._open_frame_offset: Optional[int] = None  # pcap offset of the
        # packet at/before the open frame's start (getFrame meta)
        self._gps_base: Optional[int] = None   # grounded HDL hour base
        self.frames.redecoder = self._redecode_frame
        self._last_ins: Optional[se3.Pose] = None
        self._last_est: Optional[se3.Pose] = None
        self._kf_count_at_last_close = 0
        # INS-port auxiliary message state (RawINS / BestGPSPos — the
        # reference declares these but leaves both handlers as FIXME
        # stubs, INSSource.cxx:233-238).
        self.imu_log: List[Tuple[int, int, Tuple[int, int, int]]] = []
        self.ins_health = {
            "inspva_count": 0, "rawins_count": 0, "bestgps_count": 0,
            "unknown_count": 0, "last_imu_status": None,
            "last_gps_solution": None, "last_gps_status": None,
            "last_diff_age": None,
        }
        # Sensor position-packet (port 8308) side channel: GPS grounding of
        # the HDL hour clock + PPS health (the reference binds the port,
        # HDLSource.cxx:484-485, but drops the packets at its length-1206
        # gate, HDLSource.cxx:211).
        self.gps_health = {
            "position_count": 0, "grounded": False, "pps_status": None,
            "last_fix_lat_deg": None, "last_fix_lon_deg": None,
            "ground_correction_us": None,
        }

    # --- inputs -------------------------------------------------------------

    def feed_ins_txt(self, path: str) -> None:
        """Load the reference INS text log format as the prior track."""
        ins = pk.read_ins_txt(path)
        for i in range(len(ins["t_us"])):
            # Host-side conversion (se3.euler_deg_to_quat_np): a jnp round
            # trip here would read back from the device and poison axon
            # dispatch latency for the whole process.
            q = se3.euler_deg_to_quat_np(
                ins["roll_deg"][i], ins["pitch_deg"][i], ins["yaw_deg"][i])
            t3 = np.array([ins["pos_xy"][i, 0], ins["pos_xy"][i, 1], 0.0])
            yaw = np.deg2rad(ins["yaw_deg"][i])
            v = ins["speed"][i] * np.array([np.cos(yaw), np.sin(yaw), 0.0])
            self.track.add(int(ins["t_us"][i]), q=q, t=t3, v=v)

    def feed_ins_pose(self, t_us: int, q, t, v=None) -> None:
        self.track.add(int(t_us), q=np.asarray(q), t=np.asarray(t), v=v)

    # --- ingest -------------------------------------------------------------

    def _decode_batch(self, pkts: np.ndarray, times_us: np.ndarray):
        """Decode + dual-return filter + INS compensation of one batch.
        Returns (dec, xyz_world, rel_s, anchor_us)."""
        sc = self.cfg.sensor
        pc = self.cfg.pipeline
        anchor = int(times_us[0])
        rel = jnp.asarray((times_us - anchor) * 1e-6, jnp.float32)
        with self.timers.stage("decode"):
            dec = decode_packets(jnp.asarray(pkts), self.dcalib,
                                 model=sc.model,
                                 crop_region=sc.crop_region,
                                 crop_inside=sc.crop_inside,
                                 points_skip=pc.points_skip)
            if sc.dual_return_filter is not None:
                from veloslam_tpu.decode.decode import \
                    apply_dual_return_filter
                dec = apply_dual_return_filter(dec, sc.dual_return_filter)
        if len(self.track) > 0:
            with self.timers.stage("compensate"):
                w = self.track.window(int(times_us[0]), int(times_us[-1]),
                                      anchor_us=anchor)
                xyz_w, _ = compensate(
                    dec, rel, jnp.asarray(w["rel_s"]), jnp.asarray(w["q"]),
                    jnp.asarray(w["t"]), jnp.asarray(w["v"]),
                    per_packet=(pc.compensation == "per_packet"))
        else:
            xyz_w = dec.xyz
        return dec, xyz_w, rel, anchor

    @staticmethod
    def _frame_dict(fb, k: int) -> Dict:
        return {
            "xyz": np.asarray(fb.xyz[k]),
            "mask": np.asarray(fb.mask[k]),
            "intensity": np.asarray(fb.intensity[k]),
            "rel_s": np.asarray(fb.rel_s[k]),
            "azimuth": np.asarray(fb.azimuth[k]),
        }

    def process_packets(self, pkts: np.ndarray, times_us: np.ndarray,
                        offsets: Optional[np.ndarray] = None,
                        pcap_path: Optional[str] = None) -> int:
        """Feed a batch of packets; returns frames completed.

        `offsets`/`pcap_path`: per-packet pcap byte offsets — when given,
        each completed frame's FrameStore entry records the offset of the
        packet at or before its start, enabling payload re-decode (the
        reference's (fileStartPos, skips) meta, HDLFrame.h:40-44)."""
        sc = self.cfg.sensor
        dec, xyz_w, rel, anchor = self._decode_batch(pkts, times_us)
        carry_start = jnp.asarray(
            0.0 if self._open_start_abs is None
            else (self._open_start_abs - anchor) * 1e-6, jnp.float32)
        with self.timers.stage("assemble"):
            fb, n_done, starts, self._carry, open_start = assemble_frames(
                dec, xyz_w, rel, self._carry, carry_start, model=sc.model,
                n_beams=sc.n_lasers, max_firings=sc.max_firings_per_frame)
        n_done = int(n_done)
        starts_np = np.asarray(starts)
        rel_np = (times_us - anchor).astype(np.float64) * 1e-6
        for k in range(n_done):
            start_us = int(anchor + float(starts_np[k]) * 1e6)
            source = None
            if offsets is not None and pcap_path is not None:
                if k == 0 and self._open_frame_offset is not None:
                    off = self._open_frame_offset
                else:
                    i = max(int(np.searchsorted(rel_np, starts_np[k],
                                                side="right")) - 1, 0)
                    off = int(offsets[i])
                source = (pcap_path, off)
            frame = self._frame_dict(fb, k)
            with self.timers.stage("frame"):
                self._handle_frame(frame, start_us, source=source)
        if offsets is not None and (n_done > 0
                                    or self._open_frame_offset is None):
            # The open frame began within THIS batch (a wrap completed the
            # previous frame here) or this is the stream start; otherwise
            # the open frame's first packet lives in an earlier batch and
            # the recorded offset must be preserved.
            i = max(int(np.searchsorted(rel_np, float(open_start),
                                        side="right")) - 1, 0)
            self._open_frame_offset = int(offsets[i])
        self._open_start_abs = anchor + float(open_start) * 1e6
        return n_done

    def _redecode_frame(self, source, start_us: int) -> Optional[Dict]:
        """Re-decode ONE frame's payload from its pcap byte offset — the
        getFrame random-access contract (reference HDLParser.h:133,
        HDLParser.cxx:505-544): seek, decode forward until the frame whose
        start matches, return it.  Uses the live INS track for motion
        compensation, so a resumed session reproduces the original frame.
        """
        from veloslam_tpu.io.pcap import PcapReader
        from veloslam_tpu.runtime.odometry import packets_per_second

        pcap_path, offset = source
        sc = self.cfg.sensor
        B = self.cfg.pipeline.packets_per_batch
        per_rev = packets_per_second(sc.model) / (sc.rpm / 60.0)
        need = int(per_rev * 2.5) + 64
        pkts_l, times_l = [], []
        with PcapReader(pcap_path) as r:
            r.seek(int(offset))
            for payload, t_us, _ in r:
                if len(payload) != C.HDL_PACKET_BYTES:
                    continue
                pkts_l.append(payload)
                times_l.append(t_us)
                if len(pkts_l) >= need:
                    break
        if not pkts_l:
            return None
        arr = np.frombuffer(b"".join(pkts_l), np.uint8).reshape(
            len(pkts_l), C.HDL_PACKET_BYTES)
        times = np.asarray(times_l, np.int64)
        if self._gps_base is not None:
            gps = pk.decode_lidar_packets_np(arr)["gps_us"]
            times = timesync.resolve_hour_stamps(gps, self._gps_base,
                                                 ref_us=int(times[0]))
        tail = len(arr) % B
        if tail:
            arr = np.concatenate(
                [arr, pk.idle_lidar_packets(arr[-1], B - tail)])
            times = np.concatenate(
                [times, np.full(B - tail, times[-1], np.int64)])

        # Local assembly state — never touches the live pipeline's carry.
        # Candidates within 500 µs of the recorded start; the fresh-carry
        # slot 0 may be a leading fragment of the previous revolution with
        # a nearby start, so the fullest candidate wins.
        carry = AssemblyCarry.init(sc.n_lasers, sc.max_firings_per_frame)
        open_abs: Optional[float] = None
        candidates = []
        for s in range(0, len(arr), B):
            dec, xyz_w, rel, anchor = self._decode_batch(
                arr[s:s + B], times[s:s + B])
            cs = jnp.asarray(0.0 if open_abs is None
                             else (open_abs - anchor) * 1e-6, jnp.float32)
            fb, n_done, starts, carry, open_start = assemble_frames(
                dec, xyz_w, rel, carry, cs, model=sc.model,
                n_beams=sc.n_lasers, max_firings=sc.max_firings_per_frame)
            n_done = int(n_done)
            starts_np = np.asarray(starts)
            passed = False
            for k in range(n_done):
                f_start = anchor + float(starts_np[k]) * 1e6
                if abs(f_start - start_us) < 500.0:
                    candidates.append(self._frame_dict(fb, k))
                elif f_start > start_us:
                    passed = True
            if passed:
                break
            open_abs = anchor + float(open_start) * 1e6
        if not candidates:
            return None
        return max(candidates, key=lambda f: int(f["mask"].sum()))

    def handle_position_packet(self, raw: bytes,
                               clock: "timesync.HdlClock") -> None:
        """One 512-byte position packet: PPS health + GPS grounding of the
        HDL hour clock (io.packets.unpack_position_packet →
        HdlClock.maybe_ground)."""
        info = pk.unpack_position_packet(raw)
        h = self.gps_health
        h["position_count"] += 1
        h["pps_status"] = info["pps_status_str"]
        rmc = info["rmc"]
        if rmc is None or not rmc["valid"]:
            return
        h["last_fix_lat_deg"] = rmc["lat_deg"]
        h["last_fix_lon_deg"] = rmc["lon_deg"]
        if clock.maybe_ground(info["us_into_hour"], rmc["utc_us"]):
            h["grounded"] = True

    def _ground_offline_times(self, pcap_path: str, pkts: np.ndarray,
                              rec_times: np.ndarray) -> np.ndarray:
        """Offline GPS grounding: when the pcap carries position packets
        with a valid $GPRMC fix, resolve the LiDAR packets' µs-into-hour
        stamps against GPS UTC instead of trusting capture timestamps
        (which include transport/capture latency).  Falls back to the pcap
        record times when no fix exists."""
        from veloslam_tpu.io.pcap import read_position_packets
        if len(pkts) == 0:
            return rec_times
        pos_pkts, _ = read_position_packets(pcap_path)
        base = None
        for raw in pos_pkts:
            info = pk.unpack_position_packet(raw.tobytes())
            h = self.gps_health
            h["position_count"] += 1
            h["pps_status"] = info["pps_status_str"]
            rmc = info["rmc"]
            if rmc is not None and rmc["valid"]:
                h["last_fix_lat_deg"] = rmc["lat_deg"]
                h["last_fix_lon_deg"] = rmc["lon_deg"]
                if base is None:
                    base = rmc["utc_us"] - info["us_into_hour"]
                    h["grounded"] = True
        if base is None:
            return rec_times
        gps = pk.decode_lidar_packets_np(pkts)["gps_us"]
        resolved = timesync.resolve_hour_stamps(gps, base,
                                                ref_us=int(rec_times[0]))
        self._gps_base = int(resolved[0]) - int(gps[0])  # hour base incl.
        # the ref_us hour shift, so re-decodes reproduce the same stamps
        self.gps_health["ground_correction_us"] = int(
            resolved[0] - rec_times[0])
        return resolved

    def run_offline(self, pcap_path: str, ins_path: Optional[str] = None,
                    max_packets: Optional[int] = None) -> Dict:
        """The loadOffline equivalent (reference HDLManager.cxx:103-117):
        drive the whole pcap through the pipeline.  HDL timestamps are
        GPS-grounded from the pcap's position packets when present."""
        if ins_path:
            self.feed_ins_txt(ins_path)
        pkts, times, offs = read_lidar_packets(pcap_path, max_packets)
        times = self._ground_offline_times(pcap_path, pkts, times)
        B = self.cfg.pipeline.packets_per_batch
        tail = len(pkts) % B
        if tail:
            # Pad the trailing partial batch with idle packets (no returns,
            # frozen azimuth) so end-of-recording frames are not dropped
            # and the compiled fixed-shape program is reused.
            pkts = np.concatenate(
                [pkts, pk.idle_lidar_packets(pkts[-1], B - tail)])
            times = np.concatenate(
                [times, np.full(B - tail, times[-1], np.int64)])
            offs = np.concatenate(
                [offs, np.full(B - tail, offs[-1], np.int64)])
        for s in range(0, len(pkts), B):
            self.process_packets(pkts[s:s + B], times[s:s + B],
                                 offsets=offs[s:s + B], pcap_path=pcap_path)
        return self.results()

    def run_offline_batched(self, pcap_path: str,
                            ins_path: Optional[str] = None,
                            max_packets: Optional[int] = None,
                            batch: int = 8192,
                            defer_map: bool = False) -> Dict:
        """High-throughput offline SLAM: the full loop at bulk-replay rate.

        Odometry, keyframe selection, and scan-context descriptors run
        device-resident (runtime.fullslam) with zero mid-stream readbacks,
        and the END-OF-STREAM sweep — loop-closure proposal (both
        channels), batched GICP verification, pose-graph solve, per-frame
        trajectory correction — is queued as device programs too
        (runtime.devfinalize) BEFORE the first readback: on the axon
        backend the first device→host readback permanently degrades every
        later dispatch, so the whole SLAM computation completes with ONE
        readback at the end.  The host then mirrors the solved graph into
        the pipeline bookkeeping and builds the tiled product map.
        `finalize()` afterwards runs only the residual host sweep (new
        candidates opened by the correction) + the landmark stage.
        Frame payloads are not kept (use run_offline when the FrameStore
        contents matter)."""
        from veloslam_tpu.runtime.fullslam import FullSlam

        if ins_path:
            self.feed_ins_txt(ins_path)
        pkts, times, _ = read_lidar_packets(pcap_path, max_packets)
        times = self._ground_offline_times(pcap_path, pkts, times)
        if len(pkts) == 0:
            return self.results()
        sc = self.cfg.sensor
        rc = self.cfg.registration
        gc = self.cfg.graph
        with self.timers.stage("slam_batched"):
            eng = FullSlam(self.dcalib, model=sc.model,
                           n_beams=sc.n_lasers, voxel_size=rc.voxel_size,
                           map_capacity=rc.rolling_map_capacity,
                           reg_points=rc.max_points,
                           reg_iterations=rc.max_iterations,
                           kf_capacity=gc.max_keyframes,
                           kf_dist_m=gc.keyframe_translation_m,
                           kf_rot_deg=gc.keyframe_rotation_deg,
                           use_pallas=rc.use_pallas,
                           use_dense=rc.use_dense_index,
                           reassociate_every=rc.reassociate_every,
                           map_decay=rc.map_decay,
                           frame_rate_hz=sc.rpm / 60.0)
            eng.run_device(pkts, times, self.track, batch=batch)
        return self._finalize_batched_engine(eng, defer_map=defer_map)


    @staticmethod
    def _sweep_budget(eng, floor: int) -> int:
        """End-of-stream closure-verification budget: ~half the estimated
        frame count (≈ 2 candidates per keyframe at the default 2 m
        spacing), power-of-two bucketed so nearby recording lengths share
        one compiled sweep, capped at 256 (a 3-lap 100-keyframe drive
        accepted 114 closures; a fixed 8-candidate sweep left it at 7 and
        3.6 m ATE).  Falls back to the ring capacity when the engine has
        no recording estimate (live mode)."""
        est = getattr(eng, "_est_frames", None) or eng.ring.capacity
        b = 1 << max(int(np.ceil(np.log2(max(est // 2, 1)))), 0)
        return int(min(max(floor, b), 256))

    def _finalize_batched_engine(self, eng, defer_map: bool = False) -> Dict:
        """Post-stream tail shared by run_offline_batched and the fast
        live mode: queue the device sweep, read everything back once,
        mirror the solved graph into the pipeline bookkeeping."""
        rc = self.cfg.registration
        gc = self.cfg.graph
        # Stage accounting: dispatch is asynchronous, so the sweep's
        # EXECUTION cost lands in whichever stage first waits on the
        # device — the readback below.  The stages are named for what
        # they actually measure: "device_finalize_queue" is dispatch
        # latency only; "device_sweep_readback" is sweep execution +
        # transfer (VERDICT r4 #3: the old "device_finalize: 0.0" line
        # misattributed ~2 s into "readback").
        with self.timers.stage("device_finalize_queue"):
            # Scale the verification budget with the drive: a fixed
            # 8-candidate sweep on a 100+-keyframe multi-lap drive leaves
            # most revisits unclosed and long graph stretches
            # unconstrained (measured: 7 closures / 103 keyframes → ATE
            # 3.6 m on the 20 s bench drive).  The ring capacity is the
            # host-known proxy for drive length (shapes stay bucketed).
            dev = eng.finalize_device(
                min_score=gc.sc_min_score,
                radius=gc.loop_closure_radius_m,
                min_gap=gc.loop_closure_min_gap,
                max_candidates=self._sweep_budget(
                    eng, gc.max_closure_candidates_per_sweep),
                use_scan_context=gc.use_scan_context,
                gn_iterations=gc.gn_iterations,
                odom_info=gc.odom_edge_info,
                closure_info=gc.closure_edge_info,
                voxel_size=gc.verify_voxel_m,
                capacity=rc.scan_voxel_capacity)
        with self.timers.stage("device_sweep_readback"):
            host = jax.tree.map(np.asarray, dev)
            # Big ring arrays: slice-read only the occupied rows (the
            # capacity-sized pts tensor is ~100 MB; a drive's worth is a
            # few MB over the tunnel).
            n_kf_early = int(host["kf_n"])
            r = eng.ring
            host["kf_pts"] = np.asarray(r.pts[:n_kf_early])
            host["kf_msk"] = np.asarray(r.msk[:n_kf_early])
            host["kf_desc"] = np.asarray(r.desc[:n_kf_early])
        return self._mirror_device_results(eng, host, defer_map=defer_map)

    def _mirror_device_results(self, eng, host, defer_map: bool = False
                               ) -> Dict:
        """Mirror an already-transferred device-finalize dict into the
        host bookkeeping (split from the readback so measurement harnesses
        and alternative transfer paths can reuse the exact production
        loop)."""
        gc = self.cfg.graph
        t0 = eng._stream_t0_us or 0
        n_frames = int(host["n_frames"])
        n_kf = int(host["kf_n"])
        self._dense_cov = float(np.asarray(eng.state.min_dense_cov))
        if self._dense_cov < 0.999:
            import warnings
            warnings.warn(
                f"dense correspondence window covered only "
                f"{self._dense_cov:.1%} of usable map voxels at some "
                f"point — scan may have outrun the index box "
                f"(ADVICE r3); registration fell back to priors there",
                RuntimeWarning)
        self._ring_full = bool(n_kf >= eng.ring.capacity)
        if self._ring_full:
            import warnings
            warnings.warn(
                f"keyframe ring saturated at {eng.ring.capacity}: "
                f"keyframes beyond capacity were dropped (drive longer "
                f"than ~{eng.ring.capacity * eng.kf_dist_m:.0f} m)",
                RuntimeWarning)
        ft = (host["traj_time"][:n_frames].astype(np.float64) * 1e6
              + t0).astype(np.int64)
        for i in range(n_frames):
            self.trajectory.append(FrameResult(
                start_us=int(ft[i]), pose_q=host["traj_q"][i],
                pose_t=host["traj_t"][i], n_points=-1, n_matched=-1,
                mean_error=float("nan"), registered=True))
        kf_times = (host["kf_time_rel_s"][:n_kf].astype(np.float64) * 1e6
                    + t0).astype(np.int64)
        for k in range(n_kf):
            sq = host["solved_q"][k].copy()
            st3 = host["solved_t"][k].copy()
            self.graph.add_pose(sq, st3)
            self.keyframe_scans.append((host["kf_pts"][k],
                                        host["kf_msk"][k]))
            self.keyframe_descs.append(host["kf_desc"][k])
            self.keyframe_times.append(int(kf_times[k]))
            self._kf_map_pose.append((sq, st3))
            self._kf_integrated_via.append("batch")
            self._kf_pose_at_creation.append((sq.copy(), st3.copy()))
            if k > 0:
                self.graph.add_edge(k - 1, k, host["rel_q"][k - 1],
                                    host["rel_t"][k - 1],
                                    info=gc.odom_edge_info)
        for c in range(len(host["accept"])):
            if host["accept"][c]:
                i, j = int(host["cand_i"][c]), int(host["cand_j"][c])
                self.graph.add_edge(i, j, host["meas_q"][c],
                                    host["meas_t"][c],
                                    info=gc.closure_edge_info)
                self.closures.append((i, j))
        self._kf_count_at_last_close = n_kf
        self._device_closed = True
        # Materialize the tiled map from the keyframe scans at the SOLVED
        # poses (the rolling device grid was odometry's working set, not
        # the product map).  With `defer_map` the build is left to
        # `finalize()`, which rebuilds after its solves anyway — callers
        # that always finalize skip one full map pass.
        self._map_deferred = defer_map
        if not defer_map:
            with self.timers.stage("map_build"):
                self.rebuild_map()
        return self.results()

    def warmup_batched(self, duration_s: float = 2.0,
                       batch: int = 8192) -> None:
        """Pre-compile EVERY program of the batched full-SLAM path
        (run_offline_batched + finalize) WITHOUT a single device→host
        readback, so a subsequent measured run in this process pays only
        dispatch: on the axon backend the first readback permanently
        degrades later dispatches, which makes an ordinary warm run (which
        must read its results back) poison the measured one.

        Streams a short synthetic drive through a scratch engine
        (run_device + finalize_device, block-only), then warms the
        post-readback host-path programs — map-rebuild / landmark
        voxelize chunks and the two graph solvers — on zero inputs of the
        production shapes."""
        from veloslam_tpu.graph.posegraph import PoseGraph as PG
        from veloslam_tpu.io import simulate as sim
        from veloslam_tpu.map.voxelmap import (_BATCH_CHUNK,
                                               _transform_build_chunk)
        from veloslam_tpu.runtime.fullslam import FullSlam

        def block(x):
            for leaf in jax.tree.leaves(x):
                if hasattr(leaf, "block_until_ready"):
                    leaf.block_until_ready()

        sc = self.cfg.sensor
        rc = self.cfg.registration
        gc = self.cfg.graph
        seq = sim.generate_sequence(duration_s=duration_s, model=sc.model,
                                    seed=11, world=sim.World.demo(2))
        scratch = SlamPipeline(self.cfg)
        for t_us, p, yaw, v in zip(seq["ins_t_us"], seq["ins_pos"],
                                   seq["ins_yaw"], seq["ins_vel"]):
            scratch.feed_ins_pose(
                int(t_us),
                se3.euler_deg_to_quat_np(0.0, 0.0,
                                         float(np.rad2deg(yaw))),
                np.asarray(p, float), v)
        eng = FullSlam(self.dcalib, model=sc.model, n_beams=sc.n_lasers,
                       voxel_size=rc.voxel_size, reg_points=rc.max_points,
                       map_capacity=rc.rolling_map_capacity,
                       reg_iterations=rc.max_iterations,
                       kf_capacity=gc.max_keyframes,
                       kf_dist_m=gc.keyframe_translation_m,
                       kf_rot_deg=gc.keyframe_rotation_deg,
                       use_pallas=rc.use_pallas,
                       use_dense=rc.use_dense_index,
                       reassociate_every=rc.reassociate_every,
                       map_decay=rc.map_decay,
                       frame_rate_hz=sc.rpm / 60.0)
        eng.run_device(seq["packets"], seq["pkt_times_us"], scratch.track,
                       batch=batch)
        dev = eng.finalize_device(
            min_score=gc.sc_min_score, radius=gc.loop_closure_radius_m,
            min_gap=gc.loop_closure_min_gap,
            max_candidates=self._sweep_budget(
                eng, gc.max_closure_candidates_per_sweep),
            use_scan_context=gc.use_scan_context,
            gn_iterations=gc.gn_iterations, odom_info=gc.odom_edge_info,
            closure_info=gc.closure_edge_info, voxel_size=gc.verify_voxel_m,
            capacity=rc.scan_voxel_capacity)
        block(dev)
        # Post-readback host-path programs on production shapes:
        P = eng.kf_scan_points
        zp = jnp.zeros((_BATCH_CHUNK, P, 3), jnp.float32)
        zm = jnp.zeros((_BATCH_CHUNK, P), bool)
        zq = jnp.zeros((_BATCH_CHUNK, 4), jnp.float32).at[:, 0].set(1.0)
        z3 = jnp.zeros((_BATCH_CHUNK, 3), jnp.float32)
        block(_transform_build_chunk(                      # map rebuild
            zp, zm, zq, z3, z3,
            jnp.asarray(self.cfg.map.voxel_size, jnp.float32),
            capacity=min(self.cfg.map.voxels_per_patch, P)))
        block(_transform_build_chunk(                      # landmark posts
            zp, zm, zq, z3, z3, jnp.asarray(0.5, jnp.float32),
            capacity=8192))
        # Warm the PRODUCTION solve path at the _crop_graph bucket
        # floors (128/64/512/512) UNDER the host-CPU placement context —
        # drives up to ~128 keyframes then hit fully-warm executables at
        # finalize (the floors exist exactly so these shapes are
        # predictable; VERDICT r4 #3's graph_solve seconds were this
        # compile).
        zg = PG(max_poses=128, max_edges=512, max_landmarks=64,
                max_obs=512)
        za = zg.arrays()
        with self._solve_device_ctx(1):
            from veloslam_tpu.graph import pcg
            block(pcg.solve_auto(za, max_poses=128,
                                 iterations=gc.gn_iterations))
            if gc.use_landmarks:
                block(pcg.solve_auto_landmarks(
                    za, max_poses=128, max_landmarks=64,
                    iterations=gc.gn_iterations))

    def warmup(self, duration_s: float = 0.35) -> None:
        """Pre-compile the streaming programs (decode → compensate →
        assemble → register) by pushing a short synthetic drive through a
        scratch pipeline with this config.  Call before `run_online` on
        backends where first-compile latency (minutes on the axon remote
        compile service) would stall live ingest past the idle timeout.
        The jit cache is per-process, keyed on shapes/static args, so the
        scratch instance warms this one."""
        from veloslam_tpu.io import simulate as sim

        seq = sim.generate_sequence(duration_s=duration_s,
                                    model=self.cfg.sensor.model,
                                    seed=0, world=sim.World.demo(1))
        scratch = SlamPipeline(self.cfg)
        for t_us, p, yaw, v in zip(seq["ins_t_us"], seq["ins_pos"],
                                   seq["ins_yaw"], seq["ins_vel"]):
            scratch.feed_ins_pose(
                int(t_us), se3.euler_deg_to_quat_np(0.0, 0.0,
                                                    float(np.rad2deg(yaw))),
                np.asarray(p, float), v)
        B = self.cfg.pipeline.packets_per_batch
        pkts, times = seq["packets"], seq["pkt_times_us"]
        for s in range(0, (len(pkts) // B) * B, B):
            scratch.process_packets(pkts[s:s + B], times[s:s + B])

    def handle_ins_datagram(self, raw: bytes, conv) -> Optional[int]:
        """Dispatch one INS-port datagram on its message id (reference
        INSSource.cxx:217-242, with the RawINS/BestGPSPos stubs actually
        implemented): InsPVA → pose track (returns its timestamp µs);
        RawINS → IMU sample log + status; BestGPSPos → GPS solution
        health."""
        mid = pk.peek_message_id(raw)
        h = self.ins_health
        if mid == C.INS_MSG_INSPVA and len(raw) >= pk.INSPVA_BYTES:
            msg = pk.unpack_inspva(raw)
            t_us, q, t3, v = conv.convert(msg)
            self.feed_ins_pose(t_us, q, t3, v)
            h["inspva_count"] += 1
            return t_us
        if mid == C.INS_MSG_RAWINS and len(raw) >= pk.RAWINS_BYTES:
            msg = pk.unpack_rawins(raw)
            t_us = timesync.ins_timestamp_us(
                msg["week_number"], msg["milliseconds"],
                msg["week_number"], msg["milliseconds"] / 1e3)
            self.imu_log.append((t_us, msg["imu_status"],
                                 tuple(msg["accel_raw"])))
            h["rawins_count"] += 1
            h["last_imu_status"] = msg["imu_status"]
            return None
        if mid == C.INS_MSG_BESTGPSPOS and len(raw) >= pk.BESTGPSPOS_BYTES:
            msg = pk.unpack_bestgpspos(raw)
            h["bestgps_count"] += 1
            h["last_gps_solution"] = msg["solution"]
            h["last_gps_status"] = msg["gps_status"]
            h["last_diff_age"] = msg["diff_age"]
            return None
        h["unknown_count"] += 1
        return None

    def run_online(self, lidar_port: int = None, ins_port: int = None,
                   position_port: int = None,
                   origin_llh_deg=None, duration_s: Optional[float] = None,
                   idle_timeout_s: float = 2.0,
                   on_ready=None, fast: bool = False) -> Dict:
        """Live acquisition (startOnline equivalent, HDLManager.h:111):
        UDP LiDAR + INS + position-packet ingest until `duration_s` elapses
        or the stream goes idle.  HDL µs-into-hour stamps resolve against
        GPS UTC when the sensor's position packets (port 8308, the second
        port the reference binds, HDLSource.cxx:484-485) carry a valid
        $GPRMC fix; otherwise against the INS time base when available
        (TimeSolver semantics, TimeSolver.cxx:33-49), else the wall
        clock.

        `fast=True` routes packet batches through the device-resident
        FullSlam engine (zero readbacks during the stream; the same
        end-of-stream device sweep as run_offline_batched) instead of the
        host-orchestrated per-frame loop — the mode that keeps up with a
        live sensor on high-dispatch-latency backends.  `live_stats` on
        the result reports sustained packet counts, receiver drops, and
        per-batch feed latency."""
        import time as _time

        from veloslam_tpu import constants as C
        from veloslam_tpu.core import timesync
        from veloslam_tpu.io import packets as pkmod
        from veloslam_tpu.io.ins import InsConverter
        from veloslam_tpu.io.udp import UdpReceiver

        lidar_port = lidar_port or C.LIDAR_DATA_PORT
        ins_port = ins_port or C.INS_PORT
        position_port = position_port or C.LIDAR_POSITION_PORT
        conv = InsConverter(origin_llh_deg)
        clock = timesync.HdlClock()
        B = self.cfg.pipeline.packets_per_batch
        buf: List[np.ndarray] = []
        buf_times: List[np.ndarray] = []
        pre_buf: List[np.ndarray] = []     # LiDAR held until a time base
        pre_times: List[np.ndarray] = []   # (INS/GPS) is established
        buffered = 0
        first_ins_us: Optional[int] = None
        t_start = _time.monotonic()
        last_rx = t_start
        stats = {"lidar_packets": 0, "ins_datagrams": 0,
                 "position_packets": 0, "batches": 0,
                 "batch_feed_ms_max": 0.0, "batch_feed_ms_sum": 0.0}
        eng = None
        if fast:
            from veloslam_tpu.runtime.fullslam import FullSlam
            from veloslam_tpu.runtime.odometry import slots_for_batch
            sc2 = self.cfg.sensor
            rc2 = self.cfg.registration
            gc2 = self.cfg.graph
            eng = FullSlam(self.dcalib, model=sc2.model,
                           n_beams=sc2.n_lasers,
                           voxel_size=rc2.voxel_size,
                           map_capacity=rc2.rolling_map_capacity,
                           reg_points=rc2.max_points,
                           reg_iterations=rc2.max_iterations,
                           kf_capacity=gc2.max_keyframes,
                           kf_dist_m=gc2.keyframe_translation_m,
                           kf_rot_deg=gc2.keyframe_rotation_deg,
                           use_pallas=rc2.use_pallas,
                           use_dense=rc2.use_dense_index,
                           reassociate_every=rc2.reassociate_every,
                           map_decay=rc2.map_decay,
                           frame_rate_hz=sc2.rpm / 60.0)
            need = slots_for_batch(sc2.model, B,
                                   frame_rate_hz=sc2.rpm / 60.0)
            if need > eng.MAX_FRAMES_BATCH:
                eng.MAX_FRAMES_BATCH = need
            if duration_s is not None:
                # Pre-size device buffers so nothing regrows (and thus
                # recompiles) mid-stream.
                fr = sc2.rpm / 60.0 * 1.2
                eng.ensure_kf_capacity(int(duration_s * fr) + 8)
                eng.ensure_capacity(-(-(int(duration_s * fr)
                                        + 2 * eng.MAX_FRAMES_BATCH + 16)
                                      // 1024) * 1024)

        def consume(pkts_b: np.ndarray, times_b: np.ndarray) -> None:
            t0b = _time.perf_counter()
            if eng is not None:
                t0, t1 = int(times_b[0]), int(times_b[-1])
                w = self.track.window(t0, t1, anchor_us=t0)
                eng.feed(pkts_b, times_b, w)   # async dispatch, 0 readbacks
            else:
                self.process_packets(pkts_b, times_b)
            ms = (_time.perf_counter() - t0b) * 1e3
            stats["batches"] += 1
            stats["batch_feed_ms_sum"] += ms
            stats["batch_feed_ms_max"] = max(stats["batch_feed_ms_max"], ms)

        # The INS port multiplexes message types of different sizes
        # (InsPVA 104 B, RawINS 24 B, BestGPSPos 20 B) — variable receiver.
        with UdpReceiver(lidar_port, C.HDL_PACKET_BYTES) as hdl_rx, \
                UdpReceiver(ins_port, pkmod.INSPVA_BYTES,
                            variable=True) as ins_rx, \
                UdpReceiver(position_port,
                            C.POSITION_PACKET_BYTES) as pos_rx:
            if on_ready is not None:
                on_ready()          # ports are bound; senders may start
            while True:
                if (duration_s is not None
                        and _time.monotonic() - t_start > duration_s):
                    break
                ins_pkts, ins_lens, _ = ins_rx.poll_var()
                for raw, ln in zip(ins_pkts, ins_lens):
                    t_us = self.handle_ins_datagram(
                        raw[:ln].tobytes(), conv)
                    if t_us is not None and first_ins_us is None:
                        first_ins_us = t_us
                stats["ins_datagrams"] += len(ins_pkts)
                pos_pkts, _ = pos_rx.poll()
                for raw in pos_pkts:
                    self.handle_position_packet(raw.tobytes(), clock)
                stats["position_packets"] += len(pos_pkts)
                pkts, rx_times = hdl_rx.poll()
                stats["lidar_packets"] += len(pkts)
                if len(pkts):
                    # Resolve GPS µs-into-hour stamps to absolute time —
                    # vectorized; the reference base is GPS grounding when
                    # a position fix arrived, else INS, else wall clock.
                    # The base LATCHES on first resolution, so do NOT
                    # resolve until a proper base exists: latching the
                    # wall clock milliseconds before the first INS
                    # datagram would put LiDAR times and the pose track
                    # in different epochs, and prior extrapolation across
                    # that gap destroys every estimate.  Fall back to the
                    # wall clock only after `base_wait` (pure-LiDAR
                    # setups with no INS/GPS at all).
                    base_ready = (clock.grounded
                                  or first_ins_us is not None
                                  or _time.monotonic() - t_start > 1.0)
                    if not base_ready:
                        pre_buf.append(pkts)
                        pre_times.append(rx_times)
                    else:
                        if pre_buf:      # backlog first (stream order)
                            pkts = np.concatenate(pre_buf + [pkts])
                            rx_times = np.concatenate(pre_times
                                                      + [rx_times])
                            pre_buf, pre_times = [], []
                        fields = pkmod.decode_lidar_packets_np(pkts)
                        ref = (None if clock.grounded
                               else (first_ins_us
                                     if first_ins_us is not None
                                     else int(rx_times[0])))
                        resolved = clock.resolve_batch(fields["gps_us"],
                                                       ref_time_us=ref)
                        buf.append(pkts)
                        buf_times.append(resolved)
                        buffered += len(pkts)
                    while buffered >= B:
                        allp = np.concatenate(buf)
                        allt = np.concatenate(buf_times)
                        consume(allp[:B], allt[:B])
                        buf = [allp[B:]]
                        buf_times = [allt[B:]]
                        buffered -= B
                if len(pkts) or len(ins_pkts) or len(pos_pkts):
                    # Stamp AFTER any processing: batch compute time must
                    # not count toward the idle window, or a slow/first
                    # batch ends the session with packets still queued.
                    last_rx = _time.monotonic()
                else:
                    if _time.monotonic() - last_rx > idle_timeout_s:
                        break
                    _time.sleep(0.005)
            # Flush the trailing partial batch so end-of-stream frames are
            # not dropped (the reference decodes every packet it received).
            # Padded with idle packets (no returns, frozen azimuth) up to
            # the standard batch size: reuses the compiled fixed-shape
            # program instead of compiling one per partial length.
            if pre_buf:
                # Stream ended before a base arrived: resolve the backlog
                # against the wall clock (last resort).
                pk2 = np.concatenate(pre_buf)
                rx2 = np.concatenate(pre_times)
                f2 = pkmod.decode_lidar_packets_np(pk2)
                ref2 = (None if clock.grounded
                        else (first_ins_us if first_ins_us is not None
                              else int(rx2[0])))
                buf.append(pk2)
                buf_times.append(clock.resolve_batch(f2["gps_us"],
                                                     ref_time_us=ref2))
                buffered += len(pk2)
                while buffered >= B:
                    allp = np.concatenate(buf)
                    allt = np.concatenate(buf_times)
                    consume(allp[:B], allt[:B])
                    buf = [allp[B:]]
                    buf_times = [allt[B:]]
                    buffered -= B
            if buffered > 0:
                allp = np.concatenate(buf)[:buffered]
                allt = np.concatenate(buf_times)[:buffered]
                pad = B - buffered
                if pad > 0:
                    allp = np.concatenate(
                        [allp, pkmod.idle_lidar_packets(allp[-1], pad)])
                    allt = np.concatenate(
                        [allt, np.full(pad, allt[-1], np.int64)])
                consume(allp, allt)
            stats["lidar_dropped"] = hdl_rx.dropped
            stats["ins_dropped"] = ins_rx.dropped
        if eng is not None and stats["batches"] > 0:
            self._finalize_batched_engine(eng)
        stats["batch_feed_ms_mean"] = round(
            stats.pop("batch_feed_ms_sum")
            / max(stats["batches"], 1), 3)
        res = self.results()
        res["live_stats"] = stats
        return res

    # --- per-frame SLAM loop ------------------------------------------------

    def _ins_pose_at(self, t_us: int) -> Optional[se3.Pose]:
        if len(self.track) == 0:
            return None
        w = self.track.window(t_us, t_us + 1, anchor_us=t_us)
        from veloslam_tpu.core.timeline import interpolate_poses
        p = interpolate_poses(jnp.asarray(w["rel_s"]), jnp.asarray(w["q"]),
                              jnp.asarray(w["t"]), jnp.asarray(w["v"]),
                              jnp.zeros(1, jnp.float32))
        return se3.Pose(p.q[0], p.t[0])

    def _subsample(self, frame: Dict) -> Tuple[np.ndarray, np.ndarray]:
        pts = frame["xyz"][frame["mask"]]
        P = self.cfg.registration.max_points
        if len(pts) > P:
            stride = int(np.ceil(len(pts) / P))
            pts = pts[::stride][:P]
        out = np.zeros((P, 3), np.float32)
        msk = np.zeros(P, bool)
        out[:len(pts)] = pts
        msk[:len(pts)] = True
        return out, msk

    def _register_frame(self, pts: np.ndarray, mask: np.ndarray,
                        T_prior: se3.Pose):
        """Scan-to-map registration against the ROI around the prior.
        Returns the registration result or None (no map content yet).
        Overridden by the distributed session (parallel.session) to
        register against the globally-sharded map."""
        rc = self.cfg.registration
        prior_t = np.asarray(T_prior.t)
        roi = self.map.roi_grid(float(prior_t[0]), float(prior_t[1]))
        if roi is None:
            return None
        with self.timers.stage("register"):
            if rc.method == "d2d":
                from veloslam_tpu.registration import d2d
                src = vx.build_grid(
                    jnp.asarray(pts), jnp.asarray(mask),
                    roi.origin, roi.voxel_size,
                    capacity=rc.scan_voxel_capacity)
                usable = d2d.usable_mask(
                    roi, min_points=rc.min_points_per_voxel)
                return d2d.register_d2d(
                    src, roi, usable, T_prior,
                    iterations=rc.max_iterations, damping=rc.damping,
                    max_dist=rc.max_correspondence_dist)
            if rc.method == "ndt":
                from veloslam_tpu.registration import ndt
                target = ndt.build_ndt_grid(
                    roi, min_points=rc.min_points_per_voxel)
                return ndt.register(
                    jnp.asarray(pts), jnp.asarray(mask), target,
                    T_prior, iterations=rc.max_iterations,
                    max_dist=rc.max_correspondence_dist)
            target = gicp.plane_grid_from(
                roi, min_points=rc.min_points_per_voxel,
                min_planarity=rc.min_planarity)
            # Per-frame (host-orchestrated) path: exact nearest-mean
            # correspondence — it keeps the O(1) index but NOT the
            # dilated/center approximations the batched engine uses.
            # It DOES inherit reassociate_every from the config (block
            # re-association is itself an approximation vs per-iteration
            # search; set reassociate_every=1 for classical ICP).
            dense = (vx.build_dense_index(roi)
                     if rc.use_dense_index else None)
            return gicp.register(
                jnp.asarray(pts), jnp.asarray(mask), target,
                T_prior, iterations=rc.max_iterations,
                damping=rc.damping, huber_delta=rc.huber_delta,
                max_dist=rc.max_correspondence_dist,
                use_pallas=rc.use_pallas, dense=dense,
                reassociate_every=rc.reassociate_every,
                dense_approx_centers=False)

    @staticmethod
    def _crop_graph(arrays, n_poses: int, n_landmarks: int = 0,
                    n_edges: int = 0, n_obs: int = 0):
        """Crop GraphArrays to power-of-two buckets covering the OCCUPIED
        prefix: the dense solve scales with CAPACITY, not count — at the
        default 1024-pose capacity a 35-keyframe session paid a (6144)²
        Cholesky x8 iterations (~30 s single-core) for 35 real poses.
        Buckets keep recompiles bounded."""
        def b(n, lo=32):
            n = max(int(n), 1)
            return max(lo, 1 << int(np.ceil(np.log2(n))))
        # Bucket FLOORS (128/64/512/512): padding a small graph to the
        # floor costs microseconds of extra math, but it pins the common
        # shapes so warmup_batched can pre-compile the host-CPU solve
        # executables — without the floors every drive length lands in
        # its own (Kc, Mc, Ec, Oc) combination and the measured run pays
        # a multi-second first-call compile (VERDICT r4 #3).
        Kc = min(b(n_poses, 128), arrays.q.shape[0])
        Mc = min(b(max(n_landmarks, 1), 64), arrays.l_pos.shape[0])
        Ec = min(b(max(n_edges, 1), 512), arrays.e_i.shape[0])
        Oc = min(b(max(n_obs, 1), 512), arrays.o_i.shape[0])
        return Kc, arrays._replace(
            q=arrays.q[:Kc], t=arrays.t[:Kc],
            e_i=arrays.e_i[:Ec], e_j=arrays.e_j[:Ec],
            e_q=arrays.e_q[:Ec], e_t=arrays.e_t[:Ec],
            e_info=arrays.e_info[:Ec], e_valid=arrays.e_valid[:Ec],
            l_pos=arrays.l_pos[:Mc],
            o_i=arrays.o_i[:Oc], o_l=arrays.o_l[:Oc],
            o_z=arrays.o_z[:Oc], o_info=arrays.o_info[:Oc],
            o_valid=arrays.o_valid[:Oc]), Mc

    def _solve_device_ctx(self, n_poses: int):
        """Placement context for the end-of-session graph solves: small
        graphs run on the host CPU backend when one is registered
        (GraphConfig.host_solve) — post-readback device calls on a
        high-latency link cost more than the solve itself (VERDICT r4
        #3: 1.63 s of tunnel round-trips for ~10 ms of math)."""
        import contextlib
        gc = self.cfg.graph
        if (not gc.host_solve or n_poses > gc.host_solve_max_poses
                or jax.default_backend() == "cpu"):
            return contextlib.nullcontext()
        from veloslam_tpu.utils import hostdev
        dev = hostdev.cpu_device()
        if dev is None:
            return contextlib.nullcontext()
        return jax.default_device(dev)

    def _solve_graph(self, arrays):
        """Pose-graph solve primitive (overridden by the distributed
        session to run the edge-sharded psum solver over the mesh)."""
        from veloslam_tpu.graph import pcg
        Kc, cropped, _ = self._crop_graph(
            arrays, self.graph.n_poses, 0, self.graph.n_edges, 0)
        with self._solve_device_ctx(self.graph.n_poses):
            out, _ = pcg.solve_auto(
                cropped, max_poses=Kc,
                iterations=self.cfg.graph.gn_iterations)
        return out

    def _solve_graph_landmarks(self, arrays):
        """Landmark-aided solve primitive (sharded in the session):
        dense Schur below pcg.DENSE_MAX_POSES, matrix-free landmark-Schur
        PCG beyond it — landmark sessions scale to the same 16k+ poses as
        pose-only ones."""
        from veloslam_tpu.graph import pcg
        Kc, cropped, Mc = self._crop_graph(
            arrays, self.graph.n_poses, self.graph.n_landmarks,
            self.graph.n_edges, self.graph.n_obs)
        with self._solve_device_ctx(self.graph.n_poses):
            out, _ = pcg.solve_auto_landmarks(
                cropped, max_poses=Kc, max_landmarks=Mc,
                iterations=self.cfg.graph.gn_iterations)
        return out

    def _integrate_scan(self, pts_world: np.ndarray, mask: np.ndarray,
                        center: np.ndarray, map_obj=None,
                        sign: float = 1.0) -> None:
        """Scan → map integration (overridden by the distributed session
        to keep only this process's owned tiles)."""
        (map_obj or self.map).integrate_points(pts_world, mask,
                                               center=center, sign=sign)

    def _tile_filter(self):
        """Tile-ownership predicate for batched map integration (None =
        keep everything; the distributed session returns its owns_tile)."""
        return None

    def _handle_frame(self, frame: Dict, start_us: int,
                      source: Optional[tuple] = None) -> None:
        rc = self.cfg.registration
        ins = self._ins_pose_at(start_us)
        frame_world = frame  # compensated into INS world frame (or sensor)

        # Local cloud: relative to the frame-start INS pose.
        if ins is not None:
            inv_ins = se3.inverse(ins)
            pts_local_full = np.asarray(se3.apply(
                inv_ins, jnp.asarray(frame["xyz"], jnp.float32)))
        else:
            pts_local_full = frame["xyz"]
        local_frame = dict(frame)
        local_frame["xyz"] = pts_local_full
        pts, mask = self._subsample(local_frame)

        # Prior: previous estimate composed with the INS relative motion.
        if self._last_est is None:
            T_prior = ins if ins is not None else se3.Pose.identity()
        elif ins is not None and self._last_ins is not None:
            rel = se3.compose(se3.inverse(self._last_ins), ins)
            T_prior = se3.compose(self._last_est, rel)
        else:
            T_prior = self._last_est

        # Localize against the map ROI.
        registered = False
        n_matched, mean_error = 0, float("nan")
        T_est = T_prior
        res = self._register_frame(pts, mask, T_prior)
        if res is not None:
            n_matched = int(res.n_matched)
            mean_error = float(res.mean_error)
            # d2d matches voxels; gicp/ndt match points
            min_matched = (rc.min_matched_voxels if rc.method == "d2d"
                           else rc.min_matched_points)
            if n_matched > min_matched and np.isfinite(mean_error):
                T_est = res.pose
                registered = True

        # Integrate the corrected scan into the map.
        pts_world = np.asarray(se3.apply(T_est, jnp.asarray(pts)))
        est_t = np.asarray(T_est.t)
        with self.timers.stage("map_update"):
            self._integrate_scan(pts_world, mask, est_t)

        # Bookkeeping.
        self.frames.add_frame(start_us, frame_world,
                              carpose_q=np.asarray(T_est.q),
                              carpose_t=est_t, source=source)
        self.trajectory.append(FrameResult(
            start_us=start_us, pose_q=np.asarray(T_est.q), pose_t=est_t,
            n_points=int(mask.sum()), n_matched=n_matched,
            mean_error=mean_error, registered=registered))
        self._maybe_keyframe(T_est, pts, mask, start_us)
        self._last_ins = ins
        self._last_est = T_est

    # --- keyframes + loop closure -------------------------------------------

    def _maybe_keyframe(self, T_est: se3.Pose, pts: np.ndarray,
                        mask: np.ndarray, start_us: int) -> None:
        gc = self.cfg.graph
        if self.graph.n_poses > 0:
            k = self.graph.n_poses - 1
            last = _np_pose(self.graph.q[k], self.graph.t[k])
            rel = se3.relative(last, T_est)
            dt = float(jnp.linalg.norm(rel.t))
            dr = float(jnp.linalg.norm(se3.quat_log(rel.q)))
            if dt < gc.keyframe_translation_m and \
                    dr < np.deg2rad(gc.keyframe_rotation_deg):
                return
        k = self.graph.add_pose(np.asarray(T_est.q), np.asarray(T_est.t))
        self.keyframe_scans.append((pts.copy(), mask.copy()))
        if gc.use_scan_context:
            from veloslam_tpu.graph import scancontext as sc_mod
            self.keyframe_descs.append(np.asarray(sc_mod.scan_context(
                jnp.asarray(pts), jnp.asarray(mask))))
        self.keyframe_times.append(start_us)
        # Pose this keyframe's scan was integrated into the map with
        # (_handle_frame integrated it just before) — the downdating
        # anchor for incremental map correction after graph solves.
        # Provenance "stream": the scan entered the map through the
        # per-frame integrate_points program, so its downdate must replay
        # that SAME compiled program to be bit-exact (XLA gives no
        # cross-program bitwise guarantee; see update_map_incremental).
        self._kf_map_pose.append((np.asarray(T_est.q), np.asarray(T_est.t)))
        self._kf_integrated_via.append("stream")
        self._kf_pose_at_creation.append((np.asarray(T_est.q),
                                          np.asarray(T_est.t)))
        if k > 0:
            prev = _np_pose(self.graph.q[k - 1], self.graph.t[k - 1])
            rel = se3.relative(prev, T_est)
            self.graph.add_edge(k - 1, k, np.asarray(rel.q),
                                np.asarray(rel.t),
                                    info=self.cfg.graph.odom_edge_info)
        if k - self._kf_count_at_last_close >= \
                gc.keyframes_per_closure_sweep:
            self._try_loop_closure()
            self._kf_count_at_last_close = k

    def _closure_candidates(self) -> List[Tuple[int, int, se3.Pose]]:
        """Candidate (i, j, rel_prior) pairs from BOTH proposal channels:

        * position radius (cheap, but blind once accumulated drift
          exceeds the radius — its prior comes from graph poses);
        * scan-context descriptors (drift-independent appearance matching;
          its prior is the best-shift yaw with zero translation, so
          verification does not depend on the drifted estimates either).
        """
        gc = self.cfg.graph
        q, t = self.graph.poses()
        seen = set(self.closures)
        out: List[Tuple[int, int, se3.Pose]] = []
        for i, j in loopclosure.find_candidates(
                t, radius=gc.loop_closure_radius_m,
                min_gap=gc.loop_closure_min_gap):
            if (i, j) in seen:
                continue
            seen.add((i, j))
            out.append((i, j, se3.relative(_np_pose(q[i], t[i]),
                                           _np_pose(q[j], t[j]))))
        if gc.use_scan_context and len(self.keyframe_descs) >= 2:
            from veloslam_tpu.graph import scancontext as sc_mod
            # Pad the descriptor stack to a power-of-two bucket: the
            # all-pairs program then compiles a handful of times per
            # session instead of once per sweep size (zero descriptors
            # score 0 and are excluded via n_valid).
            descs = np.stack(self.keyframe_descs)
            bucket = max(16, 1 << int(np.ceil(np.log2(len(descs)))))
            if len(descs) < bucket:
                descs = np.concatenate(
                    [descs, np.zeros((bucket - len(descs),)
                                     + descs.shape[1:], descs.dtype)])
            scores, shifts = sc_mod.descriptor_scores(jnp.asarray(descs))
            for i, j, _, shift in sc_mod.propose(
                    np.asarray(scores), np.asarray(shifts),
                    n_valid=len(self.keyframe_descs),
                    min_score=gc.sc_min_score,
                    min_gap=gc.loop_closure_min_gap,
                    exclude=seen):
                seen.add((i, j))
                yaw = float(sc_mod.relative_yaw(shift))
                out.append((i, j, se3.Pose(
                    jnp.asarray([np.cos(yaw / 2), 0.0, 0.0,
                                 np.sin(yaw / 2)], jnp.float32),
                    jnp.zeros(3, jnp.float32))))
        return out[:gc.max_closure_candidates_per_sweep]

    def _try_loop_closure(self) -> None:
        rc = self.cfg.registration
        gc = self.cfg.graph
        new_p = self._closure_candidates()
        new = [(i, j) for i, j, _ in new_p]
        accepted = 0
        if new:
            # All candidates of the sweep verify in one batched program
            # (vmapped grid build + stacked-target register_batch), PADDED
            # to the sweep cap so the program compiles once per process —
            # a per-count shape would recompile on every sweep size.
            cap = self.cfg.graph.max_closure_candidates_per_sweep
            pad = cap - len(new)
            z_p = np.zeros_like(self.keyframe_scans[0][0])
            z_m = np.zeros_like(self.keyframe_scans[0][1])
            pi = jnp.asarray(np.stack(
                [self.keyframe_scans[i][0] for i, _ in new]
                + [z_p] * pad))
            mi = jnp.asarray(np.stack(
                [self.keyframe_scans[i][1] for i, _ in new]
                + [z_m] * pad))
            pj = jnp.asarray(np.stack(
                [self.keyframe_scans[j][0] for _, j in new]
                + [z_p] * pad))
            mj = jnp.asarray(np.stack(
                [self.keyframe_scans[j][1] for _, j in new]
                + [z_m] * pad))
            ident = se3.Pose.identity()
            rel_priors = se3.Pose(
                jnp.stack([p.q for _, _, p in new_p]
                          + [ident.q] * pad),
                jnp.stack([p.t for _, _, p in new_p]
                          + [ident.t] * pad))
            with self.timers.stage("loop_verify"):
                measures = loopclosure.verify_closures_batch(
                    pi, mi, pj, mj, rel_priors,
                    voxel_size=gc.verify_voxel_m,
                    capacity=rc.scan_voxel_capacity)
            for (i, j), meas in zip(new, measures):
                if meas is None:
                    continue
                self.graph.add_edge(i, j, np.asarray(meas.q),
                                    np.asarray(meas.t),
                                    info=self.cfg.graph.closure_edge_info)
                self.closures.append((i, j))
                accepted += 1
        if accepted:
            with self.timers.stage("graph_solve"):
                out = self._solve_graph(self.graph.arrays())
            self.graph.update_from(np.asarray(out.q)[:self.graph.n_poses],
                                   np.asarray(out.t)[:self.graph.n_poses])
            with self.timers.stage("map_downdate"):
                self.update_map_incremental()

    def update_map_incremental(self, move_threshold_m: float = 0.05
                               ) -> int:
        """Incremental voxel downdating: for each keyframe whose optimized
        pose moved more than `move_threshold_m` since its scan was
        integrated, SUBTRACT the scan's voxel statistics at the old pose
        and re-add them at the new pose.  Touches only moved keyframes —
        a mid-session correction far cheaper than `rebuild_map` (which
        stays the exact end-of-session path; non-keyframe frames'
        contributions are not tracked and remain as integrated).  Returns
        the number of keyframes re-integrated.

        Exactness: the subtraction replays the SAME compiled program the
        scan was integrated with (tracked in `_kf_integrated_via`) — XLA
        gives no bitwise guarantee across different compilations, so a
        batched downdate of a stream-integrated scan could voxelize
        boundary points differently and leave stale residue."""
        q, t = self.graph.poses()
        moved_k = [
            k for k in range(len(self.keyframe_scans))
            if not (np.linalg.norm(t[k] - self._kf_map_pose[k][1])
                    < move_threshold_m
                    and abs(float(np.dot(q[k], self._kf_map_pose[k][0])))
                    > 0.999995)]
        if not moved_k:
            return 0
        def via(k):  # untracked keyframes default to the stream path
            return (self._kf_integrated_via[k]
                    if k < len(self._kf_integrated_via) else "stream")
        stream_k = [k for k in moved_k if via(k) == "stream"]
        batch_k = [k for k in moved_k if via(k) != "stream"]
        # Stream-integrated scans: replay the per-frame programs
        # (se3.apply + integrate_points) at the old pose with sign −1 —
        # bit-exact inverse — then re-add through the same path so future
        # downdates stay exact.
        for k in stream_k:
            pts_k, msk_k = self.keyframe_scans[k]
            old_q, old_t = self._kf_map_pose[k]
            pw_old = np.asarray(se3.apply(_np_pose(old_q, old_t),
                                          jnp.asarray(pts_k)))
            self._integrate_scan(pw_old, msk_k, old_t, sign=-1.0)
            pw_new = np.asarray(se3.apply(_np_pose(q[k], t[k]),
                                          jnp.asarray(pts_k)))
            self._integrate_scan(pw_new, msk_k, t[k])
        if batch_k:
            # One batched pass: downdate every moved scan at its old pose
            # (sign −1), re-add at the new pose — 2·M entries, chunked
            # device programs instead of ~12·M dispatch round-trips.
            pts = np.stack([self.keyframe_scans[k][0] for k in batch_k] * 2)
            msk = np.stack([self.keyframe_scans[k][1] for k in batch_k] * 2)
            qs = np.stack([self._kf_map_pose[k][0] for k in batch_k]
                          + [q[k] for k in batch_k])
            ts = np.stack([self._kf_map_pose[k][1] for k in batch_k]
                          + [t[k] for k in batch_k])
            signs = np.concatenate([-np.ones(len(batch_k)),
                                    np.ones(len(batch_k))])
            self.map.integrate_scans_batch(pts, msk, qs, ts, signs=signs,
                                           tile_filter=self._tile_filter())
        for k in moved_k:
            self._kf_map_pose[k] = (q[k].copy(), t[k].copy())
        return len(moved_k)

    def rebuild_map(self) -> None:
        """Re-integrate all keyframe scans with their optimized graph poses
        into a fresh map — run after loop closures so the map reflects the
        corrected trajectory (the reference has no equivalent; its map
        layer has no producers)."""
        q, t = self.graph.poses()
        fresh = VoxelMap(self.cfg.map, spill_dir=self.map.spill_dir)
        K = len(self.keyframe_scans)
        if K:
            fresh.integrate_scans_batch(
                np.stack([p for p, _ in self.keyframe_scans]),
                np.stack([m for _, m in self.keyframe_scans]),
                q[:K], t[:K], tile_filter=self._tile_filter())
            for k in range(min(K, len(self._kf_map_pose))):
                self._kf_map_pose[k] = (q[k].copy(), t[k].copy())
                self._kf_integrated_via[k] = "batch"
        self.map = fresh

    def _correct_trajectory(self, old_q: np.ndarray, old_t: np.ndarray
                            ) -> None:
        """Propagate a graph solve to the per-frame trajectory: the world-
        frame correction C_k = T_new_k ∘ T_old_k⁻¹ of each keyframe is
        interpolated (slerp/lerp over keyframe times) at every frame time
        and left-composed onto the frame's pose — exact at keyframes,
        smooth between them.

        Pure host numpy: this runs AFTER the end-of-stream readback, where
        every device dispatch is degraded on the axon backend and the
        trajectory-length-dependent shapes would recompile per recording —
        a few thousand poses are microseconds of numpy instead."""
        if not self.trajectory or self.graph.n_poses < 1:
            return
        from veloslam_tpu.core.timeline import interpolate_poses_np
        new_q, new_t = self.graph.poses()
        K = len(new_q)
        inv_q, inv_t = se3.inverse_np(old_q[:K], old_t[:K])
        corr_q, corr_t = se3.compose_np(new_q, new_t, inv_q, inv_t)
        kt = np.asarray(self.keyframe_times[:K], np.float64)
        ft = np.asarray([r.start_us for r in self.trajectory], np.float64)
        anchor = kt[0]
        cq, ct = interpolate_poses_np(
            (kt - anchor) * 1e-6, corr_q, corr_t,
            np.zeros((K, 3), np.float32), (ft - anchor) * 1e-6)
        fq = np.stack([r.pose_q for r in self.trajectory])
        ftl = np.stack([r.pose_t for r in self.trajectory])
        q_np, t_np = se3.compose_np(cq, ct, fq, ftl)
        q_np = (q_np / np.linalg.norm(q_np, axis=-1, keepdims=True)
                ).astype(np.float32)
        t_np = t_np.astype(np.float32)
        for i, r in enumerate(self.trajectory):
            r.pose_q, r.pose_t = q_np[i], t_np[i]

    def add_landmark_observations(self) -> Tuple[int, int]:
        """Extract post landmarks from every keyframe scan and add them as
        pose-landmark observations (graph.landmark_assoc) — the landmark-
        map capability the reference's MapObjects layer anticipates
        (MapObjects.h:11-46) wired into the production back end.  Runs
        once; returns (n_landmarks, n_observations) added."""
        if getattr(self, "_landmarks_added", False):
            return 0, 0
        if not self.keyframe_scans:      # public method: degrade, not raise
            return 0, 0
        self._landmarks_added = True
        gc = self.cfg.graph
        from veloslam_tpu.graph import landmark_assoc as la
        with self.timers.stage("landmarks"):
            det = la.extract_scan_posts_batch(
                np.stack([p for p, _ in self.keyframe_scans]),
                np.stack([m for _, m in self.keyframe_scans]))
            return la.associate_and_add(
                self.graph, det, radius=gc.landmark_cluster_radius_m,
                min_observations=gc.landmark_min_observations,
                obs_info=gc.landmark_obs_info)

    def finalize(self) -> Dict:
        """End-of-session pass: final loop-closure sweep, landmark
        extraction/association, graph solve (Schur-eliminated landmarks
        when present), map rebuild, per-frame trajectory correction.

        After a device-finalized batched run (run_offline_batched) the
        closure sweep already happened on device, so the host sweep is
        skipped — its programs would otherwise cold-compile here just to
        re-find excluded pairs."""
        if not getattr(self, "_device_closed", False):
            self._try_loop_closure()
        if self.cfg.graph.use_landmarks and self.keyframe_scans:
            self.add_landmark_observations()
        has_closures = self.graph.n_edges > max(self.graph.n_poses - 1, 0)
        if has_closures or self.graph.n_obs > 0:
            with self.timers.stage("graph_solve"):
                if self.graph.n_obs > 0:
                    out = self._solve_graph_landmarks(self.graph.arrays())
                    self.graph.update_from(
                        np.asarray(out.q)[:self.graph.n_poses],
                        np.asarray(out.t)[:self.graph.n_poses],
                        np.asarray(out.l_pos)[:self.graph.n_landmarks])
                    # Outlier trim + one re-solve: Huber bounds the
                    # influence of cross-associations but keeps them in
                    # the system; at the solved state they are separable
                    # by residual (config.landmark_trim_residual_m).
                    trim = self.cfg.graph.landmark_trim_residual_m
                    if trim > 0 and self.graph.trim_observations(trim):
                        out = self._solve_graph_landmarks(
                            self.graph.arrays())
                        self.graph.update_from(
                            np.asarray(out.q)[:self.graph.n_poses],
                            np.asarray(out.t)[:self.graph.n_poses],
                            np.asarray(out.l_pos)[:self.graph.n_landmarks])
                else:
                    out = self._solve_graph(self.graph.arrays())
                    self.graph.update_from(
                        np.asarray(out.q)[:self.graph.n_poses],
                        np.asarray(out.t)[:self.graph.n_poses])
            with self.timers.stage("map_downdate"):
                self.rebuild_map()
            self._map_deferred = False
        if getattr(self, "_map_deferred", False):
            # Deferred batched-run map build with no solve this pass.
            with self.timers.stage("map_build"):
                self.rebuild_map()
            self._map_deferred = False
        # Correct the per-frame trajectory by each keyframe's TOTAL motion
        # since creation (mid-session sweeps may already have solved —
        # the per-frame trajectory was recorded at creation poses).
        if self._kf_pose_at_creation:
            old_q = np.stack([q for q, _ in self._kf_pose_at_creation])
            old_t = np.stack([t for _, t in self._kf_pose_at_creation])
            self._correct_trajectory(old_q, old_t)
            new_q, new_t = self.graph.poses()
            self._kf_pose_at_creation = [
                (new_q[k].copy(), new_t[k].copy())
                for k in range(self.graph.n_poses)]
        return self.results()

    # --- outputs ------------------------------------------------------------

    def results(self) -> Dict:
        traj_t = np.asarray([r.pose_t for r in self.trajectory])
        traj_q = np.asarray([r.pose_q for r in self.trajectory])
        times = np.asarray([r.start_us for r in self.trajectory], np.int64)
        return {
            "times_us": times,
            "positions": traj_t,
            "quaternions": traj_q,
            "registered_fraction": float(np.mean(
                [r.registered for r in self.trajectory]))
            if self.trajectory else 0.0,
            "n_frames": len(self.trajectory),
            "n_keyframes": self.graph.n_poses,
            "n_closures": len(self.closures),
            "n_landmarks": self.graph.n_landmarks,
            "n_landmark_obs": self.graph.n_obs,
            "keyframe_positions": self.graph.poses()[1].copy(),
            "keyframe_times_us": np.asarray(self.keyframe_times, np.int64),
            "map_patches": self.map.n_patches,
            "ring_full": getattr(self, "_ring_full", False),
            "dense_index_min_coverage": getattr(self, "_dense_cov", None),
            "timing": self.timers.summary(),
            "ins_health": dict(self.ins_health),
            "gps_health": dict(self.gps_health),
        }

    def save_checkpoint(self, dirname: str) -> None:
        """Full-session checkpoint: frame meta + pose track + map + graph
        (the .hdlmeta/.insmeta resume contract, SURVEY.md §5)."""
        import os
        os.makedirs(dirname, exist_ok=True)
        self.frames.save_meta(os.path.join(dirname, "frames_meta.npz"),
                              frames_dir=os.path.join(dirname, "frames"))
        self.track.save(os.path.join(dirname, "ins_track.npz"))
        self.map.save(os.path.join(dirname, "map"))
        self.graph.save(os.path.join(dirname, "graph.npz"))

    def load_checkpoint(self, dirname: str) -> None:
        import os
        self.frames.load_meta(os.path.join(dirname, "frames_meta.npz"),
                              spill_dir=os.path.join(dirname, "frames"))
        self.track = PoseTrack.load(os.path.join(dirname, "ins_track.npz"))
        self.map = VoxelMap.load(os.path.join(dirname, "map"), self.cfg.map)
        self.graph = PoseGraph.load(os.path.join(dirname, "graph.npz"))
