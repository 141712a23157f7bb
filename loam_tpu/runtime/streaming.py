"""Online streaming engine: the reference's 4-process real-time graph as
threaded stages over native lossy queues.

The reference runs scanRegistration -> laserOdometry -> laserMapping ->
transformMaintenance as separate OS processes connected by roscpp
subscription queues of depth 2-5 that drop the oldest message under load
(SURVEY.md §1/§2; src/laserOdometry.cpp:357-398); odometry keeps 10 Hz
while mapping consumes every 2nd frame (src/laserOdometry.cpp:51).

Here each stage is a host thread driving a jitted device function; the
inter-stage queues are the native bounded drop-oldest queues
(native/runtime.cc), so an overloaded stage sheds load exactly like the
reference instead of stalling the lidar ingest.  The integration stage
(transformMaintenance) is callback-driven on the odometry output, as in
the reference (src/transformMaintenance.cpp:147-180).

Usage:
    eng = StreamingEngine(cfg)
    eng.start()
    eng.push_sweep(xyz, mask)          # from the sensor thread, 10 Hz
    pose = eng.latest_pose()           # integrated 10 Hz pose
    eng.stop(); print(eng.stats())
"""

from __future__ import annotations

import ctypes
import itertools
import threading
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LoamConfig
from .. import frontend, imu as imu_mod, odometry, mapping, pipeline
from ..ops.features import extract_features
from ..utils import rotations
from ..io.rosbag import _load as _load_native

_IMU_WINDOW = 256  # per-sweep IMU window capacity (reference buffer: 200)


class NativeQueue:
    """ctypes wrapper over the native drop-oldest bounded queue."""

    def __init__(self, capacity: int):
        lib = _load_native()
        lib.loam_q_create.restype = ctypes.c_void_p
        lib.loam_q_create.argtypes = [ctypes.c_long]
        lib.loam_q_push.restype = ctypes.c_int
        lib.loam_q_push.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.loam_q_pop.restype = ctypes.c_int
        lib.loam_q_pop.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_long
        ]
        lib.loam_q_close.argtypes = [ctypes.c_void_p]
        lib.loam_q_stats.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_uint64)
        ] * 4
        lib.loam_q_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._h = lib.loam_q_create(capacity)
        self._slots: dict[int, object] = {}
        self._next = itertools.count()
        self._lock = threading.Lock()

    def push(self, obj) -> bool:
        """Returns False if an old entry was dropped to make room."""
        with self._lock:
            handle = next(self._next)
            self._slots[handle] = obj
        dropped = ctypes.c_uint64()
        rc = self._lib.loam_q_push(self._h, handle, ctypes.byref(dropped))
        if rc != 0:
            with self._lock:
                self._slots.pop(handle, None)
            return True
        if dropped.value != 0xFFFFFFFFFFFFFFFF:
            with self._lock:
                self._slots.pop(dropped.value, None)
            return False
        return True

    def pop(self, timeout_ms: int = -1):
        """Returns the object, or None on timeout/closed."""
        out = ctypes.c_uint64()
        rc = self._lib.loam_q_pop(self._h, ctypes.byref(out), timeout_ms)
        if rc != 0:
            return None
        with self._lock:
            return self._slots.pop(out.value, None)

    def close(self):
        self._lib.loam_q_close(self._h)

    def stats(self) -> dict:
        vals = [ctypes.c_uint64() for _ in range(4)]
        self._lib.loam_q_stats(self._h, *[ctypes.byref(v) for v in vals])
        return dict(zip(
            ("pushed", "popped", "dropped", "depth"),
            (v.value for v in vals),
        ))


@dataclass
class EngineStats:
    frames_in: int = 0
    odom_frames: int = 0
    map_frames: int = 0
    integrated: int = 0
    queue_stats: dict = field(default_factory=dict)


class StreamingEngine:
    """Threaded 4-stage online pipeline with reference queue depths."""

    def __init__(self, cfg: LoamConfig = LoamConfig(),
                 raw_queue_depth: int = 2, feat_queue_depth: int = 2,
                 map_queue_depth: int = 5):
        self.cfg = cfg
        # queue depths follow the reference's subscriber queues:
        # odometry inputs 2, mapping inputs 5 (src/laserOdometry.cpp:362,
        # src/laserMapping.cpp:340-352)
        self.q_raw = NativeQueue(raw_queue_depth)
        self.q_feats = NativeQueue(feat_queue_depth)
        self.q_map = NativeQueue(map_queue_depth)
        self.stats_ = EngineStats()
        self._pose_lock = threading.Lock()
        self._latest_integrated = np.zeros(6, np.float32)
        self._latest_aft = np.zeros(6, np.float32)
        self._latest_odom = np.zeros(6, np.float32)
        # latest /velodyne_cloud_registered (PointCloud) when
        # cfg.emit_registered is set
        self._latest_registered = None
        self._trajectory: list[np.ndarray] = []
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        self._busy = [False, False, False]  # frontend, odometry, mapping

        c = cfg

        def _front_fn(x, m, it, irpy, iacc, imask, t_scan):
            # per-sweep IMU window -> dead-reckoning -> deskewed ingest
            # (the scanRegistration IMU path, src/scanRegistration.cpp:
            # 286-347,638-660); an all-masked window degrades gracefully
            # to the no-IMU path (SweepImu.valid gates the deskew)
            stream = imu_mod.imu_from_raw(it, irpy, iacc, imask)
            integ = imu_mod.integrate(stream, c)
            sweep, imu_trans = frontend.ingest_sweep_imu(
                x, m, c, stream, integ, t_scan
            )
            feats = extract_features(sweep, c)
            # mapping blend input: IMU rpy at t_scan + scanPeriod
            # (src/laserMapping.cpp:203-222)
            rpy, ok = imu_mod.rpy_at(stream, t_scan + c.scan_period)
            map_rpy = jnp.stack(
                [rpy[0], rpy[2], ok.astype(jnp.float32)]
            )
            return feats, imu_trans, map_rpy

        self._front = jax.jit(_front_fn)
        self._odom = jax.jit(
            lambda s, f, it: odometry.odometry_step(s, f, it, c)
        )
        if c.emit_registered:
            # thread the full-res /velodyne_cloud_3 through mapping so
            # MapOutput.registered (/velodyne_cloud_registered,
            # src/laserMapping.cpp:1060-1069) is produced live
            self._map = jax.jit(
                lambda s, p, cl, su, mr, fu: mapping.mapping_step(
                    s, p, cl, su, mr, c, full=fu
                )
            )
        else:
            self._map = jax.jit(
                lambda s, p, cl, su, mr: mapping.mapping_step(
                    s, p, cl, su, mr, c
                )
            )
        self._odom_state = odometry.OdomState.create(cfg)
        self._map_state = mapping.MapState.create(cfg)
        # transformMaintenance pose pair (src/transformMaintenance.cpp:52-58)
        self._bef = np.zeros(6, np.float32)
        self._aft = np.zeros(6, np.float32)
        # host-side IMU ring buffer (the reference's 200-entry circular
        # buffer, src/scanRegistration.cpp:68-99)
        self._imu_lock = threading.Lock()
        self._imu_t = np.zeros(0, np.float32)
        self._imu_rpy = np.zeros((0, 3), np.float32)
        self._imu_acc = np.zeros((0, 3), np.float32)
        self._sweep_clock = 0.0

    # ---- stage loops ----

    def _imu_window(self, t_scan: float):
        """Snapshot the per-sweep IMU window [t_scan - 0.05,
        t_scan + scanPeriod + 0.05] into fixed-capacity arrays."""
        ts = np.zeros(_IMU_WINDOW, np.float32)
        rp = np.zeros((_IMU_WINDOW, 3), np.float32)
        ac = np.zeros((_IMU_WINDOW, 3), np.float32)
        mk = np.zeros(_IMU_WINDOW, bool)
        with self._imu_lock:
            t = self._imu_t
            lo = int(np.searchsorted(t, t_scan - 0.05))
            hi = min(
                int(np.searchsorted(
                    t, t_scan + self.cfg.scan_period + 0.05
                )),
                lo + _IMU_WINDOW,
            )
            n = hi - lo
            if n > 0:
                ts[:n] = t[lo:hi]
                rp[:n] = self._imu_rpy[lo:hi]
                ac[:n] = self._imu_acc[lo:hi]
                mk[:n] = True
        return ts, rp, ac, mk

    def _frontend_loop(self):
        while not self._stop.is_set():
            item = self.q_raw.pop(timeout_ms=100)
            if item is None:
                continue
            self._busy[0] = True
            try:
                xyz, m, t_scan = item
                ts, rp, ac, mk = self._imu_window(float(t_scan))
                feats, imu_trans, map_rpy = self._front(
                    xyz, m, jax.numpy.asarray(ts), jax.numpy.asarray(rp),
                    jax.numpy.asarray(ac), jax.numpy.asarray(mk),
                    jax.numpy.asarray(np.float32(t_scan)),
                )
                self.q_feats.push((feats, imu_trans, map_rpy))
            finally:
                self._busy[0] = False

    def _odometry_loop(self):
        while not self._stop.is_set():
            item = self.q_feats.pop(timeout_ms=100)
            if item is None:
                continue
            self._busy[1] = True
            self._process_odom(item)
            self._busy[1] = False

    def _process_odom(self, item):
        feats, imu_trans, map_rpy = item
        self._odom_state, out = self._odom(
            self._odom_state, feats, imu_trans
        )
        self.stats_.odom_frames += 1
        pose = np.asarray(out.pose)
        # transformMaintenance: integrate odometry with the latest
        # mapping correction, publish at odometry rate
        with self._pose_lock:
            bef, aft = self._bef.copy(), self._aft.copy()
        integrated = np.asarray(rotations.transform_associate_to_map(
            jax.numpy.asarray(pose), jax.numpy.asarray(bef),
            jax.numpy.asarray(aft),
        ))
        with self._pose_lock:
            self._latest_integrated = integrated
            self._latest_odom = pose
            self._trajectory.append(integrated)
        self.stats_.integrated += 1
        if bool(np.asarray(out.publish_to_mapping)):
            full = out.full if self.cfg.emit_registered else None
            self.q_map.push(
                (pose, out.corner_last, out.surf_last, map_rpy, full)
            )

    def _mapping_loop(self):
        while not self._stop.is_set():
            item = self.q_map.pop(timeout_ms=100)
            if item is None:
                continue
            self._busy[2] = True
            try:
                pose, corner_last, surf_last, map_rpy, full = item
                if full is not None:
                    new_map_state, mout = self._map(
                        self._map_state, jax.numpy.asarray(pose),
                        corner_last, surf_last, map_rpy, full,
                    )
                else:
                    new_map_state, mout = self._map(
                        self._map_state, jax.numpy.asarray(pose),
                        corner_last, surf_last, map_rpy,
                    )
                self.stats_.map_frames += 1
                with self._pose_lock:
                    self._map_state = new_map_state
                    self._bef = np.asarray(mout.pose_bef)
                    self._aft = np.asarray(mout.pose_aft)
                    self._latest_aft = self._aft
                    if mout.registered is not None:
                        self._latest_registered = mout.registered
            finally:
                self._busy[2] = False

    # ---- public API ----

    def start(self):
        self._stop.clear()
        for fn in (self._frontend_loop, self._odometry_loop,
                   self._mapping_loop):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)

    def push_sweep(self, xyz, mask, t_scan: float | None = None) -> bool:
        """Feed one raw sweep (non-blocking; oldest dropped under load,
        like the reference's lossy subscriber queues).  t_scan: sweep
        start time; defaults to a 10 Hz wall clock."""
        if t_scan is None:
            t_scan = self._sweep_clock
            self._sweep_clock += self.cfg.scan_period
        self.stats_.frames_in += 1
        return self.q_raw.push(
            (jax.numpy.asarray(xyz), jax.numpy.asarray(mask),
             float(t_scan))
        )

    def push_imu(self, t, rpy, acc_velodyne) -> None:
        """Feed one IMU sample — the imuHandler subscription
        (src/scanRegistration.cpp:638-660).  rpy: (roll, pitch, yaw) from
        the orientation quaternion; acc_velodyne: raw velodyne-frame
        linear acceleration (gravity removal happens on-device in
        imu_from_raw)."""
        with self._imu_lock:
            self._imu_t = np.append(self._imu_t, np.float32(t))[-2048:]
            self._imu_rpy = np.vstack(
                [self._imu_rpy, np.asarray(rpy, np.float32)[None]]
            )[-2048:]
            self._imu_acc = np.vstack(
                [self._imu_acc, np.asarray(acc_velodyne, np.float32)[None]]
            )[-2048:]

    def latest_pose(self) -> np.ndarray:
        with self._pose_lock:
            return self._latest_integrated.copy()

    def latest_aft(self) -> np.ndarray:
        """Latest aft-mapped pose (/aft_mapped_to_init), locked."""
        with self._pose_lock:
            return self._latest_aft.copy()

    def latest_odom(self) -> np.ndarray:
        """Latest raw odometry pose (/laser_odom_to_init), locked."""
        with self._pose_lock:
            return self._latest_odom.copy()

    def latest_registered(self):
        """Latest registered full-res cloud
        (/velodyne_cloud_registered), or None when cfg.emit_registered
        is off or no mapping frame has completed yet.  Locked snapshot;
        the PointCloud is an immutable pytree."""
        with self._pose_lock:
            return self._latest_registered

    def map_state_snapshot(self):
        """Consistent (map_state, aft_pose) snapshot for observers.

        The mapping loop publishes both under the pose lock, so a reader
        taking the lock never sees a map from frame k paired with the
        pose of frame k+1.  The returned MapState is an immutable pytree
        of device arrays — safe to read from any thread."""
        with self._pose_lock:
            return self._map_state, self._latest_aft.copy()

    def trajectory(self) -> np.ndarray:
        with self._pose_lock:
            return np.stack(self._trajectory) if self._trajectory else \
                np.zeros((0, 6), np.float32)

    def drain(self, timeout_s: float = 30.0):
        """Block until all queued work is processed (for replay use)."""
        import time

        t0 = time.time()
        idle_streak = 0
        while time.time() - t0 < timeout_s:
            st = [self.q_raw.stats(), self.q_feats.stats(),
                  self.q_map.stats()]
            if all(s["depth"] == 0 for s in st) and not any(self._busy):
                # double-check across a sleep: a pop may have happened
                # between the depth read and the busy-flag set
                idle_streak += 1
                if idle_streak >= 2:
                    return True
            else:
                idle_streak = 0
            time.sleep(0.02)
        return False

    def stop(self):
        self._stop.set()
        for q in (self.q_raw, self.q_feats, self.q_map):
            q.close()
        for t in self._threads:
            t.join(timeout=5)
        self._threads.clear()

    def stats(self) -> EngineStats:
        self.stats_.queue_stats = {
            "raw": self.q_raw.stats(),
            "feats": self.q_feats.stats(),
            "map": self.q_map.stats(),
        }
        return self.stats_
