"""IMU angular-velocity accumulator -> rotation pretransform.

Behavioral parity: /root/reference/src/util/imu_accumulator.cpp:20-55 —
drains buffered IMU samples with stamp <= cloud stamp, integrates
``ang_vel * dt`` as sequential X/Y/Z axis rotations, and left-multiplies
into an accumulated rotation.  The first sample only seeds the clock.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .ring_buffer import ConcurrentRingBuffer


@dataclass
class ImuSample:
    stamp: float                 # seconds
    angular_velocity: np.ndarray  # (3,) rad/s
    orientation: np.ndarray | None = None  # (4,) unit quaternion (x,y,z,w)


def _axis_rotations(orientation: np.ndarray) -> np.ndarray:
    """AngleAxis(x, Ux) * AngleAxis(y, Uy) * AngleAxis(z, Uz)."""
    rx, ry, rz = orientation
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rx @ Ry @ Rz


class ImuAccumulator:
    def __init__(self, buffer: ConcurrentRingBuffer):
        self.buffer = buffer
        self.first = True
        self.last_stamp = 0.0

    def acc_transform(self, cloud_stamp: float) -> np.ndarray:
        """4x4 rotation pretransform from all IMU samples up to the stamp."""
        acc = np.eye(4, dtype=np.float64)
        while True:
            msg = self.buffer.pop_nb_if(lambda m: cloud_stamp - m.stamp >= 0)
            if msg is None:
                break
            if self.first:
                self.last_stamp = msg.stamp
                self.first = False
                continue
            dt = abs(msg.stamp - self.last_stamp)
            R = _axis_rotations(np.asarray(msg.angular_velocity) * dt)
            acc[:3, :3] = R @ acc[:3, :3]
            self.last_stamp = msg.stamp
        return acc


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    """Unit quaternion (x,y,z,w) -> 3x3 rotation, numpy twin of
    core.geometry.quat_to_mat."""
    x, y, z, w = np.asarray(q, np.float64)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class ImuOrientationDiff:
    """Absolute-orientation-difference pretransform (the fastsense variant).

    Behavioral parity: /root/reference/src/cpu/fastsense.cpp:181-212 — the
    node consumes (Madgwick-)filtered IMU messages carrying absolute
    orientation quaternions; per scan it drains all samples with
    stamp <= cloud stamp, keeps the LAST one, and the rotation pretransform
    is R(q_now) @ R(q_prev)^T (the orientation delta since the previous
    scan).  The first orientation only seeds the anchor.
    """

    def __init__(self, buffer: ConcurrentRingBuffer):
        self.buffer = buffer
        self.last_orientation: np.ndarray | None = None

    def pretransform(self, cloud_stamp: float) -> np.ndarray:
        """4x4 rotation pretransform from the orientation delta."""
        latest = None
        while True:
            msg = self.buffer.pop_nb_if(lambda m: cloud_stamp - m.stamp >= 0)
            if msg is None:
                break
            if msg.orientation is not None:
                latest = np.asarray(msg.orientation, np.float64)
        acc = np.eye(4, dtype=np.float64)
        if latest is None:
            return acc
        if self.last_orientation is not None:
            acc[:3, :3] = (_quat_to_mat_np(latest)
                           @ _quat_to_mat_np(self.last_orientation).T)
        self.last_orientation = latest
        return acc
