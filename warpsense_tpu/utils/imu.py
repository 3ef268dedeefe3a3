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
