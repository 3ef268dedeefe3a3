"""GIL-free byte queue backed by the native C++ ring buffer.

Carries raw scan frames (numpy buffers) between data-loader and pipeline
threads without holding the GIL during waits — the role the reference's
``ConcurrentRingBuffer<sensor_msgs::PointCloud2ConstPtr>`` plays
(/root/reference/include/featsense/buffers.h:15-42).  Falls back to the
pure-Python ConcurrentRingBuffer when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import pickle
from typing import Any, Optional

import numpy as np

from ..native import load as load_native
from .ring_buffer import ConcurrentRingBuffer


class NativeByteQueue:
    """Bounded queue of byte payloads (ws_ringbuf_*)."""

    def __init__(self, capacity: int, lib=None):
        self._lib = lib if lib is not None else load_native()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.ws_ringbuf_create(capacity)

    def push(self, payload: bytes, *, force: bool = False,
             timeout: float = -1.0) -> bool:
        buf = (ctypes.c_char * len(payload)).from_buffer_copy(payload)
        return bool(self._lib.ws_ringbuf_push(
            self._h, buf, len(payload), int(force), timeout))

    def pop(self, *, timeout: float = -1.0, max_bytes: int = 1 << 24
            ) -> Optional[bytes]:
        out = (ctypes.c_char * max_bytes)()
        n = ctypes.c_size_t(0)
        rc = self._lib.ws_ringbuf_pop(self._h, out, max_bytes,
                                      ctypes.byref(n), timeout)
        if rc == -1:  # payload larger than the buffer: retry sized
            return self.pop(timeout=timeout, max_bytes=int(n.value))
        if rc != 1:
            return None
        return bytes(out[: n.value])

    def __len__(self) -> int:
        return int(self._lib.ws_ringbuf_size(self._h))

    def clear(self) -> None:
        self._lib.ws_ringbuf_clear(self._h)

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_h", None)
        if lib is not None and h:
            lib.ws_ringbuf_destroy(h)


class ScanQueue:
    """Typed scan queue: (stamp, (H, W, 3) float32 cloud) frames.

    Uses the native queue when available, ConcurrentRingBuffer otherwise —
    same API either way.
    """

    def __init__(self, capacity: int):
        lib = load_native()
        self._native = None
        self._py: ConcurrentRingBuffer | None = None
        if lib is not None:
            self._native = NativeByteQueue(capacity, lib)
        else:
            self._py = ConcurrentRingBuffer(capacity)

    @property
    def backend(self) -> str:
        return "native" if self._native is not None else "python"

    def push(self, stamp: float, cloud: np.ndarray, *, force: bool = False,
             timeout: float = -1.0) -> bool:
        if self._native is None:
            return (self._py.push_nb((stamp, cloud), force=force) if timeout < 0
                    else self._py.push((stamp, cloud), timeout=timeout))
        payload = pickle.dumps(
            (stamp, np.ascontiguousarray(cloud, dtype=np.float32)),
            protocol=pickle.HIGHEST_PROTOCOL)
        return self._native.push(payload, force=force, timeout=timeout)

    def pop(self, *, timeout: float = -1.0) -> Optional[tuple[float, Any]]:
        if self._native is None:
            return (self._py.pop_nb() if timeout < 0
                    else self._py.pop(timeout=timeout))
        payload = self._native.pop(timeout=timeout)
        return None if payload is None else pickle.loads(payload)

    def __len__(self) -> int:
        return len(self._native if self._native is not None else self._py)

    def clear(self) -> None:
        (self._native if self._native is not None else self._py).clear()
