"""Dependency-free TensorBoard scalar writer.

Replaces the TensorBoard sink of ``fairseq/logging/progress_bar.py:61-74``
(and the ViT recipe's ``--tensorboard-logdir``, ``main.sh:152``) without
pulling in TensorFlow: events are written directly in the TFRecord format
(length-prefixed records with masked CRC32C) containing hand-encoded
``Event``/``Summary`` protobufs — scalars only, which is all the reference
logs.
"""
from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional

# ---- CRC32C (Castagnoli), table-driven --------------------------------------
_POLY = 0x82F63B78
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# ---- minimal protobuf wire encoding -----------------------------------------
def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _f32(num: int, value: float) -> bytes:
    return _field(num, 5) + struct.pack("<f", value)


def _f64(num: int, value: float) -> bytes:
    return _field(num, 1) + struct.pack("<d", value)


def _vint(num: int, value: int) -> bytes:
    return _field(num, 0) + _varint(value)


def _bytes_field(num: int, data: bytes) -> bytes:
    return _field(num, 2) + _varint(len(data)) + data


def _scalar_event(tag: str, value: float, step: int, wall: float) -> bytes:
    # Summary.Value { tag = 1, simple_value = 2 }
    sv = _bytes_field(1, tag.encode()) + _f32(2, value)
    # Summary { value = 1 (repeated) }
    summary = _bytes_field(1, sv)
    # Event { wall_time = 1 (double), step = 2 (int64), summary = 5 }
    return _f64(1, wall) + _vint(2, step) + _bytes_field(5, summary)


def _file_version_event(wall: float) -> bytes:
    # Event { wall_time = 1, file_version = 3 (string) }
    return _f64(1, wall) + _bytes_field(3, b"brain.Event:2")


class SummaryWriter:
    """Write scalar summaries readable by TensorBoard."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{socket.gethostname()}")
        self._f = open(os.path.join(logdir, fname), "wb")
        self._write_record(_file_version_event(time.time()))

    def _write_record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))
        self._f.flush()

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._write_record(
            _scalar_event(tag, float(value), int(step), time.time()))

    def add_scalars(self, scalars: dict, step: int, prefix: str = "") -> None:
        for k, v in scalars.items():
            self.add_scalar(prefix + k, v, step)

    def close(self) -> None:
        self._f.close()
