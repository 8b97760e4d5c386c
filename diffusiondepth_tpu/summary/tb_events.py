"""Dependency-free TensorBoard event-file writer.

The reference's summary layer subclasses ``torch.utils.tensorboard``'s
``SummaryWriter`` (src/summary/__init__.py:33-44) and emits scalar and image
summaries per epoch. This module reproduces the on-disk artifact — TFRecord
framed ``tensorboard.Event`` protos in ``events.out.tfevents.*`` files that
TensorBoard loads directly — without importing tensorboard/tensorflow, whose
import alone costs ~10 s on the 1-core sandbox and drags in oneDNN/absl
side effects the training process does not want.

Protobuf wire encoding is done by hand. Only the three message paths the
summary layer needs are implemented (schema from tensorboard's event.proto /
summary.proto, unchanged since TF 1.x):

    Event    { double wall_time = 1; int64 step = 2;
               string file_version = 3; Summary summary = 5; }
    Summary  { repeated Value value = 1; }
    Value    { string tag = 1; float simple_value = 2; Image image = 4; }
    Image    { int32 height = 1; int32 width = 2; int32 colorspace = 3;
               bytes encoded_image_string = 4; }

TFRecord framing per record: uint64-LE length, uint32-LE masked CRC32C of
the length bytes, payload, uint32-LE masked CRC32C of the payload. Golden
parity with the real reader is tested in tests/test_tb_events.py, which
parses these files back through tensorboard's own EventFileLoader
(CRC-checked).
"""

from __future__ import annotations

import io
import os
import socket
import struct
import time
from typing import Optional

import numpy as np

# ----------------------------------------------------------------- crc32c
# Castagnoli polynomial (reflected 0x82F63B78), table-driven. Throughput is
# irrelevant: records here are a few bytes (scalars) to ~1 MB (PNG panels),
# written once per epoch.
_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 if _c & 1 else 0)
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    """TFRecord CRC mask (record_writer.cc): rotate right 15, add constant."""
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------- proto wire
def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        bits = n & 0x7F
        n >>= 7
        if n:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _bytes_field(field: int, data: bytes) -> bytes:
    return _key(field, 2) + _varint(len(data)) + data


def _varint_field(field: int, n: int) -> bytes:
    return _key(field, 0) + _varint(n)


def _float_field(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _double_field(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _event(step: int, body: bytes = b"", wall_time: Optional[float] = None) -> bytes:
    ev = _double_field(1, time.time() if wall_time is None else wall_time)
    if step:
        ev += _varint_field(2, step)
    return ev + body


def _scalar_event(tag: str, value: float, step: int) -> bytes:
    val = _bytes_field(1, tag.encode("utf-8")) + _float_field(2, float(value))
    return _event(step, _bytes_field(5, _bytes_field(1, val)))


def _image_event(tag: str, png: bytes, h: int, w: int, colorspace: int,
                 step: int) -> bytes:
    img = (_varint_field(1, h) + _varint_field(2, w)
           + _varint_field(3, colorspace) + _bytes_field(4, png))
    val = _bytes_field(1, tag.encode("utf-8")) + _bytes_field(4, img)
    return _event(step, _bytes_field(5, _bytes_field(1, val)))


class EventFileWriter:
    """Append TensorBoard events to ``{log_dir}/events.out.tfevents.*``.

    API mirrors the subset of ``SummaryWriter`` the summary layer uses:
    ``add_scalar(tag, value, step)`` and ``add_image(tag, hwc_uint8, step)``.
    """

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        name = "events.out.tfevents.{:.6f}.{}.{}".format(
            time.time(), socket.gethostname(), os.getpid()
        )
        self.path = os.path.join(log_dir, name)
        self._f = open(self.path, "ab")
        # every event file leads with a version stamp record
        self._write_record(_event(0, _bytes_field(3, b"brain.Event:2")))
        self.flush()

    def _write_record(self, payload: bytes):
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))

    def add_scalar(self, tag: str, value: float, step: int):
        self._write_record(_scalar_event(tag, value, int(step)))

    def add_image(self, tag: str, image: np.ndarray, step: int):
        """``image`` is HWC uint8 (RGB or grayscale), PNG-encoded here."""
        from PIL import Image

        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            raise ValueError(f"add_image expects uint8, got {arr.dtype}")
        if arr.ndim == 2:
            arr = arr[..., None]
        h, w, c = arr.shape
        buf = io.BytesIO()
        Image.fromarray(arr[..., 0] if c == 1 else arr).save(buf, format="PNG")
        # colorspace codes from summary.proto: 1=grayscale, 3=RGB, 4=RGBA
        self._write_record(
            _image_event(tag, buf.getvalue(), h, w, {1: 1, 3: 3, 4: 4}[c],
                         int(step))
        )

    def flush(self):
        self._f.flush()

    def close(self):
        if not self._f.closed:
            self._f.flush()
            self._f.close()
