"""Golden parity for the dependency-free TensorBoard event writer.

The files written by ``summary/tb_events.py`` (hand-encoded protos, TFRecord
framing, masked CRC32C) are read back with tensorboard's OWN loader — the
same CRC-checked reader TensorBoard uses — so any drift in the wire format
fails here, not in the user's TensorBoard UI. Reference behavior being
reproduced: src/summary/__init__.py:33-44 (SummaryWriter subclass),
diffusion_dcbase_summary.py:155 (per-epoch image strip tag).
"""

import glob
import os

import numpy as np
import pytest

from diffusiondepth_tpu.summary.tb_events import (
    EventFileWriter,
    _crc32c,
    _varint,
)


def test_crc32c_known_vectors():
    # published CRC-32C test vectors (RFC 3720 appendix B.4)
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_varint():
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(300) == b"\xac\x02"
    assert _varint(2**35) == b"\x80\x80\x80\x80\x80\x01"


def _load_events(path):
    """Parse raw records with tensorboard's CRC-checked record reader, then
    decode with its event proto — WITHOUT the data-compat migration pass
    (EventFileLoader rewrites legacy simple_value/image summaries into
    tensor form), so assertions see exactly what was written."""
    tb_loader = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader"
    )
    from tensorboard.compat.proto import event_pb2

    return [event_pb2.Event.FromString(bytes(rec))
            for rec in tb_loader.RawEventFileLoader(path).Load()]


def test_event_file_roundtrip(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("Loss/L1", 1.5, 3)
    w.add_scalar("Metric/RMSE", 0.25, 3)
    panel = np.zeros((4, 6, 3), np.uint8)
    panel[..., 0] = 255
    w.add_image("val/images", panel, 7)
    w.close()

    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1

    events = _load_events(files[0])
    assert events[0].file_version == "brain.Event:2"
    assert all(e.wall_time > 0 for e in events)

    scalars = {
        v.tag: (e.step, v.simple_value)
        for e in events for v in e.summary.value
        if v.HasField("simple_value")
    }
    assert scalars["Loss/L1"] == (3, 1.5)
    assert scalars["Metric/RMSE"] == (3, 0.25)

    images = [(e.step, v.tag, v.image) for e in events
              for v in e.summary.value if v.HasField("image")]
    assert len(images) == 1
    step, tag, img = images[0]
    assert (step, tag) == (7, "val/images")
    assert (img.height, img.width, img.colorspace) == (4, 6, 3)
    # the encoded bytes are a real PNG that decodes to the input
    from PIL import Image
    import io

    arr = np.asarray(Image.open(io.BytesIO(img.encoded_image_string)))
    np.testing.assert_array_equal(arr, panel)


def test_summary_layer_writes_events(tmp_path):
    """BaseSummary/Diffusion_DCbase_Summary emit loadable event files."""
    from diffusiondepth_tpu.config import Config
    from diffusiondepth_tpu.summary.diffusion_dcbase_summary import (
        Diffusion_DCbase_Summary,
    )

    cfg = Config(max_depth=88.0, num_summary=2).finalize()
    summ = Diffusion_DCbase_Summary(str(tmp_path), "train", cfg,
                                    loss_name=["L1"], metric_name=["RMSE"])
    summ.add(loss=np.asarray([[0.5]]), metric=np.asarray([[1.25]]))
    sample = {
        "rgb": np.zeros((1, 8, 12, 3), np.float32),
        "dep": np.ones((1, 8, 12, 1), np.float32),
        "gt": np.ones((1, 8, 12, 1), np.float32),
    }
    output = {"pred": np.ones((1, 8, 12, 1), np.float32)}
    summ.update(1, sample, output)

    files = glob.glob(os.path.join(str(tmp_path), "train",
                                   "events.out.tfevents.*"))
    assert len(files) == 1
    events = _load_events(files[0])
    tags = [v.tag for e in events for v in e.summary.value]
    assert "Loss/L1" in tags and "Metric/RMSE" in tags
    assert "train/images" in tags
