"""Native 16-bit grayscale PNG decoder (native/depthops.cpp
decode_png_gray16) vs PIL: exact parity over content that exercises the PNG
scanline filters, strict-format rejection (caller falls back to PIL), and
the KITTI read_depth integration."""

import io
import warnings

import numpy as np
import pytest
from PIL import Image

from diffusiondepth_tpu.native import depthops


def _png_bytes(arr: np.ndarray) -> bytes:
    b = io.BytesIO()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        Image.fromarray(arr, mode="I;16").save(b, format="PNG")
    return b.getvalue()


requires_native = pytest.mark.skipif(
    not depthops.available(), reason="libdepthops.so unavailable"
)


@requires_native
@pytest.mark.parametrize("shape", [(8, 8), (31, 47), (97, 353), (64, 1)])
def test_decode_matches_pil_exactly(shape):
    rng = np.random.RandomState(sum(shape))
    h, w = shape
    gx = np.tile((np.arange(w, dtype=np.uint16) * 7) % 60001, (h, 1))
    sparse = np.zeros((h, w), np.uint16)
    mask = rng.rand(h, w) < 0.06
    sparse[mask] = (rng.rand(int(mask.sum())) * 20000 + 300).astype(np.uint16)
    for arr in [
        (rng.rand(h, w) * 65535).astype(np.uint16),  # incompressible
        gx,                                          # Sub/Up-filter friendly
        np.full((h, w), 1234, np.uint16),            # constant
        sparse,                                      # KITTI-like lidar
    ]:
        data = _png_bytes(arr)
        got = depthops.decode_png_gray16(data)
        assert got is not None and got.dtype == np.uint16
        np.testing.assert_array_equal(got, np.asarray(Image.open(io.BytesIO(data))))
        np.testing.assert_array_equal(got, arr)


@requires_native
def test_strict_format_rejection_returns_none():
    b8 = io.BytesIO()
    Image.fromarray(np.zeros((4, 4), np.uint8)).save(b8, format="PNG")
    assert depthops.decode_png_gray16(b8.getvalue()) is None  # 8-bit
    brgb = io.BytesIO()
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(brgb, format="PNG")
    assert depthops.decode_png_gray16(brgb.getvalue()) is None  # color
    data = _png_bytes(np.ones((16, 16), np.uint16) * 300)
    assert depthops.decode_png_gray16(data[:40]) is None  # truncated
    assert depthops.decode_png_gray16(b"nonsense") is None


@requires_native
def test_read_depth_uses_native_path(tmp_path):
    from diffusiondepth_tpu.data.kittidc import read_depth

    arr = np.zeros((24, 40), np.uint16)
    arr[3, 7] = 256 * 12  # 12 m
    p = tmp_path / "d.png"
    p.write_bytes(_png_bytes(arr))
    d = read_depth(str(p))
    assert d.dtype == np.float32 and d[3, 7] == 12.0 and d.sum() == 12.0
