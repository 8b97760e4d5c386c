"""Native (C++) data-pipeline ops, bound via ctypes.

The reference's only non-CUDA native compute is the numba-JIT scanline
completion feeding the NYU loader (src/model/ops/depth_map_proc.py:7-52,
src/data/nyu.py:165-171). Here the same op is a small C++ library compiled
once (``make -C diffusiondepth_tpu/native`` or automatically on first import)
and called from loader threads — it releases the GIL for the whole sweep, so
decode threads scale, unlike a pure-python loop.

``diffusiondepth_tpu.data.depth_completion`` transparently prefers this
engine and falls back to its vectorised numpy implementation.
"""

from . import depthops  # noqa: F401
