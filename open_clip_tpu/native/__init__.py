"""Native (C++) host-stage components, bound via ctypes.

``decode`` exposes the libjpeg-based decode+resize+crop stage used by the
device-preprocess input pipeline (see ``decode.cpp``). The shared library is
compiled on first use with g++ and cached next to the source; environments
without a toolchain or libjpeg simply fall back to the PIL tier.
"""

from .decode import (  # noqa: F401
    NATIVE_DECODE_AVAILABLE,
    decode_resize_batch,
    decode_resize_one,
    jpeg_dims,
)
