from .decode import (
    DecodeConstants,
    decode_frame_plane,
    decode_frame_planes,
    frame_to_device,
    make_constants,
)
from .color import ycbcr_to_rgb_jax

__all__ = [
    "DecodeConstants",
    "decode_frame_plane",
    "decode_frame_planes",
    "frame_to_device",
    "make_constants",
    "ycbcr_to_rgb_jax",
]
