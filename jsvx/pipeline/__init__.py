from .gop import decode_gop_scan, stack_device_frames, zero_refs
from .stream import JaxStreamDecoder

__all__ = [
    "decode_gop_scan",
    "stack_device_frames",
    "zero_refs",
    "JaxStreamDecoder",
]
