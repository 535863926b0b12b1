from .mesh import build_mesh
from .gop_parallel import decode_gops_parallel
from .slice_rows import (decode_gop_rows_sharded, decode_gops_2d_sharded,
                         exchange_row_halo)

__all__ = [
    "build_mesh",
    "decode_gops_parallel",
    "decode_gop_rows_sharded",
    "decode_gops_2d_sharded",
    "exchange_row_halo",
]
