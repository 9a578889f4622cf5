from .mesh import make_mesh, stream_tile_mesh
from .halo import halo_exchange_rows
from .quantile import distributed_median, distributed_percentile, psum_histogram_quantile
from .tiling import tiled_farneback, TileConfig
from .streams import stream_batched_grid_flow, stream_batched_farneback
from .tiling import tiled_farneback_multi
from .ba_dist import distributed_bundle_adjust

__all__ = [
    "make_mesh",
    "stream_tile_mesh",
    "halo_exchange_rows",
    "distributed_median",
    "distributed_percentile",
    "psum_histogram_quantile",
    "tiled_farneback",
    "TileConfig",
    "stream_batched_grid_flow",
    "stream_batched_farneback",
    "tiled_farneback_multi",
    "distributed_bundle_adjust",
]
