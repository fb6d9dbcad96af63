from .distributed import global_volume_mesh, initialize_distributed
from .halo import halo_exchange, make_volume_mesh, shard_volume, sharded_dilate26

__all__ = ["global_volume_mesh", "initialize_distributed",
           "halo_exchange", "make_volume_mesh", "shard_volume",
           "sharded_dilate26"]
