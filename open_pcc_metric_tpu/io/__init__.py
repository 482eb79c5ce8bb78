from .loaders import read_point_cloud, write_ply, RawCloud

__all__ = ["read_point_cloud", "write_ply", "RawCloud"]
