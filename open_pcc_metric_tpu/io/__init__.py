from .loaders import RawCloud, point_count, read_point_cloud, write_ply

__all__ = ["read_point_cloud", "write_ply", "RawCloud", "point_count"]
