from .nn import nearest_neighbors, nn_chunked
from .knn import knn
from .normals import estimate_normals
from .obb import minimal_obb_extent
from .color import transform_colors, get_color_peak

__all__ = [
    "nearest_neighbors",
    "nn_chunked",
    "knn",
    "estimate_normals",
    "minimal_obb_extent",
    "transform_colors",
    "get_color_peak",
]
