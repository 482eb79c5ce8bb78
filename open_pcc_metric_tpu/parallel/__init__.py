from .sharded import (
    make_mesh,
    ring_nn,
    ring_nn_pruned,
    ring_knn_coords,
    ring_knn_coords_pruned,
    ring_normals,
    sharded_pair_stats,
)

__all__ = [
    "make_mesh",
    "ring_nn",
    "ring_nn_pruned",
    "ring_knn_coords",
    "ring_knn_coords_pruned",
    "ring_normals",
    "sharded_pair_stats",
]
