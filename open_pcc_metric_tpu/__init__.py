"""open_pcc_metric_tpu — TPU-native point-cloud-compression QA framework.

A ground-up JAX/Pallas rebuild of the capability surface of
``aaletov/open-pcc-metric`` (MPEG pc_error-style D1/D2/Hausdorff/colour
metrics): brute-force tiled NN kernels on the MXU replace per-point KD-tree
queries, PCA normal estimation runs as a batched covariance+eigh kernel, and
whole sequences evaluate as sharded batches over a device mesh.
"""
from .cloud import Cloud, synthetic_sphere_pair, synthetic_voxel_pair
from .cloud_pair import CloudPair, get_neighbour_cloud
from .calculator import CalculateResult, MetricCalculator
from .options import CalculateOptions, transform_options
from .evaluate import evaluate_files, evaluate_pair, load_cloud
from .io import read_point_cloud, write_ply

__version__ = "0.3.0"

__all__ = [
    "Cloud",
    "CloudPair",
    "get_neighbour_cloud",
    "CalculateOptions",
    "CalculateResult",
    "MetricCalculator",
    "transform_options",
    "evaluate_files",
    "evaluate_pair",
    "load_cloud",
    "read_point_cloud",
    "write_ply",
    "synthetic_sphere_pair",
    "synthetic_voxel_pair",
    "__version__",
]
