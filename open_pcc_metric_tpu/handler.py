"""click CLI — flag-for-flag parity with the reference plus TPU extensions.

Reference surface (open_pcc_metric/handler.py:4-43):
  --ocloud --pcloud --color {rgb,ycc} --hausdorff --point-to-plane --csv

Extensions: --color yuv (library-only in the reference), --color-hausdorff,
--d2-mode {reference,pc_error}, --peak/--resolution (pc_error's PSNR peak
convention), --dtype, --backend, and the ``sweep`` batch command (see
batch.py) for whole-sequence evaluation.
"""
from __future__ import annotations

import click


@click.command()
@click.option("--ocloud", required=True, type=str, help="Original point cloud.")
@click.option("--pcloud", required=True, type=str, help="Processed point cloud.")
@click.option(
    "--color",
    required=False,
    type=click.Choice(["rgb", "ycc", "yuv"]),
    help="Report color distortions as well.",
)
@click.option(
    "--hausdorff",
    required=False,
    is_flag=True,
    help=(
        "Report hausdorff metric as well. If --point-to-plane is provided, "
        "then hausdorff point-to-plane would be reported too"
    ),
)
@click.option(
    "--point-to-plane",
    required=False,
    is_flag=True,
    help="Report point-to-plane distance as well.",
)
@click.option(
    "--csv", required=False, is_flag=True, help="Print output in csv format."
)
@click.option(
    "--color-hausdorff",
    required=False,
    is_flag=True,
    help="Also report per-channel color Hausdorff distance/PSNR.",
)
@click.option(
    "--d2-mode",
    required=False,
    type=click.Choice(["reference", "pc_error"]),
    default="reference",
    show_default=True,
    help="Normal convention for point-to-plane (D2) projection.",
)
@click.option(
    "--peak",
    "--resolution",
    required=False,
    type=float,
    default=None,
    help=(
        "User-supplied signal peak for every geometric PSNR (pc_error's "
        "--resolution convention) instead of the reference's OBB-extent / "
        "intra-NN-distance peaks."
    ),
)
@click.option(
    "--dtype",
    required=False,
    type=click.Choice(["float32", "float64"]),
    default="float32",
    show_default=True,
    help="Device compute dtype (float64 only on CPU backend).",
)
@click.option(
    "--trace-dir",
    required=False,
    type=str,
    default=None,
    help="Write a jax.profiler trace of the evaluation to this directory.",
)
@click.option(
    "--timings",
    required=False,
    is_flag=True,
    help="Print wall time and Mpoints/sec to stderr.",
)
@click.option(
    "--backend",
    required=False,
    type=click.Choice(["auto", "pruned", "pallas", "jnp"]),
    default="auto",
    show_default=True,
    help=(
        "NN backend (auto = Morton-pruned for large clouds, else Pallas "
        "on TPU / jnp elsewhere)."
    ),
)
def cli(
    ocloud: str,
    pcloud: str,
    color: str,
    hausdorff: bool,
    point_to_plane: bool,
    csv: bool,
    color_hausdorff: bool,
    d2_mode: str,
    peak: float,
    dtype: str,
    backend: str,
    trace_dir: str,
    timings: bool,
) -> None:
    import sys
    import time

    from .evaluate import load_cloud, evaluate_pair
    from .options import CalculateOptions
    from .utils import enable_compile_cache
    from .utils.profiling import mpoints_per_sec, trace

    enable_compile_cache()

    options = CalculateOptions(
        color=color,
        hausdorff=hausdorff,
        point_to_plane=point_to_plane,
        color_hausdorff=color_hausdorff,
        d2_mode=d2_mode,
        peak=peak,
    )
    a = load_cloud(ocloud, dtype=dtype)
    b = load_cloud(pcloud, dtype=dtype)
    t0 = time.perf_counter()
    with trace(trace_dir):
        result = evaluate_pair(a, b, options, backend=backend).as_df()
    wall = time.perf_counter() - t0

    if timings:
        print(
            f"evaluated {a.n}+{b.n} points in {wall:.3f}s "
            f"({mpoints_per_sec(a.n + b.n, wall):.3f} Mpoints/s)",
            file=sys.stderr,
        )
    if csv:
        print(result.to_csv())
    else:
        print(result.to_string())
