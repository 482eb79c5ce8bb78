"""Example: a G-PCC-style QP rate sweep (BASELINE.json config 4).

Generates a reference cloud plus six degraded variants, evaluates the full
suite for every (reference, qp) pair with a resumable journal, and prints a
rate-distortion table. The reference cloud's device state (Morton grid,
minimal-OBB extent, self-NN boundary stats, estimated normals) is computed
once and reused across all six pairs.

Run:  python examples/qp_sweep.py [--points 100000] [--journal sweep.jsonl]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from open_pcc_metric_tpu.batch import SweepItem, run_sweep  # noqa: E402
from open_pcc_metric_tpu.datasets import write_qp_sweep  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--journal", type=str, default=None)
    ap.add_argument("--workdir", type=str, default=None)
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="pcc_qp_sweep_")
    journal = args.journal or f"{workdir}/sweep.jsonl"
    print(f"writing clouds to {workdir}")
    ref_path, degraded = write_qp_sweep(workdir, n_points=args.points)

    items = [
        SweepItem(ref_path, path, tag=f"qp{qp:02d}") for qp, path in degraded
    ]
    results = run_sweep(
        items, journal, color_scheme="ycc", point_to_plane=True,
        d2_mode="pc_error",
    )

    print(f"\n{'tag':>6} {'D1 PSNR':>9} {'D2 PSNR':>9} {'Y PSNR':>8} "
          f"{'wall s':>7} {'Mpts/s':>7}")
    for rec in results:
        if "error" in rec:
            print(f"{rec['tag']:>6}  ERROR: {rec['error']}")
            continue
        m = rec["metrics"]
        print(
            f"{rec['tag']:>6} {m['geo_psnr_sym']:>9.3f} "
            f"{m['d2_psnr_sym']:>9.3f} {m['color_psnr_sym'][0]:>8.3f} "
            f"{rec['wall_s']:>7.3f} {rec['mpoints_per_sec']:>7.3f}"
        )
    print(f"\njournal: {journal} (re-run resumes; see also "
          f"python -m open_pcc_metric_tpu.batch --help)")


if __name__ == "__main__":
    main()
