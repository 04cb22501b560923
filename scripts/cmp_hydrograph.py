#!/usr/bin/env python
"""Compare an estimated hydrograph against gauge groundtruth.

Same contract as the reference scripts/cmp_hydrograph.py: px->meter affine
calibration from records, resampled gauge series, mean/std absolute error in
cm and %.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfloodnet_tpu.pipelines.hydrograph import compare_hydrographs  # noqa: E402
from vfloodnet_tpu.utils import gct  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test-name", type=str, required=True)
    p.add_argument("--est-csv", type=str, default=None,
                   help="Defaults to output/waterlevel/<name>_ref/waterlevel.csv")
    p.add_argument("--record-dir", type=str, default="./records/groundtruth")
    p.add_argument("--out-dir", type=str, default=None)
    args = p.parse_args()

    est_csv = args.est_csv or os.path.join(
        "output", "waterlevel", f"{args.test_name}_ref", "waterlevel.csv")
    gt_csv = os.path.join(args.record_dir, args.test_name, "gt.csv")
    px2m = os.path.join(args.record_dir, args.test_name, "px_to_meter.txt")
    out_dir = args.out_dir or os.path.dirname(est_csv)

    res = compare_hydrographs(est_csv, gt_csv, px2m, out_dir,
                              test_name=args.test_name)
    print(gct(), f"[{res['site_profile']}] "
          f"mean abs err: {res['mean_abs_err_cm']:.2f} cm, "
          f"std: {res['std_abs_err_cm']:.2f} cm, "
          f"err rate: {res['mean_err_rate'] * 100:.2f}% (n={res['n']})")


if __name__ == "__main__":
    main()
