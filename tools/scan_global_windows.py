"""Scan every registry query's physical plan for partition-less
WindowExec nodes (the single-partition scale hazard). Prints one line
per offending query with the window expressions.

Usage: python tools/scan_global_windows.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_cdc_spark.plans.explain import global_windows  # noqa: E402
from rust_cdc_spark.queries import load_all  # noqa: E402
from rust_cdc_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    bad = {}
    for name, q in load_all().items():
        try:
            hits = global_windows(q.spark_fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:45s} ERROR {e}")
            continue
        if hits:
            bad[name] = hits
            for h in hits:
                print(f"{name:45s} {h[:140]}")
    print(f"\n{len(bad)} queries with partition-less Window nodes")


if __name__ == "__main__":
    main()
