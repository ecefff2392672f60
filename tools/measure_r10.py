"""Round-10 optimization measurement harness.

Times a list of registered queries in ONE session (warmup pass, then
min-of-N with the noop sink — same methodology as bench.py) and
optionally dumps each query's `.explain("formatted")` to
plans/r10/<name>_<tag>.txt. Paired before/after runs in the same
session protocol make the numbers comparable despite the host drift
documented in SCALE.md §Round-10 addendum.

Usage:
  python tools/measure_r10.py [--plans TAG] [--reps N] [--sf DIR] name...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_cdc_spark.operators import ranks  # noqa: E402
from rust_cdc_spark.plans.explain import plan_text  # noqa: E402
from rust_cdc_spark.queries import load_all  # noqa: E402
from rust_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None, help="dump plans with this tag")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    reg = load_all()
    names = []
    for pat in args.names:
        hits = [n for n in reg if pat == n] or [n for n in reg if pat in n]
        if not hits:
            print(f"no match: {pat}", file=sys.stderr)
            sys.exit(2)
        names.extend(h for h in hits if h not in names)

    spark = get_spark("measure_r10")
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r10")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = reg[name].spark_fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        ranks.release_pinned()
        return dt

    times: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"measure:{name}")
        if args.plans:
            os.makedirs(plan_dir, exist_ok=True)
            df = reg[name].spark_fn(spark, args.sf)
            txt = plan_text(df)
            with open(os.path.join(
                    plan_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(txt)
        run(name)  # warmup (codegen/JIT)
        times[name] = round(min(run(name) for _ in range(args.reps)), 3)
        print(json.dumps({"query": name, "sec": times[name]}), flush=True)

    print(json.dumps({"total": round(sum(times.values()), 3),
                      "n": len(times)}), flush=True)


if __name__ == "__main__":
    main()
