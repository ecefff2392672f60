"""Derive the driver-window ordering from the CORRECTNESS ledger.

The driver checks the first 50 names `queries()` yields, so the entry
file pins diagnostics first and then rotates every registered name
oldest-driver-row-first (VERDICT r8 #2: with ~330 names and a 50-slot
window, full rotation takes ~7 rounds — staleness must be derived, not
hand-maintained). This tool reads every CORRECTNESS_r0N.json, computes
each name's most recent driver row, and prints ready-to-paste Python
list literals, one per staleness tier (never-checked first, then
ascending by round). Paste the output into __spark_entry__.py each
round after updating the pinned diagnostic block.

Usage: python tools/staleness.py [max_tier_to_print]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_cdc_spark.queries import load_all  # noqa: E402


def tiers() -> dict[int, list[str]]:
    reg = load_all()
    last: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        for name in json.load(open(f)):
            last[name] = max(last.get(name, 0), rnd)
    out: dict[int, list[str]] = {}
    for name in reg:
        out.setdefault(last.get(name, 0), []).append(name)
    return {k: sorted(v) for k, v in sorted(out.items())}


def main() -> None:
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 99
    total = 0
    for rnd, names in tiers().items():
        total += len(names)
        if rnd > cap:
            continue
        label = "never" if rnd == 0 else f"r{rnd:02d}"
        print(f"# tier {label} — {len(names)} names")
        print(f"_STALE_{label.upper()} = [")
        for n in names:
            print(f'    "{n}",')
        print("]")
    print(f"# total registered: {total}")


if __name__ == "__main__":
    main()
