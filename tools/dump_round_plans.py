"""Dump explain("formatted") for named queries to plans/r<N>/<query>_<tag>.txt.

The per-round optimization evidence: run once with tag=before at the
pre-change tree (e.g. in a worktree at the previous round's close) and
once with tag=after at HEAD, so plan claims in OPTIMIZATION_r<N>.md are
checkable without running Spark.

Usage:
    python tools/dump_round_plans.py --out plans/r10 --tag after q1 q2 ...
Planning only -- no jobs run, so this is safe to run alongside a bench.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output dir, e.g. plans/r10")
    ap.add_argument("--tag", required=True, choices=["before", "after"])
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from uofi_payroll_etl_main_spark.session import get_spark

    spark = get_spark("round-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(args.out, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in args.names:
        df = qs[name](spark, SF_DIR)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(f"query: {name}\ntag: {args.tag}\nsf_dir: {SF_DIR}\n\n")
            f.write(text.strip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
