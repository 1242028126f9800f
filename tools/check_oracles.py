"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 on Spark AND its
oracle_sql() on DuckDB, then compares row count, schema (column names),
and order-insensitive values.  Use while iterating so CORRECTNESS_r{N}
holds no surprises.

Usage: python tools/check_oracles.py [--ansi] [--json PATH] [name_filter ...]
  --ansi: use a DEFAULT SparkSession (ANSI on, like the driver) instead
          of the tuned engine session.
  --json PATH: write a machine-readable sweep artifact (per-query
          status pass/rows-only/fail + elapsed + git SHA) to PATH,
          e.g. ORACLE_SWEEP_r8.json, so full-registry results are
          recorded at HEAD each round, not just the driver's 50-sample.
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if s.dtype == object:
            import numpy as np

            out[c] = s.map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else bytes(v)
                if isinstance(v, (bytearray, memoryview))
                else v
            )
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def frames_match(sp: pd.DataFrame, du: pd.DataFrame) -> tuple[bool, str]:
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"schema: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    if len(sp) != len(du):
        return False, f"rows: spark={len(sp)} duck={len(du)}"
    a, b = canon(sp), canon(du)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not values_equal(x, y):
                return False, f"value mismatch col={c} row={i}: spark={x!r} duck={y!r}"
    return True, "ok"


def run_gate(
    spark,
    sf_dir: str = SF_DIR,
    names: list[str] | None = None,
    filters: list[str] | None = None,
    verbose: bool = True,
    records: list[dict] | None = None,
) -> tuple[int, int, list[str]]:
    """Run the oracle gate over the registry: every queries() entry on
    Spark and its oracle_sql() on DuckDB, comparing rows + schema +
    values.  `names` pins an exact query list; `filters` keeps entries
    whose name contains any substring.  Returns
    (n_pass, n_rowsonly, failing_names) -- reusable from pytest
    (tests/test_oracle_gate.py) and from the CLI below."""
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failures = []

    def say(msg):
        if verbose:
            print(msg)

    def record(name, status, rows, t0, detail="ok"):
        if records is not None:
            records.append(
                {
                    "name": name,
                    "status": status,
                    "rows": rows,
                    "sec": round(time.time() - t0, 2),
                    "detail": detail if status == "fail" else "ok",
                }
            )

    for name, fn in qs.items():
        if names is not None and name not in names:
            continue
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            n_fail += 1
            failures.append(name)
            record(name, "fail", None, t0, "spark query raised")
            say(f"FAIL  {name}: spark query raised\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            n_rowsonly += 1
            record(name, "rows_only", len(sdf), t0)
            say(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception:
            n_fail += 1
            failures.append(name)
            record(name, "fail", len(sdf), t0, "oracle raised")
            say(f"FAIL  {name}: oracle raised\n{traceback.format_exc()}")
            continue
        ok, why = frames_match(sdf, ddf)
        if ok:
            n_pass += 1
            record(name, "pass", len(sdf), t0)
            say(f"pass  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)
            record(name, "fail", len(sdf), t0, why)
            say(f"FAIL  {name}: {why}")
    say(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    if failures:
        say("failing: " + " ".join(failures))
    return n_pass, n_rowsonly, failures


def main() -> int:
    args = sys.argv[1:]
    use_ansi = "--ansi" in args
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            print("usage: check_oracles.py [--ansi] [--json PATH] [name ...]",
                  file=sys.stderr)
            return 2
        json_path = args[i + 1]
        del args[i : i + 2]
    filters = [a for a in args if a != "--ansi"]

    if use_ansi:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from uofi_payroll_etl_main_spark.session import get_spark

        spark = get_spark("oracle-check")
    records: list[dict] | None = [] if json_path else None
    t_start = time.time()
    n_pass, n_rowsonly, failures = run_gate(
        spark, SF_DIR, filters=filters or None, records=records
    )
    if json_path:
        import json
        import subprocess

        try:
            sha = subprocess.check_output(
                ["git", "rev-parse", "HEAD"],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                text=True,
            ).strip()
        except Exception:
            sha = "unknown"
        artifact = {
            "git_sha": sha,
            "sf_dir": SF_DIR,
            "session": "ansi" if use_ansi else "tuned",
            # a filtered run is NOT a full-registry sweep: stamp it so the
            # artifact can never be mistaken for one
            "partial": bool(filters),
            "filters": sorted(filters),
            "total_sec": round(time.time() - t_start, 1),
            "n_pass": n_pass,
            "n_rows_only": n_rowsonly,
            "n_fail": len(failures),
            "queries": records,
        }
        with open(json_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {json_path}: {n_pass} pass / {n_rowsonly} rows-only / {len(failures)} fail")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
