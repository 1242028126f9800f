"""End-to-end PUA pipeline parity vs an independent DuckDB-SQL
reimplementation (BASELINE.md: "output hash-match vs DuckDB-SQL
reimplementation on FIXTURES.md synthetic inputs").

The SQL below re-derives the whole reference dataflow -- key derivation,
typo rename, dim joins, mode map with lexicographic tie-break,
keep-first dedup by ingest order, ADJ defaulting, 26-col contract,
final string normalization -- from the same parquet fixtures the Spark
pipeline reads.  Any semantic drift in run_pua shows up as a value diff.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import Row

from uofi_payroll_etl_main_spark.pipelines.pua import run_pua


def _pua_rows():
    def r(uin, year, payid, paynum, seq, coa, org, dept, ecls, tem, te, posn, suff,
          adj_code, adj_desc, calc, college_code="KV", college_name="Engineering"):
        return Row(**{
            "UIN": uin, "Year": year, "Pay ID": payid, "Pay #": paynum, "Seq #": seq,
            "TS COA": coa, "TS ORG": org, "DEPT Code": dept,
            "Department Name": "Fallback Dept", "ECLS": ecls, "ECLS DESC": "Desc-" + ecls,
            "TE M": tem, "Time Entry": te, "POSN": posn, "SUFF": suff,
            "College Code": college_code, "College Name": college_name,
            "Earn Code": "RGS", "DESCRIPTION": "Regular",
            "ADj Reason Code": adj_code, "ADJ Reason DESC": adj_desc, "Calc Date": calc,
        })

    return [
        # keep-first: same business key, different payloads -- row order decides
        r("111111111", "2025", "BW", "14", "0", "1", "602", "123.0", "EA", "W", "",
          "U10000", "0.0", "nan", "x", "2025-01-15"),
        r("111111111", "2025", "BW", "14", "0", "1", "602", "123.0", "EA", "W", "LOSER",
          "U10000", "0.0", "RET", "Retro", "2025-02-20"),
        # unmatched org key + unparseable date + real ADJ code
        r("222222222", "2025", "MN", "7", "1", "9", "999", "55", "EB", "B", "Manual",
          "U20000", "1.0", "RET", "Retro", "garbage"),
        # null COA -> null-propagating concat keys; blank ADJ -> default
        r("333333333", "2025", "BW", "14", "0", None, "603", "77.0", "ZZ", "Q", None,
          "U30000", "00", "", "ignored", "2025-03-01"),
    ]


DIM_SQL_SETUP = """
CREATE VIEW pua AS
  SELECT *, file_row_number AS __ord
  FROM read_parquet('{d}/pua.parquet/*.parquet', file_row_number=true);
CREATE VIEW ts_org_v AS SELECT DISTINCT * FROM read_parquet('{d}/ts_org.parquet/*.parquet');
CREATE VIEW ts_dept_v AS SELECT DISTINCT * FROM read_parquet('{d}/ts_dept.parquet/*.parquet');
CREATE VIEW overtime_v AS SELECT DISTINCT * FROM read_parquet('{d}/overtime.parquet/*.parquet');
CREATE VIEW te_m_v AS SELECT * FROM read_parquet('{d}/te_m.parquet/*.parquet');
"""

PUA_SQL = """
WITH derived AS (
  -- trim discipline mirrors the reference EXACTLY: ensure_string trims
  -- only the derive-key columns up front (ref :238-254); UIN / ECLS /
  -- Time Entry / Earn Code / ADJ columns stay RAW through the joins and
  -- the keep-first dedup, and are stripped only by the post-dedup
  -- whole-frame ensure_string (ref :319-321) -- replicated by the TRIMs
  -- in the final SELECT.  (Fuzz seed 1010 caught the early-trim variant
  -- collapsing ' 333333333 ' into 333333333 BEFORE dedup, which the
  -- reference does not do.)
  SELECT
    UIN AS "UIN",
    TRIM("Pay ID") AS "Pay ID",
    TRIM("Year") AS "Year",
    TRIM("Pay #") AS "Pay #",
    TRIM("Seq #") AS "Seq #",
    TRIM("TS COA") AS "TS COA",
    TRIM("TS ORG") AS "TS ORG",
    TRIM("TS COA") || '-' || TRIM("TS ORG") AS "TS-Org Code",
    regexp_replace(TRIM("DEPT Code"), '\\.0$', '') AS "DEPT Code",
    TRIM("TS COA") || '-' || regexp_replace(TRIM("DEPT Code"), '\\.0$', '')
      AS "TS-Org Department Code",
    TRIM("Department Name") AS "Department Name",
    "ECLS" AS "ECLS",
    "ECLS DESC" AS "ECLS DESC",
    TRIM("Year") || TRIM("Pay ID") || TRIM("Pay #") || TRIM("Seq #") AS "Pay Event",
    regexp_replace(TRIM("POSN"), '\\.0$', '') || '-' ||
      regexp_replace(TRIM("SUFF"), '\\.0$', '') AS "Job Number",
    TRIM("College Code") AS "College Code",
    TRIM("College Name") AS "College Name",
    TRIM("College Code") || '-' || TRIM("College Name") AS "College",
    TRIM("TE M") AS "TE M",
    "Time Entry" AS "Time Entry",
    "Earn Code" AS "Earn Code",
    "DESCRIPTION" AS "DESCRIPTION",
    "ADj Reason Code" AS "ADJ Reason Code",
    "ADJ Reason DESC" AS "ADJ Reason DESC",
    "Calc Date",
    __ord
  FROM pua
),
te_mode AS (
  SELECT "TE M", "Time Entry Method" AS mapped FROM (
    SELECT "TE M", "Time Entry Method",
           row_number() OVER (PARTITION BY "TE M"
                              ORDER BY count(*) DESC, "Time Entry Method" ASC) AS rn
    FROM te_m_v
    WHERE "TE M" IS NOT NULL AND "Time Entry Method" IS NOT NULL
    GROUP BY "TE M", "Time Entry Method"
  ) WHERE rn = 1
),
enriched AS (
  SELECT d.*,
         o."TS-Org Title",
         COALESCE(dp."TS-Org Dept Title", d."Department Name") AS "TS-Org Dept Title",
         dp."TS-Org Dept Code",
         ot."Overtime FLSA" AS "Overtime",
         CASE WHEN d."Time Entry" IS NOT NULL AND d."Time Entry" <> ''
              THEN d."Time Entry" ELSE m.mapped END AS "Time Entry Filled"
  FROM derived d
  LEFT JOIN ts_org_v o ON d."TS-Org Code" = o."TS-Org Code"
  LEFT JOIN ts_dept_v dp ON d."TS-Org Department Code" = dp."TS-Org Dept Code"
  LEFT JOIN (SELECT DISTINCT "Job Eclass", "Overtime FLSA" FROM overtime_v) ot
         ON d."ECLS" = ot."Job Eclass"
  LEFT JOIN te_mode m ON d."TE M" = m."TE M"
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY "UIN", "Pay Event", "Job Number" ORDER BY __ord) AS __rn
    FROM enriched
  ) WHERE __rn = 1
),
defaulted AS (
  SELECT *,
    CASE WHEN "ADJ Reason Code" IS NULL
           OR TRIM("ADJ Reason Code") IN ('', 'nan', 'NaN')
         THEN 'INT' ELSE "ADJ Reason Code" END AS adj_code_f,
    CASE WHEN "ADJ Reason Code" IS NULL
           OR TRIM("ADJ Reason Code") IN ('', 'nan', 'NaN')
         THEN 'Internal' ELSE "ADJ Reason DESC" END AS adj_desc_f
  FROM deduped
)
SELECT
  -- post-dedup whole-frame strip (ref :319-321) + final normalization
  TRIM("UIN") AS "UIN", "Pay ID", "Year", "Pay #", "Seq #", "Job Number",
  "College Code", "College Name", "College",
  "TS COA", "TS ORG",
  "TS-Org Code", TRIM("TS-Org Title") AS "TS-Org Title",
  "DEPT Code" AS "Dept Code", "TS-Org Dept Code",
  TRIM("TS-Org Dept Title") AS "TS-Org Dept Title",
  TRIM("ECLS") AS "E-Class Code", TRIM("ECLS DESC") AS "E-Class",
  "TE M", TRIM("Time Entry Filled") AS "Time Entry",
  TRIM("Overtime") AS "Overtime",
  TRIM("Earn Code") AS "Earn Code",
  TRIM("DESCRIPTION") AS "Earn Code Description",
  TRIM(adj_code_f) AS "Adjustment Reason Code",
  TRIM(adj_desc_f) AS "Adjustment Reason Description",
  TRY_CAST("Calc Date" AS TIMESTAMP) AS "Calc Date"
FROM defaulted
"""


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pua_parity"))
    # coalesce(1) keeps parquet row order == insertion order so DuckDB's
    # file_row_number reproduces the Spark-side ingest order exactly
    spark.createDataFrame(_pua_rows()).coalesce(1).write.parquet(f"{d}/pua.parquet")
    spark.createDataFrame(
        [Row(**{"TS-Org Code": "1-602", "TS-Org Title": "Physics"}),
         Row(**{"TS-Org Code": "1-603", "TS-Org Title": "Math"})]
    ).write.parquet(f"{d}/ts_org.parquet")
    spark.createDataFrame(
        [Row(**{"TS-Org Dept Code": "1-123", "TS-Org Dept Title": "Engineering Dept"})]
    ).write.parquet(f"{d}/ts_dept.parquet")
    spark.createDataFrame(
        [Row(**{"Job Eclass": "EA", "Pay ID": "BW", "Overtime FLSA": "Non-Exempt",
                "Job Detail E-Class Long Desc": "Academic"}),
         Row(**{"Job Eclass": "EB", "Pay ID": "MN", "Overtime FLSA": "Exempt",
                "Job Detail E-Class Long Desc": "Monthly"})]
    ).write.parquet(f"{d}/overtime.parquet")
    spark.createDataFrame(
        [Row(**{"UIN Job": "a", "TE M": "W", "Time Entry Method": "Web Time",
                "Time Entry Type": "Clock"}),
         Row(**{"UIN Job": "b", "TE M": "W", "Time Entry Method": "Web Time",
                "Time Entry Type": "Clock"}),
         Row(**{"UIN Job": "c", "TE M": "W", "Time Entry Method": "Alpha Method",
                "Time Entry Type": "Clock"}),  # tie fixture: count(Alpha)=1 < Web
         Row(**{"UIN Job": "d", "TE M": "B", "Time Entry Method": "Banner",
                "Time Entry Type": "Batch"})]
    ).write.parquet(f"{d}/te_m.parquet")
    return d


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def test_pua_matches_duckdb_reimplementation(spark, fixture_dir):
    d = fixture_dir
    pua = spark.read.parquet(f"{d}/pua.parquet")
    ts_org = spark.read.parquet(f"{d}/ts_org.parquet")
    ts_dept = spark.read.parquet(f"{d}/ts_dept.parquet")
    overtime = spark.read.parquet(f"{d}/overtime.parquet")
    te_m = spark.read.parquet(f"{d}/te_m.parquet")

    out, _ = run_pua(pua.coalesce(1), ts_org, ts_dept, overtime, te_m)
    got = out.toPandas()

    con = duckdb.connect()
    for stmt in DIM_SQL_SETUP.format(d=d).strip().split(";"):
        if stmt.strip():
            con.execute(stmt)
    expect = con.execute(PUA_SQL).df()

    assert sorted(got.columns) == sorted(expect.columns)
    assert len(got) == len(expect)
    g, e = _canon(got), _canon(expect)
    for c in g.columns:
        for i, (x, y) in enumerate(zip(g[c], e[c])):
            both_na = pd.isna(x) and pd.isna(y)
            assert both_na or x == y, f"col={c} row={i}: spark={x!r} duck={y!r}"
    # the keep-first winner is the FIRST physical row (Time Entry filled
    # from the mode map, not the 'LOSER' payload of the later duplicate)
    r = g[g["UIN"] == "111111111"].iloc[0]
    assert r["Time Entry"] == "Web Time"
    assert r["Adjustment Reason Code"] == "INT"
