"""End-to-end CPA pipeline parity vs an independent DuckDB-SQL
reimplementation (BASELINE.md e2e parity target; SURVEY.md section 3.3).

Covers: union-by-name with BW-before-MN source order, coerce-parse +
fiscal-year filter, derived keys (TS-Org Code, 5-char dept prefix,
UIN Job), org/dept/time-entry/composite-overtime joins, mode fill,
ACTION filter, keep-first dedup across the union order, college split
with the no-hyphen guard, and the 20-column output contract.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import Row

from uofi_payroll_etl_main_spark.pipelines.cpa import CPA_OUTPUT_COLUMNS, run_cpa

CERT_COLS = [
    "UIN", "PAY_YEAR", "PAY_ID", "PAY_NBR", "PAY_SEQ", "TRAN_ID", "TRAN_COMPNT",
    "ADJ_REASON", "TRAN_CREATE_DT", "TRAN_CLOSED_DT", "JOB", "JOB_TITLE",
    "JOB_TS_COAS", "JOB_TS_ORGN", "JOB_ECLS", "COLLEGE", "OWNING_UIN", "LAST_NAME",
    "FIRST_NAME", "UI_ENTERPRISE_ID", "EMAIL_ADDR", "HRLY_RATE", "RT_LEAVE_DT",
    "RT_ENTER_DT", "RT_CREATE_DT", "LVL", "ROLE", "ACTION", "ROUTED_BY_UIN",
    "RETURNED_FLAG", "TRAN_ROUTE_DT", "ELAPSED_WORK_TIME", "ROUTE_STOP_TIME",
    "ELAPSED_TRAN_TIME",
]
CERT_SCHEMA = ", ".join(f"`{c}` string" for c in CERT_COLS)


def _cert(**over):
    base = {c: None for c in CERT_COLS}
    base.update(
        UIN="111111111", PAY_YEAR="2025", PAY_ID="BW", PAY_NBR="14", PAY_SEQ="0",
        TRAN_CREATE_DT="2024-09-15 10:00:00", JOB="U10000-00", JOB_TITLE="RA",
        JOB_TS_COAS="1", JOB_TS_ORGN="602", JOB_ECLS="EA",
        COLLEGE="KV-Engineering", ACTION="3 - Apply",
    )
    base.update(over)
    return Row(**{c: base[c] for c in CERT_COLS})


BW_ROWS = [
    _cert(LVL=" pad-me "),                                     # E14 trim visible via LVL? (not in output; padding on join keys instead)
    _cert(UIN=" 111111111", LVL="same-after-trim"),            # trims to same UIN Job -> dedup with row 1
    _cert(UIN="333333333", COLLEGE="NOHYPHEN"),                # split guard
    _cert(UIN="444444444", ACTION="1 - Review"),               # dropped by ACTION
    _cert(UIN="555555555", TRAN_CREATE_DT="2023-01-01 00:00:00"),  # outside FY
    _cert(UIN="666666666", TRAN_CREATE_DT="not a date"),       # coerce -> null -> dropped
    _cert(UIN="777777777", JOB_TS_COAS="9", JOB_TS_ORGN="999", # unmatched dims
          JOB_ECLS="ZZ", PAY_ID="XX"),
]
MN_ROWS = [
    _cert(PAY_ID="MN", LVL="mn-loser"),    # same UIN Job as BW row 1 -> BW wins
    _cert(UIN="888888888", PAY_ID="MN", JOB_ECLS="EB"),
]


SETUP_SQL = """
CREATE VIEW bw AS SELECT *, file_row_number AS ord, 0 AS src
  FROM read_parquet('{d}/bw.parquet/*.parquet', file_row_number=true);
CREATE VIEW mn AS SELECT *, file_row_number AS ord, 1 AS src
  FROM read_parquet('{d}/mn.parquet/*.parquet', file_row_number=true);
CREATE VIEW ts_org_v AS SELECT DISTINCT * FROM read_parquet('{d}/ts_org.parquet/*.parquet');
CREATE VIEW ts_dept_v AS SELECT DISTINCT * FROM read_parquet('{d}/ts_dept.parquet/*.parquet');
CREATE VIEW overtime_v AS SELECT DISTINCT * FROM read_parquet('{d}/overtime.parquet/*.parquet');
CREATE VIEW te_m_v AS SELECT * FROM read_parquet('{d}/te_m.parquet/*.parquet');
"""

CPA_SQL = """
WITH unioned AS (
  SELECT * FROM bw UNION ALL BY NAME SELECT * FROM mn
),
fy AS (
  SELECT * FROM (SELECT *, TRY_CAST(TRAN_CREATE_DT AS TIMESTAMP) AS tcd FROM unioned)
  WHERE tcd BETWEEN TIMESTAMP '2024-07-01 00:00:00'
                AND TIMESTAMP '2025-06-30 23:59:59.999999'
),
derived AS (
  SELECT
    TRIM(UIN) AS "UIN", TRIM(PAY_ID) AS "PAY_ID", TRIM(PAY_YEAR) AS "PAY_YEAR",
    TRIM(PAY_NBR) AS "PAY_NBR", TRIM(PAY_SEQ) AS "PAY_SEQ",
    TRIM(JOB) AS "JOB", TRIM(JOB_TS_COAS) AS "JOB_TS_COAS",
    TRIM(JOB_TS_ORGN) AS "JOB_TS_ORGN", TRIM(JOB_ECLS) AS "JOB_ECLS",
    TRIM(COLLEGE) AS "COLLEGE", TRIM(ACTION) AS "ACTION",
    TRIM(JOB_TS_COAS) || '-' || TRIM(JOB_TS_ORGN) AS "TS-Org Code",
    substr(TRIM(JOB_TS_COAS) || '-' || TRIM(JOB_TS_ORGN), 1, 5) AS "Dept TS-Org",
    TRIM(UIN) || '-' || TRIM(JOB) AS "UIN Job",
    src, ord
  FROM fy
),
te_mode AS (
  SELECT "TE M", "Time Entry Method" AS mapped FROM (
    SELECT "TE M", "Time Entry Method",
           row_number() OVER (PARTITION BY "TE M"
                              ORDER BY count(*) DESC, "Time Entry Method" ASC) AS rn
    FROM te_m_v WHERE "TE M" IS NOT NULL AND "Time Entry Method" IS NOT NULL
    GROUP BY "TE M", "Time Entry Method"
  ) WHERE rn = 1
),
enriched AS (
  SELECT d.*,
         o."TS-Org Title" AS "TS-Org Title",
         dp."TS-Org Dept Code", dp."TS-Org Dept Title",
         te."TE M",
         m.mapped AS "Time Entry",
         ot."Overtime FLSA" AS "Overtime",
         ot."Job Detail E-Class Long Desc" AS "EClassDesc"
  FROM derived d
  LEFT JOIN ts_org_v o ON d."TS-Org Code" = o."TS-Org Code"
  LEFT JOIN ts_dept_v dp ON d."Dept TS-Org" = dp."TS-Org Dept Code"
  LEFT JOIN (SELECT DISTINCT "UIN Job", "TE M" FROM te_m_v) te
         ON d."UIN Job" = te."UIN Job"
  LEFT JOIN te_mode m ON te."TE M" = m."TE M"
  LEFT JOIN (SELECT DISTINCT "Job Eclass", "Pay ID", "Overtime FLSA",
                    "Job Detail E-Class Long Desc" FROM overtime_v) ot
         ON d."JOB_ECLS" = ot."Job Eclass" AND d."PAY_ID" = ot."Pay ID"
),
applied AS (SELECT * FROM enriched WHERE "ACTION" = '3 - Apply'),
kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY "UIN Job" ORDER BY src, ord) AS rn
    FROM applied
  ) WHERE rn = 1
)
SELECT
  "UIN",
  "PAY_ID" AS "Pay ID",
  "PAY_YEAR" AS "Year",
  "PAY_NBR" AS "Pay #",
  "PAY_SEQ" AS "Seq #",
  "JOB" AS "Job Number",
  CASE WHEN strpos("COLLEGE", '-') > 0
       THEN TRIM(substr("COLLEGE", 1, strpos("COLLEGE", '-') - 1))
       ELSE TRIM("COLLEGE") END AS "College Code",
  CASE WHEN strpos("COLLEGE", '-') > 0
       THEN TRIM(substr("COLLEGE", strpos("COLLEGE", '-') + 1))
       ELSE '' END AS "College Name",
  "COLLEGE" AS "College",
  "JOB_TS_COAS" AS "TS COA",
  "JOB_TS_ORGN" AS "TS Org",
  "TS-Org Code",
  "TS-Org Title",
  "TS-Org Dept Code",
  "TS-Org Dept Title",
  "JOB_ECLS" AS "E-Class Code",
  "EClassDesc" AS "E-Class",
  "TE M",
  "Time Entry",
  "Overtime"
FROM kept
"""


@pytest.fixture(scope="module")
def cpa_fixture_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cpa_parity"))
    spark.createDataFrame(BW_ROWS, CERT_SCHEMA).coalesce(1).write.parquet(f"{d}/bw.parquet")
    spark.createDataFrame(MN_ROWS, CERT_SCHEMA).coalesce(1).write.parquet(f"{d}/mn.parquet")
    spark.createDataFrame(
        [Row(**{"TS-Org Code": "1-602", "TS-Org Title": "Physics"})]
    ).write.parquet(f"{d}/ts_org.parquet")
    spark.createDataFrame(
        [Row(**{"TS-Org Dept Code": "1-602", "TS-Org Dept Title": "Physics Dept"})]
    ).write.parquet(f"{d}/ts_dept.parquet")
    spark.createDataFrame(
        [Row(**{"Job Eclass": "EA", "Pay ID": "BW", "Overtime FLSA": "Non-Exempt",
                "Job Detail E-Class Long Desc": "Academic"}),
         Row(**{"Job Eclass": "EB", "Pay ID": "MN", "Overtime FLSA": "Exempt",
                "Job Detail E-Class Long Desc": "Monthly"})]
    ).write.parquet(f"{d}/overtime.parquet")
    spark.createDataFrame(
        [Row(**{"UIN Job": "111111111-U10000-00", "TE M": "W",
                "Time Entry Method": "Web Time", "Time Entry Type": "Clock"}),
         Row(**{"UIN Job": "888888888-U10000-00", "TE M": "B",
                "Time Entry Method": "Banner", "Time Entry Type": "Batch"}),
         Row(**{"UIN Job": "x", "TE M": "W", "Time Entry Method": "Web Time",
                "Time Entry Type": "Clock"})]
    ).write.parquet(f"{d}/te_m.parquet")
    return d


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def test_cpa_matches_duckdb_reimplementation(spark, cpa_fixture_dir):
    d = cpa_fixture_dir
    bw = spark.read.parquet(f"{d}/bw.parquet").coalesce(1)
    mn = spark.read.parquet(f"{d}/mn.parquet").coalesce(1)
    ts_org = spark.read.parquet(f"{d}/ts_org.parquet")
    ts_dept = spark.read.parquet(f"{d}/ts_dept.parquet")
    overtime = spark.read.parquet(f"{d}/overtime.parquet")
    te_m = spark.read.parquet(f"{d}/te_m.parquet")

    out, _ = run_cpa(bw, mn, ts_org, ts_dept, overtime, te_m, fy_end_year=2025)
    assert out.columns == CPA_OUTPUT_COLUMNS
    got = out.toPandas()

    con = duckdb.connect()
    for stmt in SETUP_SQL.format(d=d).strip().split(";"):
        if stmt.strip():
            con.execute(stmt)
    expect = con.execute(CPA_SQL).df()

    assert sorted(got.columns) == sorted(expect.columns)
    assert len(got) == len(expect)
    g, e = _canon(got), _canon(expect)
    for c in g.columns:
        for i, (x, y) in enumerate(zip(g[c], e[c])):
            both_na = pd.isna(x) and pd.isna(y)
            assert both_na or x == y, f"col={c} row={i}: spark={x!r} duck={y!r}"

    by_uin = {r["UIN"]: r for _, r in g.iterrows()}
    assert set(by_uin) == {"111111111", "333333333", "777777777", "888888888"}
    assert by_uin["111111111"]["Pay ID"] == "BW"          # BW beats MN in keep-first
    assert by_uin["111111111"]["Time Entry"] == "Web Time"
    assert by_uin["333333333"]["College Name"] == ""      # no-hyphen guard
    assert pd.isna(by_uin["777777777"]["Overtime"])       # unmatched composite key
