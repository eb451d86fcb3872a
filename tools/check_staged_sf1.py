"""Cross-engine check of the staged-corpus SPINE branch that only
activates at scale (r15 self-review finding 3).

The redecide/recall-drift staged oracles replay the whole contract
(decisions, triggers, NSW beam) — tractable in DuckDB at the driver sfs,
but at sf1 the materialized pair CTEs carry 64-float lists and the spill
exceeds this host's disk. The scale-ACTIVATED code is only the spine
(count-derived m=3 subsample past 10k embeddings rows + dense renumber)
and the snapshot construction on top of it; everything downstream is
sf-invariant code hash-verified at sf0.001/sf0.01 by check_new. So this
tool verifies exactly that seam at an sf where m=3 is live: for each of
the four staged snapshots (redecide snap1/batch2, recall-drift
snap1/snap2) it compares Spark vs DuckDB on (row count, sum of vec_id,
sum of a 32-bit md5 fingerprint of every full row). Embeddings are
quantized to integers (round(x*256) — the staged values are exact
multiples of 1/256, optionally +4.0) so the fingerprint is
float-format-proof on both engines.

Usage: python tools/check_staged_sf1.py [sf_dir]   (default localdata/sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from wafer_defect_data_pipeline_spark.plans.queries_similarity import (  # noqa: E402
    _spine_ctes,
    _staged_byte_sql,
    _staged_recall_drift_snapshots,
    _staged_redecide_snapshots,
)
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402


def _spark_sig(df) -> tuple[int, int, int]:
    """(count, sum(vec_id), sum(int32 md5 fingerprint)) of a staged
    snapshot — embedding quantized to ints so the row string is
    engine-portable."""
    row = (
        df.select(
            "vec_id",
            F.concat_ws(
                "|",
                F.col("vec_id").cast("string"),
                F.col("label").cast("string"),
                F.concat_ws(
                    ",",
                    F.transform(
                        "embedding",
                        lambda x: F.round(x * 256).cast("int").cast("string"),
                    ),
                ),
            ).alias("s"),
        )
        .select(
            F.count("*").alias("n"),
            F.sum("vec_id").alias("idsum"),
            F.sum(
                F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long")
            ).alias("fp"),
        )
        .collect()[0]
    )
    return int(row["n"]), int(row["idsum"]), int(row["fp"])


def _duck_sig(con, snap_sql: str) -> tuple[int, int, int]:
    n, idsum, fp = con.execute(
        f"""
        SELECT count(*), sum(vec_id),
               sum(CAST(concat('0x', substring(md5(
                     concat(CAST(vec_id AS VARCHAR), '|',
                            CAST(label AS VARCHAR), '|',
                            array_to_string(list_transform(embedding,
                              x -> CAST(CAST(round(x * 256) AS INT) AS VARCHAR)), ','))
                   ), 1, 8)) AS BIGINT))
        FROM ({snap_sql})
        """
    ).fetchone()
    return int(n), int(idsum), int(fp)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(_REPO) / "localdata" / "sf1"
    )
    spark = get_spark(app_name="check-staged-sf1")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )

    def byte(pfx: str) -> str:  # prefix-bound twin of the oracles' usage
        return _staged_byte_sql(pfx)

    r_spine = _spine_ctes("smod0", "spine")
    c_spine = _spine_ctes("cmod", "cspine")
    duck_snaps = {
        "redecide_snap1": f"""WITH {r_spine}
          SELECT vec_id, CAST(vec_id % 8 AS INT) AS label,
                 list_transform(range(0, 64), i ->
                   CASE WHEN i = vec_id % 8 THEN 4.0 ELSE 0.0 END + {byte('s1:')}) AS embedding
          FROM spine""",
        "redecide_batch2": f"""WITH {r_spine}, newids AS (
            SELECT vec_id // 2 + 1000000 AS vec_id FROM spine WHERE vec_id % 2 = 0
          )
          SELECT vec_id, CAST(vec_id % 8 AS INT) AS label,
                 list_transform(range(0, 64), i -> {byte('s2:')}) AS embedding
          FROM newids""",
        "drift_snap1": f"""WITH {c_spine}
          SELECT vec_id, CAST(vec_id % 8 AS INT) AS label,
                 list_transform(range(0, 64), i ->
                   CASE WHEN i = vec_id % 8 THEN 4.0 ELSE 0.0 END + {byte('c1:')}) AS embedding
          FROM cspine""",
        "drift_snap2": f"""WITH {c_spine}
          SELECT vec_id, CAST(vec_id % 8 AS INT) AS label,
                 list_transform(range(0, 64), i -> {byte('c2:')}) AS embedding
          FROM cspine""",
    }

    r1, r2 = _staged_redecide_snapshots(spark, sf_dir)
    c1, c2 = _staged_recall_drift_snapshots(spark, sf_dir)
    spark_snaps = {
        "redecide_snap1": r1,
        "redecide_batch2": r2,
        "drift_snap1": c1,
        "drift_snap2": c2,
    }

    rc = 0
    results = []
    for name, df in spark_snaps.items():
        s = _spark_sig(df)
        d = _duck_sig(con, duck_snaps[name])
        ok = s == d
        rc |= 0 if ok else 1
        results.append(f"{name}: {'OK' if ok else 'FAIL'} spark={s} duck={d}")
        print(results[-1])

    from wafer_defect_data_pipeline_spark.ledger import record_run

    record_run(
        "check-staged-sf1",
        f"{'4/4 snapshot signatures cross-engine OK' if rc == 0 else 'FAIL'} "
        f"at {sf_dir.rstrip('/').rsplit('/', 1)[-1]} (m=3 spine live): "
        + "; ".join(r.split(' spark=')[0] for r in results),
    )
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
