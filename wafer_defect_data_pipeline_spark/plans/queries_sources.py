"""Source/sink queries (SURVEY.md §2 S1-S6) made driver-visible.

The validated CSV reader (``sources/csv.py``, reference
``/root/reference/src/data_loader.py:11-77``) and the CSV sink
(``sources/sinks.py``, reference ``main.py:104-111``) previously had only
pytest coverage. ``csv_roundtrip`` exercises the full S1+S2+S5 path under
the driver: write a deterministic table slice to CSV, read it back through
the validated loader with an explicit schema, and oracle the result against
the original parquet — round-trip fidelity is exactly the contract a
source/sink pair must keep.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import read_table
from ..sources.csv import load_wafer_csv
from ..sources.sinks import write_csv_single
from .registry import register

# Mirrors the driver nation.parquet footer exactly (int32 keys) so the
# CSV read-back schema round-trips bit-for-bit against the parquet oracle.
_NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


def _csv_roundtrip(spark, sf_dir):
    """S1/S2/S5: CSV sink -> validated CSV source -> same rows as parquet.

    The temp path is keyed on the sf dir name so concurrent runs at
    different scale factors don't clobber each other. ``write_csv_single``
    is the reference-parity single-file sink (fine here: nation is 25
    rows); the read-back uses the explicit schema so the scan is
    single-pass (no inference job).
    """
    n = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = Path(tempfile.gettempdir()) / f"wdps_csv_roundtrip_{Path(sf_dir).name}"
    write_csv_single(n, str(out))
    df = load_wafer_csv(spark, str(out), schema=_NATION_SCHEMA)
    return df.orderBy("n_nationkey")


register(
    "csv_roundtrip",
    _csv_roundtrip,
    """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation ORDER BY n_nationkey
    """,
)


_REGION_SCHEMA = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)


def _json_roundtrip(spark, sf_dir):
    """JSON sink -> schema'd JSON source -> same rows as parquet.

    Explicit schema on the read so there is no inference pass (JSON
    inference reads the whole dataset twice — never acceptable at scale).
    """
    from ..sources.sinks import write_json

    r = read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    out = Path(tempfile.gettempdir()) / f"wdps_json_roundtrip_{Path(sf_dir).name}"
    write_json(r, str(out))
    return spark.read.schema(_REGION_SCHEMA).json(str(out)).orderBy("r_regionkey")


register(
    "json_roundtrip",
    _json_roundtrip,
    """
    SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey
    """,
)


def _partitioned_pruned_read(spark, sf_dir):
    """Hive-partitioned parquet write + partition-pruned read.

    documents written partitioned by ``lang``; the read filters one lang, so
    the scan lists ONE partition directory (PartitionFilters in the plan —
    asserted by the plan-shape test). This is the layout a 100 TB corpus
    actually uses: partition by coarse key, prune at planning time, never
    touch the other partitions' files.
    """
    from ..sources.sinks import write_parquet

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    out = Path(tempfile.gettempdir()) / f"wdps_part_docs_{Path(sf_dir).name}"
    write_parquet(d, str(out), partition_by=["lang"])
    back = spark.read.parquet(str(out)).filter(F.col("lang") == "de")
    return back.select("doc_id", "lang", "source").orderBy("doc_id")


register(
    "partitioned_pruned_read",
    _partitioned_pruned_read,
    """
    SELECT doc_id, lang, source FROM documents WHERE lang = 'de' ORDER BY doc_id
    """,
)
