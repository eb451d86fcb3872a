"""Data-quality audit operators (extension surface §2.9).

The reference validates its input once at load (existence + non-empty —
reference ``src/data_loader.py:40-70``); a production 100 TB ingest needs
declarative, per-batch constraint checking in the style of Deequ/Great
Expectations (public tools; the relational formulation below is original).

Design: every row-level predicate rule compiles to ONE conditional-sum
column, so an arbitrary number of rules costs a single pass over the table
(one map-side-combinable aggregate, no per-rule jobs). Cross-row rules
(key uniqueness, referential integrity) are the only ones that shuffle,
each as one aggregate/anti-join on the key columns alone. The audit result
is a tiny (rule, violations, checked) frame — collect-safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def predicate_audit(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-pass row-predicate audit: ``(rule, violations, checked)``.

    ``rules`` maps rule name -> boolean Column that should hold for every
    row. A null predicate result counts as a violation (unknown is not
    proof of quality — same stance as SQL CHECK constraints NOT ENFORCED
    would hide).
    """
    names = list(rules)
    if not names:
        # stack(0, ...) is a parse error; an empty rule set is a valid
        # audit (uniqueness/RI-only) and must yield an empty frame, not a
        # confusing analysis failure.
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "rule string, violations bigint, checked bigint"
        )
    aggs = [F.count(F.lit(1)).alias("__checked")]
    for i, name in enumerate(names):
        aggs.append(
            F.sum(F.when(F.coalesce(rules[name], F.lit(False)), 0).otherwise(1)).alias(
                f"__v{i}"
            )
        )
    row = df.agg(*aggs)
    stacked = row.selectExpr(
        "stack({}, {}) as (rule, violations)".format(
            len(names),
            ", ".join(f"'{n}', __v{i}" for i, n in enumerate(names)),
        ),
        "__checked as checked",
    )
    return stacked.select("rule", "violations", "checked")


def uniqueness_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """``(rule, violations, checked)`` — rows beyond the first per key.

    groupBy + sum(cnt-1): the shuffle carries one row per distinct key.
    """
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__c"))
    return per_key.agg(
        F.lit("unique(" + ",".join(key_cols) + ")").alias("rule"),
        F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).alias("violations"),
        F.coalesce(F.sum("__c"), F.lit(0)).alias("checked"),
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """``(rule, violations, checked)`` — child keys absent from parent.

    left_anti against the parent's distinct keys; at scale the parent key
    set is the small side (broadcast or a Bloom pre-filter — see
    operators/skew.bloom_runtime_filtered_join for the runtime variant).
    """
    total = child.agg(F.count(F.lit(1)).alias("n"))
    pk = parent.select(F.col(parent_key).alias("__pk")).distinct()
    orphans = child.join(pk, child[child_key] == pk["__pk"], "left_anti").agg(
        F.count(F.lit(1)).alias("v")
    )
    return orphans.crossJoin(total).select(
        F.lit(f"ri({child_key}->{parent_key})").alias("rule"),
        F.col("v").alias("violations"),
        F.col("n").alias("checked"),
    )


def dq_audit(
    df: DataFrame,
    rules: dict[str, Column],
    unique_keys: list[list[str]] | None = None,
    references: list[tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Full audit: predicate rules (one pass) + uniqueness + referential
    integrity, unioned into one ``(rule, violations, checked)`` frame."""
    out = predicate_audit(df, rules)
    for keys in unique_keys or []:
        out = out.unionByName(uniqueness_violations(df, keys))
    for parent, child_key, parent_key in references or []:
        out = out.unionByName(referential_violations(df, parent, child_key, parent_key))
    return out
