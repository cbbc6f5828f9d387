"""Skew handling utilities: salted joins and salted aggregation.

The corpus has hub entities — a handful of canonical ids appear in a large
fraction of documents (planted by the generator, ckg_spark/corpus/pages.py;
in CKG's data these are ubiquitin-like proteins and common diseases whose
alias fan-out joins dominate, SURVEY.md §2.3 J1). Three tiers of defense,
cheapest first:

1. **Broadcast the dimension** — a broadcast join is skew-immune on the
   probe side; this is what the KG pipeline does everywhere the build side
   is dimension-sized (canonical map, alias dicts, blocklists).
2. **AQE skew-join splitting** — on by default in the session factory; at
   shuffle time Spark splits oversized partitions of a sort-merge join.
3. **Explicit salting** (this module) — when BOTH sides are big and the
   hot keys are known or discoverable, replicate the build side per salt
   and scatter the probe side: turns one hot partition into ``salt`` even
   ones. This is the only tier that also fixes skewed *aggregations* whose
   per-key state is large.

All salts are deterministic (hash of row identity, never rand()) so runs
are reproducible (north rule: no nondeterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def top_heavy_keys(df: DataFrame, key: str, min_share: float = 0.01) -> DataFrame:
    """Keys holding more than ``min_share`` of all rows: (key, n_rows).
    One aggregation pass (partial agg absorbs the hot key map-side).

    Strictly greater-than, un-floored: ``int(min_share * total)`` with ``>=``
    would report EVERY key (threshold 1, or even 0) on small inputs and the
    caller would salt the whole table."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > F.lit(float(min_share * total)))
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    probe_id_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join resilient to hot keys without broadcasting.

    The build side is replicated ``salt`` times (explode over the salt
    range — fine when build is the smaller side); the probe side gets a
    deterministic salt from hashing its identity columns (all columns by
    default). The join key becomes (on, salt), so a key with 30% of all
    probe rows spreads over ``salt`` partitions instead of one.

    Result is row-identical to ``probe.join(build, on, how)`` for
    probe-preserving join types (inner / left / left_semi / left_anti) —
    tests assert it. Right/full-outer are rejected: unmatched build rows
    exist ``salt`` times after replication and would surface as duplicates.
    Cost: build side x salt; choose salt ≈ (hot-partition rows /
    target-partition rows).
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports probe-preserving joins {sorted(allowed)}; "
            f"got how={how!r} (unmatched build rows would appear {salt} times)"
        )
    id_cols = probe_id_cols or probe.columns
    salted_probe = probe.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), F.lit(salt))
    )
    salted_build = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    return salted_probe.join(salted_build, on=[on, SALT_COL], how=how).drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    key: str,
    value: str,
    salt: int = 8,
) -> DataFrame:
    """Two-phase sum/count aggregation for keys with huge groups:
    (key, total, n_rows). Phase 1 aggregates on (key, salt) — the hot key's
    rows split across ``salt`` reducers; phase 2 combines the ``salt``
    partials (tiny). Equivalent to groupBy(key).agg(sum, count); Spark's
    map-side partial aggregation usually makes this unnecessary for
    algebraic aggregates — it exists for the cases where per-group state is
    too large to combine map-side (e.g. large collect_set states).

    Salt = row position (monotonically_increasing_id), NOT a value hash: a
    hot key's values are often constant (counting workloads), which would
    hash every row to one salt and re-create the skew. The aggregate's
    RESULT is independent of salt assignment, so run-to-run layout
    variation cannot change the output."""
    phase1 = (
        df.withColumn(SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
        .groupBy(key, SALT_COL)
        .agg(F.sum(value).alias("_partial_sum"), F.count(F.lit(1)).alias("_partial_n"))
    )
    return phase1.groupBy(key).agg(
        F.sum("_partial_sum").alias("total"),
        F.sum("_partial_n").cast("long").alias("n_rows"),
    )
