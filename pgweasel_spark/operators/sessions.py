"""Gap-based sessionization — the standard log-analytics windowing the
reference's time-bucketed reports stop short of: consecutive events of
one key belong to one session until the inter-event gap exceeds the
threshold.

Scale shape: ONE shuffle (the window partition on the key), then two
chained window functions (lag → running sum) and a partial-aggregated
groupBy on (key, session_no). Session numbering is a prefix sum inside
each key partition — no driver work, no iteration; skew follows the key
distribution (salt upstream if one user dominates, same playbook as
aggregates.salted_count_by).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign events to sessions and aggregate one row per session:
    ``(key, session_no, session_start, session_end, n_events)``.

    A new session starts at the first event of a key and whenever the
    gap to the previous event is STRICTLY greater than ``gap_seconds``.
    Ordering ties on ``ts_col`` are broken by ``tiebreak_col`` so the
    lag sequence (and therefore session numbering) is deterministic.
    Gap arithmetic compares epoch seconds as doubles (microsecond
    fractions preserved) — the exact restatement a SQL oracle makes."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # NTZ timestamps don't cast straight to double; the intermediate
    # cast interprets them in the session tz (pinned UTC), matching a
    # SQL oracle's epoch() on the same naive values
    ts_s = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(ts_s).over(w)
    is_new = F.when(
        prev.isNull() | ((ts_s - prev) > float(gap_seconds)), 1
    ).otherwise(0)
    numbered = df.select(
        key_col,
        ts_col,
        tiebreak_col,
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_no"),
    )
    return (
        numbered.groupBy(key_col, "session_no")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy(key_col, "session_no")
    )
