"""Generic two-relation as-of join — the reusable form of the pattern
``streaming/events.py:q_events_asof_prior_click`` applies to one table.

Spark has no native as-of join; the naive inequality join
(``left ⋈ right ON key AND r.ts <= l.ts`` + max) plans as a per-key nested
loop and dies at scale. This operator re-expresses it as UNION + one
partitioned sort + ``last(..., ignorenulls=True)`` carry-forward:

- tag both relations and union them (schema-aligned, right's payload
  columns nulled on the left rows and vice versa);
- ONE shuffle keyed on the join key; within each key partition, order by
  (ts, tag, tiebreak) — right rows sort BEFORE left rows at equal
  timestamps, so an equal-ts right row counts as "prior" (the standard
  backward as-of convention; flip the tag order for strict inequality);
- carry the latest right payload forward; keep left rows.

This is the shape every large-scale as-of implementation uses (time-series
joins in kdb/QuestDB do the same merge conceptually): no join operator in
the plan, cost = one exchange + one sort, immune to key skew beyond the
sort itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_TAG = "__asof_side"  # 0 = right (quote), 1 = left (trade): right sorts first


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each ``left`` row: the most recent ``right`` row with the same
    ``by`` key and ``right.ts <= left.ts``. Returns all of ``left``'s
    columns plus ``right_cols`` (null when no prior right row exists).

    ``tiebreak`` orders rows within equal (ts, side) deterministically;
    defaults to the ts column itself (adequate when ts is unique per side).

    Right-row presence is tracked independently of payload nullability:
    the carry-forward moves ONE struct per right row (non-null whenever a
    right row exists, even if every payload value in it is NULL), so a
    genuinely-NULL payload on the most recent right row surfaces as NULL
    instead of an older non-null value leaking forward.
    """
    tb = tiebreak or ts
    lcols = left.columns
    l_tagged = left.select(
        *lcols, F.lit(1).alias(_TAG), *[F.lit(None).alias(f"__r_{c}") for c in right_cols]
    )
    r_tagged = right.select(
        F.col(by),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (by, ts)],
        F.lit(0).alias(_TAG),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    ).select(*lcols, _TAG, *[f"__r_{c}" for c in right_cols])
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col(_TAG).asc(), F.col(tb).asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # one struct per RIGHT row (never null for a right row, even when all
    # its payload fields are null) — last(ignorenulls) then tracks "was
    # there a prior right row" separately from each payload's nullability
    payload = F.when(
        F.col(_TAG) == 0,
        F.struct(*[F.col(f"__r_{c}").alias(c) for c in right_cols]),
    )
    carried = unioned.select(
        *lcols,
        _TAG,
        F.last(payload, ignorenulls=True).over(w).alias("__asof_payload"),
    )
    return carried.filter(F.col(_TAG) == 1).select(
        *lcols,
        *[F.col(f"__asof_payload.{c}").alias(c) for c in right_cols],
    )
