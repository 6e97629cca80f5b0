"""Dimension-lookup joins: CIDR/range lookup and time-keyed rate lookup.

Reference semantics: TD's enrichment UDFs ``TD_IP_TO_COUNTRY(ip)`` and
``TD_CURRENCY_CONV(time, currency, amount)`` (public TD UDF docs; SURVEY.md
§2.8 — /root/reference is empty, loci are public-knowledge anchors). Both
are, under the hood, joins against a managed dimension table (GeoIP ranges,
daily FX rates). We implement them as *operators* over an explicit
dimension DataFrame rather than scalar UDFs, because at 100 TB the join
strategy is the whole game:

* ``range_lookup`` — the naive plan for ``fact.key BETWEEN dim.lo AND
  dim.hi`` is a BroadcastNestedLoopJoin: every fact row is compared against
  every one of the dim's ~200k ranges (real GeoLite2 is ~400k rows) — a
  200,000x scan multiplier. Because lookup ranges are NON-OVERLAPPING, we
  instead explode each range to the fixed-width buckets it spans (bucket =
  key >> shift) and broadcast-HASH-join on the bucket, keeping the range
  predicate as a cheap residual filter. Each fact row now probes one hash
  bucket and compares against only the handful of ranges sharing its
  prefix. This is the standard IP-geolocation join strategy at warehouse
  scale (interval bucketization, same family as operators/interval.py's
  bucketized interval join — this is its equi-width, broadcast-dim
  specialization).

* ``rate_convert`` — FX conversion is an equi-join on (currency, day)
  against a broadcast daily-rates dim; for sparse/irregular rate feeds use
  ``operators.asof.asof_join`` (documented fallback) instead of densifying.

The GeoIP *data* is licensed/proprietary, so tests and queries use a small
deterministic synthetic ranges table — the operator itself is data-agnostic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ip_to_int", "range_lookup", "rate_convert"]


def ip_to_int(col: str | Column) -> Column:
    """Dotted-quad IPv4 string -> BIGINT (JVM-side, codegen'd; NULL for
    malformed input via try-cast semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    octets = [parts.getItem(i).try_cast("bigint") for i in range(4)]
    valid = None
    for o in octets:
        ok = o.isNotNull() & (o >= 0) & (o <= 255)
        valid = ok if valid is None else (valid & ok)
    value = (
        octets[0] * F.lit(16777216)
        + octets[1] * F.lit(65536)
        + octets[2] * F.lit(256)
        + octets[3]
    )
    return F.when(F.size(parts) == 4, F.when(valid, value))


def range_lookup(
    facts: DataFrame,
    key_col: str,
    ranges: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    payload: Sequence[str] = ("value",),
    shift: int = 24,
    how: str = "left",
) -> DataFrame:
    """Join ``facts`` to a small non-overlapping ``[lo, hi]`` ranges dim on
    ``lo <= facts[key_col] <= hi`` WITHOUT a nested-loop join.

    Each dim range is exploded to every width-``2^shift`` bucket it spans
    (``sequence(lo >> shift, hi >> shift)``), then broadcast and HASH-joined
    on ``bucket = key >> shift``; the range predicate remains as a residual
    filter inside the join. For IPv4 / GeoIP, ``shift=24`` buckets by /8
    octet; real-world range sets span few buckets each (CIDR blocks nest
    inside prefixes), so the explode factor stays ~1-2x.

    Non-overlap is the caller's contract (GeoIP and tiering tables satisfy
    it); overlapping dims should use operators/interval.py, which handles
    many-to-many overlap. At most one dim row matches each fact row, so
    ``how='left'`` preserves fact cardinality with NULL payload for
    unmatched keys (TD_IP_TO_COUNTRY's NULL-for-unknown contract).
    """
    buckets = ranges.withColumn(
        "__rb",
        F.explode(
            F.sequence(
                F.shiftright(F.col(lo_col), shift),
                F.shiftright(F.col(hi_col), shift),
            )
        ),
    )
    key = F.col(key_col)
    joined = facts.withColumn(
        "__fb", F.shiftright(key, shift)
    ).join(
        F.broadcast(buckets),
        on=[
            F.col("__fb") == F.col("__rb"),
            key >= F.col(lo_col),
            key <= F.col(hi_col),
        ],
        how=how,
    )
    keep = [facts[c] for c in facts.columns] + [buckets[c] for c in payload]
    return joined.select(*keep)


def rate_convert(
    facts: DataFrame,
    rates: DataFrame,
    time_col: str = "time",
    currency_col: str = "currency",
    amount_col: str = "amount",
    rate_time_col: str = "rate_day",
    rate_currency_col: str = "currency",
    rate_col: str = "rate",
    out_col: str = "amount_usd",
) -> DataFrame:
    """TD_CURRENCY_CONV semantics: multiply ``amount_col`` by the daily
    rate for (currency, day-of ``time_col``). ``time_col`` and
    ``rate_time_col`` are epoch seconds; the join key is the UTC day index
    ``epoch // 86400`` — a broadcast equi-join (daily-dense rates contract;
    for sparse feeds, as-of join via operators/asof.py instead). Unknown
    (currency, day) yields NULL — the reference UDF's behavior for an
    unlisted currency."""
    day = (F.col(time_col) / 86400).cast("bigint")
    r = rates.select(
        (F.col(rate_time_col) / 86400).cast("bigint").alias("__day"),
        F.col(rate_currency_col).alias("__cur"),
        F.col(rate_col).alias("__rate"),
    )
    joined = facts.join(
        F.broadcast(r),
        on=[
            day == F.col("__day"),
            F.col(currency_col) == F.col("__cur"),
        ],
        how="left",
    )
    return joined.select(
        *[facts[c] for c in facts.columns],
        (F.col(amount_col) * F.col("__rate")).alias(out_col),
    )
