"""Range (interval) join: points matched to [start, end) intervals.

Open-source Spark has no range-join optimization — a plain non-equi
join plans as BroadcastNestedLoopJoin (or a cartesian when neither
side broadcasts), which is O(|points| x |intervals|) and explodes at
scale. Two strategies:

* ``broadcast`` — correct and fast when the interval side is
  dim-sized; the nested-loop probe stays per-executor against the
  broadcast table.
* ``binned`` — the 100 TB path. Bucket the domain into fixed-width
  bins: an interval covers ``len/width + O(1)`` consecutive bins, a
  point exactly one, so candidate pairs reduce to an EQUI-join on the
  bin id (plus any extra equi keys) followed by the exact
  ``start <= p < end`` filter. Each qualifying (point, interval) pair
  arises from exactly one bin — the point's own — so no post-dedup
  shuffle is needed. Shuffle volume is |points| + sum(len_i/width)
  rows, both hash-partitioned by Catalyst; AQE handles residual skew.
  Pick ``bin_width`` near the typical interval length: too small
  explodes the interval side, too large packs many intervals per bin
  (bucket-local cross product).

The reference has no interval join (its joins are all equi,
SURVEY.md §2.3); this is a beyond-reference extension in the family
of `asof_join_backward` (operators/asof.py), oracle-checked against
DuckDB's native inequality join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def _to_long(col: F.Column, dtype) -> F.Column:
    """Orderable numeric image of the column for binning: timestamps
    → epoch micros (NTZ cast first — value-preserving under the UTC
    session tz), dates → epoch days, numerics pass through."""
    if isinstance(dtype, TimestampType):
        return F.unix_micros(col)
    if isinstance(dtype, TimestampNTZType):
        return F.unix_micros(col.cast("timestamp"))
    if isinstance(dtype, DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date"))
    return col


def _bin_width_long(bin_width: float, dtype) -> float:
    """bin_width is given in the column's natural unit (seconds for
    timestamps, days for dates); convert to the _to_long scale."""
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return bin_width * 1_000_000
    return bin_width


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    extra_eq: Sequence[str] = (),
    strategy: str = "binned",
    bin_width: float | str | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point < end`` (and equality on ``extra_eq`` columns,
    which must exist on both sides; all other column names must be
    disjoint). Works on numeric, timestamp, or date columns; for
    timestamps ``bin_width`` is in seconds, for dates in days.

    ``strategy='broadcast'`` emits the plain non-equi join with a
    broadcast hint (interval side must be dim-sized);
    ``strategy='binned'`` needs ``bin_width`` and emits the
    equi-join-on-bin plan described in the module docstring.
    Empty intervals (start >= end) match nothing under either
    strategy.
    """
    p_dtype = points.schema[point_col].dataType
    on_range = (
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    intervals = intervals.withColumnsRenamed({k: f"_r_{k}" for k in extra_eq})

    if strategy == "broadcast":
        cond = on_range
        for k in extra_eq:
            cond = cond & (points[k] == intervals[f"_r_{k}"])
        return (
            points.join(F.broadcast(intervals), cond, "inner")
            .drop(*[f"_r_{k}" for k in extra_eq])
        )
    if strategy != "binned":
        raise ValueError(f"strategy must be 'binned' or 'broadcast', got {strategy!r}")

    s_dtype = intervals.schema[start_col].dataType
    e_dtype = intervals.schema[end_col].dataType
    # the three columns must share one numeric image: a timestamp
    # point (epoch MICROS) binned against date intervals (epoch DAYS)
    # would put the sides ~8.6e10 apart and the bin equi-join would
    # silently match nothing — fail loudly instead

    def _family(dt) -> str:
        if isinstance(dt, (TimestampType, TimestampNTZType)):
            return "timestamp"
        if isinstance(dt, DateType):
            return "date"
        return "numeric"

    fams = {_family(p_dtype), _family(s_dtype), _family(e_dtype)}
    if len(fams) > 1:
        raise ValueError(
            f"range_join(binned): point/start/end must share a type family, got "
            f"{p_dtype.simpleString()}/{s_dtype.simpleString()}/{e_dtype.simpleString()}"
        )
    p_num = _to_long(F.col(point_col), p_dtype)
    s_num = _to_long(F.col(start_col), s_dtype)
    e_num = _to_long(F.col(end_col), e_dtype)

    if bin_width == "auto":
        # Tune the width to the data: the median interval length keeps
        # the per-interval bin fan-out at ~2 while bounding how many
        # intervals share a bin. One sketch aggregate over the interval
        # side, one scalar to the driver — a config value, not a data
        # path, so scale-safe.
        med = (
            intervals.filter(F.col(start_col) < F.col(end_col))
            .select(F.percentile_approx(e_num - s_num, F.lit(0.5), F.lit(100)).alias("m"))
            .first()["m"]
        )
        w_long = max(float(med or 1.0), 1.0)
    else:
        if bin_width is None or bin_width <= 0:
            raise ValueError("binned strategy requires a positive bin_width (or 'auto')")
        w_long = _bin_width_long(bin_width, p_dtype)
    w = F.lit(w_long)

    # Bins covered by [start, end): floor(start/w) .. floor(end/w),
    # minus the last when end lands exactly on a bin boundary (the
    # exclusive end doesn't reach into that bin). floor() keeps this
    # correct for negative coordinates too.
    lo = F.floor(s_num / w)
    hi = F.floor(e_num / w) - F.when(e_num % w == 0, 1).otherwise(0)
    binned_iv = (
        intervals.filter(F.col(start_col) < F.col(end_col))
        .withColumn("_bin", F.explode(F.sequence(lo, hi)))
    )
    binned_p = points.withColumn("_bin", F.floor(p_num / w))

    cond = binned_p["_bin"] == binned_iv["_bin"]
    for k in extra_eq:
        cond = cond & (binned_p[k] == binned_iv[f"_r_{k}"])
    return (
        binned_p.join(binned_iv, cond, "inner")
        .filter(on_range)
        .drop("_bin", *[f"_r_{k}" for k in extra_eq])
    )
