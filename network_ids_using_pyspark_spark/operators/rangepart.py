"""Range-partition primitives: exact distributed order statistics and
contiguous range bucketing WITHOUT a global single-task sort.

The reference's NTILE/global-window idioms (ranking a whole relation
through one `Window.orderBy(...)`) are exact but collapse to a single
task — the scale-killer flagged for `equidepth_histogram`,
`stump_split_gains`, `rfm_segment_counts`, `learned_binning_apply`,
`snm_candidate_pairs` and `pareto_frontier_orders`.  This module is
the one shared primitive those queries' `_scaled` twins route
through (queries/rangescale.py):

* ``exact_rank_select`` — the value tuple at given GLOBAL ranks of a
  lexicographic (value[, tiebreak]) order, found by iterative
  histogram narrowing: each pass bins the remaining candidates on a
  deterministic equi-width grid with one map-side-combined groupBy,
  exact per-bin counts locate each target rank's bin, and only those
  bins' rows survive to the next pass.  Three passes at bins=1024
  resolve ranks over 10^9+ rows down to a ≤`small`-row remainder that
  is collected and sorted on the driver (the bounded G4-style
  scalar-fit pattern).  No sort, no shuffle of the big relation —
  only full-scan aggregates with partial (map-side) combine.
* ``ntile_boundaries`` — NTILE bucket arithmetic (ceil/floor sizes)
  so rank-selected cutpoints reproduce NTILE bucket assignment
  bit-for-bit, ties included, when the selection runs on the same
  (value, tiebreak) total order NTILE's window uses.
* ``equiwidth_bucket_expr`` — a map-side contiguous bucket id over a
  numeric column (equal values always share a bucket), the carrier
  for per-bucket windows + boundary seeding in the SNM / Pareto
  scaled twins.

Exactness does NOT depend on the grid: the grid only prunes.  Counts
per cell are exact, so the located ranks are exact; the final resolve
sorts the true column values (native type, not the double cast used
for grid arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Hard ceiling on what the degenerate-tie fallback may collect; far
# above anything the fixtures or a sane tiebreak column can produce.
_MAX_RESOLVE_ROWS = 5_000_000


def ntile_sizes(n: int, k: int) -> list[int]:
    """Bucket sizes NTILE(k) assigns to an n-row ordered relation:
    the first n % k buckets get ceil(n/k), the rest floor(n/k)."""
    base, rem = divmod(n, k)
    return [base + 1 if i < rem else base for i in range(k)]


def ntile_boundaries(n: int, k: int) -> list[int]:
    """Cumulative 1-indexed rank of the LAST row of each NTILE(k)
    bucket; boundaries[-1] == n."""
    out, c = [], 0
    for s in ntile_sizes(n, k):
        c += s
        out.append(c)
    return out


def locate_ranks(
    hist: dict[int, int], pairs: list[tuple[int, int]]
) -> dict[int, list[tuple[int, int]]]:
    """Pure rank arithmetic of one narrowing pass: given exact per-bin
    counts (bins keyed by their ORDER position) and (global_rank,
    local_rank) targets, return {bin: [(global_rank, rank local to
    that bin)]} for every bin that contains a target.  Exactness of
    the whole descent reduces to this function plus exact counting —
    property-tested off-Spark in tests/test_property.py."""
    cum = 0
    needed: dict[int, list[tuple[int, int]]] = {}
    for b in sorted(hist):
        c = hist[b]
        for g, loc in pairs:
            if cum < loc <= cum + c:
                needed.setdefault(b, []).append((g, loc - cum))
        cum += c
    return needed


def _resolve_small(cdf: DataFrame, cols: list[str], pairs, count: int) -> dict:
    """Collect a bounded candidate remainder and read the target local
    ranks off a driver-side sort of the NATIVE column values."""
    if count > _MAX_RESOLVE_ROWS:
        raise ValueError(
            f"rank-select degenerate remainder of {count} rows exceeds "
            f"{_MAX_RESOLVE_ROWS}; provide a higher-cardinality tiebreak column"
        )
    rows = cdf.select(*cols).collect()
    rows.sort(key=lambda r: tuple(r[c] for c in cols))
    return {g: tuple(rows[loc - 1][c] for c in cols) for g, loc in pairs}


def exact_rank_select(
    df: DataFrame,
    cols: list[str],
    ranks: list[int],
    bins: int = 1024,
    small: int = 4096,
    max_passes: int = 64,
) -> dict[int, tuple]:
    """Exact values of `cols` (ascending lexicographic order, non-null
    numeric/decimal/date-castable) at the given 1-indexed global ranks.

    Returns ``{rank: tuple(values in cols order)}``.  Runs
    O(passes) full-scan aggregates (map-side combined, no shuffle of
    the data, no global sort); every driver-side collect is bounded
    (bins rows per histogram, `small` rows at the final resolve).
    """
    sdf = df.select(*cols)
    n = sdf.count()
    ranks = sorted(set(ranks))
    if not ranks:
        return {}
    if ranks[0] < 1 or ranks[-1] > n:
        raise ValueError(f"ranks {ranks[0]}..{ranks[-1]} outside 1..{n}")
    out: dict[int, tuple] = {}
    # task = (candidate df, candidate count, [(global_rank, local_rank)],
    #         index of the sort column still being narrowed)
    tasks = [(sdf, n, [(r, r) for r in ranks], 0)]
    passes = 0
    while tasks:
        cdf, cnt, pairs, ci = tasks.pop()
        passes += 1
        if cnt <= small or passes > max_passes:
            out.update(_resolve_small(cdf, cols, pairs, cnt))
            continue
        col = cols[ci]
        lohi = cdf.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        lo, hi = lohi["lo"], lohi["hi"]
        if lo == hi:
            # column constant over the remainder: narrow on the next
            # sort column, or resolve if this was the last one
            if ci + 1 < len(cols):
                tasks.append((cdf, cnt, pairs, ci + 1))
            else:
                out.update(_resolve_small(cdf, cols, pairs, cnt))
            continue
        lo_d, hi_d = float(lo), float(hi)
        width = hi_d - lo_d
        if width <= 0.0:
            # distinct native values collapse to one double: the grid
            # cannot split further — bounded-tie fallback
            out.update(_resolve_small(cdf, cols, pairs, cnt))
            continue
        dcol = F.col(col).cast("double")
        binx = (
            F.greatest(
                F.least(
                    F.floor((dcol - F.lit(lo_d)) / F.lit(width) * bins),
                    F.lit(bins - 1),
                ),
                F.lit(0),
            )
        ).cast("int")
        hist = {
            r["__b"]: r["count"]
            for r in cdf.groupBy(binx.alias("__b")).count().collect()
        }
        needed = locate_ranks(hist, pairs)
        per_bin = width / bins
        for b, sub in needed.items():
            # the exact bin predicate re-derives membership; the padded
            # range predicate is redundant but sargable (pushes to the
            # parquet scan / survives as a cheap pre-filter)
            subdf = cdf.filter(
                (binx == F.lit(b))
                & (dcol >= F.lit(lo_d + (b - 1) * per_bin))
                & (dcol <= F.lit(lo_d + (b + 2) * per_bin))
            )
            tasks.append((subdf, hist[b], sub, ci))
    return out


def equiwidth_bucket_expr(col: str, lo: float, hi: float, nbuckets: int) -> Column:
    """Map-side contiguous bucket id in [0, nbuckets) over a numeric
    column: a pure function of the value, so equal values (window-tie
    groups) never straddle a bucket boundary.  `lo`/`hi` come from one
    min/max aggregate; degenerate lo==hi collapses to bucket 0.

    Output exactness of the rangescale twins never depends on WHERE
    the boundaries fall — any deterministic ordered contiguous
    partition works — so under value skew the drop-in upgrade is
    equi-DEPTH boundaries from ``exact_rank_select`` (one extra
    narrowing descent buys balanced tasks); equi-width is the default
    because it costs a single min/max aggregate."""
    if hi <= lo:
        return F.lit(0)
    dcol = F.col(col).cast("double")
    return (
        F.greatest(
            F.least(
                F.floor((dcol - F.lit(float(lo))) / F.lit(float(hi - lo)) * nbuckets),
                F.lit(nbuckets - 1),
            ),
            F.lit(0),
        )
    ).cast("int")
