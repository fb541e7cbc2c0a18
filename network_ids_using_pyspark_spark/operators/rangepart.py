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


def _grid_bin(col: str, lo_d: float, width: float, bins: int) -> Column:
    """Deterministic equi-width grid cell of a (double-cast) column —
    the pruning grid of one narrowing level.  Pure per-row arithmetic,
    so equal values always share a cell."""
    dcol = F.col(col).cast("double")
    return (
        F.greatest(
            F.least(
                F.floor((dcol - F.lit(lo_d)) / F.lit(width) * bins),
                F.lit(bins - 1),
            ),
            F.lit(0),
        )
    ).cast("int")


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

    Returns ``{rank: tuple(values in cols order)}``.  The descent is
    LEVEL-BATCHED: every live narrowing task of a level shares ONE
    min/max aggregate and ONE histogram aggregate (tasks are disjoint,
    so a CASE over the task predicates keys both), making the total
    full-scan count ~2·depth + 1, independent of how many target ranks
    fan out.  (The round-7 scale measurement caught the per-task
    recursion this replaces going super-linear: at 30x rows every
    boundary rank's bin needed its own second-level pass, i.e. ~20
    extra full scans — one batched scan now serves them all.)  Every
    driver-side collect stays bounded: bins rows per (task, level) in
    the histogram, `small` rows per task at the final resolve.
    """
    sdf = df.select(*cols)
    n = sdf.count()
    ranks = sorted(set(ranks))
    if not ranks:
        return {}
    if ranks[0] < 1 or ranks[-1] > n:
        raise ValueError(f"ranks {ranks[0]}..{ranks[-1]} outside 1..{n}")
    out: dict[int, tuple] = {}
    # task = (predicate Column | None, candidate count,
    #         [(global_rank, local_rank)], sort-column index)
    tasks: list[tuple] = [(None, n, [(r, r) for r in ranks], 0)]
    levels = 0
    while tasks:
        levels += 1
        force_resolve = levels > max_passes
        live: list[tuple] = []
        for pred, cnt, pairs, ci in tasks:
            if cnt <= small or force_resolve:
                cdf = sdf if pred is None else sdf.filter(pred)
                out.update(_resolve_small(cdf, cols, pairs, cnt))
            else:
                live.append((pred, cnt, pairs, ci))
        if not live:
            break
        # ONE scan: per-task min/max of each task's current sort column,
        # in BOTH the double cast (grid arithmetic) and the NATIVE type.
        # Tasks are DISJOINT (sibling bins / disjoint ancestors), so a
        # flat CASE chain keys rows to tasks; rows in no task get NULL.
        # The native pair disambiguates "column truly constant" from
        # "distinct natives collapse to one double" (int64 ≥ 2^53,
        # high-precision decimals): advancing ci in the latter case
        # would narrow under a non-lexicographic order and return
        # silently wrong values (repro: [(2^53+1, 0), (2^53+1, 1),
        # (2^53, 2), (2^53, 3)] with cols [v, tb]).
        tid = None
        for i, (pred, _, _, _) in enumerate(live):
            cond = F.lit(True) if pred is None else pred
            tid = F.when(cond, F.lit(i)) if tid is None else tid.when(cond, F.lit(i))
        aggs = []
        for i, (pred, _, _, ci) in enumerate(live):
            cond = F.lit(True) if pred is None else pred
            nat = F.when(cond, F.col(cols[ci]))
            dbl = F.when(cond, F.col(cols[ci]).cast("double"))
            aggs += [
                F.min(dbl).alias(f"__lo_{i}"),
                F.max(dbl).alias(f"__hi_{i}"),
                F.min(nat).alias(f"__nlo_{i}"),
                F.max(nat).alias(f"__nhi_{i}"),
            ]
        mm = sdf.agg(*aggs).collect()[0]
        # classify: truly-constant column → advance ci (or resolve);
        # double-collapsed but natives differ → bounded exact resolve
        # (the pre-batching tie fallback, capped by _MAX_RESOLVE_ROWS);
        # else grid
        grids: list[tuple] = []  # (task index, lo_d, width)
        next_tasks: list[tuple] = []
        for i, (pred, cnt, pairs, ci) in enumerate(live):
            lo_d, hi_d = mm[f"__lo_{i}"], mm[f"__hi_{i}"]
            nlo, nhi = mm[f"__nlo_{i}"], mm[f"__nhi_{i}"]
            width = float(hi_d) - float(lo_d)
            if width <= 0.0:
                if nlo == nhi and ci + 1 < len(cols):
                    next_tasks.append((pred, cnt, pairs, ci + 1))
                elif nlo == nhi:
                    # LAST sort column constant within this task — and
                    # columns before ci are constant by the descent
                    # invariant (ci only advances on a natively-constant
                    # column), so EVERY row in the task carries the same
                    # tuple: fetch one row instead of collecting cnt
                    # (an all-tied key holding >_MAX_RESOLVE_ROWS rows
                    # is now O(1) driver traffic instead of an error).
                    cdf = sdf if pred is None else sdf.filter(pred)
                    row = cdf.select(*cols).limit(1).collect()[0]
                    val = tuple(row[c] for c in cols)
                    out.update({g: val for g, _loc in pairs})
                else:
                    cdf = sdf if pred is None else sdf.filter(pred)
                    out.update(_resolve_small(cdf, cols, pairs, cnt))
            else:
                grids.append((i, float(lo_d), width))
        if grids:
            # ONE scan: per-(task, grid-cell) exact counts
            bcol = None
            for i, lo_d, width in grids:
                ci = live[i][3]
                g = _grid_bin(cols[ci], lo_d, width, bins)
                bcol = F.when(tid == i, g) if bcol is None else bcol.when(tid == i, g)
            hist_rows = (
                sdf.select(tid.alias("__t"), bcol.alias("__b"))
                .filter(F.col("__t").isNotNull() & F.col("__b").isNotNull())
                .groupBy("__t", "__b")
                .count()
                .collect()
            )
            hists: dict[int, dict[int, int]] = {}
            for r in hist_rows:
                hists.setdefault(r["__t"], {})[r["__b"]] = r["count"]
            for i, lo_d, width in grids:
                pred, cnt, pairs, ci = live[i]
                hist = hists[i]
                needed = locate_ranks(hist, pairs)
                per_bin = width / bins
                col = cols[ci]
                for b, sub in needed.items():
                    # exact bin predicate + a redundant-but-sargable
                    # range pad that pushes to the parquet scan
                    dcol = F.col(col).cast("double")
                    bin_pred = (
                        (_grid_bin(col, lo_d, width, bins) == F.lit(b))
                        & (dcol >= F.lit(lo_d + (b - 1) * per_bin))
                        & (dcol <= F.lit(lo_d + (b + 2) * per_bin))
                    )
                    child = bin_pred if pred is None else (pred & bin_pred)
                    next_tasks.append((child, hist[b], sub, ci))
        tasks = next_tasks
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
