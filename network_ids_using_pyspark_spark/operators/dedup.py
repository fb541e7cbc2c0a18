"""Fuzzy-deduplication operators (LLM-data-pipeline surface).

Four families, each scale-designed and (because every hash is the
portable md5 primitive) fully oracle-checkable:

* **n-gram Jaccard** — inverted-index self-join on word shingles:
  explode distinct shingles → join on shingle → count intersections →
  Jaccard from per-doc set sizes.  Never a quadratic cross join; the
  shuffle key is the shingle.  At 100 TB add ``max_df`` (drop shingles
  occurring in more than N docs — stopword-shingle skew control, the
  standard trick) — exposed as a parameter.
* **MinHash** — k independent hash mins per doc over the shingle set;
  signature similarity estimates Jaccard without pairwise shingle
  intersection.
* **MinHash LSH** — band the signatures (b bands × r rows), join on
  band keys: candidate pairs cost O(collisions), not O(n²).
* **SimHash** — per-token hash bit-votes, packed into a small integer
  fingerprint; near-dups differ in few bits.

Reference has none of these (its only dedup-adjacent op is exact
``dropDuplicates`` semantics); they are the BASELINE.json north-star
additions (SURVEY.md §7.1 phase 7).
"""

from __future__ import annotations

import hashlib
import threading
import weakref

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel  # noqa: F401  (jaccard_pairs param)

from ..functions.hashing import portable_hash64
from .textops import tokens


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (built-in array ops —
    sequence/slice/array_join — no UDF)."""
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(F.sequence(F.lit(1), k), lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def exploded_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs, distinct per doc — the inverted-index
    input relation."""
    return docs.select(
        id_col, F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle")
    )


def _min_overlap(threshold: float, n_col: Column) -> Column:
    """Minimum integer intersection size ⌈t·n⌉ implied by the
    similarity threshold, with a SAFE-SIDE epsilon: double rounding can
    push an exactly-integral t·n up a hair, and a plain ``ceil`` would
    then overshoot by one — shortening the prefix and silently LOSING
    true pairs.  Biasing down by 1e-9 before the ceil can only ever
    LENGTHEN a prefix (extra candidates, never missed ones); true
    non-integral t·n values sit ≥ 1/denominator(t) ≫ 1e-9 away from
    integers for every threshold used here."""
    return F.ceil(n_col.cast("double") * F.lit(float(threshold)) - F.lit(1e-9)).cast(
        "int"
    )


# Heavy-shingle cutoff: a shingle is "heavy" (stop-word-like) when its
# document frequency exceeds max(floor, HEAVY_FRAC of the corpus).
# The cutoff must be RELATIVE to corpus size — df grows linearly with
# the corpus, so any fixed cutoff reclassifies ordinary content
# shingles as heavy at scale (measured at the r8 10× point: a fixed 64
# turned 23k content shingles heavy, made every doc majority-heavy,
# and the heavy machinery cost 6× the join it replaced).  Stop-phrase
# shingles sit at df/N ≈ constant; content shingles at df/N → 0 — the
# fraction separates them at every scale.  The 64-row floor keeps tiny
# corpora (unit tests, sf0.001) on the plain path.  Same spirit as the
# Adamic-Adar stop-node ceiling (operators/graph.py).
HEAVY_FRAC = 0.05
HEAVY_DF_FLOOR = 64


def _resolve_heavy_df(
    docs: DataFrame, heavy_df: "int | None", doc_count: "int | None" = None
) -> int:
    """Resolve the heavy cutoff; the corpus count is a bounded 1-row
    driver action (the G4 scalar pattern) used only to size the
    cutoff — it never enters result semantics (the output is
    bit-identical at ANY cutoff).  Callers that already know the
    corpus size pass ``doc_count`` to skip the count job (ADVICE r8)."""
    if heavy_df is not None:
        return heavy_df
    import math

    n = doc_count if doc_count is not None else docs.count()
    return max(HEAVY_DF_FLOOR, math.ceil(HEAVY_FRAC * n))


def _df_split(ex: DataFrame, id_col: str, heavy_df: int):
    """Annotate the exploded corpus with per-shingle document frequency
    and fold per-doc stats: (exd = ex + df_sh, stats = id → set size +
    heavy-shingle count).  ``exd`` feeds four plan branches — persist
    it so the df join runs once."""
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_sh"))
    # EAGER materialization, not lazy persist: 5-6 downstream plan
    # branches consume this relation inside one action, and a lazy
    # cache lets them race to recompute the df join (measured 3× wall
    # at sf0.1).  localCheckpoint also truncates the lineage, so the
    # branches re-plan from stored blocks.  DISK_ONLY: the exploded
    # corpus is the largest relation in the plan and holding it on the
    # execution heaps starved the 30× run's sort/agg buffers into OOM —
    # columnar disk blocks cost one re-read and free the heap (same
    # escalation ladder as jaccard_pairs' storage_level/spill_path).
    joined = ex.join(dfreq, "shingle")
    # storageLevel kwarg is PySpark ≥ 4.0 (SPARK-45130) — guaranteed by
    # the declared floor pyproject.toml `pyspark>=4.0`.  The former
    # 3.5.x TypeError fallback was dead code under that floor and was
    # dropped (ADVICE r9: a declared floor that contradicts a compat
    # path leaves the path untested drift).
    exd = joined.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    stats = exd.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.sum(F.when(F.col("df_sh") > heavy_df, 1).otherwise(0))
        .cast("int")
        .alias("n_hv"),
    )
    return exd, stats


# Module-wide ledger of every relation a pair-join persisted and has
# not yet released.  The per-result attribute set by ``_track_cache``
# lives only on the exact DataFrame object ``jaccard_pairs``/
# ``containment_pairs`` returned — any downstream transformation
# (``.filter``, ``.select`` …) produces a NEW DataFrame without it,
# which previously left the persisted exploded relation with no
# release path in long-lived sessions (ADVICE r9).  The ledger gives
# :func:`release_all_pair_join_caches` a handle that survives plan
# composition.
#
# The ledger holds WEAK references (ADVICE r10): the strong reference
# lives on the result DataFrame's ``_nids_cached_relations`` attribute,
# so once a caller drops the result, the entry dies with it and the
# ContextCleaner GC-reclaim fallback works exactly as before the ledger
# existed — a session that never calls a release function cannot grow
# the ledger unboundedly.  Dead entries are pruned on every ledger
# operation; a lock makes concurrent pair-joins safe.
_LIVE_PAIR_CACHES: "list[weakref.ref[DataFrame]]" = []
_LEDGER_LOCK = threading.Lock()


def _prune_dead_locked() -> None:
    _LIVE_PAIR_CACHES[:] = [r for r in _LIVE_PAIR_CACHES if r() is not None]


def live_pair_cache_relations() -> "list[DataFrame]":
    """The persisted pair-join relations still tracked (and alive)."""
    with _LEDGER_LOCK:
        _prune_dead_locked()
        return [r() for r in _LIVE_PAIR_CACHES if r() is not None]


def _track_cache(result: DataFrame, cached: "list[DataFrame]") -> DataFrame:
    """Record the relations a pair-join persisted while building
    ``result`` so :func:`release_pair_join_cache` /
    :func:`release_all_pair_join_caches` can free them (ADVICE r8:
    eager builds leak cache in long-lived sessions)."""
    result._nids_cached_relations = list(cached)
    with _LEDGER_LOCK:
        _prune_dead_locked()
        _LIVE_PAIR_CACHES.extend(weakref.ref(c) for c in cached)
    return result


def release_pair_join_cache(result: DataFrame) -> None:
    """Unpersist the relations cached while building a
    ``jaccard_pairs``/``containment_pairs`` result (no-op for other
    DataFrames).

    MUST be called on the DataFrame those functions returned ITSELF:
    the tracking attribute does not propagate through transformations,
    so ``release_pair_join_cache(jaccard_pairs(...).filter(...))`` is a
    silent no-op — hold the original reference, or use
    :func:`release_all_pair_join_caches` (ADVICE r9).

    The eager ``localCheckpoint`` blocks themselves have no public
    unpersist API — Spark's ContextCleaner reclaims them once the
    result DataFrame (whose plan references the checkpointed RDD) is
    garbage-collected, so drop your reference to ``result`` after
    calling this."""
    rels = list(getattr(result, "_nids_cached_relations", ()))
    for rel in rels:
        rel.unpersist()
    if rels:
        released = {id(rel) for rel in rels}
        with _LEDGER_LOCK:
            _LIVE_PAIR_CACHES[:] = [
                r
                for r in _LIVE_PAIR_CACHES
                if r() is not None and id(r()) not in released
            ]
    result._nids_cached_relations = []


def release_all_pair_join_caches() -> None:
    """Unpersist EVERY relation any pair-join in this process persisted
    and has not yet released — the handle that works when the original
    pair-join result was transformed away or dropped (ADVICE r9).  Safe
    to call between pipeline stages in a long-lived session."""
    with _LEDGER_LOCK:
        refs = list(_LIVE_PAIR_CACHES)
        _LIVE_PAIR_CACHES.clear()
    for ref in refs:
        rel = ref()
        if rel is not None:
            rel.unpersist()


def _light_pair_counts(exd: DataFrame, id_col: str, heavy_df: int) -> DataFrame:
    """Exact per-pair count of shared LIGHT (df ≤ cutoff) shingles via
    the direct inverted-index join — one thin shuffle, work bounded by
    cutoff · |corpus|.  The shuffle-hash hint keeps AQE from
    broadcasting the exploded corpus (the OOM-at-scale plan)."""
    light = exd.filter(F.col("df_sh") <= heavy_df)
    a = light.select(F.col(id_col).alias("doc_a"), "shingle")
    b = light.select(F.col(id_col).alias("doc_b"), "shingle").hint("shuffle_hash")
    return (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_light"))
    )


def _heavy_sets(exd: DataFrame, id_col: str, heavy_df: int) -> DataFrame:
    """Per-doc HEAVY shingle sets as arrays sorted by the global rarity
    order (df asc, shingle asc) — short (stop-word-like shingles per
    doc, bounded by doc length), so shipping them through candidate
    joins stays cheap."""
    return (
        exd.filter(F.col("df_sh") > heavy_df)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("df_sh", "shingle"))).alias("hi"))
        .select(id_col, F.transform("hi", lambda s: s["shingle"]).alias("h_set"))
    )


def _attach_pair_side(pairs: DataFrame, rel: DataFrame, id_col: str, side: str, how: str = "inner") -> DataFrame:
    """Join a per-doc relation onto one side of a pair relation,
    suffixing its non-id columns with ``_a``/``_b``."""
    cols = [c for c in rel.columns if c != id_col]
    renamed = rel.select(
        F.col(id_col).alias(f"doc_{side}"),
        *[F.col(c).alias(f"{c}_{side}") for c in cols],
    )
    return pairs.join(renamed, f"doc_{side}", how)


def _empty_str_arr() -> Column:
    return F.array().cast("array<string>")


def _n_heavy_col() -> Column:
    """Exact heavy-intersection size from the two (possibly absent)
    heavy arrays — a JVM codegen expression, no shuffle."""
    return F.size(
        F.array_intersect(
            F.coalesce(F.col("h_set_a"), _empty_str_arr()),
            F.coalesce(F.col("h_set_b"), _empty_str_arr()),
        )
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int | None = None,
    storage_level: "StorageLevel | None" = None,
    spill_path: str | None = None,
    heavy_df: int | None = None,
    doc_count: int | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold — EXACT, via a
    document-frequency-split join that is bounded in BOTH cost regimes
    the r8 10× skew harness exposed:

    * **Light shingles (df ≤ heavy_df)** go through the direct
      inverted-index co-occurrence join — one thin shuffle whose work
      is ≤ heavy_df row visits per corpus shingle, i.e. LINEAR in the
      corpus.  This is the dominant path on replica-style near-dup
      data, where pair enumeration is output-bound (the r8 evidence:
      output pairs grow α≈3.0 under 10× replica cliques — no algorithm
      emits them cheaper than the thin count join).
    * **Heavy shingles (df > heavy_df)** never enter a df² join.  Their
      per-doc sets are short arrays; pairs already found via a shared
      light shingle add their exact heavy overlap by `array_intersect`
      AFTER a count-based prune (n_light + min(heavy counts) must reach
      ⌈t·max(n_a,n_b)⌉ — a necessary condition, so pruning is safe).
      Pairs sharing ONLY heavy shingles are recovered by the
      prefix-filtering pigeonhole (AllPairs/PPJoin, Bayardo WWW'07 /
      Xiao WWW'08) restricted to the heavy tail: a qualifying pair must
      share a shingle ranked ≤ n − ⌈t·n⌉ + 1 in each doc's global
      rarity order, and for an all-heavy intersection that means one of
      each doc's ``n_hv − ⌈t·n⌉ + 1`` rarest HEAVY shingles — empty
      unless a doc is ≥ t stop-shingle, which is what keeps the hot
      df² out of the plan.

    Output is bit-identical to the naive full inverted-index join (the
    unit suite compares against it on adversarial corpora); only the
    physical plan changes.  ``max_df`` is retained as the documented
    semantics-CHANGING knob (drop shingles with df > N before
    everything; keep None for exact results).

    ``storage_level`` controls how the exploded-shingle relation is
    persisted (default ``MEMORY_AND_DISK``).  At extreme scale the
    exploded corpus is ~an order of magnitude larger than the input —
    pass ``StorageLevel.DISK_ONLY`` to keep it off the executor heaps
    entirely (the 100 TB memory-pressure escape hatch; VERDICT r1 #6).

    ``spill_path`` is the last escalation step (VERDICT r2 #9): write
    the exploded relation to a parquet table and re-scan it, so the
    consuming plan branches read columnar storage instead of executor
    block storage — survives executor loss, costs nothing on the
    heaps, and the re-scan gets column pruning.  Overrides
    ``storage_level``.

    **Eager construction (ADVICE r8):** building this DataFrame runs
    Spark jobs immediately — a 1-row corpus count to size the heavy
    cutoff (skipped when ``heavy_df`` or ``doc_count`` is given) and
    the eager DISK_ONLY checkpoint of the df-annotated exploded corpus
    (required: 5-6 plan branches consume it inside one action, and a
    lazy cache lets them race to recompute the df join — measured 3x
    wall at sf0.1).  In a long-lived session, release the cached
    relations with :func:`release_pair_join_cache` once the result is
    consumed."""
    heavy_df = _resolve_heavy_df(docs, heavy_df, doc_count)
    ex = exploded_shingles(docs, id_col, text_col, n)
    if max_df is not None:
        rare = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") <= max_df
        )
        ex = ex.join(rare.select("shingle"), "shingle")
    if spill_path is not None:
        ex.write.mode("overwrite").parquet(spill_path)
        ex = docs.sparkSession.read.parquet(spill_path)
    elif storage_level is not None:
        ex = ex.persist(storage_level)
    else:
        ex = ex.persist()
    exd, stats = _df_split(ex, id_col, heavy_df)
    hsets = _heavy_sets(exd, id_col, heavy_df)
    # --- path A: pairs sharing ≥1 light shingle -----------------------
    lp = _light_pair_counts(exd, id_col, heavy_df)
    A = _attach_pair_side(_attach_pair_side(lp, stats, id_col, "a"), stats, id_col, "b")
    minreq = _min_overlap(threshold, F.greatest("n_sh_a", "n_sh_b"))
    A = A.filter(F.col("n_light") + F.least("n_hv_a", "n_hv_b") >= minreq)
    A = _attach_pair_side(
        _attach_pair_side(A, hsets, id_col, "a", "left"), hsets, id_col, "b", "left"
    )
    A = A.select(
        "doc_a",
        "doc_b",
        (F.col("n_light") + _n_heavy_col()).alias("n_inter"),
        F.col("n_sh_a").alias("n_a"),
        F.col("n_sh_b").alias("n_b"),
    )
    # --- path B: pairs whose entire intersection is heavy -------------
    hpx = (
        _attach_pair_side(
            hsets.select(F.col(id_col).alias("doc_a"), "h_set"),
            stats,
            id_col,
            "a",
        )
        .select(
            F.col("doc_a").alias(id_col),
            F.col("n_sh_a").alias("n_sh"),
            F.explode(
                F.slice(
                    "h_set",
                    F.lit(1),
                    F.greatest(
                        F.lit(0),
                        F.col("n_hv_a") - _min_overlap(threshold, F.col("n_sh_a")) + 1,
                    ),
                )
            ).alias("shingle"),
        )
    )
    ha = hpx.select(F.col(id_col).alias("doc_a"), "shingle")
    hb = hpx.select(F.col(id_col).alias("doc_b"), "shingle")
    hcand = (
        ha.join(hb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # light sets ONLY for candidate docs (semi-join prune): needed to
    # certify the intersection is all-heavy (n_light == 0 ⇒ disjoint
    # from path A, which owns every pair with a shared light shingle)
    cids = (
        hcand.select(F.col("doc_a").alias(id_col))
        .unionByName(hcand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    lsets = (
        exd.filter(F.col("df_sh") <= heavy_df)
        .join(cids, id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("l_set"))
    )
    B = _attach_pair_side(
        _attach_pair_side(hcand, lsets, id_col, "a", "left"), lsets, id_col, "b", "left"
    )
    B = B.filter(
        F.size(
            F.array_intersect(
                F.coalesce(F.col("l_set_a"), _empty_str_arr()),
                F.coalesce(F.col("l_set_b"), _empty_str_arr()),
            )
        )
        == 0
    )
    B = _attach_pair_side(_attach_pair_side(B, hsets, id_col, "a"), hsets, id_col, "b")
    B = _attach_pair_side(_attach_pair_side(B, stats, id_col, "a"), stats, id_col, "b")
    B = B.select(
        "doc_a",
        "doc_b",
        _n_heavy_col().alias("n_inter"),
        F.col("n_sh_a").alias("n_a"),
        F.col("n_sh_b").alias("n_b"),
    )
    out = A.unionByName(B).withColumn(
        "jaccard",
        F.col("n_inter").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
    )
    result = out.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )
    return _track_cache(result, [] if spill_path is not None else [ex])


def containment_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    heavy_df: int | None = None,
    doc_count: int | None = None,
) -> DataFrame:
    """All pairs with shingle containment |a∩b| / min(|a|,|b|) ≥
    threshold — EXACT, via the same df-split join as ``jaccard_pairs``
    (light co-occurrence count + heavy arrays), with the containment-
    specific bound |∩| ≥ t·min(|a|,|b|) driving the prune and the
    heavy-only recovery.  Heavy-only candidates use the ONE-SIDED
    prefix pigeonhole containment admits: the requirement binds the
    smaller set alone, so its ``n_hv − ⌈t·n⌉ + 1`` rarest heavy
    shingles are probed against partners' FULL heavy postings (larger-
    or-equal partners only; ties by id, so each pair is probed once).
    That probe is empty unless a doc is ≥ t stop-shingle — the
    documented residual cost of containment's asymmetry (a pure stop-
    word doc IS contained in everything; the output itself is the
    blowup there).  Output is bit-identical to the naive full
    inverted-index join; only the physical plan changes.

    **Eager construction (ADVICE r8):** like ``jaccard_pairs``, this
    runs Spark jobs at build time (corpus count unless ``heavy_df``/
    ``doc_count`` is given; eager checkpoint of the exploded corpus).
    Release the cache with :func:`release_pair_join_cache`."""
    heavy_df = _resolve_heavy_df(docs, heavy_df, doc_count)
    ex = exploded_shingles(docs, id_col, text_col, n).persist()
    exd, stats = _df_split(ex, id_col, heavy_df)
    hsets = _heavy_sets(exd, id_col, heavy_df)
    # --- path A: pairs sharing ≥1 light shingle -----------------------
    lp = _light_pair_counts(exd, id_col, heavy_df)
    A = _attach_pair_side(_attach_pair_side(lp, stats, id_col, "a"), stats, id_col, "b")
    minreq = _min_overlap(threshold, F.least("n_sh_a", "n_sh_b"))
    A = A.filter(F.col("n_light") + F.least("n_hv_a", "n_hv_b") >= minreq)
    A = _attach_pair_side(
        _attach_pair_side(A, hsets, id_col, "a", "left"), hsets, id_col, "b", "left"
    )
    A = A.select(
        "doc_a",
        "doc_b",
        (F.col("n_light") + _n_heavy_col()).alias("n_inter"),
        F.col("n_sh_a").alias("n_a"),
        F.col("n_sh_b").alias("n_b"),
    )
    # --- path B: all-heavy intersections (one-sided pigeonhole) -------
    hx = (
        _attach_pair_side(
            hsets.select(F.col(id_col).alias("doc_a"), "h_set"), stats, id_col, "a"
        )
        .select(
            F.col("doc_a").alias("doc_x"),
            F.col("n_sh_a").alias("nx"),
            F.explode(
                F.slice(
                    "h_set",
                    F.lit(1),
                    F.greatest(
                        F.lit(0),
                        F.col("n_hv_a") - _min_overlap(threshold, F.col("n_sh_a")) + 1,
                    ),
                )
            ).alias("shingle"),
        )
    )
    hfull = _attach_pair_side(
        exd.filter(F.col("df_sh") > heavy_df).select(
            F.col(id_col).alias("doc_b"), "shingle"
        ),
        stats,
        id_col,
        "b",
    ).select(F.col("doc_b").alias("doc_y"), F.col("n_sh_b").alias("ny"), "shingle")
    hcand = (
        hx.join(hfull.hint("shuffle_hash"), "shingle")
        .filter(
            (F.col("nx") < F.col("ny"))
            | ((F.col("nx") == F.col("ny")) & (F.col("doc_x") < F.col("doc_y")))
        )
        .select(
            F.least("doc_x", "doc_y").alias("doc_a"),
            F.greatest("doc_x", "doc_y").alias("doc_b"),
        )
        .distinct()
    )
    cids = (
        hcand.select(F.col("doc_a").alias(id_col))
        .unionByName(hcand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    lsets = (
        exd.filter(F.col("df_sh") <= heavy_df)
        .join(cids, id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("l_set"))
    )
    B = _attach_pair_side(
        _attach_pair_side(hcand, lsets, id_col, "a", "left"), lsets, id_col, "b", "left"
    )
    B = B.filter(
        F.size(
            F.array_intersect(
                F.coalesce(F.col("l_set_a"), _empty_str_arr()),
                F.coalesce(F.col("l_set_b"), _empty_str_arr()),
            )
        )
        == 0
    )
    B = _attach_pair_side(_attach_pair_side(B, hsets, id_col, "a"), hsets, id_col, "b")
    B = _attach_pair_side(_attach_pair_side(B, stats, id_col, "a"), stats, id_col, "b")
    B = B.select(
        "doc_a",
        "doc_b",
        _n_heavy_col().alias("n_inter"),
        F.col("n_sh_a").alias("n_a"),
        F.col("n_sh_b").alias("n_b"),
    )
    out = A.unionByName(B).select(
        "doc_a",
        "doc_b",
        F.when(F.col("n_a") <= F.col("n_b"), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("contained_doc"),
        (F.col("n_inter").cast("double") / F.least("n_a", "n_b")).alias("containment"),
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).alias("jaccard"),
    )
    return _track_cache(out.filter(F.col("containment") >= threshold), [ex])


# Affine-permutation constants: h_i(x) = (A_i * x + B_i) mod P over a
# 30-bit base hash.  P = 2^31 - 1 (prime); A_i/B_i derived from md5 so
# the oracle embeds identical literals.  All arithmetic stays < 2^61 —
# overflow-free int64 on any engine.
MINHASH_P = (1 << 31) - 1


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    out = []
    for i in range(k):
        a = int(hashlib.md5(f"mh-a:{i}".encode()).hexdigest()[:7], 16) % (MINHASH_P - 1) + 1
        b = int(hashlib.md5(f"mh-b:{i}".encode()).hexdigest()[:7], 16) % MINHASH_P
        out.append((a, b))
    return out


def minhash_signatures(
    docs: DataFrame, k: int = 16, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """k-permutation MinHash signature per doc: each shingle is hashed
    ONCE (md5 → 30-bit base), the k permutations are affine transforms
    of that base — 1 cryptographic hash + k multiply-adds per shingle
    instead of k hashes (the standard minhash trick; ~k× less CPU in
    the scan stage).  One explode + map-side-combined agg — the mins
    are computed before the single doc_id shuffle.  Docs with fewer
    than ``n`` tokens have no shingles and no signature (dropped by the
    inner explode), same as the SQL unnest."""
    ex = exploded_shingles(docs, id_col, text_col, n)
    base = F.pmod(portable_hash64(F.col("shingle"), seed="mh:"), F.lit(1 << 30))
    ex = ex.select(id_col, base.alias("h"))
    aggs = [
        F.min((F.col("h") * a + b) % MINHASH_P).alias(f"sig_{i}")
        for i, (a, b) in enumerate(minhash_coeffs(k))
    ]
    return ex.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    signatures: DataFrame, bands: int = 4, rows: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """LSH candidate pairs: hash each band of ``rows`` signature values
    to a key; docs colliding on any (band, key) are candidates.  The
    join cost is bucket-quadratic, not corpus-quadratic — this is the
    100 TB fuzzy-dedup path."""
    banded = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows + r}") for r in range(rows)]
        banded.append(
            signatures.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *cols)).alias("band_key"),
            )
        )
    all_bands = banded[0]
    for extra in banded[1:]:
        all_bands = all_bands.unionByName(extra)
    a, b_ = all_bands.alias("a"), all_bands.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 32, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash fingerprint: each token votes ±1 on every bit of its
    hash; the fingerprint packs the vote signs.  Term frequency acts as
    the weight (tokens exploded, not distinct).  One explode + one
    grouped agg with ``bits`` sums."""
    ex = docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    h = portable_hash64(F.col("tok"), seed="simhash:")
    ex = ex.select(id_col, h.alias("h"))
    votes = [
        F.sum(
            F.when(F.expr(f"(h DIV {1 << j}) % 2") == 1, 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(bits)
    ]
    agg = ex.groupBy(id_col).agg(*votes)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"v_{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select(id_col, fp.cast("long").alias("simhash"))


def simhash_near_dup_pairs(
    fingerprints: DataFrame,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
) -> DataFrame:
    """SimHash near-duplicate pairs via banded blocking: split the
    ``bits``-bit fingerprint into ``bands`` equal bands; any pair sharing
    a band value becomes a candidate (guaranteed to include every pair
    with Hamming distance < ``bands`` by pigeonhole); verify candidates
    with exact ``bit_count(a XOR b) <= max_hamming``.

    The band equi-join is the 100 TB shape — candidates are generated
    bucket-locally (shuffle on (band_idx, band_val)), never all-pairs;
    the verify step touches only candidate pairs."""
    rows = bits // bands
    mask = (1 << rows) - 1
    banded = fingerprints.select(
        F.col(id_col),
        F.col(sig_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.expr(f"({sig_col} DIV {1 << (b * rows)}) % {mask + 1}").alias("band_val"),
                )
                for b in range(bands)
            ])
        ).alias("band"),
    ).select(id_col, sig_col, "band.band_idx", "band.band_val")
    a, b_ = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col(f"a.{sig_col}").alias("sig_a"),
            F.col(f"b.{sig_col}").alias("sig_b"),
        )
        .distinct()  # a pair may collide in several bands
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b", max_iter: int = 25
) -> DataFrame:
    """Collapse duplicate-candidate PAIRS into duplicate CLUSTERS:
    connected components by Pregel-style min-label propagation (each
    node repeatedly takes the minimum component id among itself and its
    neighbors until fixpoint).  Output: (doc_id, component) where
    component = the smallest doc_id in the cluster.

    This is the step every dedup pipeline needs after candidate
    generation — pairs alone can't answer "keep one per duplicate
    group" when A~B and B~C but A~C was never emitted.

    Scale posture: one shuffle (groupBy src) + one join per superstep;
    convergence takes O(component diameter) supersteps — near-dup
    clusters are shallow, so typically 3-5.  ``localCheckpoint``
    truncates the growing lineage each round (on a cluster, use a
    reliable checkpoint dir instead); at extreme scale swap the loop
    body for alternating small-star/large-star (Kiveris et al.), same
    fixpoint."""
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    edges = fwd.union(rev).distinct().cache()
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), "component")


# --- embedding near-dup (sign-LSH buckets + exact cosine inside) -----

def hyperplanes(bits: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1,1]^dim, derived
    from md5 so the oracle can embed the identical literals."""
    out = []
    for b in range(bits):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"hp:{b}:{i}".encode()).hexdigest()[:15], 16)
            row.append((h / float(16**15)) * 2.0 - 1.0)
        out.append(row)
    return out


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-duplicate pairs over an embedding column:
    sign-LSH bucket (``bits`` hyperplanes) → exact cosine within bucket
    ≥ threshold.  Candidate generation is bucket-local, so the join is
    linear-ish in corpus size; recall is bounded by the bucketing (by
    design — documented approximate semantics)."""
    from .similarity import as_double_array, cosine

    hps = hyperplanes(bits, dim)
    e = as_double_array(vec_col)

    def dot_lit(vec: Column, plane: list[float]) -> Column:
        arr = F.array(*[F.lit(v) for v in plane])
        return F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )

    bucket = None
    for b in range(bits):
        bit = F.when(dot_lit(e, hps[b]) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    tagged = emb.select(F.col(id_col), e.alias("v"), bucket.cast("long").alias("bucket"))
    a, b_ = tagged.alias("a"), tagged.alias("b")
    pairs = a.join(
        b_,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("vec_a"),
        F.col(f"b.{id_col}").alias("vec_b"),
        cosine(F.col("a.v"), F.col("b.v")).alias("sim"),
    )
    return pairs.filter(F.col("sim") >= threshold)


def minhash_verified_pairs(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    rows: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full production fuzzy-dedup pair pipeline as one operator:
    MinHash signatures → banded LSH candidates → exact Jaccard verify
    (≥ threshold) computed for candidates ONLY.  At 100 TB the verify
    join touches O(candidates), never O(corpus²)."""
    ex = exploded_shingles(docs, id_col=id_col, text_col=text_col, n=n)
    cands = minhash_lsh_pairs(
        minhash_signatures(docs, k=k, id_col=id_col, text_col=text_col, n=n),
        bands=bands,
        rows=rows,
        id_col=id_col,
    )
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = ex.withColumnsRenamed({id_col: "doc_a", "shingle": "sh_a"})
    b = ex.withColumnsRenamed({id_col: "doc_b_r", "shingle": "sh_b"})
    inter = (
        cands.join(a, "doc_a")
        .join(b, (F.col("doc_b") == F.col("doc_b_r")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnsRenamed({id_col: "doc_a", "n_sh": "n_a"})
    sb = sizes.withColumnsRenamed({id_col: "doc_b", "n_sh": "n_b"})
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")
