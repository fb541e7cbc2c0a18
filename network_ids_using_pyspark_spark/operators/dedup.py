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


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int | None = None,
    storage_level: "StorageLevel | None" = None,
    spill_path: str | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold, via the
    inverted-index join.  ``max_df`` drops shingles present in more than
    that many docs before the self-join (skew control at scale; changes
    results — keep None for exact semantics).

    ``storage_level`` controls how the exploded-shingle relation is
    persisted (default ``MEMORY_AND_DISK``).  At extreme scale the
    exploded corpus is ~an order of magnitude larger than the input —
    pass ``StorageLevel.DISK_ONLY`` to keep it off the executor heaps
    entirely (the 100 TB memory-pressure escape hatch; VERDICT r1 #6).

    ``spill_path`` is the last escalation step (VERDICT r2 #9): write
    the exploded relation to a parquet table and re-scan it, so the
    three consuming plan branches read columnar storage instead of
    executor block storage — survives executor loss, costs nothing on
    the heaps, and the re-scan gets column pruning (the size branch
    reads only ``doc_id``).  Overrides ``storage_level``."""
    ex = exploded_shingles(docs, id_col, text_col, n)
    if max_df is not None:
        rare = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") <= max_df
        )
        ex = ex.join(rare.select("shingle"), "shingle")
    # the exploded relation feeds three plan branches (join left/right,
    # per-doc sizes); materialize it so tokenize+shingle runs once, not 3-4×
    if spill_path is not None:
        ex.write.mode("overwrite").parquet(spill_path)
        ex = docs.sparkSession.read.parquet(spill_path)
    elif storage_level is not None:
        ex = ex.persist(storage_level)
    else:
        ex = ex.persist()
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    # hint the self-join to shuffle-hash: broadcasting the exploded
    # corpus (what AQE picks at small SF) is exactly what would OOM at
    # scale — the shingle-partitioned hash join is the right plan at
    # every size
    a, b = ex.alias("a"), ex.hint("shuffle_hash").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
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
