"""Fuzzy string matching — SymSpell-style deletion-neighborhood
blocking for edit-distance-1 entity resolution.

The all-pairs `levenshtein(a, b) <= 1` join is quadratic and dies at
any real scale.  The deletion-neighborhood trick (the core idea of the
SymSpell spell-checker family) makes it an EQUI-join: two strings are
within one edit of each other only if they share a *deletion variant*
(the string with one character removed) or one equals a variant of the
other.  So:

  1. explode each distinct string into its ``len(s)`` deletion
     variants — linear blow-up bounded by string length, map-side;
  2. equi-join variants with variants (substitution candidates) and
     variants with originals (pure insert/delete candidates);
  3. verify the survivors with one exact ``levenshtein`` call — the
     expensive O(len²) comparison runs on CANDIDATES only, never on
     the cross product.

At 100 TB the variant relation is |distinct strings| × avg_len rows
keyed by a short string — a plain shuffle-hash equi-join.  For long
strings, join on a 16-byte hash of the variant instead of the variant
text (same dataflow; the lev verify step already re-checks the pair,
so hash collisions cost a verify, never a wrong answer).

No reference parity: the reference (a flow-classification pipeline,
``modelling.py``) has no string-matching surface; this is part of the
engine's entity-resolution / data-cleaning extension family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deletion variants as (del_pos, variant) structs, computed with
# built-in higher-order functions — stays inside whole-stage codegen
_DELS = (
    "transform(sequence(1, length(nm)), i -> "
    "struct(i AS del_pos, concat(substring(nm, 1, i - 1), "
    "substring(nm, i + 1, length(nm))) AS variant))"
)


def deletion_variants(names: DataFrame, col: str = "nm") -> DataFrame:
    """(nm, del_pos, variant) — one row per single-character deletion."""
    nm = names.select(F.col(col).alias("nm"))
    return nm.select(
        "nm", F.explode(F.expr(_DELS)).alias("d")
    ).select("nm", F.col("d.del_pos").alias("del_pos"), F.col("d.variant").alias("variant"))


def edit1_pairs(names: DataFrame, col: str = "nm") -> DataFrame:
    """All unordered pairs of distinct strings at levenshtein distance
    exactly 1, found without an all-pairs comparison.

    Returns (nm_a, nm_b, edit_pos): ``nm_a < nm_b`` canonical order;
    ``edit_pos`` is the 1-based position of the substituted character
    for equal-length pairs, NULL for insert/delete pairs.
    """
    # materialize the name/variant relations ONCE: they feed three join
    # sides (sub×2, ins), and recomputing the scan+explode per side
    # tripled wall-clock; both are |names|-bounded, far under the corpus
    distinct = (
        names.select(F.col(col).alias("nm")).distinct().localCheckpoint(eager=True)
    )
    # dedup (nm, variant): a run of k equal characters yields k IDENTICAL
    # deletion variants, and joining the duplicates multiplies candidate
    # rows k² per run-sharing pair — the duplicates carry no information,
    # drop them before the join, not after
    dels = (
        deletion_variants(distinct)
        .select("nm", "variant")
        .distinct()
        .localCheckpoint(eager=True)
    )

    # substitution (and swapped ins/del) candidates: shared variant
    sub = (
        dels.alias("a")
        .join(dels.alias("b"), F.col("a.variant") == F.col("b.variant"))
        .filter(F.col("a.nm") < F.col("b.nm"))
        .select(F.col("a.nm").alias("nm_a"), F.col("b.nm").alias("nm_b"))
    )
    # pure insert/delete candidates: one string IS a variant of the other
    ins = (
        dels.alias("a")
        .join(distinct.alias("b"), F.col("a.variant") == F.col("b.nm"))
        .select(
            F.least(F.col("a.nm"), F.col("b.nm")).alias("nm_a"),
            F.greatest(F.col("a.nm"), F.col("b.nm")).alias("nm_b"),
        )
    )
    cands = sub.unionByName(ins).distinct()

    verified = cands.filter(F.levenshtein("nm_a", "nm_b") == 1)
    edit_pos = F.when(
        F.length("nm_a") == F.length("nm_b"),
        F.expr(
            "filter(sequence(1, length(nm_a)), "
            "i -> substring(nm_a, i, 1) <> substring(nm_b, i, 1))[0]"
        ),
    ).cast("long")
    return verified.select("nm_a", "nm_b", edit_pos.alias("edit_pos"))
