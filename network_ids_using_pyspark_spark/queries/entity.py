"""Entity-resolution queries: fuzzy duplicate detection over the
customer name column via deletion-neighborhood (SymSpell-style)
blocking — the string-similarity sibling of the MinHash/SimHash
document dedup family.

The fixture's customer names are fixed-format ("Customer#NNNNNNNNN"),
so levenshtein-1 pairs are exactly the pairs whose serial numbers
differ in one digit — thousands of true pairs whose count per edited
position (500 / 5 500 / 6 750 / 6 750 at sf0.01) is a strongly
discriminating signature for the oracle hash.

No reference parity (the reference has no string-matching surface);
part of the engine's data-cleaning extension family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.fuzzy import edit1_pairs
from ..sources.tables import load_table
from . import register

_FUZZY_SQL = """
WITH names AS (SELECT DISTINCT c_name AS nm FROM customer),
dels AS (
  SELECT nm, i AS del_pos,
         substring(nm, 1, i - 1) || substring(nm, i + 1) AS variant
  FROM names, UNNEST(range(1, len(nm) + 1)) AS t(i)
),
cands AS (
  SELECT a.nm AS nm_a, b.nm AS nm_b
  FROM dels a JOIN dels b ON a.variant = b.variant
  WHERE a.nm < b.nm
  UNION
  SELECT LEAST(a.nm, b.nm) AS nm_a, GREATEST(a.nm, b.nm) AS nm_b
  FROM dels a JOIN names b ON a.variant = b.nm
),
pairs AS (
  SELECT nm_a, nm_b,
         CASE WHEN len(nm_a) = len(nm_b) THEN
           CAST(list_filter(range(1, len(nm_a) + 1),
                i -> substring(nm_a, i, 1) <> substring(nm_b, i, 1))[1] AS BIGINT)
         END AS edit_pos
  FROM cands
  WHERE levenshtein(nm_a, nm_b) = 1
)
SELECT edit_pos,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MIN(nm_a) AS sample_a,
       MIN(nm_b) AS sample_b
FROM pairs
GROUP BY edit_pos
"""


@register("fuzzy_name_pairs_symspell", _FUZZY_SQL)
def q_fuzzy_name_pairs_symspell(spark, sf_dir):
    """Levenshtein-1 customer-name pairs via deletion-neighborhood
    equi-join blocking (never all-pairs), verified with one exact
    ``levenshtein`` on candidates only; reported as pair counts per
    edited character position.

    Scale plan: the variant relation is |distinct names| × name_len
    rows — linear — and both candidate joins are plain equi-joins on
    the variant string (hash it to 16 bytes for long strings; the
    verify step makes collisions harmless).  The quadratic all-pairs
    comparison never appears at any scale; the only shuffles are the
    two candidate equi-joins and the tiny per-position aggregate.
    """
    customer = load_table(spark, sf_dir, "customer")
    pairs = edit1_pairs(customer, col="c_name")
    return pairs.groupBy("edit_pos").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("nm_a").alias("sample_a"),
        F.min("nm_b").alias("sample_b"),
    )
