"""Entity resolution: blocked fuzzy matching.

``er_fuzzy_part_names`` — the classic ER pipeline shape (Fellegi-Sunter
blocking + pairwise comparison): candidate pairs come from a cheap
BLOCKING key (the name's last token — the product noun), and only
within-block pairs pay the expensive comparator (Levenshtein edit
distance). Never an all-pairs name join: at B blocks of at most m
names the comparator runs B·C(m,2) times instead of C(n,2), and the
comparison grain is the DISTINCT-name relation (vocabulary-sized),
not the row count — every per-row duplicate of a name rides the
aggregated n_parts counts.

Both engines implement classical Levenshtein (unit insert/delete/
substitute), so the distance column is integer-exact cross-engine.

Scale notes: the blocking join is an equi-join keyed on the block —
skew-safe so long as no block exceeds the df-cap rule of the dedup
family; a block holding more than ``_ER_BLOCK_CAP`` distinct names is
boilerplate (single-noun mega-blocks) and is dropped before the pair
join, the same bounding device as dedup.py's ``_DF_CAP`` (pairs are
then bounded by C(cap, 2) per block). At the test vocabulary no block
nears the cap; the knob exists for open-vocabulary corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_ER_MAX_DIST = 2
_ER_BLOCK_CAP = 1000

_ER_ORACLE = f"""
WITH names AS (
  SELECT p_name, count(*) AS n FROM part GROUP BY p_name
), blocked AS (
  SELECT p_name, n, string_split(p_name, ' ')[-1] AS blk FROM names
), kept AS (
  SELECT blk FROM blocked GROUP BY blk HAVING count(*) <= {_ER_BLOCK_CAP}
), live AS (
  SELECT b.p_name, b.n, b.blk FROM blocked b JOIN kept USING (blk)
)
SELECT a.p_name AS name_a, b.p_name AS name_b, a.blk AS block,
       levenshtein(a.p_name, b.p_name) AS dist,
       a.n AS n_parts_a, b.n AS n_parts_b
FROM live a JOIN live b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_ER_MAX_DIST}
"""


@register("er_fuzzy_part_names", oracle=_ER_ORACLE)
def er_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy name matching: near-duplicate part-name pairs
    (edit distance <= 2) found by last-token blocking + in-block
    Levenshtein verification, at the distinct-name grain."""
    part = table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n"))
    blocked = names.select(
        "p_name",
        "n",
        F.element_at(F.split("p_name", " "), -1).alias("blk"),
    )
    kept = (
        blocked.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("bn"))
        .where(F.col("bn") <= _ER_BLOCK_CAP)
        .select("blk")
    )
    live = blocked.join(kept, "blk")
    a = live.alias("a")
    b = live.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(dist <= _ER_MAX_DIST)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.blk").alias("block"),
            dist.alias("dist"),
            F.col("a.n").alias("n_parts_a"),
            F.col("b.n").alias("n_parts_b"),
        )
    )
