"""Incremental corpus dedup: a persisted MinHash/LSH signature index.

The batch operators (dedup.py) answer "which pairs in THIS corpus are
near-dups" — but a production ingest asks a different question every
hour: "is this NEW batch a near-dup of anything already in the 100 TB
corpus?" Recomputing corpus shingles per batch is a full corpus scan;
this module persists what the batch pipeline derives once —

- ``shingles/``  (doc_id, sh)           the exact-verify relation
- ``sizes/``     (doc_id, sz)           per-doc distinct-shingle counts
- ``bands/``     (band, bh, doc_id)     LSH band buckets, partitioned
                                        by band so a probe prunes to
                                        its band's partition

— so checking a batch costs O(batch + collisions), never O(corpus):
the batch's band signatures equi-join the persisted buckets, and only
colliding docs' shingles are read back for exact-Jaccard verification.

Because a doc's MinHash signature depends only on its own shingles
(min over a fixed seeded hash family, dedup.py:210), the streamed /
incremental index is IDENTICAL to one derived from the union corpus —
``dedup_index_check`` returns exactly the cross-batch pairs the batch
``dedup_minhash_lsh`` would find on the union (pinned by pytest), the
same frozen-derivation property the IVF index relies on.

Operating procedure at scale: ``build_dedup_index`` seeds from the
existing corpus; per ingest batch run ``dedup_index_check`` (gate or
tag the duplicates) then ``dedup_index_add`` for the survivors;
compact the appended band/shingle partitions on a schedule
(sinks.compact_dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    _JACCARD_T,
    band_structs_expr,
    minhash_sig_exprs,
)


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, sh) word-trigram shingles of a docs frame
    (same derivation as dedup.shingle_sets, which is sf_dir-bound)."""
    return (
        docs.select("doc_id", F.split(F.lower("text"), r"\s+").alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("t") >= 3,
                    F.expr(
                        "transform(sequence(1, size(t) - 2),"
                        " p -> concat(t[p - 1], ' ', t[p], ' ', t[p + 1]))"
                    ),
                ).otherwise(F.expr("array()"))
            ).alias("sh"),
        )
        .distinct()
    )


def _band_rows(sh: DataFrame) -> DataFrame:
    """(band, bh, doc_id) LSH band buckets from a shingle relation."""
    sigs = sh.groupBy("doc_id").agg(*minhash_sig_exprs())
    band_structs = band_structs_expr()
    return sigs.select("doc_id", F.explode(band_structs).alias("b")).select(
        F.col("b.band").alias("band"), F.col("b.bh").alias("bh"), "doc_id"
    )


def _write(sh: DataFrame, index_dir: str, mode: str) -> None:
    sh = sh.localCheckpoint(eager=True)  # one shingle derivation, 3 consumers
    sh.write.mode(mode).parquet(f"{index_dir}/shingles")
    (
        sh.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .write.mode(mode)
        .parquet(f"{index_dir}/sizes")
    )
    from ..sinks import spread_repartition

    # (band, bh) shuffle so the band-partitioned write scales with
    # executors instead of capping at #bands tasks (r8 verdict #2 shape)
    (
        spread_repartition(_band_rows(sh), "band", "bh")
        .write.mode(mode)
        .partitionBy("band")
        .parquet(f"{index_dir}/bands")
    )


def build_dedup_index(spark: SparkSession, docs: DataFrame, index_dir: str) -> None:
    """Seed the index from an existing corpus (overwrites)."""
    _write(_doc_shingles(docs), index_dir, "overwrite")


def dedup_index_add(spark: SparkSession, docs: DataFrame, index_dir: str) -> None:
    """Append a batch's signatures: cost tracks the batch, not the index."""
    _write(_doc_shingles(docs), index_dir, "append")


def dedup_index_check(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    broadcast_max_bytes: int | None = None,
) -> DataFrame:
    """Near-dup pairs between a new batch and the indexed corpus:
    (doc_a, doc_b, jaccard, is_duplicate) with doc_a < doc_b, exactly the
    cross-batch rows batch ``dedup_minhash_lsh`` would emit on the union.

    Plan shape: batch bands broadcast against the band-partitioned bucket
    table — the corpus-side scan is an equi-join probe, and the verify
    reads only colliding docs' shingles (semi-joined by the candidate
    ids). Self-pairs within the new batch are the batch operator's job;
    this is the ingest gate against history.

    The broadcast is GATED through ``stats.choose_join_strategy`` (r5
    verdict #7's size gate, routed through the shared chooser per r7
    verdict #6): the hourly-ingest shape broadcasts, but a backfill-sized
    batch would OOM the executors with an unconditional hint, so past
    ``broadcast_max_bytes`` estimated bytes (exact batch shingle-row
    count x dtype row width; default ``stats.DEFAULT_BROADCAST_MAX_BYTES``)
    the probe falls back to keyed shuffle joins on the same equi keys.
    The count is already on the driver for free: the batch is
    localCheckpointed for the multi-branch probe, so count() reads
    materialized block sizes. The chooser's 'salted' branch cannot
    trigger here — the probe key is a banded bucket hash whose occupancy
    dedup_index_stats audits (ndv ~ rows on the batch side).
    """
    from .. import stats as _stats

    new_sh = _doc_shingles(docs).localCheckpoint(eager=True)
    n_rows = new_sh.count()
    # exact driver-side count in the chooser's stats shape
    batch_stats = {
        "sh": {
            "n_rows": n_rows,
            "n_nulls": 0,
            "min_value": None,
            "max_value": None,
            "approx_ndv": max(n_rows, 1),
        }
    }
    cap = (
        broadcast_max_bytes
        if broadcast_max_bytes is not None
        else _stats.DEFAULT_BROADCAST_MAX_BYTES
    )
    small = (
        _stats.choose_join_strategy(
            batch_stats,
            batch_stats,
            "sh",
            _stats.schema_row_bytes(new_sh),
            cap,
        )
        == "broadcast"
    )
    hint = F.broadcast if small else (lambda df: df)
    new_bands = _band_rows(new_sh)
    idx_bands = spark.read.parquet(f"{index_dir}/bands")
    cand = (
        idx_bands.join(
            hint(new_bands.withColumnsRenamed({"doc_id": "new_id", "bh": "bh"})),
            ["band", "bh"],
        )
        .select(F.col("doc_id").alias("idx_id"), "new_id")
        .where(F.col("idx_id") != F.col("new_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    idx_sh = spark.read.parquet(f"{index_dir}/shingles").join(
        hint(cand.select(F.col("idx_id").alias("doc_id")).distinct()),
        "doc_id",
        "left_semi",
    )
    shared = (
        cand.join(idx_sh.withColumnsRenamed({"doc_id": "idx_id"}), "idx_id")
        .join(
            new_sh.withColumnsRenamed({"doc_id": "new_id"}),
            ["new_id", "sh"],
        )
        .groupBy("idx_id", "new_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    idx_sz = spark.read.parquet(f"{index_dir}/sizes").withColumnsRenamed(
        {"doc_id": "idx_id", "sz": "sz_i"}
    )
    new_sz = (
        new_sh.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sz_n"))
        .withColumnsRenamed({"doc_id": "new_id"})
    )
    jc = F.round(
        F.col("shared")
        * F.lit(1.0)
        / (F.col("sz_i") + F.col("sz_n") - F.col("shared")),
        6,
    )
    return (
        shared.join(idx_sz, "idx_id")
        .join(new_sz, "new_id")
        .select(
            F.least("idx_id", "new_id").alias("doc_a"),
            F.greatest("idx_id", "new_id").alias("doc_b"),
            jc.alias("jaccard"),
            (jc >= _JACCARD_T).alias("is_duplicate"),
            # which side is the incoming doc (doc_a/doc_b are canonically
            # ordered, so an ingest gate can't infer it from position)
            F.col("new_id").alias("new_doc_id"),
        )
    )


def dedup_index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Index-health audit: per-band bucket occupancy and the candidate-pair
    volume it implies (Σ n·(n−1)/2 over buckets). THE number to watch at
    scale: when max/avg occupancy grows with the corpus, the band hash is
    too narrow and check cost goes super-linear — the same occupancy
    economics SCALING.md documents for the embedding-LSH knob. Run it on a
    schedule; when expected_pairs trends quadratic, re-band (more hashes
    per band) and rebuild."""
    bands = spark.read.parquet(f"{index_dir}/bands")
    per_bucket = bands.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_bucket.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("n").alias("n_docs"),
            F.max("n").alias("max_occupancy"),
            F.round(F.sum("n") * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
                "avg_occupancy"
            ),
            F.sum(F.col("n") * (F.col("n") - 1) / 2)
            .cast("bigint")
            .alias("expected_pairs"),
        )
        .orderBy("band")
    )
