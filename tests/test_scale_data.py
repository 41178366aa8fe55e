"""The scale-smoke tiling must preserve within-tile structure and break
cross-tile similarity — otherwise the sf10-equivalent numbers measure a
pathological all-duplicates corpus, not a bigger realistic one."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.make_scale_data import ensure_scale_data  # noqa: E402


def test_tiling_counts_ids_and_structure(spark, sf_dir, tmp_path):
    out = ensure_scale_data(
        spark, src=sf_dir, out=str(tmp_path / "tiled"), tiles=3, emb_tiles=2
    )

    src_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = spark.read.parquet(f"{out}/documents.parquet")
    assert docs.count() == 3 * src_docs.count()
    # ids unique across tiles
    assert docs.select("doc_id").distinct().count() == docs.count()

    # within-tile text structure preserved: tile 0 is the identity mutation
    # except for the per-token suffix — token COUNTS per doc must match.
    t0 = docs.where(F.col("doc_id") < 10_000_000)
    n_src = src_docs.select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("n")
    ).collect()[0]["n"]
    n_t0 = t0.select(F.sum(F.size(F.split("text", r"\s+"))).alias("n")).collect()[0][
        "n"
    ]
    assert n_src == n_t0

    # cross-tile shingle disjointness: the same doc in two tiles shares no
    # word trigram (suffixes differ), so exact-dup and near-dup structure
    # stays per-tile.
    words0 = t0.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
    words1 = docs.where(
        (F.col("doc_id") >= 10_000_000) & (F.col("doc_id") < 20_000_000)
    ).select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
    shared = (
        words0.distinct()
        .join(words1.distinct(), "w")
        .where(~F.col("w").isin("slow", "query", "join"))
        .count()
    )
    assert shared == 0

    # embeddings: sign flips preserve norms exactly (same floats, flipped)
    emb_src = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = spark.read.parquet(f"{out}/embeddings.parquet")
    assert emb.count() == 2 * emb_src.count()
    nrm = "aggregate(zip_with(embedding, embedding, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"
    src_norms = sorted(
        r[0] for r in emb_src.select(F.expr(nrm)).collect()
    )
    t1_norms = sorted(
        r[0]
        for r in emb.where(F.col("vec_id") >= 10_000_000).select(F.expr(nrm)).collect()
    )
    assert src_norms == t1_norms

    # events: row count scales, user key space scales
    ev_src_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").distinct().count()
    )
    ev = spark.read.parquet(f"{out}/events.parquet")
    assert ev.select("user_id").distinct().count() == 3 * ev_src_users


def test_tiling_relational_facts(spark, sf_dir, tmp_path):
    out = ensure_scale_data(
        spark, src=sf_dir, out=str(tmp_path / "tiled2"), tiles=3, emb_tiles=2
    )
    src_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li = spark.read.parquet(f"{out}/lineitem.parquet")
    assert li.count() == 3 * src_li.count()
    # orderkeys disjoint across tiles; per-order line structure preserved
    assert (
        li.select("l_orderkey").distinct().count()
        == 3 * src_li.select("l_orderkey").distinct().count()
    )
    # dims copied verbatim so every registered query runs against the dir
    assert spark.read.parquet(f"{out}/supplier.parquet").count() == (
        spark.read.parquet(f"{sf_dir}/supplier.parquet").count()
    )
    # orders tiled with the same offset constant: the lineitem⋈orders
    # key relationship survives tiling (join hit count scales linearly)
    orders = spark.read.parquet(f"{out}/orders.parquet")
    src_hits = src_li.join(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).count()
    hits = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert hits == 3 * src_hits
