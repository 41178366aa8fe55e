"""Tile sf0.1 into an sf10-equivalent corpus for order-of-magnitude scale smokes.

Everything below sf0.1 (17 MB) validates CORRECTNESS; this generator gives
the perf claims (minhash bucketing, components rounds, broadcast
decontamination) at least one 10-100x check without shipping new test data.

Tiling is NOT naive replication — exact copies would make every document a
cross-tile exact/near duplicate and turn the pairwise operators into a
deliberate O(n * tiles) blowup that no real corpus exhibits. Instead each
tile is a deterministic mutation that PRESERVES within-tile structure and
BREAKS cross-tile similarity:

- documents: doc_id offset per tile; every token suffixed with ``~<tile>``
  so word-shingle sets are tile-disjoint (vocabulary grows ~linearly, like
  a real corpus), EXCEPT the rag_retrieve query words which stay intact so
  keyword retrieval still matches.
- embeddings: vec_id offset per tile; per-(tile, dim) deterministic sign
  flip — norms and all within-tile cosines are exactly preserved, while a
  cross-tile cosine is a +-1-weighted sum with mean 0 (P(>=0.5) ~ 0), so
  near-dup structure stays per-tile like a real sharded corpus.
- events: event_id/user_id offset per tile, timestamps kept — 100x event
  density over the same window with 100x distinct users (state-store keys
  scale with the data, as they would in production).

Output is one parquet FILE per table (coalesce(1) + rename) because the
streaming sources address ``<dir>/events.parquet`` with a pathGlobFilter.
A manifest records the tiling config + source fingerprints; the build is
skipped when it matches (the scale bench reuses the cache across rounds).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ID_OFFSET = 10_000_000
_EVENT_ID_OFFSET = 1_000_000_000
# Words rag_retrieve scores on (similarity._RAG_QUERY_WORDS) — kept
# unsuffixed so keyword retrieval has hits in every tile.
_KEEP_WORDS = ("slow", "query", "join")


def _tiled(df: DataFrame, tiles: int) -> DataFrame:
    # bigint tile: the event_id offset multiply (tile * 1e9) overflows int32
    return df.select(
        "*",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(tiles - 1).cast("bigint"))
        ).alias("tile"),
    )


def _documents(spark: SparkSession, src: str, tiles: int) -> DataFrame:
    keep = ", ".join(f"'{w}'" for w in _KEEP_WORDS)
    mutate = (
        "array_join(transform(split(text, '\\\\s+'), "
        f"w -> CASE WHEN w IN ({keep}) THEN w "
        "ELSE concat(w, '~', cast(tile as string)) END), ' ')"
    )
    return _tiled(spark.read.parquet(f"{src}/documents.parquet"), tiles).select(
        (F.col("doc_id") + F.col("tile") * _ID_OFFSET).alias("doc_id"),
        F.expr(mutate).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def _embeddings(spark: SparkSession, src: str, tiles: int) -> DataFrame:
    signs = (
        "transform(sequence(0, size(embedding) - 1), "
        "i -> CASE WHEN pmod(hash(tile * 1024 + i), 2) = 0 "
        "THEN cast(1.0 as float) ELSE cast(-1.0 as float) END)"
    )
    return _tiled(spark.read.parquet(f"{src}/embeddings.parquet"), tiles).select(
        (F.col("vec_id") + F.col("tile") * _ID_OFFSET).alias("vec_id"),
        F.expr(f"zip_with(embedding, {signs}, (x, s) -> x * s)").alias("embedding"),
        "label",
    )


def _events(spark: SparkSession, src: str, tiles: int) -> DataFrame:
    from sentiment_analysis_vector_search_spark.catalog import (
        normalize_event_ts,
        read_events_raw,
    )

    ev = normalize_event_ts(read_events_raw(spark, src))
    return _tiled(ev, tiles).select(
        (F.col("event_id") + F.col("tile") * _EVENT_ID_OFFSET).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("tile") * _ID_OFFSET).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def _lineitem(spark: SparkSession, src: str, tiles: int) -> DataFrame:
    # l_orderkey offset per tile: 100x orders over the same part/supplier
    # dims — how a real fact table grows (more transactions, same catalog).
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    rest = [c for c in li.columns if c != "l_orderkey"]
    return _tiled(li, tiles).select(
        (F.col("l_orderkey") + F.col("tile") * _EVENT_ID_OFFSET).alias("l_orderkey"),
        *rest,
    )


def _part(spark: SparkSession, src: str, tiles: int) -> DataFrame:
    # v3 (r11): part tiles too, for the ER smoke — p_partkey offset per
    # tile and the name's LAST token (er_fuzzy_part_names' blocking key)
    # suffixed ~<tile>, so each tile contributes its own disjoint blocks:
    # distinct names x tiles, block SIZES unchanged. Within a block the
    # shared suffix adds equal trailing characters, so in-block
    # Levenshtein distances are exactly the tile-0 distances — the scale
    # run measures block-join volume growth, not changed semantics.
    # Fact tables keep their original part keys (same-catalog growth);
    # only tile 0's parts join them, which no smoke query does.
    pt = spark.read.parquet(f"{src}/part.parquet")
    rest = [c for c in pt.columns if c not in ("p_partkey", "p_name")]
    suffixed = (
        "concat(p_name, '~', cast(tile as string))"
    )
    return _tiled(pt, tiles).select(
        (F.col("p_partkey") + F.col("tile") * _ID_OFFSET).alias("p_partkey"),
        F.expr(suffixed).alias("p_name"),
        *rest,
    )


def _orders(spark: SparkSession, src: str, tiles: int) -> DataFrame:
    od = spark.read.parquet(f"{src}/orders.parquet")
    rest = [c for c in od.columns if c != "o_orderkey"]
    return _tiled(od, tiles).select(
        (F.col("o_orderkey") + F.col("tile") * _EVENT_ID_OFFSET).alias("o_orderkey"),
        *rest,
    )


def _write_single_file(df: DataFrame, out_dir: str, name: str) -> None:
    tmp = os.path.join(out_dir, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.replace(part, os.path.join(out_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)


def _write_dir(df: DataFrame, out_dir: str, name: str) -> None:
    # Facts that only Spark reads (no streaming pathGlobFilter, no DuckDB)
    # can stay multi-part directories — a parallel write, and the layout a
    # real table would have.
    df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def _manifest(src: str, tiles: int, emb_tiles: int) -> dict:
    fp = {}
    for t in ("documents", "embeddings", "events", "lineitem", "orders"):
        st = os.stat(os.path.join(src, f"{t}.parquet"))
        fp[t] = [st.st_mtime_ns, st.st_size]
    return {
        "version": 3,  # v3: + tiled part (ER smoke); v2: lineitem/orders
        "tiles": tiles,
        "emb_tiles": emb_tiles,
        "src": src,
        "fingerprint": fp,
    }


def _warm_page_cache(out: str) -> None:
    """Sequentially read every tiled parquet file once on corpus REUSE.

    A fresh build leaves the corpus page-hot (the writer just produced
    it) — the cache state the smoke's ratio comments assume and the one
    a fresh-container driver run always sees. A manifest-match reuse
    run on a long-lived host starts page-COLD instead, and r11 measured
    the asymmetry directly: rag_retrieve 70.6s on a cold reuse run vs
    26.7s on the rebuild run at the same HEAD (2.6x, pure page cache).
    One sequential pass (~seconds from local NVMe, bounded by corpus
    bytes) pins both configurations to the same hot state."""
    for root, _, files in os.walk(out):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            try:
                with open(os.path.join(root, name), "rb") as f:
                    while f.read(1 << 24):
                        pass
            except OSError:
                pass


def ensure_scale_data(
    spark: SparkSession,
    src: str = "/root/testdata/sf0.1",
    out: str = "/root/repo/.scale_data/sf10x",
    tiles: int = 100,
    emb_tiles: int = 10,
) -> str:
    """Build (or reuse) the tiled corpus; returns the output dir."""
    manifest_path = os.path.join(out, "manifest.json")
    want = _manifest(src, tiles, emb_tiles)
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                if json.load(f) == want:
                    _warm_page_cache(out)
                    return out
        except (OSError, json.JSONDecodeError):
            pass
    os.makedirs(out, exist_ok=True)
    _write_single_file(_documents(spark, src, tiles), out, "documents")
    _write_single_file(_embeddings(spark, src, emb_tiles), out, "embeddings")
    _write_single_file(_events(spark, src, tiles), out, "events")
    _write_dir(_lineitem(spark, src, tiles), out, "lineitem")
    _write_dir(_orders(spark, src, tiles), out, "orders")
    _write_single_file(_part(spark, src, tiles), out, "part")
    # dims unchanged — copy so any registered query runs against the dir
    for t in ("region", "nation", "customer", "supplier"):
        shutil.copyfile(
            os.path.join(src, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
    with open(manifest_path, "w") as f:
        json.dump(want, f)
    return out


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sentiment_analysis_vector_search_spark.session import get_spark

    out = ensure_scale_data(get_spark("make-scale-data"))
    print(out)
