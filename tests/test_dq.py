

def test_table_checksum_properties(spark, sf_dir, tmp_path):
    """The checksum is order/partitioning-insensitive (repartitioned
    table gives the identical value), detects a single-row change, and
    shard checksums merge additively mod 2^60."""
    import os

    import pandas as pd

    import sentiment_analysis_vector_search_spark.operators.dq as dq
    from sentiment_analysis_vector_search_spark.operators.dq import (
        _CHK_MOD,
        dq_table_checksum,
    )

    base = dq_table_checksum(spark, sf_dir).collect()[0]

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    # identical rows, shuffled order, different file layout
    d1 = str(tmp_path / "shuffled")
    os.makedirs(d1)
    docs.sample(frac=1.0, random_state=7).to_parquet(
        os.path.join(d1, "documents.parquet"), index=False
    )
    got = dq_table_checksum(spark, d1).collect()[0]
    assert (got["n_rows"], got["checksum"]) == (base["n_rows"], base["checksum"])

    # one flipped character -> different checksum
    d2 = str(tmp_path / "tampered")
    os.makedirs(d2)
    t = docs.copy()
    t.loc[t.index[0], "text"] = (t.loc[t.index[0], "text"] or "") + "x"
    t.to_parquet(os.path.join(d2, "documents.parquet"), index=False)
    bad = dq_table_checksum(spark, d2).collect()[0]
    assert bad["checksum"] != base["checksum"]

    # shard mergeability: checksums of two halves add mod 2^60
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(da), os.makedirs(db)
    docs.iloc[: len(docs) // 2].to_parquet(
        os.path.join(da, "documents.parquet"), index=False
    )
    docs.iloc[len(docs) // 2 :].to_parquet(
        os.path.join(db, "documents.parquet"), index=False
    )
    ca = dq_table_checksum(spark, da).collect()[0]["checksum"]
    cb = dq_table_checksum(spark, db).collect()[0]["checksum"]
    assert (ca + cb) % _CHK_MOD == base["checksum"]


def test_table_checksum_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "dq_table_checksum", sf_dir)
