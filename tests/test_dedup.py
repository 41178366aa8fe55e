import pytest

from tests.parity import assert_parity

DEDUP = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
]


@pytest.mark.parametrize("name", DEDUP)
def test_dedup_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_exact_dedup_finds_planted_dups(spark):
    # sf0.1 contains planted exact duplicates (5000 docs, 4992 distinct)
    import __spark_entry__ as entrymod

    df = entrymod.queries()["dedup_exact"](spark, "/root/testdata/sf0.1")
    dups = df.where("is_duplicate").count()
    assert dups == 8


def test_minhash_catches_exact_dups(spark):
    import __spark_entry__ as entrymod

    mh = entrymod.queries()["dedup_minhash_lsh"](spark, "/root/testdata/sf0.1")
    perfect = mh.where("jaccard >= 0.999").count()
    assert perfect >= 8  # every exact dup pair must be an LSH candidate


def test_dedup_components_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "dedup_components", sf_dir)


def test_dedup_components_invariants(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["dedup_components"](spark, sf_dir).collect()
    by_comp = {}
    for r in rows:
        assert r.component <= r.id  # min-label fixpoint
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        assert all(m.component_size == len(members) for m in members)
        assert min(m.id for m in members) == comp
