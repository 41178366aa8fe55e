"""Property-based tests (hypothesis) for the pure-python cores of the
sketch/index components — the invariants the distributed paths rely on,
checked over adversarial inputs rather than one fixture.

No SparkSession here: these run in milliseconds and guard the math.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from sentiment_analysis_vector_search_spark.bloom import (
    _bitmap_for,
    _m_bits_for,
    _positions,
    _test,
)
from sentiment_analysis_vector_search_spark.stats import _mg_fold, merge_mg


# ---------------------------------------------------------------------------
# Misra-Gries: any value with true count > n/k survives, and reported
# counts are lower bounds within n/k of truth — including when the
# stream is folded in arbitrary chunks (the per-partition merge path).
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=16),
    st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=8),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_guarantee_under_chunked_merge(values, k, cuts):
    truth = Counter(str(v) for v in values)
    n = len(values)

    # split the stream at the (wrapped) cut points and fold chunk by
    # chunk through merge_mg — the distributed merge path
    summary: dict = {}
    start = 0
    bounds = sorted({min(c % (n + 1), n) for c in cuts} | {n})
    for b in bounds:
        chunk = Counter(str(v) for v in values[start:b])
        summary = merge_mg(summary, dict(chunk), k)
        start = b

    for v, c in truth.items():
        if c > n / k:
            assert v in summary, (v, c, n, k, summary)
        if v in summary:
            assert summary[v] <= c  # lower bound
            assert c - summary[v] <= n / k  # within n/k of truth


@given(
    st.dictionaries(
        st.text(min_size=1, max_size=4),
        st.integers(min_value=1, max_value=1000),
        max_size=40,
    ),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=100, deadline=None)
def test_mg_fold_keeps_at_most_k_and_never_raises_counts(counts, k):
    folded = _mg_fold(dict(counts), k)
    assert len(folded) <= k
    for v, c in folded.items():
        assert 0 < c <= counts[v]


# ---------------------------------------------------------------------------
# Bloom filter: NO false negatives, ever — the reader's one hard
# assumption. Sizing is a power of two covering the bits/key budget.
# ---------------------------------------------------------------------------


@given(
    st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=120),
    st.integers(min_value=2, max_value=32),
)
@settings(max_examples=150, deadline=None)
def test_bloom_never_false_negative(keys, bits_per_key):
    m = _m_bits_for(len(set(keys)), bits_per_key)
    bm = _bitmap_for(set(keys), m)
    for key in keys:
        assert _test(bm, key, m)


@given(st.integers(min_value=0, max_value=10**7), st.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_bloom_sizing_power_of_two_and_covering(n, bpk):
    m = _m_bits_for(n, bpk)
    assert m >= 64 and (m & (m - 1)) == 0
    assert m >= max(64, n * bpk)  # covers the bits/key budget


@given(st.text(min_size=0, max_size=20), st.sampled_from([64, 256, 4096, 1 << 16]))
@settings(max_examples=200, deadline=None)
def test_bloom_positions_in_range_and_deterministic(key, m):
    p1 = _positions(key, m)
    p2 = _positions(key, m)
    assert p1 == p2
    assert all(0 <= p < m for p in p1)


# ---------------------------------------------------------------------------
# KMV intersection: the threshold-based union/Jaccard estimator must be
# EXACT whenever the sketches happen to be complete prefixes (small
# sets), and for filled sketches must (a) never report an intersection
# larger than its union, (b) report exactly zero on disjoint hash sets,
# (c) be symmetric in its arguments.
# ---------------------------------------------------------------------------


def _bottom_k(hashes, k):
    return sorted(set(hashes))[:k]


@given(
    st.sets(st.integers(min_value=1, max_value=10_000_000), min_size=1, max_size=300),
    st.sets(st.integers(min_value=1, max_value=10_000_000), min_size=1, max_size=300),
    st.integers(min_value=8, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_kmv_intersection_invariants(ha, hb, k):
    from sentiment_analysis_vector_search_spark.stats import kmv_intersection

    sa, sb = _bottom_k(ha, k), _bottom_k(hb, k)
    u, i, j = kmv_intersection(sa, sb)
    assert 0.0 <= i <= u + 1e-9
    assert 0.0 <= j <= 1.0
    # symmetry
    u2, i2, j2 = kmv_intersection(sb, sa)
    assert (u, i, j) == (u2, i2, j2)
    # exactness with known k on complete sets
    if len(ha) < k and len(hb) < k:
        ue, ie, je = kmv_intersection(sa, sb, k=k)
        assert ue == len(ha | hb)
        assert ie == len(ha & hb)
    # disjoint hash sets can never report an intersection
    if not (ha & hb):
        assert i == 0.0 and j == 0.0


# ---------------------------------------------------------------------------
# Bottom-k sample merge: min-union over arbitrary chunkings must equal
# the one-shot bottom-k (the property that makes the streamed sample
# byte-identical to a full pass), and re-merging any chunk must be a
# no-op (idempotence).
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**9), st.integers()),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=32),
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_bottom_k_min_union_merge(rows, k, cuts):
    def merge(stored, fresh):
        seen = {r[0] for r in stored}
        return sorted(
            stored + [r for r in fresh if r[0] not in seen], key=lambda r: r[0]
        )[:k]

    one_shot = sorted(rows, key=lambda r: r[0])[:k]
    # fold in arbitrary chunks
    stored: list = []
    i = 0
    chunks = []
    for c in cuts:
        if i >= len(rows):
            break
        chunks.append(rows[i : i + c])
        i += c
    if i < len(rows):
        chunks.append(rows[i:])
    for ch in chunks:
        stored = merge(stored, sorted(ch, key=lambda r: r[0])[:k])
    assert [list(r) for r in stored] == [list(r) for r in one_shot]
    # idempotence: re-folding any chunk changes nothing
    for ch in chunks:
        again = merge(stored, sorted(ch, key=lambda r: r[0])[:k])
        assert again == stored


# ---------------------------------------------------------------------------
# Count-Min model: for ANY key multiset, the python twin of the engine's
# CMS (same md5 bucketing, same min-over-depths) must upper-bound every
# true count, be exact when no bucket collides, and merge additively
# (CMS(a) + CMS(b) == CMS(a ++ b) counter-wise).
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=400),
    st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=0, max_size=400),
)
@settings(max_examples=100, deadline=None)
def test_cms_model_upper_bound_and_mergeable(a, b):
    import hashlib
    from collections import Counter

    from sentiment_analysis_vector_search_spark.operators.sketch_ops import (
        _CMS_D,
        _CMS_W,
    )

    def bucket(i, u):
        return (
            int(hashlib.md5(f"cms{i}:{u}".encode()).hexdigest()[:15], 16)
            % _CMS_W
        )

    def sketch(keys):
        cms = Counter()
        for u in keys:
            for i in range(_CMS_D):
                cms[(i, bucket(i, u))] += 1
        return cms

    def est(cms, u):
        return min(cms.get((i, bucket(i, u)), 0) for i in range(_CMS_D))

    sa, sb, sab = sketch(a), sketch(b), sketch(a + b)
    true = Counter(a + b)
    merged = sa + sb
    assert merged == sab  # counters add — the mergeability contract
    for u, n in true.items():
        assert est(sab, u) >= n  # never under-counts
    # exactness when every key has a private bucket in some depth
    for u, n in true.items():
        private = any(
            all(bucket(i, v) != bucket(i, u) for v in true if v != u)
            for i in range(_CMS_D)
        )
        if private:
            assert est(sab, u) == n
