"""Semantic laws for operators.behavior (oracle equivalence is pinned
by the driver gate; these localize what a hash mismatch would not)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.driver_queries import (
    q_cohort_retention,
    q_first_touch,
    q_funnel_conversion,
    q_volume_rank,
)
from real_time_stock_market_data_pipeline__spark.operators import behavior


@pytest.mark.slow
def test_funnel_is_monotone(spark, sf_dir):
    row = q_funnel_conversion(spark, sf_dir).collect()[0]
    assert row.n_view_users >= row.n_click_users >= row.n_purchase_users
    assert 0 <= row.rate_view_to_click <= 1
    assert 0 <= row.rate_click_to_purchase <= 1


def test_funnel_strict_ordering(spark):
    # click BEFORE the first view must not count as view→click
    rows = [
        (1, "click", "2024-01-01 00:00:00"),
        (1, "view", "2024-01-02 00:00:00"),
        (2, "view", "2024-01-01 00:00:00"),
        (2, "click", "2024-01-02 00:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = behavior.funnel_conversion(ev, stages=["view", "click"]).collect()[0]
    assert out.n_view_users == 2
    assert out.n_click_users == 1  # only user 2's click follows a view


def test_cohort_day_zero_covers_all_users(spark, sf_dir):
    rows = q_cohort_retention(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        assert r.day_offset >= 0
        by_cohort.setdefault(r.cohort_day, {})[r.day_offset] = r.n_users
    for cohort, offsets in by_cohort.items():
        # every user is active on their own first day
        assert 0 in offsets
        # retention at any offset never exceeds the cohort's size
        assert all(n <= offsets[0] for n in offsets.values())


def test_first_touch_partitions_users(spark, sf_dir):
    rows = q_first_touch(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 0 <= r.n_converted <= r.n_users
        assert abs(r.conversion_rate - r.n_converted / r.n_users) < 1e-9


def test_volume_rank_bounds(spark, sf_dir):
    rows = q_volume_rank(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume_dist <= 1.0
        assert 1 <= r.tile <= 4


def test_event_transitions_probabilities(spark, sf_dir):
    """Per-source probabilities sum to 1; total transition count equals
    events minus one per user (consecutive-pair count)."""
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_event_transitions,
    )
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    df = q_event_transitions(spark, sf_dir)
    per_src = df.groupBy("from_event").agg(F.sum("p").alias("tot"))
    for r in per_src.collect():
        assert abs(r.tot - 1.0) < 1e-9
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert df.agg(F.sum("n")).first()[0] == ev.count() - n_users


def test_rfm_scores_tiles_and_segments(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_rfm_scores,
    )

    rows = q_rfm_scores(spark, sf_dir).collect()
    assert rows
    users = {r.user_id for r in rows}
    assert len(users) == len(rows)  # one row per user
    for r in rows:
        assert 1 <= r.r_score <= 4
        assert 1 <= r.f_score <= 4
        assert 1 <= r.m_score <= 4
        assert r.segment == f"{r.r_score}-{r.f_score}-{r.m_score}"
        assert r.recency_days >= 0
    # ntile(4) balance: bucket sizes differ by at most 1
    from collections import Counter

    for axis in ("r_score", "f_score", "m_score"):
        counts = Counter(getattr(r, axis) for r in rows)
        assert max(counts.values()) - min(counts.values()) <= 1


def test_weekday_returns_partition_of_days(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_daily_metrics,
        q_weekday_returns,
    )

    rows = q_weekday_returns(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.iso_weekday <= 7
        assert 0.0 <= r.share_up <= 1.0
        if r.std_ret is not None:
            assert r.std_ret >= 0
    # weekday buckets partition the return days: totals match the
    # daily series minus each symbol's first day
    n_daily = {
        r.symbol: r.n
        for r in q_daily_metrics(spark, sf_dir)
        .groupBy("symbol")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    from collections import defaultdict

    per_sym = defaultdict(int)
    for r in rows:
        per_sym[r.symbol] += r.n_days
    for sym, n in per_sym.items():
        assert n == n_daily[sym] - 1


def test_event_lift_probability_laws(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_event_lift,
    )

    rows = q_event_lift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert 0 < r.support <= 1
        assert 0 < r.conf_a_to_b <= 1
        assert 0 < r.conf_b_to_a <= 1
        # lift identity: conf(a->b) / P(b)
        expect = (r.n_ab * r.n_users) / (r.n_a * r.n_b)
        assert abs(r.lift - round(expect, 6)) < 1e-9


def test_session_paths_trigram_counts(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_session_paths,
    )

    rows = q_session_paths(spark, sf_dir).collect()
    assert rows
    assert len(rows) <= 20
    ranks = sorted(r.rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        assert len(r.path.split(">")) == 3
        assert 1 <= r.n_sessions <= r.n_occurrences
    by_rank = sorted(rows, key=lambda r: r.rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert a.n_occurrences >= b.n_occurrences


def test_weighted_sample_laws(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = sampling.weighted_sample(
        docs, id_col="doc_id", weight_col="n_chars", target_fraction=0.3
    )
    rows = kept.collect()
    n_total = docs.count()
    assert 0 < len(rows) < n_total
    for r in rows:
        assert 0 < r.keep_prob <= 1.0
    # determinism: identical membership under a different partitioning
    rows2 = sampling.weighted_sample(
        docs.repartition(7, "lang"), "doc_id", "n_chars", 0.3
    ).collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in rows2)
    # monotonicity: doubling the target can only grow the kept set
    rows3 = sampling.weighted_sample(docs, "doc_id", "n_chars", 0.6).collect()
    assert set(r.doc_id for r in rows) <= set(r.doc_id for r in rows3)


def test_conversion_latency_hand_case(spark):
    import datetime

    from real_time_stock_market_data_pipeline__spark.operators import behavior

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(uid, etype, sec):
        return (uid, etype, t0 + datetime.timedelta(seconds=sec))

    rows = [
        # user 1: view at 0, purchase at 10 -> 10 s
        ev(1, "view", 0), ev(1, "purchase", 10),
        # user 2: purchase BEFORE first view -> not converted
        ev(2, "purchase", 0), ev(2, "view", 5),
        # user 3: view at 0, purchases at 30 (first counts)
        ev(3, "view", 0), ev(3, "purchase", 30), ev(3, "purchase", 60),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = behavior.conversion_latency(df, "view", "purchase").collect()[0]
    assert out.n_converted == 2
    assert abs(out.mean_latency_s - 20.0) < 1e-9
    assert out.median_latency_s == 10.0
    assert out.p90_latency_s == 30.0


def test_dau_wau_laws(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_dau_wau,
    )

    rows = q_dau_wau(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # a day's actives are a subset of its trailing week's actives
        assert r.dau <= r.wau
        assert 0 < r.stickiness <= 1.0


def test_cumulative_users_monotone_and_total(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_cumulative_users,
    )

    rows = sorted(q_cumulative_users(spark, sf_dir).collect(), key=lambda r: r.date)
    assert rows
    prev = 0
    for r in rows:
        assert r.cumulative_users == prev + r.new_users
        prev = r.cumulative_users
    total_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert rows[-1].cumulative_users == total_users


# ---------------------------------------------------------------------------
# Round-7: PageRank + churn
# ---------------------------------------------------------------------------


def test_pagerank_is_a_probability_vector(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = behavior.event_pagerank(ev, n_iter=3).collect()
    assert rows
    total = sum(r.pagerank for r in rows)
    # quantized at 1e-12 per node; mass is conserved up to that
    assert abs(total - 1.0) < 1e-9 * len(rows) + 1e-9
    for r in rows:
        assert r.pagerank > 0


def test_pagerank_two_node_hand_case(spark):
    import datetime

    # A -> B -> A -> B ... for one user: symmetric 2-cycle, so the
    # stationary distribution is uniform (0.5, 0.5) at every round.
    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, i), 1, "A" if i % 2 == 0 else "B")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.node: r.pagerank for r in behavior.event_pagerank(df, n_iter=4).collect()}
    assert abs(out["A"] - 0.5) < 1e-9
    assert abs(out["B"] - 0.5) < 1e-9


def test_pagerank_dangling_sink_gets_most_mass(spark):
    import datetime

    # every user path ends in 'sink' and sink never transitions out:
    # the dangling redistribution keeps total mass 1 and the sink
    # accumulates the largest rank.
    rows = []
    eid = 0
    for u in range(5):
        for i, t in enumerate(["a", "b", "sink"]):
            rows.append((eid, datetime.datetime(2024, 1, 1, u, i), u, t))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.node: r.pagerank for r in behavior.event_pagerank(df, n_iter=5).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-8
    assert out["sink"] == max(out.values())


def test_churn_accounting_laws(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = behavior.churn_by_period(ev, "week").orderBy("period_start").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_retained <= r.n_active
        assert 0 <= r.n_new <= r.n_active
        assert 0 <= r.n_churning_out <= r.n_active
        assert 0.0 <= r.churn_rate <= 1.0


def test_churn_skipping_user_hand_case(spark):
    import datetime

    def ev(eid, day, user):
        return (eid, datetime.datetime(2024, 1, day, 12), user, "click")

    # weeks: Jan 1-7, 8-14, 15-21, 22-28.
    # u1 active every week; u2 active wk1 + wk3 only (skips wk2).
    rows = [
        ev(0, 2, 1), ev(1, 9, 1), ev(2, 16, 1), ev(3, 23, 1),
        ev(4, 3, 2), ev(5, 17, 2),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r.period_start.day: r
        for r in behavior.churn_by_period(df, "week").collect()
    }
    # wk1 (Jan 1): both active, both new; u2 churns out (absent wk2)
    assert out[1].n_active == 2 and out[1].n_new == 2
    assert out[1].n_churning_out == 1
    # wk2 (Jan 8): only u1, retained, not new
    assert out[8].n_active == 1 and out[8].n_retained == 1 and out[8].n_new == 0
    # wk3 (Jan 15): u1 retained + u2 returning (active, NOT new, NOT retained)
    assert out[15].n_active == 2 and out[15].n_retained == 1 and out[15].n_new == 0
    # last week (Jan 22) is dropped — future unobserved
    assert 22 not in out


def test_windowed_funnel_never_beats_unbounded(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    stages = ["view", "click", "purchase"]
    unbounded = behavior.funnel_conversion(ev, stages).collect()[0]
    bounded = behavior.funnel_conversion(
        ev, stages, max_gap_us=3_600_000_000
    ).collect()[0]
    huge = behavior.funnel_conversion(ev, stages, max_gap_us=10**15).collect()[0]
    assert bounded.n_click_users <= unbounded.n_click_users
    assert bounded.n_purchase_users <= unbounded.n_purchase_users
    assert huge == unbounded  # an unreachable bound degenerates to plain funnel


def test_session_funnel_never_beats_user_funnel(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    stages = ["view", "click", "purchase"]
    sess = behavior.session_funnel(ev, stages, gap_seconds=1800).collect()[0]
    assert sess.n_view_sessions <= sess.n_sessions
    # monotone down the funnel
    assert sess.n_purchase_sessions <= sess.n_click_sessions <= sess.n_view_sessions
    # with an infinite gap each user is one session: must equal the
    # plain per-user funnel's counts
    one = behavior.session_funnel(ev, stages, gap_seconds=10**9).collect()[0]
    user = behavior.funnel_conversion(ev, stages).collect()[0]
    assert one.n_view_sessions == user.n_view_users
    assert one.n_purchase_sessions == user.n_purchase_users


def test_session_pmi_laws(spark, sf_dir):
    import math

    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = behavior.session_copresence_pmi(ev).collect()
    assert rows
    for r in rows:
        assert r.etype_a < r.etype_b
        assert r.n_ab <= min(r.n_a, r.n_b)
        # PMI is bounded above by -ln(max(p_a, p_b))-ish; loose sanity:
        assert not math.isnan(r.pmi)


def test_cohort_ltv_monotone_and_reconciles(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = behavior.cohort_ltv(ev).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_day, []).append(r)
    total = 0.0
    for series in by_cohort.values():
        series.sort(key=lambda r: r.day_offset)
        prev = -1.0
        for r in series:
            assert r.cum_revenue >= prev - 1e-9  # cumulative is monotone
            prev = r.cum_revenue
            assert abs(r.ltv_per_user - round(r.cum_revenue / r.cohort_size, 6)) < 1e-9
        total += series[-1].cum_revenue
    want = (
        ev.where("event_type = 'purchase'")
        .agg(F.round(F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double"), 4))
        .collect()[0][0]
    )
    assert abs(total - want) < 1e-2  # all purchase revenue lands in some cohort


def test_engagement_decay_laws(spark):
    import datetime

    def ev(eid, day, etype):
        return (eid, datetime.datetime(2024, 1, day, 12), 1, etype)

    df = spark.createDataFrame(
        [ev(0, 1, "purchase"), ev(1, 29, "purchase")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    # as_of = Jan 29: the same-day purchase counts 5.0, the 28-day-old
    # one 5 * 2^-4 = 0.3125
    out = behavior.engagement_score(df, as_of="2024-01-29").collect()[0]
    assert abs(out.engagement - (5.0 + 0.3125)) < 1e-6
    # moving as_of later strictly decays the score
    later = behavior.engagement_score(df, as_of="2024-02-26").collect()[0]
    assert later.engagement < out.engagement


def test_absorption_probability_laws(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    k4 = {r.node: r.absorb_prob for r in behavior.absorption_prob(ev, "purchase", k=4).collect()}
    k2 = {r.node: r.absorb_prob for r in behavior.absorption_prob(ev, "purchase", k=2).collect()}
    assert k4["purchase"] == 1.0
    for node, p in k4.items():
        assert 0.0 <= p <= 1.0
        # absorption probability is monotone in the horizon
        assert p >= k2[node] - 1e-9


def test_absorption_deterministic_chain(spark):
    import datetime

    # a -> b -> purchase deterministic chain for one user
    rows = [
        (0, datetime.datetime(2024, 1, 1, 10, 0), 1, "a"),
        (1, datetime.datetime(2024, 1, 1, 10, 1), 1, "b"),
        (2, datetime.datetime(2024, 1, 1, 10, 2), 1, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.node: r.absorb_prob for r in behavior.absorption_prob(df, "purchase", k=2).collect()}
    assert out["a"] == 1.0 and out["b"] == 1.0 and out["purchase"] == 1.0
    short = {r.node: r.absorb_prob for r in behavior.absorption_prob(df, "purchase", k=1).collect()}
    assert short["a"] == 0.0 and short["b"] == 1.0  # a needs two hops


def test_linear_attribution_conserves_credit(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = behavior.linear_attribution(ev).collect()
    total_credit = sum(r.credit_total for r in rows)
    n_converters = (
        ev.where("event_type = 'purchase'").select("user_id").distinct().count()
    )
    # total credit ~= number of converting users (8-digit per-touch
    # quantization leaves at most n_touches * 5e-9 drift)
    assert abs(total_credit - n_converters) < 1e-3


def test_linear_attribution_hand_case(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 10, 0)

    def ev(eid, mins, user, etype):
        return (eid, t0 + datetime.timedelta(minutes=mins), user, etype)

    # user 1: view, click, purchase, then a post-conversion view
    # (ignored); user 2: never converts
    df = spark.createDataFrame(
        [
            ev(0, 0, 1, "view"), ev(1, 1, 1, "click"),
            ev(2, 2, 1, "purchase"), ev(3, 3, 1, "view"),
            ev(4, 0, 2, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {r.touch_type: r.credit_total for r in behavior.linear_attribution(df).collect()}
    assert abs(out["view"] - 1 / 3) < 1e-6
    assert abs(out["click"] - 1 / 3) < 1e-6
    assert abs(out["purchase"] - 1 / 3) < 1e-6


def test_last_touch_attribution_laws(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = behavior.last_touch_attribution(ev).collect()
    n_conv = (
        ev.where("event_type = 'purchase'").select("user_id").distinct().count()
    )
    assert sum(r.n_conversions for r in rows) == n_conv
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5


def test_last_touch_hand_case(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 10, 0)

    def ev(eid, mins, user, etype):
        return (eid, t0 + datetime.timedelta(minutes=mins), user, etype)

    df = spark.createDataFrame(
        [
            # user 1: view -> click -> purchase => last touch = click
            ev(0, 0, 1, "view"), ev(1, 1, 1, "click"), ev(2, 2, 1, "purchase"),
            # user 2: purchase is the very first event => credited to purchase
            ev(3, 0, 2, "purchase"),
            # user 3: never converts
            ev(4, 0, 3, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {r.touch_type: r.n_conversions for r in behavior.last_touch_attribution(df).collect()}
    assert out == {"click": 1, "purchase": 1}
