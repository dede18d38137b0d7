"""Hypothesis-generated property tests: the algebraic laws must hold on
arbitrary inputs, not just the driver fixtures. Spark jobs are slow per
example, so examples are capped low — breadth comes from the generated
shapes (dup ratios, key collisions, empty frames are all reachable)."""

from __future__ import annotations

import pytest

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.operators import dedup, relational
from real_time_stock_market_data_pipeline__spark.oracle_compare import value_hash

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),          # key
        st.integers(min_value=0, max_value=5),           # sub-key
        st.integers(min_value=0, max_value=10_000),      # ordering id
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "g", "oid", "v"])


@given(rows=ROWS, rows2=ROWS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_merge_upsert_laws(spark, rows, rows2):
    target, source = _df(spark, rows), _df(spark, rows2)
    once = relational.merge_upsert(target, source, ["k", "g"])
    twice = relational.merge_upsert(once, source, ["k", "g"])
    h = lambda d: value_hash(d.columns, [tuple(r) for r in d.collect()])  # noqa: E731
    # idempotent
    assert h(once) == h(twice)
    # every source row present verbatim; no key lost
    src_keys = {(r[0], r[1]) for r in rows2}
    tgt_keys = {(r[0], r[1]) for r in rows}
    out_keys = {(r["k"], r["g"]) for r in once.collect()}
    assert out_keys == src_keys | tgt_keys


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_keep_last_laws(spark, rows):
    df = _df(spark, rows)
    out = dedup.dedup_keep_last(df, ["k"], ["oid"])
    got = {r["k"]: (r["oid"], r["v"]) for r in out.collect()}
    expect = {}
    for k, g, oid, v in rows:
        if k not in expect or oid > expect[k][0]:
            expect[k] = (oid, v)
    # ties on oid are broken arbitrarily among equal (k, oid); compare oid only
    assert {k: o for k, (o, _) in got.items()} == {
        k: o for k, (o, _) in expect.items()
    }


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab "),
            max_size=30,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_dedup_exact_partitions_corpus(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    groups = dedup.dedup_exact(docs).collect()
    # groups partition the corpus
    assert sum(r["dup_count"] for r in groups) == len(texts)
    # same normalized text ⇒ same group; keeper is the min id
    norm = {}
    for i, t in enumerate(texts):
        key = " ".join(t.lower().strip().split())
        norm.setdefault(key, []).append(i)
    assert sorted(min(v) for v in norm.values()) == sorted(
        r["keep_id"] for r in groups
    )


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(alphabet=st.sampled_from("ab "), max_size=30),
        ),
        min_size=1,
        max_size=15,
    ),
    n_words=st.sampled_from([1, 2, 4]),
)
@settings(**_SETTINGS)
def test_substring_dedup_model(spark, texts, n_words):
    """Generative model law for the ExactSubstr block dedup: a
    sequential Python reference (iterate docs in id order, segment
    with the SAME empty-word-preserving split semantics, keep each
    block's first occurrence) must match the distributed operator
    exactly — counts and reconstruction digest — over texts with space
    runs, empties, and NULLs."""
    import hashlib
    import math

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["dedup_text_md5"])
        for r in dedup.substring_dedup(docs, n_words=n_words).collect()
    }
    seen: set = set()
    expect = {}
    for i, t in enumerate(texts):
        if t is None:
            continue
        words = t.split(" ")  # keeps empty words, like Spark's split
        n_blocks = math.ceil(len(words) / n_words)
        blocks = [
            " ".join(words[j * n_words:(j + 1) * n_words])
            for j in range(n_blocks)
        ]
        kept = []
        for b in blocks:
            if b not in seen:
                seen.add(b)
                kept.append(b)
        expect[i] = (
            n_blocks,
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    assert got == expect


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    deduped = pipeline.stream_dedup_within_watermark(
        src, keys=["user_id", "event_type"], ts_col="ts"
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() <= 75  # ≤ one row per (user, event_type)
    assert out.groupBy("user_id", "event_type").count().filter(
        F.col("count") > 1
    ).count() == 0


INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # interval id
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        st.floats(min_value=0, max_value=60, allow_nan=False),  # length
    ),
    min_size=1,
    max_size=25,
)

POINTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.floats(min_value=-150, max_value=150, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@given(points=POINTS, intervals=INTERVALS, w=st.sampled_from([3.0, 17.0, 64.0]))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_range_join_law(spark, points, intervals, w):
    """Bucketized range join ≡ the naive theta join for arbitrary
    intervals (negative bounds, empty, zero-length) and bucket widths."""
    from real_time_stock_market_data_pipeline__spark.operators import temporal

    l = spark.createDataFrame(points, ["pid", "p"])
    r = spark.createDataFrame(
        [(i, lo, lo + ln) for i, lo, ln in intervals], ["iid", "lo", "hi"]
    )
    fast = temporal.range_join(l, r, "p", "lo", "hi", bucket_width=w)
    naive = l.join(r, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
    cols = ["pid", "iid"]
    assert sorted(map(tuple, fast.select(*cols).collect())) == sorted(
        map(tuple, naive.select(*cols).collect())
    )


@given(rows=ROWS, n_salts=st.sampled_from([1, 3, 16]))
@settings(**_SETTINGS)
def test_salted_agg_law(spark, rows, n_salts):
    """Salting is invisible in the result for any salt count, incl. the
    degenerate n_salts=1."""
    df = _df(spark, rows)
    salted = relational.salted_agg(df, ["k"], "v", n_salts=n_salts)
    plain = df.groupBy(F.col("k")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("total_value"),
        F.min("v").alias("min_value"),
        F.max("v").alias("max_value"),
    )
    h = lambda d: value_hash(d.columns, [tuple(r) for r in d.collect()])  # noqa: E731
    assert h(salted) == h(plain)


@given(rows=ROWS, rows2=ROWS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_merge_aggregates_decomposability_law(spark, rows, rows2):
    """merge(agg(A), agg(B)) == agg(A ∪ B) for arbitrary frames —
    the law that makes incremental maintenance exact."""
    a, b = _df(spark, rows), _df(spark, rows2)
    pa = relational.decomposed_agg(a, ["k"], "v")
    pb = relational.decomposed_agg(b, ["k"], "v")
    merged = relational.merge_aggregates(pa, pb, ["k"])
    full = relational.decomposed_agg(a.unionAll(b), ["k"], "v")
    got = {
        r["k"]: (r["n"], r["sum_value"], r["min_value"], r["max_value"])
        for r in merged.collect()
    }
    want = {
        r["k"]: (r["n"], r["sum_value"], r["min_value"], r["max_value"])
        for r in full.collect()
    }
    assert got == want


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_trimmed_mean_bounds_law(spark, rows):
    """The trimmed mean lies within [min, max] of the kept values and
    never exceeds the untrimmed extremes; k is the exact integer
    floor(n/10) per tail."""
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    df = _df(spark, rows)
    out = metrics.trimmed_mean(df, ["k"], "v", trim_pct=10)
    per_key: dict[int, list[float]] = {}
    for k, _, _, v in rows:
        per_key.setdefault(k, []).append(round(v, 6))
    for r in out.collect():
        vals = sorted(per_key[r["k"]])
        assert r["n"] == len(vals)
        assert r["k_each_side"] == len(vals) // 10
        assert min(vals) - 1e-9 <= r["mean_trimmed"] <= max(vals) + 1e-9


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_cms_never_undercounts_law(spark, rows):
    """CMS estimates are one-sided for every key on arbitrary inputs
    (top_n covering all keys)."""
    from real_time_stock_market_data_pipeline__spark.operators import sketches

    df = _df(spark, rows)
    out = sketches.cms_heavy_hitters(df, "k", depth=2, width=8, top_n=10**9)
    import collections

    truth = collections.Counter(str(k) for k, _, _, _ in rows)
    got = {r["key"]: (r["n_exact"], r["n_est"]) for r in out.collect()}
    assert set(got) == set(truth)
    for key, (n_exact, n_est) in got.items():
        assert n_exact == truth[key]
        assert n_est >= n_exact


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=300, deadline=None)
def test_sq8_quantize_matches_duckdb_round(vec):
    """Cross-engine law behind sq8_topk's oracle: the Python
    Decimal-ROUND_HALF_UP code derivation must equal DuckDB's
    round(double, 0) (std::round half-away-from-zero on the exact
    binary value) for every component — no Spark session needed, so
    Hypothesis can hammer the tie neighborhoods cheaply."""
    import duckdb

    from real_time_stock_market_data_pipeline__spark.operators.similarity import (
        _sq8_quantize,
    )

    if max(abs(x) for x in vec) / 127.0 == 0:  # zero or denormal underflow
        return
    codes, qn = _sq8_quantize(vec)
    assert qn == sum(c * c for c in codes)
    assert all(abs(c) <= 127 for c in codes)
    con = duckdb.connect()
    scale = max(abs(float(x)) for x in vec) / 127.0
    duck = [
        int(
            con.execute(
                "SELECT CAST(round(CAST(? AS DOUBLE) / ?, 0) AS BIGINT)",
                [float(x), scale],
            ).fetchone()[0]
        )
        for x in vec
    ]
    con.close()
    assert codes == duck


@given(
    st.lists(
        st.floats(
            min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
        ),
        min_size=64,
        max_size=64,
    ),
    st.lists(
        st.floats(
            min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
        ),
        min_size=64,
        max_size=64,
    ),
)
@settings(max_examples=150, deadline=None)
def test_bq_sign_pack_matches_duckdb(vec, mu):
    """Cross-engine law behind bq_topk's oracle: the Python lane
    packing (bit j of lane L set iff x[32L+j] > mean[32L+j], summed as
    1<<j) must equal DuckDB's unrolled CASE-sum replay for every
    component, including exact-equality ties (strict > in both) —
    no Spark session needed. Hamming symmetry and the zero-distance
    self law ride along."""
    import duckdb

    from real_time_stock_market_data_pipeline__spark.operators.similarity import (
        BQ_LANE_BITS,
    )

    def pack(v):
        lanes = []
        for lane in range(len(v) // BQ_LANE_BITS):
            acc = 0
            for j in range(BQ_LANE_BITS):
                if float(v[lane * BQ_LANE_BITS + j]) > mu[
                    lane * BQ_LANE_BITS + j
                ]:
                    acc += 1 << j
            lanes.append(acc)
        return lanes

    py = pack(vec)
    con = duckdb.connect()
    duck = []
    for lane in range(2):
        expr = " + ".join(
            f"CASE WHEN CAST(v[{lane * 32 + j + 1}] AS DOUBLE)"
            f" > m[{lane * 32 + j + 1}]"
            f" THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            for j in range(32)
        )
        duck.append(
            int(
                con.execute(
                    f"SELECT {expr} FROM (SELECT ? AS v, ? AS m)",
                    [[float(x) for x in vec], [float(x) for x in mu]],
                ).fetchone()[0]
            )
        )
    # hamming(self) == 0 and lanes agree bit for bit
    ham = int(
        con.execute(
            "SELECT bit_count(xor(CAST(? AS BIGINT), CAST(? AS BIGINT)))"
            " + bit_count(xor(CAST(? AS BIGINT), CAST(? AS BIGINT)))",
            [py[0], duck[0], py[1], duck[1]],
        ).fetchone()[0]
    )
    con.close()
    assert py == duck
    assert ham == 0
    assert all(0 <= x < (1 << 32) for x in py)


@given(
    corpus_texts=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=6).map(
            " ".join
        ),
        min_size=1,
        max_size=8,
    ),
    batch_texts=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=6).map(
            " ".join
        ),
        min_size=1,
        max_size=8,
    ),
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_neardup_screen_model(spark, corpus_texts, batch_texts):
    """Generative model law for the arrival-ordered near-dup screen:
    given the operator's OWN band tables (MinHash banding has its own
    oracle and laws), a sequential Python reference — count distinct
    corpus colliders, count distinct LOWER-id in-batch colliders, dup
    iff either is positive — must match the distributed verdict
    exactly, including zero-shingle short docs passing through as
    non-dups."""
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)],
        "doc_id: long, text: string",
    )
    batch = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id: long, text: string",
    )
    cb = [
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in dedup.minhash_bands(corpus).collect()
    ]
    nb = [
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in dedup.minhash_bands(batch).collect()
    ]
    bands_of = {}
    for d, bi, bh in nb:
        bands_of.setdefault(d, set()).add((bi, bh))
    expect = {}
    for i in range(len(batch_texts)):
        d = 1000 + i
        mine = bands_of.get(d, set())
        n_corpus = len({cd for cd, bi, bh in cb if (bi, bh) in mine})
        n_prior = len(
            {
                pd
                for pd, bi, bh in nb
                if pd < d and (bi, bh) in mine
            }
        )
        expect[d] = (n_corpus, n_prior, (n_corpus + n_prior) > 0)
    got = {
        r["doc_id"]: (r["n_corpus_dups"], r["n_prior_dups"], r["dup"])
        for r in dedup.neardup_screen(batch, corpus).collect()
    }
    assert got == expect
