"""Property-style invariants (SURVEY §5): things that must hold for
ANY input, checked over an adversarial corpus in a single Spark job
per property (one job, many rows — not one job per example).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gaming_ai_analytics_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    word_shingles,
)

ADVERSARIAL = [
    "",
    " ",
    "\t\n  \n",
    "word",
    "two words",
    "a b c d e f g h",
    "ALLCAPS SHOUTING TEXT HERE",
    "punct!!! ??? ...,,,;;;",
    "1234 5678 90",
    "ünïcödé tëxt höre",
    "日本語のテキストです",
    "mixed 日本語 and english words",
    "repeat repeat repeat repeat repeat",
    "x" * 5000,
    ("the quick brown fox " * 200).strip(),
    'quotes "inside" text',
    "emoji 🎮🎮🎮 text",
]


def _corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)], ["id", "text"]
    )


def test_text_function_invariants(spark):
    rows = _corpus(spark).select(
        "id",
        token_count(F.col("text")).alias("tc"),
        F.size(F.split(F.trim("text"), " +")).alias("naive_tc"),
        quality_score(F.col("text")).alias("q"),
        language_id(F.col("text")).alias("lang"),
        doc_fingerprint(F.col("text")).alias("fp1"),
        doc_fingerprint(F.col("text")).alias("fp2"),
        F.size(word_shingles(F.col("text"), 3)).alias("n_sh"),
    ).collect()
    assert len(rows) == len(ADVERSARIAL)
    for r in rows:
        assert r.tc >= 0
        if ADVERSARIAL[r.id].strip():
            assert r.tc == r.naive_tc, ADVERSARIAL[r.id][:40]
        assert 0.0 <= r.q <= 1.0, (ADVERSARIAL[r.id][:40], r.q)
        assert isinstance(r.lang, str) and r.lang
        assert r.fp1 == r.fp2  # deterministic
        # distinct k-shingles: 0 when tokens < k, else ≤ n-k+1
        bound = max(0, r.tc - 3 + 1)
        assert 0 <= r.n_sh <= bound or r.tc < 3, (r.n_sh, r.tc)


def test_conditional_ratio_bounds(spark, sf_dir):
    import __spark_entry__ as e

    for r in e.queries()["agg_conditional_ratio"](spark, sf_dir).collect():
        vals = [v for k, v in r.asDict().items() if "pct" in k or "ratio" in k]
        assert vals, r
        for v in vals:
            assert 0.0 <= v <= 1.0
        assert sum(vals) <= 1.0 + 1e-9


def test_minhash_signature_shape(spark):
    from gaming_ai_analytics_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(_corpus(spark), "id", "text", k=3, num_hashes=16)
    rows = sigs.collect()
    assert rows  # at least the long texts have ≥3 tokens
    for r in rows:
        assert len(r.signature) == 16
        assert all(s is not None for s in r.signature)
    # identical text (planted repeats) → identical signatures
    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        ["id", "text"],
    )
    s1, s2 = [r.signature for r in minhash_signatures(dup, "id", "text").collect()]
    assert s1 == s2


def test_scale_sketches_near_exact(spark, sf_dir):
    """Approximate tier must track the exact tier. The query now emits
    the comparison itself (error-bound booleans hash-checked against a
    literal-TRUE oracle); here we assert every bound holds and the
    exact columns match an independent computation."""
    import __spark_entry__ as e

    rows = {
        r.l_linestatus: r
        for r in e.queries()["agg_scale_sketches"](spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r.l_linestatus: (r.m, r.n)
        for r in li.groupBy("l_linestatus")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 2).alias("m"),
            F.countDistinct("l_orderkey").alias("n"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for k, (em, en) in exact.items():
        r = rows[k]
        assert r.median_price_exact == em
        assert r.n_orders_exact == en
        assert r.median_approx_ok and r.acd_approx_ok, k


def test_dot_many_pandas_matches_expression(spark, sf_dir):
    """Arrow matmul kernel ≡ expression-form dots (1e-9 tolerance)."""
    import numpy as np

    from gaming_ai_analytics_spark.functions.vectors import dot, dot_many_pandas
    from gaming_ai_analytics_spark.operators.dedup import _hyperplanes

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    planes = _hyperplanes(64, 8)
    exprs = [
        dot(F.col("embedding"), F.array(*[F.lit(float(x)) for x in p])).alias(f"d{i}")
        for i, p in enumerate(planes)
    ]
    a = emb.select("vec_id", *exprs).collect()
    b = {r.vec_id: r.d for r in emb.select(
        "vec_id", dot_many_pandas(F.col("embedding"), planes).alias("d")
    ).collect()}
    assert len(a) == 100
    for ra in a:
        kb = b[ra.vec_id]
        assert np.allclose([ra[f"d{i}"] for i in range(8)], kb, atol=1e-9)


def test_funnel_matches_pure_python_reference(spark):
    """The funnel fold must agree with a straightforward sequential
    reference on a deterministic pseudo-random event corpus (many
    users, shuffled arrival order, duplicate timestamps)."""
    import datetime as dt

    from gaming_ai_analytics_spark.operators.analytics import funnel

    steps = ["view", "click", "purchase"]
    types = ["view", "click", "purchase", "error"]
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(40):
        for k in range(12):
            # deterministic LCG-ish mix; duplicate minutes on purpose
            h = (u * 2654435761 + k * 40503) % 2**16
            rows.append(
                (
                    u,
                    types[h % 4],
                    base + dt.timedelta(minutes=(h // 4) % 97),
                )
            )
    # reference: greedy earliest chain per user over ts-sorted events
    # (ties broken by event_type to mirror the fold's array_sort)
    reached = {s: 0 for s in steps}
    by_user: dict[int, list] = {}
    for u, et, ts in rows:
        by_user.setdefault(u, []).append((ts, et))
    for evs in by_user.values():
        evs.sort()
        matched = [None] * len(steps)
        for ts, et in evs:
            for i, s in enumerate(steps):
                if (
                    matched[i] is None
                    and et == s
                    and (i == 0 or (matched[i - 1] is not None and ts > matched[i - 1]))
                ):
                    matched[i] = ts
                    break
        for i, m in enumerate(matched):
            if m is not None:
                reached[steps[i]] += 1

    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {r.event_type: r.n_users for r in funnel(df, steps).collect()}
    assert got == reached
