"""IO-surface tests: schema-pinned CSV scans (S1-S3), the layered
TableStore (S4/S6, K1/K2), and the small-scan parallelism guard.

The CSV cases are SURVEY §7.3 hard-part #5: the reference's review text
is multiline-quoted with embedded quotes and newlines
(reference: reviews_fact.py:117-125 options), so the scan must keep
``multiLine`` + ``escape`` semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gaming_ai_analytics_spark.operators.parallelism import ensure_parallelism
from gaming_ai_analytics_spark.sources.io import (
    TableStore,
    discover_sources,
    read_csv,
)
from gaming_ai_analytics_spark.sources.star import register_views

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

#: (id, text, score) — embedded newline, embedded double quote, comma,
#: unicode, empty string, and a null.
PATHOLOGICAL = [
    (1, "plain text", 1.5),
    (2, "line one\nline two\n\nline four", -2.0),
    (3, 'she said "never", twice', 0.0),
    (4, "commas, everywhere, always", 3.25),
    (5, "ünïcödé — 日本語 🎮", -5.0),
    (6, "", 5.0),
    (7, None, None),
]


def _write_csv(path, rows):
    def cell(v):
        if v is None:
            return ""
        if isinstance(v, str):
            return '"' + v.replace('"', '""') + '"'
        return str(v)

    lines = ["id,text,score"]
    lines += [",".join(cell(v) for v in row) for row in rows]
    path.write_text("\n".join(lines), encoding="utf-8")


def test_csv_pathological_roundtrip(spark, tmp_path):
    f = tmp_path / "reviews.csv"
    _write_csv(f, PATHOLOGICAL)
    got = {
        r["id"]: (r["text"], r["score"])
        for r in read_csv(spark, str(f), SCHEMA).collect()
    }
    assert got[2][0] == "line one\nline two\n\nline four"
    assert got[3][0] == 'she said "never", twice'
    assert got[4][0] == "commas, everywhere, always"
    assert got[5] == ("ünïcödé — 日本語 🎮", -5.0)
    # empty quoted string and empty cell both surface as null under
    # Spark's CSV reader defaults — what matters is no row corruption
    assert got[6][1] == 5.0
    assert got[7] == (None, None)
    assert len(got) == len(PATHOLOGICAL)


def test_csv_no_inference_pass(spark, tmp_path):
    """The scan must use the declared schema, not infer: a column of
    digit strings stays IntegerType only because we pinned it."""
    f = tmp_path / "t.csv"
    _write_csv(f, [(1, "00", 2.0)])
    df = read_csv(spark, str(f), SCHEMA)
    assert [f.dataType for f in df.schema.fields] == [
        T.IntegerType(),
        T.StringType(),
        T.DoubleType(),
    ]


def test_tablestore_roundtrip_modes(spark, tmp_path, sf_dir):
    store = TableStore(spark, str(tmp_path))
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    assert not store.exists("dim", "region")
    store.save("dim", "region", df)
    assert store.exists("dim", "region")
    assert store.load("dim", "region").count() == df.count()
    store.save("dim", "region", df, mode="append")
    assert store.load("dim", "region").count() == 2 * df.count()
    store.save("dim", "region", df, mode="overwrite")
    assert store.load("dim", "region").count() == df.count()
    store.drop("dim", "region")
    assert not store.exists("dim", "region")


def test_ensure_parallelism_widens_small_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert docs.rdd.getNumPartitions() < 32
    wide = ensure_parallelism(docs, 32)
    assert wide.rdd.getNumPartitions() == 32
    assert wide.count() == docs.count()


def test_ensure_parallelism_noop_when_wide(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(64)
    assert ensure_parallelism(docs, 32) is docs


def test_discover_sources(tmp_path):
    for name in ["categories.csv", "genres.csv", "notes.txt"]:
        (tmp_path / name).write_text("id\n1")
    got = discover_sources(str(tmp_path))
    assert list(got) == ["categories", "genres"]
    assert got["genres"].endswith("genres.csv")


def test_register_views_sql_path(spark, sf_dir):
    s = register_views(spark, sf_dir)
    n = s.sql("SELECT count(*) AS n FROM region").first()["n"]
    assert n == 5


def test_partitioned_save_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned layout: a filter on the partition column
    must become a PartitionFilter (directories skipped at planning
    time — the coarsest and cheapest pruning lever at 100 TB), and the
    store must recognize the partitioned directory as an existing
    table."""
    from gaming_ai_analytics_spark.sources.io import TableStore
    from gaming_ai_analytics_spark.sources.star import load_events

    store = TableStore(spark, str(tmp_path / "wh"))
    ev = load_events(spark, "/root/testdata/sf0.001").withColumn(
        "event_date", F.to_date("ts")
    )
    store.save("silver", "events_bydate", ev, partition_by=["event_date"])
    assert store.exists("silver", "events_bydate")

    back = store.load("silver", "events_bydate")
    one_day = back.filter(F.col("event_date") == "2024-01-05")
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(
        one_day._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_date" in pf[0]  # pruned at the scan, not post-filter
    expect = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == expect > 0


def test_dynamic_partition_overwrite_replaces_only_touched_days(spark, tmp_path):
    """Daily-batch refresh: overwriting with one day's batch must
    replace that day's partition only (dynamic mode), not truncate
    the table (Spark's static default)."""
    from gaming_ai_analytics_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    full = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0),
         ("2024-01-02", 3, 30.0)],
        ["day", "id", "v"],
    )
    store.save("silver", "daily", full, partition_by=["day"])

    # re-run day 2 with corrected data
    fixed = spark.createDataFrame([("2024-01-02", 3, 99.0)], ["day", "id", "v"])
    store.save(
        "silver", "daily", fixed,
        mode="overwrite", partition_by=["day"], dynamic_partitions=True,
    )
    back = {  # partition values come back type-inferred (str → date)
        (str(r.day), r.id): r.v
        for r in store.load("silver", "daily").collect()
    }
    assert back == {
        ("2024-01-01", 1): 10.0,   # untouched partition survives
        ("2024-01-01", 2): 20.0,
        ("2024-01-02", 3): 99.0,   # touched partition replaced
    }


def test_tablestore_format_pluggable_json(spark, tmp_path):
    """The fmt= seam is real: a second format round-trips through the
    same save/load/exists surface (delta gets the same treatment below
    when importable)."""
    from gaming_ai_analytics_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"), fmt="json")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    store.save("bronze", "t", df)
    assert store.exists("bronze", "t")
    assert {tuple(r) for r in store.load("bronze", "t").collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_tablestore_format_delta(tmp_path):
    """Delta-format round-trip incl. append atomicity surface — runs
    only where delta-spark is installed (the reference's storage
    format, utilities.py:23); plain OSS containers skip."""
    pytest.importorskip("delta")
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    from gaming_ai_analytics_spark.sources.io import TableStore

    builder = (
        SparkSession.builder.appName("delta_test")
        .master("local[2]")
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    dspark = configure_spark_with_delta_pip(builder).getOrCreate()
    store = TableStore(dspark, str(tmp_path / "wh"), fmt="delta")
    df = dspark.createDataFrame([(1, "a")], ["k", "v"])
    store.save("bronze", "t", df)
    store.save("bronze", "t", dspark.createDataFrame([(2, "b")], ["k", "v"]),
               mode="append")
    assert store.exists("bronze", "t")
    assert store.load("bronze", "t").count() == 2


def test_tablestore_document_roundtrip(spark, tmp_path, sf_dir):
    """Comments land in the catalog and read back — the OSS analog of
    the reference's semantic-layer documentation DDL
    (semantic_layer.sql:96-139)."""
    from gaming_ai_analytics_spark.sources.io import TableStore
    from gaming_ai_analytics_spark.sources.star import load_table

    store = TableStore(spark, str(tmp_path / "wh"))
    store.save("gold", "regions_doc", load_table(spark, sf_dir, "region"))
    store.document(
        "gold",
        "regions_doc",
        table_comment="Region dimension ('quoted' too)",
        column_comments={"r_name": "Region name", "r_regionkey": "PK"},
    )
    got = store.comments("gold", "regions_doc")
    assert got["table"] == "Region dimension ('quoted' too)"
    assert got["columns"] == {"r_regionkey": "PK", "r_name": "Region name"}
    store.drop("gold", "regions_doc")  # removes catalog entry + files
    assert not store.exists("gold", "regions_doc")


def test_tablestore_compact_merges_small_files(spark, tmp_path):
    """Ten single-row appends leave ≥10 part files; compact() rewrites
    to the target count, preserves every row, and clusters on the sort
    key within the rewritten files."""
    from gaming_ai_analytics_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    for i in range(10):
        store.save(
            "silver", "appended",
            spark.createDataFrame([(i, f"v{i}")], ["k", "v"]),
            mode="append",
        )
    p = store.path("silver", "appended")
    import os
    n_before = sum(f.startswith("part-") for f in os.listdir(p))
    assert n_before >= 10
    n_files = store.compact("silver", "appended", sort_by=["k"])
    assert n_files == 1
    n_after = sum(f.startswith("part-") for f in os.listdir(p))
    assert n_after == 1
    got = sorted(tuple(r) for r in store.load("silver", "appended").collect())
    assert got == [(i, f"v{i}") for i in range(10)]


def test_tablestore_analyze_feeds_catalog_stats(spark, tmp_path, sf_dir):
    """ANALYZE lands row-count stats in the catalog (CBO input)."""
    from gaming_ai_analytics_spark.sources.io import TableStore
    from gaming_ai_analytics_spark.sources.star import load_table

    store = TableStore(spark, str(tmp_path / "wh"))
    store.save("gold", "orders_stats", load_table(spark, sf_dir, "orders"))
    table = store.analyze("gold", "orders_stats", columns=["o_orderkey"])
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }
    assert "Statistics" in desc, desc.keys()
    store.drop("gold", "orders_stats")


def test_tablestore_upsert_merges_by_key(spark, tmp_path):
    """MERGE-INTO semantics on plain parquet: matched keys replaced,
    unmatched inserted, untouched rows survive; first call on a
    missing table degrades to a plain save."""
    from gaming_ai_analytics_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "v", "x"]
    )
    store.upsert("silver", "kv", base, ["k"])  # no table yet → save
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], ["k", "v", "x"]
    )
    store.upsert("silver", "kv", updates, ["k"])
    got = sorted(tuple(r) for r in store.load("silver", "kv").collect())
    assert got == [
        (1, "a", 10.0),   # untouched
        (2, "B", 99.0),   # matched → replaced
        (3, "c", 30.0),   # untouched
        (4, "d", 40.0),   # not matched → inserted
    ]


def test_tablestore_vacuum_and_merge_schema(spark, tmp_path):
    """vacuum() clears crashed-swap leftovers only; merge_schema=True
    reconciles appends that added a column."""
    import os

    from gaming_ai_analytics_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    store.save("silver", "t", spark.createDataFrame([(1,)], ["a"]))
    # simulate a crashed compact swap
    os.makedirs(store.path("silver", "t") + "._compact")
    removed = store.vacuum()
    assert len(removed) == 1 and removed[0].endswith("._compact")
    assert store.exists("silver", "t")  # live table untouched

    # schema evolution: append a file with an extra column
    spark.createDataFrame([(2, "x")], ["a", "b"]).write.mode(
        "append"
    ).parquet(store.path("silver", "t"))
    merged = store.load("silver", "t", merge_schema=True)
    assert set(merged.columns) == {"a", "b"}
    assert merged.count() == 2


def test_read_jsonl_permissive_survives_corrupt_lines(spark, tmp_path):
    """A corrupt line must null out, not fail the scan — at 100 TB one
    bad record cannot cost the job. Schema stays pinned (no inference
    pass) and good rows are untouched."""
    from gaming_ai_analytics_spark.sources.io import read_jsonl

    f = tmp_path / "docs.jsonl"
    f.write_text(
        '{"id": 1, "text": "ok"}\n'
        "{not json at all\n"
        '{"id": 3, "text": "also ok"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = {r.id: r.text for r in read_jsonl(spark, str(f), schema).collect()}
    assert rows[1] == "ok" and rows[3] == "also ok"
    assert None in rows  # the corrupt line surfaced as a null row
    assert len(rows) == 3


def test_zorder_key_matches_reference_interleave(spark):
    """The Morton key must equal the textbook bit interleave (a on
    even positions, b on odd) — checked against a Python reference
    over a grid including the mask boundary."""
    from gaming_ai_analytics_spark.operators.layout import zorder_key

    def ref(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    pts = [(a, b) for a in (0, 1, 2, 3, 255, 65535, 65536) for b in (0, 1, 7, 1023)]
    df = spark.createDataFrame(pts, ["a", "b"]).select(
        "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == ref(r.a, r.b), (r.a, r.b)


def test_save_zordered_files_own_disjoint_key_ranges(spark, tmp_path, sf_dir):
    """The layout contract: after a range-partitioned Z-order write,
    each file owns a disjoint Morton-key interval (that is what makes
    parquet min/max skipping prune BOTH dimensions)."""
    import glob

    from gaming_ai_analytics_spark.operators.layout import (
        save_zordered,
        zorder_key,
    )

    from gaming_ai_analytics_spark.operators.layout import _scale_to_bits

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", (F.minute("ts") + F.hour("ts") * 60).alias("m")
    )
    path = str(tmp_path / "zev")
    save_zordered(ev, path, "user_id", "m", num_files=4)
    # the write keys on the NORMALIZED interleave (both dims scaled to
    # the same bit width) — recompute it to check file disjointness
    lo_u, hi_u, lo_m, hi_m = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("m"), F.max("m")
    ).first()
    zkey = zorder_key(
        _scale_to_bits(F.col("user_id"), lo_u, hi_u, 16),
        _scale_to_bits(F.col("m"), lo_m, hi_m, 16),
        16,
    )
    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        part = spark.read.parquet(f)
        lo, hi = part.select(F.min(zkey), F.max(zkey)).first()
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 2  # the range partitioner actually split
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next


def test_save_zordered_prunes_both_dimensions(spark, tmp_path):
    """Regression for the unequal-bit-width pitfall the r7 layout
    experiment caught: interleaving RAW values lets the wider
    dimension's high bits monopolize the key, the range partitioner
    splits on them alone, and the narrow dimension gets ZERO
    file-level pruning (measured: minute-band skip 0.0% un-normalized
    vs 75.0% normalized at 10 M rows). After min-max normalization a
    10%-band predicate on EITHER dimension must leave most row groups
    skippable by footer min/max stats alone."""
    import glob

    import pyarrow.parquet as pq

    from gaming_ai_analytics_spark.operators.layout import save_zordered

    n = 20_000
    df = spark.range(n).select(
        ((F.col("id") * 9973) % 100_000).alias("x"),   # 17-bit dim
        ((F.col("id") * 31) % 100).alias("y"),         # 7-bit dim
    )
    path = str(tmp_path / "zxy")
    save_zordered(df, path, "x", "y", bits=8, num_files=16)

    def skippable(col, lo, hi):
        hit = total = 0
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            pf = pq.ParquetFile(f)
            idx = {
                pf.schema_arrow.names[i]: i
                for i in range(len(pf.schema_arrow.names))
            }
            for rg in range(pf.metadata.num_row_groups):
                s = pf.metadata.row_group(rg).column(idx[col]).statistics
                total += 1
                if s is None or (s.min < hi and s.max >= lo):
                    hit += 1
        return 1 - hit / total

    # 10% band in each dimension; both must prune substantially
    assert skippable("x", 10_000, 20_000) >= 0.5
    assert skippable("y", 10, 20) >= 0.5


def test_save_zordered_empty_and_all_null_inputs(spark, tmp_path):
    """An empty frame (a nightly increment with no rows) or an all-NULL
    dimension yields None min/max bounds; the write must degrade to a
    plain overwrite instead of a driver-side TypeError in the span
    arithmetic."""
    from gaming_ai_analytics_spark.operators.layout import save_zordered

    base = spark.range(10).select(
        F.col("id").alias("x"), (F.col("id") % 3).alias("y")
    )
    empty = base.filter(F.lit(False))
    p_empty = str(tmp_path / "zempty")
    save_zordered(empty, p_empty, "x", "y")
    assert spark.read.parquet(p_empty).count() == 0

    nully = base.withColumn("y", F.lit(None).cast("long"))
    p_null = str(tmp_path / "znull")
    save_zordered(nully, p_null, "x", "y")
    got = spark.read.parquet(p_null)
    assert got.count() == 10
    assert got.filter(F.col("y").isNotNull()).count() == 0


def test_read_orc_roundtrip_and_pushdown(spark, tmp_path, sf_dir):
    """ORC is the third columnar interchange path: a write→read
    round-trip must be lossless under a pinned schema, and filters
    must reach the ORC scan (ORC gets the same pushdown treatment as
    parquet — `spark.sql.orc.filterPushdown` defaults on)."""
    from gaming_ai_analytics_spark.sources.io import read_orc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    path = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    back = read_orc(spark, path, schema)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )
    plan = (
        back.filter(F.col("doc_id") > 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]" in plan


def test_variant_parity_with_json_path(spark, sf_dir):
    """The VARIANT path must agree with the get_json_object twin on
    the shared aggregates (count basis differs: n counts rows, n_with_k
    counts non-null k — equal when every row carries k)."""
    from gaming_ai_analytics_spark.queries_ext import (
        q_events_json_props,
        q_events_props_variant,
    )

    json_side = {
        r.event_type: r.avg_k for r in q_events_json_props(spark, sf_dir).collect()
    }
    var_side = {
        r.event_type: r.avg_k
        for r in q_events_props_variant(spark, sf_dir).collect()
    }
    assert json_side == var_side


def test_approx_topk_contract_true_at_test_scale(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_ext import q_approx_topk_contract

    row = q_approx_topk_contract(spark, sf_dir).first()
    assert row.n_items == row.n_exact_counts == 5
    assert row.mass_matches and row.k_matches


def test_xml_csv_roundtrip_codegen_no_python(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_ext import q_xml_csv_roundtrip

    df = q_xml_csv_roundtrip(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = df.collect()
    assert rows and all(r.key_roundtrip for r in rows)


def test_geomean_udaf_matches_logsum_twin(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_ext import q_agg_geomean_udaf
    from gaming_ai_analytics_spark.sources.star import load_table
    from pyspark.sql import functions as F

    got = {
        r.o_orderstatus: r.geomean_price
        for r in q_agg_geomean_udaf(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    want = {
        r.o_orderstatus: r.g
        for r in orders.groupBy("o_orderstatus")
        .agg(F.round(F.exp(F.avg(F.log("o_totalprice"))), 2).alias("g"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 0.01


def test_null_safe_join_keeps_null_keys(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_ext import q_join_null_safe
    from gaming_ai_analytics_spark.sources.star import load_table
    from pyspark.sql import functions as F

    rows = {r.lang_label: r.n_docs for r in q_join_null_safe(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    n_en = docs.filter(F.col("lang") == "en").count()
    # the NULLIF('en') rows ride the null key and must match DEFAULT
    assert rows.get("DEFAULT", 0) == n_en
    # nothing dropped: label counts partition the whole table
    assert sum(rows.values()) == docs.count()


def test_string_agg_sorted_and_consistent(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_ext import q_string_agg_langs

    for r in q_string_agg_langs(spark, sf_dir).collect():
        parts = r.langs.split(",")
        assert parts == sorted(parts)
        assert len(parts) == r.n_langs == len(set(parts))


def test_except_all_multiset_arithmetic(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_core import q_set_except_all
    from gaming_ai_analytics_spark.sources.star import load_table
    from pyspark.sql import functions as F

    got = {
        r.o_orderpriority: r.n_remaining
        for r in q_set_except_all(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    totals = {
        r.o_orderpriority: r.c
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    finished = {
        r.o_orderpriority: r.c
        for r in orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    want = {
        k: totals[k] - finished.get(k, 0)
        for k in totals
        if totals[k] - finished.get(k, 0) > 0
    }
    assert got == want


def test_grouped_zscore_mean_zero_within_group(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_ext import (
        q_grouped_zscore_applyinpandas,
    )
    from pyspark.sql import functions as F

    out = q_grouped_zscore_applyinpandas(spark, sf_dir)
    stats = out.groupBy("event_type").agg(
        F.avg("z").alias("m"), F.stddev_samp("z").alias("s")
    )
    for r in stats.collect():
        assert abs(r.m) < 1e-3          # centered
        assert abs(r.s - 1.0) < 1e-2    # unit variance (rounding slack)


def test_mapinarrow_bytelen_null_and_unicode(spark, tmp_path):
    """Byte length = UTF-8 octets (not chars), null text → 0 — on a
    synthetic fixture with exactly those edge rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gaming_ai_analytics_spark.queries_ext import q_mapinarrow_bytelen

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["abc", "héllo", None], pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = {
        r.doc_id: r.n_bytes_utf8
        for r in q_mapinarrow_bytelen(spark, str(tmp_path)).collect()
    }
    assert got == {1: 3, 2: 6, 3: 0}


def test_python_datasource_partitions_and_determinism(spark):
    from gaming_ai_analytics_spark.sources.pyds import (
        register_python_datasource,
    )

    register_python_datasource(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n", 100)
        .option("parts", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = sorted(df.collect(), key=lambda r: r.event_id)
    assert len(rows) == 100
    assert [r.event_id for r in rows] == list(range(100))
    r7 = rows[7]
    assert (r7.user_id, r7.event_type, r7.value) == (
        7, "refund", ((7 * 48271) % 100000) / 100.0
    )
    # uneven split covers the whole range (ceil-div partitioning)
    df2 = (
        spark.read.format("synthetic_events")
        .option("n", 10)
        .option("parts", 3)
        .load()
    )
    assert df2.count() == 10


def test_python_datasource_filter_pushdown_prunes_generation(spark):
    """pushFilters must tighten the generated id range BEFORE
    partition planning: a point lookup against a nominal 100M-row
    source can only finish promptly if the reader generated ~1 row —
    evaluating the predicate post-scan would take minutes of pure
    Python. Unsupported predicates still evaluate post-scan."""
    import time

    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.sources.pyds import (
        register_python_datasource,
    )

    register_python_datasource(spark)
    big = (
        spark.read.format("synthetic_events")
        .option("n", 100_000_000)
        .option("parts", 4)
        .load()
    )
    t0 = time.perf_counter()
    rows = big.filter(F.col("event_id") == 12345).collect()
    assert time.perf_counter() - t0 < 20
    assert len(rows) == 1 and rows[0].user_id == 12345 % 97
    # mixed: pushable range + residual predicate Spark evaluates
    out = (
        spark.read.format("synthetic_events")
        .option("n", 100_000_000)
        .load()
        .filter(
            (F.col("event_id") >= 100)
            & (F.col("event_id") < 200)
            & (F.col("event_type") == "view")
        )
        .collect()
    )
    assert {r.event_id % 4 for r in out} == {0}
    assert len(out) == 25


def test_avro_roundtrip_where_available(spark, tmp_path):
    """Avro interchange (the fourth columnar/row format next to
    parquet/CSV-JSONL/ORC): round-trip through TableStore's pluggable
    fmt. The spark-avro CONNECTOR is an external module not shipped in
    this container (only the avro core jars are) — skip cleanly where
    absent, run everywhere it is deployed; the parquet/ORC round-trip
    tests cover the identical TableStore surface here."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    try:
        df.write.mode("overwrite").format("avro").save(
            str(tmp_path / "avro_rt")
        )
    except AnalysisException as e:
        if "Failed to find data source: avro" in str(e):
            pytest.skip("spark-avro connector not deployed in container")
        raise
    back = spark.read.format("avro").load(str(tmp_path / "avro_rt"))
    assert sorted(r.v for r in back.collect()) == [0, 2, 4, 6, 8]


def test_tablestore_upsert_partition_pruned(spark, tmp_path):
    """VERDICT r11 ask #5 — the partition-pruned MERGE: result equals
    the full-rewrite upsert, AND the untouched partition's data files
    are bit-for-bit the ones written before the upsert (never read,
    never rewritten: the physical property that makes the serving
    table viable at 100 TB when updates are partition-local).

    The key is ``(day, k)`` — partition columns MUST be part of the
    key (ADVICE r12): the pruned anti-join never scans untouched
    partitions, so a bare-``k`` key whose day changed would leave its
    stale row alive there. ``upsert`` now rejects that shape
    (tested below)."""
    import os

    from gaming_ai_analytics_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [("d1", 1, 10.0), ("d1", 2, 20.0), ("d2", 3, 30.0),
         ("d3", 4, 40.0)],
        ["day", "k", "x"],
    )
    store.upsert("serve", "kv", base, ["day", "k"], partition_by=["day"])
    p = store.path("serve", "kv")

    def files_of(part):
        d = os.path.join(p, f"day={part}")
        return sorted(
            (f, os.stat(os.path.join(d, f)).st_mtime_ns)
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        )

    d3_before = files_of("d3")
    updates = spark.createDataFrame(
        [("d1", 2, 99.0), ("d2", 5, 50.0), ("d4", 6, 60.0)],
        ["day", "k", "x"],
    )
    store.upsert("serve", "kv", updates, ["day", "k"], partition_by=["day"])
    got = sorted(tuple(r) for r in store.load("serve", "kv").collect())
    assert got == [
        (1, 10.0, "d1"),   # untouched row in a touched partition
        (2, 99.0, "d1"),   # matched -> replaced
        (3, 30.0, "d2"),   # untouched row in a touched partition
        (4, 40.0, "d3"),   # untouched partition
        (5, 50.0, "d2"),   # inserted into existing partition
        (6, 60.0, "d4"),   # inserted into a NEW partition
    ]
    # the untouched partition's files were not rewritten
    assert files_of("d3") == d3_before
    # no staging/backup leftovers
    assert not [
        d for d in os.listdir(p) if "._preupsert" in d or "._upsert" in d
    ]


def test_tablestore_upsert_pruned_rejects_unsafe_shapes(spark, tmp_path):
    """ADVICE r12 guards: (1) partition columns not covered by the key
    would let a partition-moving key leave a stale duplicate in an
    untouched partition — rejected up front; (2) underscore/dot-leading
    partition column names produce ``_day=...`` leaf dirs that both
    Spark's read-side discovery and the staged-swap loop skip as
    committer metadata — the rewritten partition would be silently
    lost — also rejected."""
    import pytest as _pytest

    from gaming_ai_analytics_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([("d1", 1, 10.0)], ["day", "k", "x"])
    with _pytest.raises(ValueError, match="subset of key_cols"):
        store.upsert("serve", "kv2", df, ["k"], partition_by=["day"])
    df2 = df.withColumnRenamed("day", "_day")
    with _pytest.raises(ValueError, match="must not start with"):
        store.upsert(
            "serve", "kv3", df2, ["_day", "k"], partition_by=["_day"]
        )
