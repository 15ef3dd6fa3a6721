"""r14 MinHash-LSH candidate-generation experiment — both arms
measured, the rewrite REJECTED; this tool preserves the rejected arm.

Decomposition first (tools/exp_minhash_decompose.py at sf10):
signatures 9.3 s, band entries 10.5 s, candidates+distinct 39.6 s,
full query 78.9 s — candidate enumeration dominates because sibling
near-dups collide in ~12 of 16 bands (~300 M joined rows deduped to
27 309 415 candidates). Two exact levers tested:

- Length filter on candidates (the exact tier's r13 trick): prunes
  exactly 1 of 27 309 415 candidates at sf10 — banding already
  enforces size similarity. Dead.
- First-colliding-band emission (``cands_firstband`` below): carry
  the 16-bucket array on each band entry and add a "no earlier band
  matches" residual so each pair is emitted exactly once and the
  ``distinct()`` disappears. Candidate sets proved IDENTICAL at
  sf0.1 (256) and sf1 (250 598, exceptAll both ways = 0), but sf10
  interleaved noop A/B: current 36.5 s vs firstband **202.5 s** —
  the per-joined-row slice+zip_with+exists residual (array
  allocations on every one of ~300 M rows) costs 5.5× more than the
  codegen hash-aggregate distinct it removes. Rejected; the distinct
  stays.

Usage: python tools/exp_lsh_firstband.py eq|time
"""

import sys, time, statistics
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from gaming_ai_analytics_spark.session import get_spark
from gaming_ai_analytics_spark.operators import dedup as D
from gaming_ai_analytics_spark.sources.star import load_table

def cands_current(d):
    bands = D._band_entries(d, "doc_id", "text", 3, 64, 16)
    _hint = D._self_join_hinter(d)
    a, b = _hint(bands).alias("a"), _hint(bands).alias("b")
    return (a.join(b, (F.col("a.band")==F.col("b.band")) & (F.col("a.bucket")==F.col("b.bucket")) & (F.col("a._id")<F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")).distinct())

def cands_firstband(d):
    from gaming_ai_analytics_spark.operators.dedup import minhash_signatures, _let
    sig = minhash_signatures(d, "doc_id", "text", 3, 64)
    buckets = _let(F.col("signature"), lambda s: F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda bnd: F.xxhash64(F.slice(s, bnd * 4 + 1, 4))))
    ent = sig.select("_id", buckets.alias("_bkts")).select(
        "_id", "_bkts", F.posexplode("_bkts").alias("band", "bucket"))
    _hint = D._self_join_hinter(d)
    a, b = _hint(ent).alias("a"), _hint(ent).alias("b")
    earlier_match = F.exists(
        F.zip_with(F.slice(F.col("a._bkts"), 1, F.col("a.band")),
                   F.slice(F.col("b._bkts"), 1, F.col("b.band")),
                   lambda x, y: x == y),
        lambda e: e)
    return (a.join(b, (F.col("a.band")==F.col("b.band")) & (F.col("a.bucket")==F.col("b.bucket"))
                     & (F.col("a._id")<F.col("b._id")) & ~earlier_match)
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")))

spark = get_spark("lsh_firstband")
mode = sys.argv[1]
if mode == "eq":
    for sf in ["/root/testdata/sf0.1", "/root/repo/.benchdata/sf1"]:
        d = D.ensure_parallelism(load_table(spark, sf, "documents"))
        c1, c2 = cands_current(d), cands_firstband(d)
        n1, n2 = c1.count(), c2.count()
        extra = c2.exceptAll(c1).count()
        missing = c1.exceptAll(c2).count()
        print(f"{sf}: current={n1} firstband={n2} extra={extra} missing={missing} "
              f"{'IDENTICAL' if n1==n2 and extra==0 and missing==0 else 'MISMATCH'}", flush=True)
else:
    def noop(df): df.write.format("noop").mode("overwrite").save()
    d10 = lambda: D.ensure_parallelism(load_table(spark, "/root/repo/.benchdata/sf10", "documents"))
    arms = {"current": lambda: noop(cands_current(d10())), "firstband": lambda: noop(cands_firstband(d10()))}
    for n, f in arms.items(): f()
    res = {n: [] for n in arms}
    for r in range(3):
        for n, f in arms.items():
            t0=time.perf_counter(); f(); res[n].append(time.perf_counter()-t0)
            print(f"r{r} {n}: {res[n][-1]:.1f}s", flush=True)
    for n, runs in res.items(): print(n, "median", round(statistics.median(runs),1), flush=True)
