"""Physical-plan audits: the scale claims the docs make must be visible
in the executed plan, not just asserted in prose."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_and_column_pushdown(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "lang")
    )
    plan = _plan(df)
    # predicate reaches the scan...
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)" in plan
    # ...and the scan reads ONLY the projected columns
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan
    assert "text" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_gapfill_spine_join_broadcasts(spark, sf_dir):
    from afspark.operators.gapfill import gapfill
    from afspark.operators.rollup import TIERS, rollup_points

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_id"), "ts", "value"
    )
    out = gapfill(rollup_points(ev, TIERS["1h"]), TIERS["1h"], method="locf")
    plan = _plan(out)
    # the dense spine joins broadcast-side; no sort-merge join of the
    # full rollup against the spine
    assert "BroadcastHashJoin" in plan


def test_kernel_stage_partitions_explicit_not_aqe_coalesced(spark, sf_dir):
    """The CPU-bound kernel shuffle must keep its explicit partition
    count — AQE byte-coalescing would serialize it (gotcha from r1)."""
    from afspark.functions import kernels as K
    from afspark.operators.score import score_pages
    from afspark.sources.pages import generate_pages, with_series_offsets

    offs = with_series_offsets(generate_pages(spark, 200))
    scored = score_pages(offs, [K.Energy()], 512, 256, fs=1000.0)
    n = scored.rdd.getNumPartitions()
    import os

    from afspark.operators.score import _kernel_partitions

    assert n == _kernel_partitions(spark)
    mult = int(os.environ.get("AFSPARK_KERNEL_PART_MULT", "1"))
    assert n == spark.sparkContext.defaultParallelism * mult


def test_brute_force_topk_no_full_corpus_window(spark, sf_dir):
    """The per-query rank window must run over the tiny mapInPandas
    survivor set, never over the full scored corpus — a window keyed
    only by qid over all scores is a single-task straggler at scale."""
    import pandas as pd

    from afspark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qpdf = emb.orderBy("vec_id").limit(3).toPandas()
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "qid": qpdf["vec_id"],
                "qvec": [list(map(float, v)) for v in qpdf["embedding"]],
            }
        )
    )
    out = brute_force_topk(emb, queries, k=5)
    plan = _plan(out)
    # phase-1 local top-k is present...
    assert "MapInPandas" in plan
    # ...and the (single) rank window sits ABOVE it in the plan tree:
    # the window's child chain must contain the MapInPandas node, i.e.
    # the window consumes survivors, not raw scores.
    win_at = plan.index("Window")
    map_at = plan.index("MapInPandas")
    assert map_at > win_at, "window must be downstream of local top-k"
    # the raw-score side (below MapInPandas) must contain no Window node
    assert "Window" not in plan[map_at:]


def test_ivf_store_partition_pruning(spark, sf_dir, tmp_path):
    """IVF's scale claim: with the index written partitioned by cell, an
    n_probe query scans ONLY the probed cell directories."""
    import pandas as pd

    from afspark.operators.similarity import (
        assign_cells,
        ivf_topk,
        read_ivf_index,
        train_codebook,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = train_codebook(emb.orderBy("vec_id"), n_cells=8, sample=500)
    store = str(tmp_path / "ivf_index")
    write_ivf_index(assign_cells(emb, cb), store)
    cells = read_ivf_index(spark, store)
    n_cells_on_disk = cells.select("cell").distinct().count()

    qpdf = emb.orderBy("vec_id").limit(2).toPandas()
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "qid": qpdf["vec_id"],
                "qvec": [list(map(float, v)) for v in qpdf["embedding"]],
            }
        )
    )
    out = ivf_topk(cells, cb, queries, k=5, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the probed-cell predicate reaches the scan as a partition filter
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters:")[1].split("]")[0]
    # and prunes: the isin literal in the partition filter names at most
    # 2 queries * 2 probes distinct cells — fewer than live on disk, so
    # the scan touches only those cell= directories
    import re

    seg = plan.split("PartitionFilters:")[1].split("]")[0]
    probed = {int(x) for x in re.findall(r"IN \(([-\d,]+)\)", seg)[0].split(",")}
    assert 0 < len(probed) <= 4 < n_cells_on_disk


def test_incremental_refresh_broadcasts_touched_set(spark, sf_dir):
    """Both the locating semi-join and the untouched anti-join must
    broadcast the (tiny) touched-bucket set — the committed tier is never
    shuffled wholesale for a refresh."""
    from afspark.operators.rollup import TIERS, refresh_tier_incremental, rollup_points

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_id"), "ts", "value"
    )
    tagged = ev.withColumn("_h", F.pmod(F.xxhash64("series_id", "ts"), F.lit(7)))
    committed = rollup_points(tagged.filter(F.col("_h") != 0).drop("_h"), TIERS["1h"])
    out = refresh_tier_incremental(
        committed, tagged.filter(F.col("_h") == 0).drop("_h"), TIERS["1h"]
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "LeftAnti" in plan
    # no sort-merge join anywhere in the refresh
    assert "SortMergeJoin" not in plan


def test_counter_rate_chunked_shuffle_shape(spark, sf_dir):
    """counter_increase's chunked decomposition: every exchange that
    carries raw rows hashes on (series_id, _chunk) — a hot series spreads
    over its time chunks instead of serializing into one sort task.  The
    only series-keyed window/exchange runs over the one-row-per-chunk
    carry aggregate, which then joins BROADCAST-side; the rate
    aggregation keeps its map-side combine."""
    from afspark.operators.tsanalytics import rate_per_bucket

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_id"), "ts", "value"
    )
    out = rate_per_bucket(ev, 3600)
    plan = _plan(out)
    # the raw-data lag window is chunk-partitioned
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    raw_windows = [s for s in specs if "value#" in s and "_chunk" in s]
    assert raw_windows, plan
    # no series-only window over raw rows: every series-only spec is the
    # carry lag over the chunk aggregate (_w0 = pre-projected last value)
    for s in specs:
        if "_chunk" not in s.split("windowspecdefinition", 1)[1].split(",")[1]:
            assert "_w0" in s or "_last" in s, s
    assert "BroadcastHashJoin" in plan  # tiny carry side broadcast
    assert "partial_" in plan  # map-side combine still present


def test_ewma_no_window_and_broadcast_carry(spark, sf_dir):
    """EWMA's linear-recurrence decomposition uses NO window function (no
    per-series global sort-task) and the tiny per-chunk carry table joins
    broadcast-side; shuffles stay bounded (series / series+chunk keys)."""
    from afspark.operators.tsanalytics import ewma

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_id"), "ts", "value"
    )
    plan = _plan(ewma(ev, 0.05, chunk_seconds=86_400))
    assert "WindowExec" not in plan and "Window " not in plan
    assert "BroadcastExchange" in plan  # carry table is the small side
    assert plan.count("Exchange hashpartitioning") <= 4


def test_minhash_signature_path_skips_set_shuffle(spark, sf_dir):
    """Round-4 contract: signatures read the shingle MULTISET (min is
    duplicate-invariant), so the only exchanges under the signature
    aggregate are the explicit pre-explode repartition and the aggregate's
    own partial->final shuffle — NO set-semantics (distinct) shuffle of
    the full exploded shingle table."""
    from afspark.operators.dedup import char_shingles, minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = char_shingles(docs, hashed=True, distinct=False)
    sig = minhash_signatures(sh, 16)
    plan = _plan(sig)
    # one RoundRobin (explicit spread) + one hash exchange (the agg);
    # a distinct would add a second hashpartitioning over (id, sh)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange RoundRobinPartitioning") == 1, plan
    assert "partial_min" in plan  # map-side combine of the lanes


def test_bm25_single_doc_shuffle_and_broadcast_stats(spark, sf_dir):
    """BM25 must not build a posting-list join: one aggregation keyed on
    doc_id, corpus stats re-entering broadcast-side, top-k through
    TakeOrderedAndProject (no global sort)."""
    from afspark.operators.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(bm25_topk(docs, ["merge", "spark"], k=10))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats crossJoin
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    # exactly one exchange keyed on doc_id feeds both dl/tf and stats
    assert plan.count("hashpartitioning(doc_id") <= 2


def test_cms_cells_broadcast_into_estimate(spark, sf_dir):
    """The d x w cell table joins broadcast-side; candidates never
    shuffle through a sort-merge join."""
    from afspark.operators.sketch import cms_heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(cms_heavy_hitters(docs, depth=4, width=64))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_interval_overlap_join_is_equi_not_nested_loop(spark):
    """The overlap predicate must ride an equi-join on (key, bucket) —
    a nested-loop/cartesian plan is the quadratic shape this operator
    exists to avoid."""
    from afspark.operators.rangejoin import interval_overlap_join

    a = spark.range(1000).selectExpr(
        "CAST(id % 7 AS STRING) AS k", "id * 100 AS l_start_s",
        "id * 100 + 500 AS l_end_s", "id AS l_id",
    )
    b = spark.range(1000).selectExpr(
        "CAST(id % 7 AS STRING) AS k", "id * 90 AS r_start_s",
        "id * 90 + 400 AS r_end_s", "id AS r_id",
    )
    plan = _plan(interval_overlap_join(a, b, 3600, keys=["k"]))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "hashpartitioning(k" in plan or "BroadcastHashJoin" in plan


def test_theilsen_pair_join_is_keyed_not_cartesian(spark, sf_dir):
    """The pairwise-slope self-join must be an equi-join keyed on
    (series, group) — never a cartesian/nested-loop over buckets."""
    from afspark.operators.tsanalytics import theil_sen_trend

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_id"), "ts", "value"
    )
    plan = _plan(theil_sen_trend(ev, 3600, 86400))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sliding_distinct_two_phase_dedup(spark, sf_dir):
    """Native sliding window -> Expand (fixed window/hop replication),
    then the exact-tier dedup: an aggregate keyed on (window, entity)
    BEFORE the per-window count — shuffle volume is the distinct set."""
    from afspark.operators.distinct import sliding_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = _plan(sliding_distinct(ev, 21600, 3600))
    assert "Expand" in plan
    i_dedup = plan.find("user_id", plan.find("hashpartitioning"))
    assert i_dedup != -1  # entity participates in a shuffle key
    # final count groups by window only — two distinct exchanges
    assert plan.count("Exchange hashpartitioning") >= 2


def test_pagerank_no_per_iteration_count_scan(spark, sf_dir):
    """The node count is a driver literal: the unrolled 3-iteration plan
    must contain NO 1-row broadcast nested-loop (scalar-subquery count)
    splices."""
    from afspark.operators.linkgraph import derive_links, pagerank_fixed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    edges = derive_links(docs, n_nodes=500)
    plan = _plan(pagerank_fixed(docs, edges, n_iter=3, n_nodes=500))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_matrix_profile_single_python_stage_per_series(spark, sf_dir):
    """One Arrow stage total, with in-process series grouping: exactly
    one MapInPandas and NO per-group FlatMapGroupsInPandas (the
    one-Arrow-batch-per-group shape measured at 5.4 s of pure overhead
    for 1500 groups at sf0.1 — see operators/sdt.py)."""
    from afspark.operators.matrixprofile import matrix_profile_discord

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_id"), "ts", "value"
    )
    plan = _plan(matrix_profile_discord(ev, 3600, 24))
    assert plan.count("MapInPandas") == 1
    assert "FlatMapGroupsInPandas" not in plan


def test_url_canonicalization_is_shuffle_free(spark, sf_dir):
    """canonicalize_url must stay a projection on the scan — any
    Exchange means the 'rides the scan' claim in urlnorm.py is false."""
    from afspark.operators.urlnorm import canonicalize_url

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(F.lit("http://www.ex.com/p/"), F.col("doc_id"))
    plan = _plan(docs.select(canonicalize_url(url).alias("c")))
    assert "Exchange" not in plan


def test_hdr_rollup_map_side_combines(spark, sf_dir):
    """The sketch cells must partial-aggregate before the shuffle —
    the 'algebraic, map-side combined' claim in hdrsketch.py."""
    from afspark.operators.hdrsketch import hdr_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_id"),
        "ts",
        F.floor(F.col("value") * 100 + 0.5).alias("value"),
    )
    plan = _plan(hdr_rollup(ev, 3600))
    pre_exchange = plan.split("Exchange")[-1]  # deepest = before shuffle
    assert "partial_count" in pre_exchange
    assert plan.count("Exchange") == 1  # one shuffle total


def test_pmi_topk_no_full_sort(spark, sf_dir):
    """Top-k collocations must end in TakeOrderedAndProject, not a
    global Sort+Exchange of every scored bigram."""
    from afspark.operators.text import pmi_bigrams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(pmi_bigrams(docs, min_count=5, k=50))
    assert "TakeOrderedAndProject" in plan


def test_sdt_single_shuffle_on_series(spark):
    """SDT is one explicit hash shuffle on the series key + an
    in-partition sort feeding the streaming Arrow kernel — no per-group
    batches (MapInPandas, not FlatMapGroupsInPandas), no second
    exchange."""
    from afspark.operators.sdt import sdt_downsample

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(10)],
        "series_id string, seq long, value double",
    )
    plan = _plan(sdt_downsample(df, dev=2.0, ts_col="seq", order_col="seq"))
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" not in plan
    assert "Sort" in plan  # the within-partition key/clock sort


def test_linear_recurrence_family_no_per_group_arrow(spark):
    """EWMA / Holt / Holt-Winters chunked decompositions run every Arrow
    stage through the in-process grouped path (_grouped.py): zero
    FlatMapGroupsInPandas anywhere in the plan — the one-batch-per-group
    shape costs ~3.6 ms/group of pure overhead (operators/sdt.py
    measurement), and the chunk grid multiplies group count by days."""
    import datetime as dt

    from afspark.operators.tsanalytics import ewma, holt_linear, holt_winters_fit

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", base + dt.timedelta(minutes=i), float(i % 7)) for i in range(50)],
        "series_id string, ts timestamp, value double",
    )
    for out in (
        ewma(df, 0.1, chunk_seconds=600),
        holt_linear(df, 0.3, 0.1, chunk_seconds=600),
        holt_winters_fit(df, 0.3, 0.1, 0.2, 3600, 6, chunk_seconds=600),
    ):
        plan = _plan(out)
        assert "FlatMapGroupsInPandas" not in plan
        assert "MapInPandas" in plan


def test_cluster_zorder_single_range_shuffle_pure_catalyst(spark):
    """cluster_zorder: ONE range-partitioning exchange, z-key computed as
    a Catalyst expression (no Python/UDF anywhere in the plan)."""
    from afspark.sources.zorder import cluster_zorder

    df = spark.range(0, 1000).select(
        (F.col("id") % 64).alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(64)).alias("b"),
    )
    plan = _plan(cluster_zorder(df, "a", "b", bits=6, n_files=8))
    assert plan.count("Exchange") == 1
    assert "rangepartitioning(_z" in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
    assert "shiftleft" in plan  # the Morton cascade rides the Project
