"""Plan-shape regression tests: the scale posture of key operators is
pinned against the physical plan (pushdown, pruning, broadcast, shuffle
counts, bucketed no-shuffle joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from org_dharts_dia_tesseract_spark import plans as P
from org_dharts_dia_tesseract_spark.operators import extract_spans
from org_dharts_dia_tesseract_spark.sources import materialize_corpus
from org_dharts_dia_tesseract_spark.sources.bucketing import (bucketed_join,
                                                              save_bucketed)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_paths(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gen")
    return materialize_corpus(spark, str(d), 30)


def test_extract_pipeline_plan_shape(spark, corpus_paths):
    """The flagship plan: span side broadcasts (payloads never shuffle);
    exactly ONE shuffle total (the lean seq window); media scan reads the
    full payload schema, documents scan only doc_id+spans."""
    docs = spark.read.parquet(corpus_paths[0])
    media = spark.read.parquet(corpus_paths[1])
    df = extract_spans(docs, media)
    assert P.has_broadcast_hash_join(df)
    assert P.n_exchanges(df) == 1
    s = P.explain_str(df)
    assert "MapInPandas" in s


def test_encoded_media_pipeline_adds_no_shuffle(spark, corpus_paths):
    """The codec path (reencode -> sniff/decode inside the OCR stage) is
    a chained narrow MapInPandas: the full encoded-media pipeline keeps
    the flagship's single exchange — re-encoding never costs a shuffle."""
    from org_dharts_dia_tesseract_spark.operators.multimodal import \
        reencode_media
    docs = spark.read.parquet(corpus_paths[0])
    media = spark.read.parquet(corpus_paths[1])
    df = extract_spans(docs, reencode_media(media, "jpeg"))
    assert P.n_exchanges(df) == 1
    # two MapInPandas nodes (reencode + OCR), each listed once in the
    # tree and once in the node-detail section of the formatted plan
    assert P.explain_str(df).count("MapInPandas") == 4


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.where(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    pf = P.pushed_filters(df)
    assert any("l_quantity" in f and "GreaterThan" in f for f in pf)
    rs = P.scan_read_schema(df)
    # column pruning: only the two referenced columns are read
    assert len(rs) == 1 and "l_orderkey" in rs[0] and "l_quantity" in rs[0]
    assert "l_extendedprice" not in rs[0]


def test_small_dim_join_broadcasts(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    df = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    assert P.has_broadcast_hash_join(df)
    assert P.n_exchanges(df) == 0


def test_whole_stage_codegen_covers_scalar_ops(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = (li.withColumn("disc", F.col("l_extendedprice") * (1 - F.col("l_discount")))
          .where(F.col("disc") > 1000).select("l_orderkey", "disc"))
    assert "*(" in P.explain_str(df, "simple")   # codegen stage marker


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    """Pre-bucketed co-located join: zero Exchange in the plan."""
    warehouse = tmp_path_factory.mktemp("wh")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    save_bucketed(o, "orders_b", "o_custkey", 8, str(warehouse / "orders_b"))
    save_bucketed(c.withColumnRenamed("c_custkey", "o_custkey"),
                  "customer_b", "o_custkey", 8, str(warehouse / "customer_b"))
    joined = bucketed_join(spark, "orders_b", "customer_b", "o_custkey")
    agg = joined.groupBy("o_custkey").count()
    # join AND the groupBy on the bucket key: both shuffle-free
    assert P.n_exchanges(joined) == 0
    assert P.n_exchanges(agg) == 0
    assert joined.count() > 0


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_tpch_q3_plan_broadcasts_dim_and_pushes_filters(spark):
    """Q3 shape: the filtered customer dim must broadcast (no payload
    shuffle for the dim) and both date filters must reach the parquet
    scans as pushed predicates."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["tpch_q3_shipping_priority"](spark, SF)
    assert P.has_broadcast_hash_join(df)
    pf = " ".join(P.pushed_filters(df))
    assert "o_orderdate" in pf and "l_shipdate" in pf
    assert "c_mktsegment" in pf


def test_tpch_q5_plan_single_fact_shuffle(spark):
    """Q5 star join: every dim is broadcast; the only exchanges are the
    two fact sides of lineitem-orders plus the final agg (<= 3)."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["tpch_q5_local_supplier_volume"](spark, SF)
    s = P.explain_str(df)
    assert s.count("BroadcastHashJoin") >= 3
    assert P.n_exchanges(df) <= 3


def test_minhash_signature_single_shuffle(spark):
    """Shingling is a narrow map (higher-order array fns, no window): the
    signature plan's only exchange is the doc_id groupBy."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["minhash_signatures"](spark, SF)
    assert P.n_exchanges(df) == 1
    s = P.explain_str(df)
    assert "Window" not in s


def test_simhash_single_shuffle_partial_agg(spark):
    """SimHash: one map-side-combinable groupBy (no 32x bit explode, no
    second aggregation)."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["simhash32"](spark, SF)
    assert P.n_exchanges(df) == 1
    s = P.explain_str(df, "simple")
    assert s.count("HashAggregate") >= 2      # partial + final


def test_histogram_partial_agg(spark):
    """Equi-width histogram must map-side combine: a partial HashAggregate
    below the exchange and a final one above — the shuffle carries bin
    partials, never rows."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["histogram_price_bins"](spark, SF)
    s = P.explain_str(df, "simple")
    assert s.count("HashAggregate") >= 2
    assert P.n_exchanges(df) == 1


def test_simhash_near_dup_plan_no_cartesian(spark):
    """Hamming candidates come from an equi-join on (band, value) bucket
    keys — never a cross/nested-loop join over the corpus."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["simhash_near_dup_pairs"](spark, SF)
    s = P.explain_str(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_jaccard_band_blocked_plan_no_cartesian(spark):
    """Band-blocked exact Jaccard: every join is an equi-join (band keys,
    then candidate doc ids) — no all-pairs shape anywhere."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["ngram_jaccard_band_blocked"](spark, SF)
    s = P.explain_str(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_price_quantiles_plan_broadcast_and_rank(spark):
    """Exact percentiles: customer dim broadcasts; ranking shuffles only
    (segment, price) pairs."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["price_quantiles_by_segment"](spark, SF)
    assert P.has_broadcast_hash_join(df)
    assert P.n_exchanges(df) <= 2


def test_lsh_signature_plan_is_constant_size(spark):
    """The pandas_udf signature keeps the Catalyst plan O(1) in
    n_planes x dim (the round-1 expression form compiled ~12k nodes at
    dim 768) and schedules no driver-side job at plan time."""
    from org_dharts_dia_tesseract_spark.operators import similarity as S
    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    qs = spark.createDataFrame([], "q_id bigint, q_emb array<float>")
    df = S.lsh_topk(emb, qs, k=3, n_planes=16)    # dim-agnostic plan
    s = P.explain_str(df)
    assert "ArrowEvalPython" in s or "PythonUDF" in s.replace("udf", "UDF")
    assert len(s) < 50_000


def test_ivf_index_partition_pruning(spark, tmp_path_factory):
    """The IVF scale path: the index written partitionBy(list_id) prunes
    at the parquet scan when probing — only nprobe/n_lists of the corpus
    is ever read."""
    import numpy as np
    from org_dharts_dia_tesseract_spark.operators import similarity as S
    rng = np.random.default_rng(21)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = S.kmeans_centroids(emb, n_lists=4, n_iters=1)
    idx_path = str(tmp_path_factory.mktemp("ivf") / "index")
    S.ivf_assign(emb, cents).write.partitionBy("list_id").parquet(idx_path)
    probe = spark.read.parquet(idx_path).where(F.col("list_id").isin([0, 1]))
    s = P.explain_str(probe)
    assert "PartitionFilters" in s and "list_id" in s
    # pruning is real: fewer files read than the full index
    full = spark.read.parquet(idx_path)
    assert probe.count() < full.count()


def test_page_osd_plan_shape(spark, corpus_paths):
    """OSD shares the OCR stage's posture: span side broadcasts, payloads
    never shuffle, one MapInPandas."""
    from org_dharts_dia_tesseract_spark.operators import page_osd
    docs = spark.read.parquet(corpus_paths[0])
    media = spark.read.parquet(corpus_paths[1])
    df = page_osd(docs, media)
    assert P.has_broadcast_hash_join(df)
    assert P.n_exchanges(df) == 0
    assert P.explain_str(df, "simple").count("MapInPandas") == 1


def test_merge_tiff_plan_single_shuffle(spark, corpus_paths):
    """Byte-level TIFF merge: one exchange (the per-doc collect); the
    encode kernel is a single MapInPandas above it."""
    from org_dharts_dia_tesseract_spark.operators.sinks import merge_tiff
    docs = spark.read.parquet(corpus_paths[0])
    media = spark.read.parquet(corpus_paths[1])
    df = merge_tiff(docs, media)
    assert P.n_exchanges(df) == 1
    assert P.explain_str(df, "simple").count("MapInPandas") == 1


def test_tfidf_plan_broadcasts_vocab_no_cartesian(spark):
    """TF-IDF shape: the vocabulary-sized df table and the one-row doc
    count broadcast back onto tf (no shuffle of the big (doc_id, word)
    side for either join), and the scalar cross join stays a broadcast
    nested loop, never a cartesian product."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["tfidf_top_terms"](spark, SF)
    s = P.explain_str(df)
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    # shuffles: tf agg, df's two-phase distinct agg (2), the one-row doc
    # count, and the per-doc top-k window — all keyed on (doc_id, word) /
    # word / doc_id; the raw text column never shuffles
    assert P.n_exchanges(df) <= 5
    # the top-k window prunes before the shuffle (rank<=3 pushdown)
    assert "WindowGroupLimit" in s


def test_pii_scrub_plan_narrow_map(spark):
    """PII scrub is a pure projection: zero exchanges, whole-stage
    codegen regexp chain over the scan."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["pii_scrub"](spark, SF)
    assert P.n_exchanges(df) == 0


def test_paragraph_dedup_plan_single_shuffle(spark):
    """Paragraph dedup: chunking is a narrow map (higher-order array fns,
    no window), so the only exchanges serve the chunk aggregation — a
    partial/final agg pair keyed on the chunk text. No cartesian, no
    per-word shuffle."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["paragraph_dedup"](spark, SF)
    s = P.explain_str(df)
    assert "CartesianProduct" not in s
    assert "Window" not in s
    assert P.n_exchanges(df) <= 2


def test_contamination_plan_broadcasts_eval_side(spark):
    """Contamination: the benchmark (eval) gram set broadcasts onto the
    train grams — the corpus is never shuffled by raw shingle for the
    probe join; remaining exchanges key on doc_id/(doc_id, shingle)."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["benchmark_contamination"](spark, SF)
    s = P.explain_str(df)
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s


def test_repetition_quality_plan_zero_exchange(spark):
    """Both Gopher repetition signals are per-row higher-order array
    expressions: the whole query is a narrow map over the documents
    scan — zero exchanges, no explode-regroup of (doc_id, bigram)."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["repetition_quality"](spark, SF)
    assert P.n_exchanges(df) == 0
    s = P.explain_str(df)
    assert "Generate" not in s          # no explode at all


def test_pdf_sink_source_plan_narrow_maps(spark, corpus_paths):
    """docs_to_pdf -> pdf_extract_text is two chained MapInPandas stages
    over the documents scan: zero exchanges — at 100 TB each task
    writes/parses only its own split's PDFs."""
    from org_dharts_dia_tesseract_spark.operators.pdf import (
        docs_to_pdf, pdf_extract_text)
    docs = spark.read.parquet(corpus_paths[0])
    df = pdf_extract_text(docs_to_pdf(docs))
    assert P.n_exchanges(df) == 0


def test_line_dedup_global_plan_broadcasts_dup_set(spark):
    """Corpus-level line dedup: the corpus-frequent-chunk set (the
    boilerplate) joins back as a BROADCAST onto the chunk stream; the
    probe side is never shuffled by chunk text. Wide exchanges remain
    for the dup-set aggregation and the per-doc reassembly only."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    df = spark_queries()["line_dedup_global"](spark, SF)
    s = P.explain_str(df)
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    assert "SortMergeJoin" not in s     # probe join must not shuffle


def test_connected_components_round_is_one_join_one_agg(spark):
    """One CC round = one equi-join (edges x labels) + one
    map-side-combinable min-agg; no cartesian, no window. (The loop
    localCheckpoints per round, so lineage never grows — asserted here
    by checkpointing being the plan root's input.)"""
    from org_dharts_dia_tesseract_spark.operators.dedup import \
        connected_components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["id_a", "id_b"])
    labels = connected_components(pairs, max_iter=5)
    # after the loop the result reads from the checkpoint, not the
    # original join tree: the plan must be flat (scan-shaped, no join)
    s = P.explain_str(labels)
    assert "Join" not in s
    assert "Exchange" not in s


def test_global_rank_queries_have_no_single_partition_window(spark):
    """ntile_price_quartiles / percent_rank_prices (the two formerly
    'weak' plans): the global ORDER BY window is replaced by two-pass
    range-partitioned rank, so the downstream plan has NO WindowExec at
    all (a no-partition window would log 'No Partition Defined' and
    collapse onto one task). The rangepartitioning exchange +
    MapInPandas numbering run EAGERLY into a localCheckpoint (one
    pinned materialization keeps the _pid->offset mapping aligned and
    is GC-cleaned, unlike a persist), so the visible plan reads the
    checkpoint RDD and joins the broadcast prefix offsets."""
    from org_dharts_dia_tesseract_spark.operators.windows import \
        global_rank
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    from org_dharts_dia_tesseract_spark.sources.tables import load_table
    qs = spark_queries()
    for name in ("ntile_price_quartiles", "percent_rank_prices"):
        df = qs[name](spark, SF)
        s = P.explain_str(df)
        assert "Window" not in s, name
        assert "ExistingRDD" in s, name         # the checkpointed pass
        assert "BroadcastHashJoin" in s, name
    # the eager pass itself carries the range exchange + numbering: pin
    # its shape on the pre-checkpoint frame
    part = load_table(spark, SF, "part").select("p_partkey", "p_retailprice")
    ranked, total = global_rank(part, ["p_retailprice", "p_partkey"])
    pre = (part.repartitionByRange(8, "p_retailprice", "p_partkey")
           .sortWithinPartitions("p_retailprice", "p_partkey"))
    s = P.explain_str(pre)
    assert "rangepartitioning" in s
    assert total == part.count()
