"""Tests for the widened operator surface: sinks, cursor-window parity,
dedup/similarity APIs, multimodal plumbing, checkpoint resume."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from org_dharts_dia_tesseract_spark import datagen
from org_dharts_dia_tesseract_spark.operators import analyze_documents
from org_dharts_dia_tesseract_spark.operators import dedup as D
from org_dharts_dia_tesseract_spark.operators import multimodal as M
from org_dharts_dia_tesseract_spark.operators import similarity as S
from org_dharts_dia_tesseract_spark.operators import sinks as K
from org_dharts_dia_tesseract_spark.operators import windows as W
from org_dharts_dia_tesseract_spark.oracle import analyze_page
from org_dharts_dia_tesseract_spark.oracle.iterator import RecognitionCursor
from org_dharts_dia_tesseract_spark.sources import corpus_tables

N_DOCS = 20


@pytest.fixture(scope="module")
def hier(spark):
    docs_df, media_df = corpus_tables(spark, N_DOCS)
    h = analyze_documents(docs_df, media_df).cache()
    h.count()
    return h


@pytest.fixture(scope="module")
def corpus_small(spark):
    d, m = corpus_tables(spark, N_DOCS)
    return d.cache(), m.cache()


# -- sinks ----------------------------------------------------------------

def test_page_text_matches_oracle(hier):
    got = {r["media_ref"]: r["page_text"]
           for r in K.page_text(hier).collect()}
    _, media = datagen.make_corpus(N_DOCS)
    from org_dharts_dia_tesseract_spark.oracle.page import decode_payload
    checked = 0
    for m in media[:15]:
        img = decode_payload(m["payload"], m["width"], m["height"], m["bands"])
        exp = analyze_page(img).page_text()
        if exp:
            assert got[m["media_ref"]] == exp
            checked += 1
    assert checked > 0


def test_mean_conf_and_word_confs(hier):
    mc = K.mean_text_conf(hier).collect()
    assert len(mc) > 0
    assert all(0 <= r["mean_conf"] <= 100 for r in mc)
    wc = K.all_word_confidences(hier).limit(5).collect()
    for r in wc:
        assert all(0 <= c <= 100 for c in r["word_confs"])


def test_hocr_structure(hier):
    row = K.hocr(hier).first()
    h = row["hocr"]
    assert h.startswith("<div class='ocr_page'")
    assert "ocrx_word" in h and "bbox" in h and "x_wconf" in h


def test_box_text_format(hier):
    row = K.box_text(hier).first()
    line = row["box_text"].split("\n")[0]
    parts = line.split(" ")
    assert len(parts) == 6 and parts[5] == "0"
    int(parts[1]); int(parts[2]); int(parts[3]); int(parts[4])


def test_merge_pages_roundtrip(spark, corpus_small):
    docs_df, media_df = corpus_small
    merged = K.merge_pages(docs_df, media_df)
    row = merged.orderBy("doc_id").first()
    assert row["n_pages"] == len(row["pages"])
    refs = [p["media_ref"] for p in row["pages"]]
    assert refs == sorted(refs, key=lambda r: int(r.rsplit("-", 1)[1]))


# -- cursor-window parity -------------------------------------------------

def _fixture_hier(spark, name):
    """Hierarchy DF for a single named fixture page."""
    img = datagen.fixture_page(name)
    res = analyze_page(img)
    rows = res.rows()
    pdf = pd.DataFrame(rows)
    for c in ("baseline_x1", "baseline_y1", "baseline_x2", "baseline_y2"):
        pdf[c] = pdf[c].astype("Int32")
    pdf.insert(0, "doc_id", "fix")
    pdf.insert(1, "media_ref", name)
    pdf.insert(2, "offset", 0)
    from org_dharts_dia_tesseract_spark.operators.extract import \
        HIERARCHY_SCHEMA
    return spark.createDataFrame(pdf[[f.name for f in HIERARCHY_SCHEMA]],
                                 HIERARCHY_SCHEMA), res


def test_window_beginning_parity_with_cursor(spark):
    df, res = _fixture_hier(spark, "simple_poetry")
    out = (W.is_at_beginning_of(df, "TEXTLINE", element="SYMBOL")
           .orderBy("seq").collect())
    cur = RecognitionCursor(res.blocks)
    flags = [cur.is_at_beginning_of("TEXTLINE")]
    while cur.next("SYMBOL"):
        flags.append(cur.is_at_beginning_of("TEXTLINE"))
    assert [r["is_at_beginning"] for r in out] == flags


def test_window_final_parity_with_cursor(spark):
    df, res = _fixture_hier(spark, "simple_poetry")
    out = (W.is_at_final_element(df, "PARA", "WORD").orderBy("seq").collect())
    cur = RecognitionCursor(res.blocks)
    flags, texts = [], []
    while True:
        flags.append(cur.is_at_final_element("PARA", "WORD"))
        texts.append(cur.get_text("WORD"))
        if not cur.next("WORD"):
            break
    assert [r["is_final"] for r in out] == flags
    assert [r["text"] for r in out] == texts


def test_level_text_and_confidence_rollups(spark):
    df, res = _fixture_hier(spark, "simple_poetry")
    bt = {r["block_id"]: r["text"]
          for r in W.level_text(df, "BLOCK").collect()}
    for i, blk in enumerate(res.blocks):
        assert bt[i] == blk.text
    bc = {r["block_id"]: r["confidence"]
          for r in W.level_confidence(df, "BLOCK").collect()}
    for i, blk in enumerate(res.blocks):
        assert abs(bc[i] - blk.confidence) < 0.01


def test_level_seq_dense(spark):
    df, _ = _fixture_hier(spark, "two_column")
    rows = W.with_level_seq(df, "BLOCK").orderBy("level_seq").collect()
    assert [r["level_seq"] for r in rows] == list(range(len(rows)))


# -- dedup / similarity APIs ---------------------------------------------

def test_exact_dedup_api(spark):
    df = spark.createDataFrame(
        [("a", "same text"), ("b", "same text"), ("c", "other")],
        "doc_id string, text string")
    out = D.exact_dedup(df).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["n_copies"]) for r in out] == [("a", 2), ("c", 1)]


def test_minhash_dedup_api(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "sleepy")
    far = "completely different words in this unrelated document here"
    df = spark.createDataFrame(
        [("a", base), ("b", base), ("c", near), ("d", far)],
        "doc_id string, text string")
    cand = D.minhash_lsh_candidates(df, n_hashes=8, bands=4)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert ("a", "b") in pairs
    assert not any("d" in p for p in pairs)
    kept = {r["doc_id"] for r in D.minhash_dedup(df).select("doc_id").collect()}
    assert "a" in kept and "b" not in kept and "d" in kept


def test_simhash_near_dup(spark):
    df = spark.createDataFrame(
        [("a", "alpha beta gamma delta"), ("b", "alpha beta gamma delta"),
         ("c", "zeta eta theta iota")],
        "doc_id string, text string")
    out = {r["doc_id"]: r["simhash"] for r in D.simhash(df).collect()}
    assert out["a"] == out["b"]
    assert out["a"] != out["c"]
    assert 0 <= out["a"] < 2 ** 32


def test_jaccard_pairs_api(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [("a", base + " alpha"), ("b", base + " beta"),
         ("c", "cold warm hot cool mild dry wet damp")],
        "doc_id string, text string")
    out = D.jaccard_pairs(df, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [("a", "b")]
    # word sets: 13 each, 12 common -> J = 12/14
    assert abs(out[0]["jaccard"] - 12 / 14) < 1e-3


def test_jaccard_hot_word_bounded(spark):
    """Scale-killer regression (VERDICT round 1): a corpus-wide hot word
    must not create candidate pairs by itself. 40 documents all share
    'the' but are otherwise pairwise-disjoint: the old word-equality
    self-join would emit C(40,2)=780 grouped pairs; the LSH-banded path
    must emit candidates only for genuinely similar docs."""
    base = ("the quick brown fox jumps over the lazy dog while the calm "
            "grey owl watches from the old oak tree near the quiet river "
            "bank at dusk")
    rows = [("near_a", base + " today"), ("near_b", base + " tonight")]
    rows += [(f"d{i:02d}",
              f"the w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h")
             for i in range(38)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    cand = D.minhash_lsh_candidates(df, n_hashes=8, bands=4)
    n_cand = cand.count()
    assert n_cand < 40, f"hot word blew up candidates: {n_cand}"
    pairs = {(r["id_a"], r["id_b"])
             for r in D.jaccard_pairs(df, threshold=0.5).collect()}
    assert pairs == {("near_a", "near_b")}


def test_simhash_near_dup_pairs_api(spark):
    df = spark.createDataFrame(
        [("a", "alpha beta gamma delta epsilon zeta eta theta"),
         ("b", "alpha beta gamma delta epsilon zeta eta iota"),
         ("c", "one two three four five six seven eight")],
        "doc_id string, text string")
    out = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in D.simhash_near_dup_pairs(df, max_hamming=3).collect()}
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(df).collect()}
    true_ham = bin(sh["a"] ^ sh["b"]).count("1")
    if true_ham <= 3:
        assert out[("a", "b")] == true_ham
    assert ("a", "c") not in out and ("b", "c") not in out
    with pytest.raises(ValueError):
        D.simhash_near_dup_pairs(df, max_hamming=9)


def test_similarity_brute_vs_lsh(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 16)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qs = (emb.where(F.col("vec_id") < 2)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_emb")))
    bf = S.brute_force_topk(emb, qs, k=3)
    got = {(r["q_id"], r["rk"]): r["vec_id"] for r in bf.collect()}
    # numpy oracle
    import numpy.linalg as la
    for q in range(2):
        sims = vecs @ vecs[q] / (la.norm(vecs, axis=1) * la.norm(vecs[q]))
        order = [i for i in np.argsort(-sims) if i != q][:3]
        assert [got[(q, rk)] for rk in (1, 2, 3)] == order
    # LSH variant returns a subset ranked consistently
    lsh = S.lsh_topk(emb, qs, k=3, n_planes=4, dim=16)
    for r in lsh.collect():
        assert r["vec_id"] != r["q_id"]


def test_ivf_probe_all_equals_brute_force(spark):
    """nprobe == n_lists probes every inverted list -> exact top-k."""
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 16)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qs = (emb.where(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_emb")))
    exact = {(r["q_id"], r["rk"]): r["vec_id"]
             for r in S.brute_force_topk(emb, qs, k=4).collect()}
    ivf = {(r["q_id"], r["rk"]): r["vec_id"]
           for r in S.ivf_topk(emb, qs, k=4, n_lists=4, nprobe=4).collect()}
    assert ivf == exact


def test_ivf_recall_and_determinism(spark):
    """Clustered vectors: nprobe=1 still recovers same-cluster neighbors;
    k-means training is deterministic across calls."""
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 16)) * 10
    vecs = np.concatenate([
        centers[i] + rng.normal(size=(15, 16)) * 0.1 for i in range(4)
    ]).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qs = (emb.where(F.col("vec_id").isin([0, 20, 40]))
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_emb")))
    c1 = S.kmeans_centroids(emb, n_lists=4, n_iters=3)
    c2 = S.kmeans_centroids(emb, n_lists=4, n_iters=3)
    assert c1 == c2
    exact = {(r["q_id"], r["vec_id"])
             for r in S.brute_force_topk(emb, qs, k=5).collect()}
    got = {(r["q_id"], r["vec_id"])
           for r in S.ivf_topk(emb, qs, k=5, n_lists=4, nprobe=1,
                               centroids=c1).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, recall


# -- multimodal -----------------------------------------------------------

def test_multimodal_features(spark, corpus_small):
    _, media_df = corpus_small
    feats = M.extract_features(media_df).collect()
    assert len(feats) == media_df.count()
    for r in feats[:10]:
        assert 0.0 < r["ink_ratio"] < 1.0
        assert r["n_components"] > 0
        assert r["dpi"] in (72, 96, 300)


def test_multimodal_resize(spark, corpus_small):
    _, media_df = corpus_small
    out = M.resize(media_df.limit(3), 20, 10).collect()
    for r in out:
        assert r["width"] == 20 and r["height"] == 10
        assert len(r["payload"]) == 20 * 10 * r["bands"]


def test_multimodal_codec_surface():
    """Every reference format is a real codec since round 3 (JP2 was the
    last stub) — plus PDF, which the reference rejects but the north
    rule names; unknown codecs reject with typed errors."""
    assert M.CODECS_STUBBED == ()
    assert set(M.CODECS_REAL) == {"bmp", "pnm", "tiff", "png", "gif",
                                  "jpeg", "jp2", "pdf"}
    with pytest.raises(ValueError):            # malformed jp2 payload
        M.decode(b"xx", 1, 1, 1, codec="jp2")
    with pytest.raises(ValueError):            # malformed pdf payload
        M.decode(b"xx", 1, 1, 1, codec="pdf")
    with pytest.raises(ValueError):
        M.decode(b"xx", 1, 1, 1, codec="webp")  # unknown codec


def test_frame_sample(spark, corpus_small):
    docs_df, media_df = corpus_small
    kept = M.frame_sample(docs_df, media_df, every_k=2)
    per_doc = (kept.groupBy("doc_id").count().collect())
    total = (docs_df.select(F.explode("spans").alias("s"))
             .where(F.col("s.kind") == "image").count())
    kept_n = sum(r["count"] for r in per_doc)
    assert 0 < kept_n <= total


# -- checkpoint / resume --------------------------------------------------

def test_checkpoint_resume_after_failure(spark, corpus_small, tmp_path):
    from org_dharts_dia_tesseract_spark.sources import checkpoint as C
    docs_df, media_df = corpus_small
    root = str(tmp_path / "ckpt")
    s1 = C.run_checkpointed(spark, docs_df, media_df, root, n_buckets=4,
                            fail_buckets={2})
    assert s1["failed"] == [2]
    ms = {m["bucket"]: m for m in C.metrics(root)}
    assert ms[2]["status"] == "FAILED" and ms[2]["attempt"] == 1
    assert all(ms[b]["status"] == "DONE" for b in s1["processed"])
    # resume: only the failed bucket runs; attempt increments
    s2 = C.run_checkpointed(spark, docs_df, media_df, root, n_buckets=4)
    assert s2["processed"] == [2] and s2["failed"] == []
    assert sorted(s2["skipped"]) == sorted(s1["processed"])
    ms = {m["bucket"]: m for m in C.metrics(root)}
    assert ms[2]["status"] == "DONE" and ms[2]["attempt"] == 2
    # resumed output equals a straight single run (bit-identical lineage)
    from org_dharts_dia_tesseract_spark.operators import extract_spans
    direct = (extract_spans(docs_df, media_df).toPandas()
              .sort_values(["doc_id", "seq"]).reset_index(drop=True))
    resumed = (C.read_output(spark, root)
               .select("doc_id", "seq", "kind", "text", "media_ref")
               .toPandas().sort_values(["doc_id", "seq"])
               .reset_index(drop=True))
    pd.testing.assert_frame_equal(direct, resumed)


def test_checkpoint_concurrent_buckets_identical(spark, corpus_small,
                                                 tmp_path):
    """concurrency=4 submits bucket jobs in parallel; output and
    manifests must equal the sequential run exactly."""
    from org_dharts_dia_tesseract_spark.sources import checkpoint as C
    docs_df, media_df = corpus_small
    seq_root = str(tmp_path / "seq")
    par_root = str(tmp_path / "par")
    s1 = C.run_checkpointed(spark, docs_df, media_df, seq_root,
                            n_buckets=4, audit=False)
    s2 = C.run_checkpointed(spark, docs_df, media_df, par_root,
                            n_buckets=4, audit=False, concurrency=4)
    assert s1["processed"] == s2["processed"] == [0, 1, 2, 3]
    cols = ["doc_id", "seq", "kind", "text", "media_ref"]
    a = (C.read_output(spark, seq_root).select(cols).toPandas()
         .sort_values(["doc_id", "seq"]).reset_index(drop=True))
    b = (C.read_output(spark, par_root).select(cols).toPandas()
         .sort_values(["doc_id", "seq"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    per_bucket = lambda root: {  # noqa: E731
        m["bucket"]: (m["n_docs"], m["n_spans"]) for m in C.metrics(root)}
    assert per_bucket(seq_root) == per_bucket(par_root)


def test_corrupt_payload_error_policy(spark, corpus_small, tmp_path):
    """A corrupt media payload: on_error='fail' raises (reference
    TesseractException behavior); 'dead-letter' emits one in-band
    kind='error' span for that page, leaves every other span untouched,
    and the checkpointed runner counts it in the bucket manifest."""
    from org_dharts_dia_tesseract_spark.operators import extract_spans
    from org_dharts_dia_tesseract_spark.sources import checkpoint as C
    docs_df, media_df = corpus_small
    victim = media_df.select("media_ref").first()[0]
    corrupted = media_df.withColumn(
        "payload",
        F.when(F.col("media_ref") == victim,
               F.substring("payload", 1, 7)).otherwise(F.col("payload")))

    with pytest.raises(Exception):
        extract_spans(docs_df, corrupted).count()

    out = extract_spans(docs_df, corrupted, on_error="dead-letter").cache()
    errs = out.where(F.col("kind") == "error").collect()
    assert len(errs) == 1 and errs[0]["media_ref"] == victim
    assert errs[0]["text"]          # carries the reason
    clean = extract_spans(docs_df, media_df)
    # every span not from the corrupt page is identical
    base = clean.where(F.col("media_ref").isNull()
                       | ~F.col("media_ref").startswith(victim))
    got = out.where(F.col("kind") != "error").where(
        F.col("media_ref").isNull()
        | ~F.col("media_ref").startswith(victim))
    assert got.select("doc_id", "kind", "text", "media_ref").exceptAll(
        base.select("doc_id", "kind", "text", "media_ref")).count() == 0
    out.unpersist()

    root = str(tmp_path / "ckpt_err")
    C.run_checkpointed(spark, docs_df, corrupted, root, n_buckets=2)
    ms = C.metrics(root)
    assert all(m["status"] == "DONE" for m in ms)
    assert sum(m["n_error_spans"] for m in ms) == 1


def test_page_timeout_dead_letters_and_resumes(spark, corpus_small,
                                               tmp_path):
    """Per-page time budget (TessAPI.java:464-481 timeout_millisec
    analog): a budget far below per-page cost dead-letters slow pages as
    in-band TimeoutError spans (counted in manifests, buckets still
    DONE); a later pass without the budget reprocesses nothing (DONE is
    DONE) but a fresh root without it produces a fully clean run."""
    from org_dharts_dia_tesseract_spark.operators import extract_spans
    from org_dharts_dia_tesseract_spark.sources import checkpoint as C
    docs_df, media_df = corpus_small

    # direct operator: 1ms budget forces at least one page over budget
    out = extract_spans(docs_df, media_df, on_error="dead-letter",
                        page_timeout_ms=1).cache()
    errs = out.where(F.col("kind") == "error").collect()
    assert errs, "1ms budget should dead-letter at least one page"
    assert all("time budget" in (e["text"] or "") for e in errs)
    out.unpersist()

    # checkpointed runner: budget recorded as error spans, buckets DONE
    root = str(tmp_path / "ckpt_timeout")
    s1 = C.run_checkpointed(spark, docs_df, media_df, root, n_buckets=2,
                            audit=False, page_timeout_ms=1)
    assert s1["failed"] == []
    assert sum(m["n_error_spans"] for m in C.metrics(root)) >= 1

    # a fresh unbudgeted run over the same corpus is clean + complete
    root2 = str(tmp_path / "ckpt_clean")
    C.run_checkpointed(spark, docs_df, media_df, root2, n_buckets=2,
                       audit=False)
    clean = C.read_output(spark, root2)
    assert clean.where(F.col("kind") == "error").count() == 0
    direct_n = extract_spans(docs_df, media_df).count()
    assert clean.count() == direct_n


def test_binary_file_media_source(spark, corpus_small, tmp_path):
    """Loose-file media via the binaryFile data source must feed the
    pipeline identically to the parquet media table (S1 file-scan
    parity)."""
    from org_dharts_dia_tesseract_spark.operators import extract_spans
    from org_dharts_dia_tesseract_spark.sources.tables import (
        dump_media_files, load_media_files)
    docs_df, media_df = corpus_small
    d = str(tmp_path / "loose_media")
    n = dump_media_files(media_df, d)
    loaded = load_media_files(spark, d)
    assert loaded.count() == n == media_df.count()
    cols = ["doc_id", "seq", "kind", "text", "media_ref"]
    via_files = (extract_spans(docs_df, loaded).select(cols)
                 .toPandas().sort_values(["doc_id", "seq"])
                 .reset_index(drop=True))
    via_parquet = (extract_spans(docs_df, media_df).select(cols)
                   .toPandas().sort_values(["doc_id", "seq"])
                   .reset_index(drop=True))
    pd.testing.assert_frame_equal(via_files, via_parquet)


def test_dangling_media_audit(spark, corpus_small, tmp_path):
    """A missing media row must be surfaced by the audit (the inner-join
    hot path would drop its span silently), and a complete corpus audits
    clean."""
    from org_dharts_dia_tesseract_spark.operators.extract import \
        audit_dangling_media
    from org_dharts_dia_tesseract_spark.sources import checkpoint as C
    docs_df, media_df = corpus_small
    assert audit_dangling_media(docs_df, media_df).count() == 0
    victim = media_df.select("media_ref").first()[0]
    holed = media_df.where(F.col("media_ref") != victim)
    rows = audit_dangling_media(docs_df, holed).collect()
    assert [r["media_ref"] for r in rows] == [victim]
    # the checkpointed runner records it in the run-level audit manifest
    root = str(tmp_path / "ckpt_audit")
    C.run_checkpointed(spark, docs_df, holed, root, n_buckets=2)
    a = C.audit(root)
    assert a["n_dangling_media_refs"] == 1
    assert a["sample"][0]["media_ref"] == victim


def test_page_items_records(hier):
    """PageItem/PageBlock record form (examples/PageItem.java:26-55,
    PageBlock.java:26-48): deterministic uuid-shaped ids, correct parent
    linkage, block-only type/orientation columns."""
    import re
    items = K.page_items(hier).cache()
    some = items.limit(20).collect()
    assert all(re.fullmatch(r"[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}",
                            r["item_id"]) for r in some)
    # ids unique; blocks have no parent, everything else does
    assert items.count() == items.select("item_id").distinct().count()
    assert items.where((F.col("level") == "BLOCK")
                       & F.col("parent_id").isNotNull()).count() == 0
    assert items.where((F.col("level") != "BLOCK")
                       & F.col("parent_id").isNull()).count() == 0
    # every parent_id resolves to an existing item of the level above
    child = items.where(F.col("level") == "WORD").select(
        F.col("parent_id").alias("item_id"))
    lines = items.where(F.col("level") == "TEXTLINE").select("item_id")
    assert child.distinct().exceptAll(lines).count() == 0
    # PageBlock columns only on blocks
    assert items.where((F.col("level") != "BLOCK")
                       & F.col("block_type").isNotNull()).count() == 0
    assert items.where((F.col("level") == "BLOCK")
                       & F.col("orientation").isNull()).count() == 0
    # deterministic: rebuilding yields the same id set
    again = K.page_items(hier)
    assert items.select("item_id").exceptAll(
        again.select("item_id")).count() == 0
    items.unpersist()


def test_hierarchy_justification_column(hier):
    """PARA rows of text blocks carry a justification from the closed
    vocabulary; the corpus renderer left-aligns, so multi-line paras are
    LEFT; non-PARA rows are NULL."""
    paras = hier.where((F.col("level") == "PARA") & ~F.col("is_virtual"))
    vocab = {r["justification"] for r in
             paras.select("justification").distinct().collect()}
    assert vocab <= {"LEFT", "CENTER", "RIGHT", "UNKNOWN"}
    multi = (hier.where(F.col("level") == "TEXTLINE")
             .groupBy("media_ref", "block_id", "para_id")
             .count().where(F.col("count") >= 2))
    lj = (paras.join(multi, ["media_ref", "block_id", "para_id"])
          .select("justification").distinct().collect())
    assert {r["justification"] for r in lj} == {"LEFT"}
    assert hier.where((F.col("level") != "PARA")
                      & F.col("justification").isNotNull()).count() == 0


# -- hierarchy enrichment (I8/R3-R6 distributed) --------------------------

def test_hierarchy_enrichment_columns(hier):
    blocks = hier.where(F.col("level") == "BLOCK")
    assert blocks.where(F.col("orientation").isNull()).count() == 0
    assert {r["orientation"] for r in
            blocks.select("orientation").distinct().collect()} <= {"UP", "RIGHT"}
    words = hier.where((F.col("level") == "WORD") & ~F.col("is_virtual"))
    some = words.limit(50).collect()
    assert all(r["font_name"] == "atlas-5x7" for r in some)
    assert all(r["font_pointsize"] > 0 for r in some)
    assert any(r["is_dictionary_word"] for r in some)
    # virtual words of non-text blocks carry no font/flags
    virt = hier.where((F.col("level") == "WORD") & F.col("is_virtual"))
    if virt.count():
        assert virt.where(F.col("font_name").isNotNull()).count() == 0
    syms = hier.where(F.col("level") == "SYMBOL").limit(20).collect()
    for r in syms:
        assert r["is_subscript"] is not None


def test_level_font_attributes_full_surface(spark, hier):
    """All 9 FontAttributes.java:28-59 fields surface as columns at WORD
    level and roll up as the first word's attrs at higher levels (R3)."""
    wf = W.level_font_attributes(hier, "WORD")
    assert set(W.FONT_ATTR_COLS) <= set(wf.columns)
    assert len(W.FONT_ATTR_COLS) == 9
    rows = wf.limit(5).collect()
    assert rows and all(r["font_name"] == "atlas-5x7" for r in rows)
    lf = W.level_font_attributes(hier, "TEXTLINE")
    one = lf.limit(1).collect()[0]
    # the line reports its first word's attrs
    first_word = (hier.where((F.col("level") == "WORD")
                             & (F.col("doc_id") == one["doc_id"])
                             & (F.col("media_ref") == one["media_ref"])
                             & (F.col("block_id") == one["block_id"])
                             & (F.col("para_id") == one["para_id"])
                             & (F.col("line_id") == one["line_id"]))
                  .orderBy("seq").limit(1).collect()[0])
    for c in W.FONT_ATTR_COLS:
        assert one[c] == first_word[c], c


def test_lsh_topk_dim256_no_dim_arg(spark):
    """High-dim LSH: dim inferred executor-side from the Arrow batch (no
    driver .first() job, no giant Catalyst expression tree)."""
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(30, 256)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qs = (emb.where(F.col("vec_id") < 2)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_emb")))
    out = S.lsh_topk(emb, qs, k=3, n_planes=6)       # dim omitted entirely
    got = out.collect()
    assert all(r["rk"] <= 3 for r in got)
    # bucketed candidates only: every result shares the query's signature
    sigs = {r["vec_id"]: r["sig"] for r in
            emb.withColumn(
                "sig", S.hyperplane_signature("embedding", 6)).collect()}
    qsigs = {r["q_id"]: r["sig"] for r in
             qs.withColumn(
                 "sig", S.hyperplane_signature("q_emb", 6)).collect()}
    for r in got:
        assert sigs[r["vec_id"]] == qsigs[r["q_id"]]
    # declared-dim validation surfaces a clear executor error
    with pytest.raises(Exception, match="dim"):
        S.lsh_topk(emb, qs, k=3, n_planes=6, dim=64).collect()


def test_page_items_repeated_media_distinct_ids(spark, hier):
    """A document that references the same media_ref at two offsets must
    produce distinct item ids (offset is part of the id hash)."""
    twice = hier.unionByName(hier.withColumn("offset", F.col("offset") + 7))
    items = K.page_items(twice)
    assert items.count() == 2 * hier.count()
    assert items.select("item_id").distinct().count() == items.count()


def test_unlv_text_sink(hier):
    """GetUNLVText (TessAPI.java:505-512): reject '~' replaces
    low-confidence symbols, '^' prefixes suspect words, line structure
    preserved."""
    out = K.unlv_text(hier)
    rows = out.collect()
    assert rows and all(r["unlv_text"] for r in rows)
    # with an impossible reject bar every symbol renders as '~'
    allrej = K.unlv_text(hier, reject_below=101.0).first()["unlv_text"]
    stripped = allrej.replace("~", "").replace("^", "") \
        .replace(" ", "").replace("\n", "")
    assert stripped == ""
    # with no thresholds the text equals the plain word rollup per line
    clean = K.unlv_text(hier, reject_below=0.0, suspect_below=0.0)
    one = clean.first()
    plain = (hier.where((F.col("level") == "WORD")
                        & (F.col("doc_id") == one["doc_id"])
                        & (F.col("media_ref") == one["media_ref"])
                        & F.col("text").isNotNull())
             .orderBy("seq").collect())
    assert " ".join(
        w["text"] for w in plain) == one["unlv_text"].replace("\n", " ")


def test_page_osd_detects_rotations(spark):
    """Real 4-way OSD: rotated page payloads are detected with the right
    rotation and the upright page scores highest confidence."""
    import numpy as np
    from org_dharts_dia_tesseract_spark.oracle.page import detect_page_osd
    img = datagen.fixture_page("simple_poetry")
    for k, expect in enumerate(("UP", "RIGHT", "DOWN", "LEFT")):
        # payload rotated k*90 clockwise needs k*90 anticlockwise to upright
        rot = np.ascontiguousarray(np.rot90(img, -k))
        osd = detect_page_osd(rot)
        assert osd["rotation_degrees"] == k * 90, (k, osd)
        assert osd["orientation"] == expect
        assert osd["osd_confidence"] > 50
    # distributed twin over the corpus (all pages upright by construction)
    from org_dharts_dia_tesseract_spark.operators import page_osd
    docs_df, media_df = corpus_tables(spark, 8)
    rows = page_osd(docs_df, media_df).collect()
    assert rows and all(r["orientation"] == "UP"
                        and r["rotation_degrees"] == 0 for r in rows)


def test_simhash64_near_dup(spark):
    """64-bit fingerprints (16-bit bands — the web-scale width): same
    near-dup detection semantics, fingerprint lives in a signed bigint."""
    df = spark.createDataFrame(
        [("a", "alpha beta gamma delta epsilon zeta eta theta"),
         ("b", "alpha beta gamma delta epsilon zeta eta iota"),
         ("c", "one two three four five six seven eight")],
        "doc_id string, text string")
    sh = {r["doc_id"]: r["simhash"]
          for r in D.simhash(df, bits=64).collect()}
    assert sh["a"] != sh["c"]
    out = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in D.simhash_near_dup_pairs(df, bits=64).collect()}
    true_ham = bin((sh["a"] ^ sh["b"]) & (2**64 - 1)).count("1")
    if true_ham <= 3:
        assert out[("a", "b")] == true_ham
    assert ("a", "c") not in out


def test_ivf_indexed_matches_in_memory(spark, tmp_path):
    """Persisted-index IVF search: same results as the in-memory path,
    probe reads only the probed list partitions."""
    rng = np.random.default_rng(31)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qs = (emb.where(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_emb")))
    path = str(tmp_path / "ivf")
    cents = S.ivf_write_index(emb, path, n_lists=4)
    got = {(r["q_id"], r["rk"]): r["vec_id"]
           for r in S.ivf_topk_indexed(spark, path, qs, k=5,
                                       nprobe=4).collect()}
    mem = {(r["q_id"], r["rk"]): r["vec_id"]
           for r in S.ivf_topk(emb, qs, k=5, n_lists=4, nprobe=4,
                               centroids=cents).collect()}
    assert got == mem and len(got) == 15
    # nprobe=1 reads a strict subset of partitions (plan prunes)
    from org_dharts_dia_tesseract_spark import plans as P
    df1 = S.ivf_topk_indexed(spark, path, qs, k=5, nprobe=1)
    assert "PartitionFilters" in P.explain_str(df1)


def test_connected_components_non_convergence_raises(spark):
    """Exhausting max_iter with labels still moving must fail typed, not
    return silently-wrong clusters (a chain of length 7 needs more than
    one hash-min round)."""
    chain = spark.createDataFrame([(i, i + 1) for i in range(6)],
                                  ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(chain, max_iter=1)
    ok = D.connected_components(chain).collect()
    assert {r["cluster_id"] for r in ok} == {0}


def test_star_components_match_hashmin(spark):
    """large-star/small-star contraction must produce exactly the
    hash-min labels on an arbitrary pair graph (two components + a
    triangle + an isolated edge)."""
    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (9, 1), (3, 7), (7, 11), (20, 21)],
        ["id_a", "id_b"])
    hm = {(r["id"], r["cluster_id"])
          for r in D.connected_components(pairs).collect()}
    st = {(r["id"], r["cluster_id"])
          for r in D.connected_components_star(pairs).collect()}
    assert st == hm
    assert {c for _, c in st} == {1, 3, 20}


def test_star_components_handle_deep_chains(spark):
    """The escape hatch's reason to exist: a 64-link chain needs 64
    hash-min rounds (the 25-round budget fails typed) but only
    O(log n) alternating star rounds."""
    chain = spark.createDataFrame([(i, i + 1) for i in range(64)],
                                  ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(chain, max_iter=25)
    got = D.connected_components_star(chain, max_iter=12).collect()
    assert len(got) == 65
    assert all(r["cluster_id"] == 0 for r in got)


def test_page_deadline_restores_foreign_timer():
    """ITIMER_REAL is process-wide: _page_deadline must hand back any
    timer another owner had running (shrunk by the time it consumed),
    not cancel it on exit (round-4 advice)."""
    import signal
    from org_dharts_dia_tesseract_spark.operators.extract import \
        _page_deadline
    fired: list[int] = []
    old_handler = signal.signal(signal.SIGALRM,
                                lambda *a: fired.append(1))
    try:
        signal.setitimer(signal.ITIMER_REAL, 5.0)   # foreign timer
        with _page_deadline(50)():
            pass                                    # fast body
        remaining, interval = signal.getitimer(signal.ITIMER_REAL)
        assert 0 < remaining <= 5.0, "foreign timer was cancelled"
        assert interval == 0.0
        assert not fired
        # and with no foreign timer, exit leaves the timer disarmed
        signal.setitimer(signal.ITIMER_REAL, 0)
        with _page_deadline(50)():
            pass
        assert signal.getitimer(signal.ITIMER_REAL) == (0.0, 0.0)
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old_handler)


def test_minhash_bucket_cap_drops_degenerate_buckets(spark):
    """max_bucket: a 6-member identical-text bucket would emit 15 pairs;
    capped at 3 it is dropped entirely while small buckets survive."""
    rows = ([(f"d{i}", "the same boilerplate words repeated here")
             for i in range(6)]
            + [("x1", "totally unique first document text body"),
               ("x2", "totally unique first document text body")])
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = D.minhash_lsh_candidates(df, max_bucket=None).count()
    got = D.minhash_lsh_candidates(df, max_bucket=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {("x1", "x2")}
    assert uncapped > len(got)
    # the guard is ON by default (round-4 verdict: an opt-in cap guards
    # nothing at 10^12 docs), at a ceiling far above genuine buckets
    assert D.DEFAULT_MAX_BUCKET >= 64
    default_pairs = D.minhash_lsh_candidates(df).count()
    assert default_pairs == uncapped   # 6-member bucket << default cap


def test_minhash_bucket_cap_observation_logs_drops(spark):
    """The capped plan observes its drop counts: after an action,
    dedup.last_bucket_cap_observation.get reports how many band buckets
    (and member rows) the guard removed and the largest bucket seen."""
    rows = ([(f"d{i}", "the same boilerplate words repeated here")
             for i in range(6)]
            + [("x1", "totally unique first document text body"),
               ("x2", "totally unique first document text body")])
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    D.minhash_lsh_candidates(df, max_bucket=3).count()
    got = D.last_bucket_cap_observation.get
    assert got["dropped_buckets"] > 0
    assert got["dropped_rows"] >= got["dropped_buckets"] * 4
    assert got["max_bucket_seen"] == 6


def test_minhash_bucket_cap_rejects_nonpositive(spark):
    """max_bucket=0 must raise, not silently disable the guard (the
    opposite of the caller's plain intent)."""
    df = spark.createDataFrame([("a", "x y z")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="max_bucket"):
        D.minhash_lsh_candidates(df, max_bucket=0)
    with pytest.raises(ValueError, match="max_bucket"):
        D.minhash_lsh_candidates(df, max_bucket=-1)


def test_star_components_empty_and_selfloops(spark):
    """Degenerate inputs: an empty pair graph yields an empty labeling
    (first alternating round is its own fixed point), and self-loop
    pairs are dropped before contraction — only real edges label."""
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert D.connected_components_star(empty).count() == 0
    loops = spark.createDataFrame([(5, 5), (2, 3)], ["id_a", "id_b"])
    got = {(r["id"], r["cluster_id"])
           for r in D.connected_components_star(loops).collect()}
    assert got == {(2, 2), (3, 2)}
