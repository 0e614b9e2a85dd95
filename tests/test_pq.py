"""Product quantization (the IVF-PQ memory half): kernel determinism,
ADC recall against exact inner product, and the map-side-combine plan."""
from __future__ import annotations

import numpy as np
import pytest

from org_dharts_dia_tesseract_spark.operators.similarity import (
    _as_f64, _pq_adc_ip_np, _pq_encode_np, _pq_train_np)


def _corpus(n=300, d=32, seed=4):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (6, d))
    X = centers[rng.integers(0, 6, n)] + rng.normal(0, 0.15, (n, d))
    return X.astype(np.float32).astype(np.float64)


class TestPqKernels:
    def test_train_deterministic(self):
        X = _corpus()
        a = _pq_train_np(X, m=4, ks=16)
        b = _pq_train_np(X, m=4, ks=16)
        for ca, cb in zip(a, b):
            assert np.array_equal(ca, cb)

    def test_dim_not_divisible_raises(self):
        with pytest.raises(ValueError, match="divisible"):
            _pq_train_np(_corpus(d=30), m=4, ks=8)

    def test_codes_shape_and_range(self):
        X = _corpus()
        books = _pq_train_np(X, m=4, ks=16)
        codes = _pq_encode_np(X, books)
        assert codes.shape == (300, 4)
        assert codes.min() >= 0 and codes.max() < 16
        # 32 float32 dims (128 B) -> 4 codes (4 B): the memory story

    def test_adc_shortlist_recall_against_exact(self):
        """PQ's production contract is shortlist-then-rerank: the exact
        top-5 must land inside the ADC top-30 shortlist (tight clusters
        + 8-byte codes make exact@5==adc@5 unrealistic by design — the
        quantization error is the memory saving)."""
        X = _corpus()
        books = _pq_train_np(X, m=8, ks=16)
        codes = _pq_encode_np(X, books)
        hits = total = 0
        for qi in range(10):
            exact = np.argsort(-(X @ X[qi]))
            exact = [i for i in exact if i != qi][:5]
            s = _pq_adc_ip_np(X[qi], books, codes)
            short = [i for i in np.argsort(-s) if i != qi][:30]
            hits += len(set(exact) & set(short))
            total += 5
        assert hits / total >= 0.85, hits / total
        # doubling the code budget lifts recall at a FIXED shortlist
        books16 = _pq_train_np(X, m=16, ks=16)
        codes16 = _pq_encode_np(X, books16)
        hits16 = 0
        for qi in range(10):
            exact = [i for i in np.argsort(-(X @ X[qi])) if i != qi][:5]
            s8 = _pq_adc_ip_np(X[qi], books, codes)
            s16 = _pq_adc_ip_np(X[qi], books16, codes16)
            short16 = [i for i in np.argsort(-s16) if i != qi][:20]
            hits16 += len(set(exact) & set(short16))
        assert hits16 / total >= 0.85, hits16 / total

    def test_reconstruction_better_with_more_codes(self):
        X = _corpus()
        def mse(ks):
            books = _pq_train_np(X, m=4, ks=ks)
            codes = _pq_encode_np(X, books)
            sub = X.shape[1] // 4
            rec = np.concatenate(
                [books[j][codes[:, j]] for j in range(4)], axis=1)
            return float(((X - rec) ** 2).mean())
        assert mse(16) < mse(4) < mse(2)


class TestPqOperator:
    def test_distributed_matches_twin(self, spark):
        """The Spark path (train -> encode -> ADC -> local top-k ->
        window) must equal the single-process kernel run bit-exactly —
        the same property the driver gate hashes."""
        from org_dharts_dia_tesseract_spark.operators.similarity import (
            pq_topk_adc)
        from org_dharts_dia_tesseract_spark.sources.tables import \
            load_table
        from pyspark.sql import functions as F
        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        qs = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"))
        got = {(r["q_id"], r["rk"]): (r["vec_id"], r["adc_ip"])
               for r in pq_topk_adc(emb, qs, k=4, m=8, ks=16).collect()}
        rows = sorted(emb.select("vec_id", "embedding").collect())
        ids = np.array([r[0] for r in rows])
        X = _as_f64([list(r[1]) for r in rows])
        books = _pq_train_np(X, m=8, ks=16)
        codes = _pq_encode_np(X, books)
        for qid in (0, 1, 2):
            qi = int(np.nonzero(ids == qid)[0][0])
            s = _pq_adc_ip_np(X[qi], books, codes)
            keep = [b for b in np.lexsort((ids, -s)) if ids[b] != qid][:4]
            for rk, b in enumerate(keep, start=1):
                vec, ip = got[(qid, rk)]
                assert vec == ids[b]
                assert ip == s[b]                 # bit-identical double

    def test_ivfpq_pruning_recall_and_plan(self, spark):
        """The composed path: pruned probes (nprobe=2) must agree with
        probe-all on most of the top-k (the pruning approximation), and
        the plan stays single-exchange/no-join."""
        from org_dharts_dia_tesseract_spark.operators.similarity import (
            ivfpq_topk)
        from org_dharts_dia_tesseract_spark.sources.tables import \
            load_table
        from pyspark.sql import functions as F
        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        qs = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"))
        full = ivfpq_topk(emb, qs, k=5, n_lists=8, nprobe=8)
        pruned = ivfpq_topk(emb, qs, k=5, n_lists=8, nprobe=3)
        f = {(r["q_id"], r["vec_id"]) for r in full.collect()}
        p = {(r["q_id"], r["vec_id"]) for r in pruned.collect()}
        assert len(f & p) / len(f) >= 0.5     # pruning keeps most hits
        # assert the plan on an unexecuted frame: a collected AQE plan
        # prints final+initial sections and double-counts the exchange
        fresh = ivfpq_topk(emb, qs, k=5, n_lists=8, nprobe=3)
        plan = fresh._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1 and "Join" not in plan

    def test_ivfpq_residual_beats_plain_pq(self):
        """Residual-space codebooks approximate clustered data better
        than direct PQ at the same code budget (the reason IVF-PQ
        quantizes x - centroid, not x)."""
        from org_dharts_dia_tesseract_spark.operators.similarity import (
            _ivfpq_encode_np, _ivfpq_train_np)
        X = _corpus()
        C, rbooks = _ivfpq_train_np(X, n_lists=6, m=4, ks=16)
        assign, rcodes = _ivfpq_encode_np(X, C, rbooks)
        sub = X.shape[1] // 4
        rec_r = C[assign] + np.concatenate(
            [rbooks[j][rcodes[:, j]] for j in range(4)], axis=1)
        books = _pq_train_np(X, m=4, ks=16)
        codes = _pq_encode_np(X, books)
        rec_p = np.concatenate(
            [books[j][codes[:, j]] for j in range(4)], axis=1)
        assert ((X - rec_r) ** 2).mean() < ((X - rec_p) ** 2).mean()

    def test_indexed_probe_all_bit_equals_in_memory(self, spark,
                                                    tmp_path):
        """The persisted read path (stored codes, model sidecar) at
        nprobe=n_lists must reproduce the in-memory composed path
        bit-exactly — same training sample, same kernels, so the only
        difference is WHERE the codes live."""
        from org_dharts_dia_tesseract_spark.operators.similarity import (
            ivfpq_topk, ivfpq_topk_indexed, ivfpq_write_index)
        from org_dharts_dia_tesseract_spark.sources.tables import \
            load_table
        from pyspark.sql import functions as F
        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        qs = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"))
        path = str(tmp_path / "ivfpq_index")
        ivfpq_write_index(emb, path, n_lists=8, m=8, ks=16)
        mem = {(r["q_id"], r["rk"]): (r["vec_id"], r["adc_ip"])
               for r in ivfpq_topk(emb, qs, k=4, n_lists=8,
                                   nprobe=8).collect()}
        idx = {(r["q_id"], r["rk"]): (r["vec_id"], r["adc_ip"])
               for r in ivfpq_topk_indexed(spark, path, qs, k=4,
                                           nprobe=8).collect()}
        assert idx == mem                     # bit-identical doubles

    def test_indexed_plan_prunes_and_never_encodes(self, spark,
                                                   tmp_path):
        """The read plan must (a) prune at the parquet scan via
        PartitionFilters on list_id — only probed lists are READ —
        (b) read codes, never the embedding column (no encode stage:
        exactly one MapInPandas, the scorer), (c) keep the single
        window exchange, no join."""
        from org_dharts_dia_tesseract_spark.operators.similarity import (
            ivfpq_topk_indexed, ivfpq_write_index)
        from org_dharts_dia_tesseract_spark.sources.tables import \
            load_table
        from pyspark.sql import functions as F
        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        qs = emb.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"))
        path = str(tmp_path / "ivfpq_index")
        ivfpq_write_index(emb, path, n_lists=8, m=8, ks=16)
        df = ivfpq_topk_indexed(spark, path, qs, k=3, nprobe=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        import re
        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
        assert "list_id" in pf and "IN" in pf.upper()
        assert plan.count("MapInPandas") == 1      # scorer only
        assert "embedding" not in plan             # codes, not vectors
        assert plan.count("Exchange") == 1 and "Join" not in plan
        # and the pruned result is a real approximation of probe-all:
        # fewer lists scanned, rows still k per query
        got = df.collect()
        assert {r["q_id"] for r in got} == {0, 1}

    def test_single_shuffle_plan(self, spark):
        """Corpus side: scan -> mapInPandas (encode+score+local top-k)
        -> ONE exchange for the global window. No join, no second
        shuffle."""
        from org_dharts_dia_tesseract_spark.operators.similarity import (
            pq_topk_adc)
        from org_dharts_dia_tesseract_spark.sources.tables import \
            load_table
        from pyspark.sql import functions as F
        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        qs = emb.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"))
        df = pq_topk_adc(emb, qs, k=3, m=8, ks=16)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "Join" not in plan
