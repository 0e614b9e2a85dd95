"""SemDeDup (cluster-then-prune semantic dedup): greedy leader kernel
semantics, the cluster-cap skew guard, Spark/single-process twin
equality, and the one-exchange plan shape."""
from __future__ import annotations

import re

import numpy as np
import pytest

from org_dharts_dia_tesseract_spark.operators.similarity import (
    _as_f64, _centroid_dists, _kmeans_np, _semdedup_prune_np, semdedup)


def _unit(*vs):
    X = np.array(vs, dtype=np.float64)
    return X / np.sqrt((X * X).sum(axis=1, keepdims=True))


class TestPruneKernel:
    def test_lowest_id_wins(self):
        """Two near-identical vectors: the lower id is the leader."""
        X = _unit([1, 0, 0], [1, 1e-4, 0], [0, 1, 0])
        kept = _semdedup_prune_np(np.array([7, 3, 9]), X, 0.95)
        assert kept == [3, 9]   # id 3 leads its group; 7 is its dup

    def test_drops_compare_to_kept_only(self):
        """Chain a~b, b~c, a!~c: b drops against leader a, but c is
        compared to KEPT vectors only (a), so c survives — the rule
        that keeps greedy leader pruning deterministic and
        non-transitive (a dropped vector never suppresses others)."""
        a = np.array([1.0, 0.0])
        b = np.array([np.cos(0.25), np.sin(0.25)])    # cos(a,b) ~ .969
        c = np.array([np.cos(0.50), np.sin(0.50)])    # cos(b,c) ~ .969
        X = _unit(a, b, c)                            # cos(a,c) ~ .878
        kept = _semdedup_prune_np(np.array([1, 2, 3]), X, 0.95)
        assert kept == [1, 3]

    def test_zero_norm_always_kept_never_leader(self):
        """Zero vectors have no direction (cosine NULL semantics):
        kept unconditionally, and they suppress nothing."""
        X = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1e-6], [0.0, 0.0]])
        kept = _semdedup_prune_np(np.array([1, 2, 3, 4]), X, 0.99)
        assert kept == [1, 2, 4]

    def test_id_order_not_input_order(self):
        """The scan is by ascending id regardless of row order."""
        X = _unit([1, 0], [1, 1e-5], [0, 1])
        k1 = _semdedup_prune_np(np.array([2, 1, 5]), X, 0.95)
        k2 = _semdedup_prune_np(np.array([1, 2, 5]),
                                X[[1, 0, 2]], 0.95)
        assert k1 == k2 == [1, 5]

    def test_threshold_boundary_inclusive(self):
        """cosine == threshold drops (>=, not >)."""
        X = _unit([1.0, 0.0], [1.0, 0.0])
        assert _semdedup_prune_np(np.array([1, 2]), X, 1.0) == [1]


@pytest.fixture(scope="module")
def emb(spark):
    from org_dharts_dia_tesseract_spark.sources.tables import load_table
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


class TestSemdedupSpark:
    def test_matches_single_process_twin(self, spark, emb):
        """Distributed output == the oracle twin's kept set (same
        shared kernels over the same vectors — the gate's contract)."""
        import pandas as pd
        import pyarrow.parquet as pq
        got = {(r["vec_id"], r["list_id"])
               for r in semdedup(emb, n_lists=4, threshold=0.35).collect()}
        et = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        order = np.argsort(et["vec_id"].to_numpy())
        ids = et["vec_id"].to_numpy()[order]
        X = _as_f64([et["embedding"][int(i)].as_py() for i in order])
        C = _kmeans_np(X, 4, 3)
        assign = _centroid_dists([list(map(float, c)) for c in C])(
            pd.Series(list(X))).argmin(axis=1)
        want = {(int(k), c) for c in range(4)
                for k in _semdedup_prune_np(ids[assign == c],
                                            X[assign == c], 0.35)}
        assert got == want and len(got) < len(ids)   # prune is live

    def test_plan_single_exchange_no_union(self, spark, emb):
        """Common case (no oversized cluster): the guard pre-pass adds
        NOTHING to the prune plan — one hash exchange on list_id, no
        Window, no Union, no second scan."""
        df = semdedup(emb, n_lists=4, threshold=0.35)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        assert "Union" not in plan and "Window" not in plan
        assert plan.count("FileScan") == 1

    def test_cluster_cap_passthrough(self, spark, emb):
        """Clusters over the cap bypass the prune unpruned (under-dedup,
        never a blown task) and the evidence lands in the observation."""
        from org_dharts_dia_tesseract_spark.operators import similarity
        out = semdedup(emb, n_lists=4, threshold=0.35, max_cluster=10)
        obs = similarity.last_semdedup_observation
        assert out.count() == emb.count()           # nothing pruned
        assert obs["passthrough_clusters"] == 4
        assert obs["passthrough_rows"] == emb.count()
        assert obs["max_cluster_seen"] > 10

    def test_cap_zero_raises(self, spark, emb):
        with pytest.raises(ValueError, match="max_cluster"):
            semdedup(emb, max_cluster=0)

    def test_realistic_threshold_prunes_planted_dups(self, spark):
        """Planted near-dup pairs at a production threshold (0.95):
        exactly the higher id of each planted pair is dropped."""
        rng = np.random.default_rng(11)
        base = rng.normal(0, 1, (40, 16)).astype(np.float32)
        rows = [(i, [float(v) for v in base[i]]) for i in range(40)]
        # ids 100/101/102 are jittered copies of vectors 0/1/2
        for j in range(3):
            dup = base[j] + rng.normal(0, 1e-3, 16).astype(np.float32)
            rows.append((100 + j, [float(v) for v in dup]))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        kept = {r["vec_id"]
                for r in semdedup(df, n_lists=2,
                                  threshold=0.95).collect()}
        assert kept == set(range(40))   # originals kept, dups dropped


class TestSemdedupIndexed:
    def test_indexed_matches_in_memory(self, spark, emb, tmp_path):
        """semdedup over a persisted IVF index == semdedup run with the
        index's centroids: the stored assignment replaces the
        train+assign front half without changing the kept set."""
        from org_dharts_dia_tesseract_spark.operators.similarity import (
            ivf_write_index, semdedup_indexed)
        path = str(tmp_path / "ivf")
        centroids = ivf_write_index(emb, path, n_lists=4)
        want = {(r["vec_id"], r["list_id"]) for r in
                semdedup(emb, threshold=0.35,
                         centroids=centroids).collect()}
        got = {(r["vec_id"], r["list_id"]) for r in
               semdedup_indexed(spark, path, threshold=0.35).collect()}
        assert got == want and len(got) < emb.count()

    def test_indexed_plan_has_no_assignment_stage(self, spark, emb,
                                                  tmp_path):
        """The read path never re-assigns: no ArrowEvalPython (the
        broadcast-model assignment UDF) anywhere in the plan — one
        parquet scan, one exchange, the prune."""
        from org_dharts_dia_tesseract_spark.operators.similarity import (
            ivf_write_index, semdedup_indexed)
        path = str(tmp_path / "ivf")
        ivf_write_index(emb, path, n_lists=4)
        df = semdedup_indexed(spark, path, threshold=0.35)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        assert "Union" not in plan and "Window" not in plan
