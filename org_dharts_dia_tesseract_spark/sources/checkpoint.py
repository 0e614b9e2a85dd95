"""Checkpointed, resumable extraction runs: per-bucket manifests with
lineage + metrics (BASELINE.json north_rule: "resumable from checkpoint
with per-partition lineage + metrics").

Layout (Iceberg-style data/manifests split; plain parquet + JSON because
the sandbox ships no Iceberg runtime — the table API below is the seam
where an Iceberg catalog would slot in):

    <root>/data/bucket=<k>/*.parquet      span rows of doc-bucket k
    <root>/manifests/bucket-<k>.json      {bucket, status, n_docs, n_spans,
                                           wall_ms, attempt, lineage_id}

Buckets are `pmod(xxhash64(doc_id), n_buckets)` — stable under any
cluster size, so a resume after failure processes exactly the missing
buckets (anti-join of bucket ids against DONE manifests). Content is a
pure function of doc_id (deterministic kernels, SURVEY 4.3), so resumed
output is bit-identical to a single run.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_of(doc_id_col, n_buckets: int):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(n_buckets)).cast("int")


def _manifest_path(root: str, bucket: int) -> str:
    return os.path.join(root, "manifests", f"bucket-{bucket}.json")


def done_buckets(root: str) -> set[int]:
    mdir = os.path.join(root, "manifests")
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if m.get("status") == "DONE":
            out.add(int(m["bucket"]))
    return out


def run_checkpointed(spark: SparkSession, documents: DataFrame,
                     media: DataFrame, root: str, n_buckets: int = 16,
                     fail_buckets: set[int] | None = None,
                     audit: bool = True,
                     on_error: str = "dead-letter",
                     concurrency: int = 4,
                     page_timeout_ms: int | None = None) -> dict:
    """Run span extraction bucket-by-bucket with manifests; skips buckets
    already DONE (resume). `fail_buckets` injects failures for tests.
    `audit` records dangling media_refs (image spans whose media row is
    missing — silently unprocessable) in manifests/_audit.json.
    `on_error` defaults to 'dead-letter': a corrupt page becomes an
    in-band kind='error' span (counted per bucket in the manifest)
    instead of permanently failing its bucket on every resume.
    `page_timeout_ms` bounds each page's decode+analyze (soft SIGALRM
    deadline, the TessAPI.java:464-481 timeout_millisec analog); an
    over-budget page dead-letters as a kind='error' span counted in the
    bucket manifest instead of stalling the task.
    `concurrency` (default 4) submits that many bucket jobs at once
    (Spark's scheduler interleaves them) — a sequential driver loop
    leaves the cluster idle between jobs once bucket counts grow;
    manifests stay correct because each is an atomic per-bucket rename.

    Returns a summary dict {processed, skipped, failed}.
    """
    from ..operators.extract import audit_dangling_media, extract_spans

    os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
    if audit:
        dangling = audit_dangling_media(documents, media)
        sample = [r.asDict() for r in dangling.limit(20).collect()]
        apath = os.path.join(root, "manifests", "_audit.json")
        with open(apath + ".tmp", "w") as f:
            json.dump({"n_dangling_media_refs": dangling.count(),
                       "sample": sample,
                       "written_at": int(time.time())}, f)
        os.replace(apath + ".tmp", apath)
    docs_b = documents.withColumn("bucket", bucket_of(F.col("doc_id"), n_buckets))
    docs_b.cache()
    already = done_buckets(root)
    summary = {"processed": [], "skipped": sorted(already), "failed": []}
    lineage_id = uuid.uuid4().hex
    # ONE job for every bucket's doc count (vs a count() job per bucket):
    # the per-bucket loop then only runs the extraction write itself
    bucket_docs = {r["bucket"]: r["n"] for r in
                   docs_b.groupBy("bucket")
                   .agg(F.count("*").alias("n")).collect()}

    def run_bucket(b: int) -> tuple[int, bool]:
        attempt = 1
        prev = _manifest_path(root, b)
        if os.path.exists(prev):
            with open(prev) as f:
                attempt = int(json.load(f).get("attempt", 0)) + 1
        t0 = time.time()
        try:
            if fail_buckets and b in fail_buckets:
                raise RuntimeError(f"injected failure in bucket {b}")
            part = docs_b.where(F.col("bucket") == b).drop("bucket")
            n_docs = int(bucket_docs.get(b, 0))
            out = extract_spans(part, media, on_error=on_error,
                                page_timeout_ms=page_timeout_ms)
            out_path = os.path.join(root, "data", f"bucket={b}")
            out.write.mode("overwrite").parquet(out_path)
            written = spark.read.parquet(out_path)
            counts = written.groupBy(
                (F.col("kind") == "error").alias("is_err")).count().collect()
            n_spans = sum(r["count"] for r in counts)
            n_err = sum(r["count"] for r in counts if r["is_err"])
            manifest = {
                "bucket": b, "status": "DONE", "n_docs": n_docs,
                "n_spans": n_spans, "n_error_spans": n_err,
                "wall_ms": int((time.time() - t0) * 1000),
                "attempt": attempt, "lineage_id": lineage_id,
                "written_at": int(time.time()),
            }
            ok = True
        except Exception as e:   # noqa: BLE001 — manifest must record any failure
            manifest = {
                "bucket": b, "status": "FAILED", "error": str(e)[:500],
                "wall_ms": int((time.time() - t0) * 1000),
                "attempt": attempt, "lineage_id": lineage_id,
                "written_at": int(time.time()),
            }
            ok = False
        tmp = _manifest_path(root, b) + f".tmp{b}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, _manifest_path(root, b))   # atomic commit
        return b, ok

    todo = [b for b in range(n_buckets) if b not in already]
    if concurrency <= 1:
        results = [run_bucket(b) for b in todo]
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            results = list(pool.map(run_bucket, todo))
    for b, ok in sorted(results):
        summary["processed" if ok else "failed"].append(b)
    docs_b.unpersist()
    return summary


def read_output(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "data"))


def metrics(root: str) -> list[dict]:
    """All per-bucket manifests (the per-partition metrics surface)."""
    mdir = os.path.join(root, "manifests")
    out = []
    for name in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if name.startswith("bucket-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out


def audit(root: str) -> dict | None:
    """The run-level data-quality audit (dangling media_refs), if any."""
    apath = os.path.join(root, "manifests", "_audit.json")
    if not os.path.exists(apath):
        return None
    with open(apath) as f:
        return json.load(f)
