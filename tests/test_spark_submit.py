"""End-to-end deploy-mode test: the north rule's `spark-submit
--py-files` path, driven exactly as a cluster operator would.

The package travels ONLY via --py-files (the job runs from a scratch cwd
with no copy of the repo on sys.path), output is the checkpointed
Iceberg-style layout, and a second identical submit proves resume: every
bucket is skipped and the data is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "org_dharts_dia_tesseract_spark")
SCRIPT = os.path.join(REPO, "scripts", "submit_extract.py")
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _make_zip(tmp_path) -> str:
    zpath = str(tmp_path / "dia_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(PKG):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join("org_dharts_dia_tesseract_spark",
                                       os.path.relpath(full, PKG))
                    z.write(full, rel)
    return zpath


def _submit(zpath: str, workdir: str, out_root: str) -> dict:
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=8",
           "--py-files", zpath,
           SCRIPT, "--gen-docs", "40", "--output", out_root,
           "--buckets", "4"]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=workdir,
                       env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, r.stdout[-2000:]
    return json.loads(lines[-1])


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_py_files_run_and_resume(tmp_path):
    zpath = _make_zip(tmp_path)
    workdir = str(tmp_path / "scratch")
    os.makedirs(workdir)
    out_root = str(tmp_path / "out")

    first = _submit(zpath, workdir, out_root)
    assert sorted(first["processed"]) == [0, 1, 2, 3]
    assert first["failed"] == []
    assert first["n_spans"] > 0

    con = duckdb.connect()
    n1 = con.execute(
        f"SELECT count(*) FROM '{out_root}/data/*/*.parquet'").fetchone()[0]
    assert n1 == first["n_spans"]
    listing = sorted(os.listdir(os.path.join(out_root, "manifests")))
    manifests = [n for n in listing if n.startswith("bucket-")]
    assert manifests == [f"bucket-{b}.json" for b in range(4)]
    with open(os.path.join(out_root, "manifests", "_audit.json")) as f:
        assert json.load(f)["n_dangling_media_refs"] == 0
    for name in manifests:
        with open(os.path.join(out_root, "manifests", name)) as f:
            m = json.load(f)
        assert m["status"] == "DONE"
        assert m["n_spans"] >= 0 and m["wall_ms"] >= 0
        assert m["attempt"] == 1 and m["lineage_id"]

    # identical second submit: pure resume — nothing reprocessed,
    # data identical
    hash1 = con.execute(
        f"SELECT md5(string_agg(doc_id || '|' || seq || '|' || kind || '|' "
        f"|| coalesce(text,'') || '|' || coalesce(media_ref,''), ',' "
        f"ORDER BY doc_id, seq)) FROM '{out_root}/data/*/*.parquet'"
    ).fetchone()[0]
    second = _submit(zpath, workdir, out_root)
    assert second["processed"] == []
    assert sorted(second["skipped"]) == [0, 1, 2, 3]
    hash2 = con.execute(
        f"SELECT md5(string_agg(doc_id || '|' || seq || '|' || kind || '|' "
        f"|| coalesce(text,'') || '|' || coalesce(media_ref,''), ',' "
        f"ORDER BY doc_id, seq)) FROM '{out_root}/data/*/*.parquet'"
    ).fetchone()[0]
    assert hash1 == hash2
