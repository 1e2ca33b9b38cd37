"""Smoke test for the cluster job entrypoint (jobs/build_job.py) — the
script runs in its own process with its own local Ray, prints the metrics
JSON line, and --check verifies the finished index."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

from tests.oracle import make_corpus


def test_build_job_with_check(tmp_path):
    texts = make_corpus(30)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }), str(src / "docs.parquet"))
    out = str(tmp_path / "idx")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_ADDRESS="local", PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, "jobs/build_job.py", "--input", str(src),
         "--output", out, "--text-col", "text", "--id-col", "doc_id",
         "--url-col", "", "--num-shards", "2", "--check"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(ln) for ln in r.stdout.splitlines()
             if ln.startswith("{")]
    metrics = lines[0]
    assert metrics["num_docs"] == len(texts)
    assert metrics["docs_per_sec"] > 0
    assert lines[-1]["check_ok"] is True
