import json
import os
import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    env = dict(os.environ, PYTHONPATH="/root/repo")
    idx = str(tmp_path_factory.mktemp("cliidx"))
    qf = str(tmp_path_factory.mktemp("q") / "queries.txt")
    with open(qf, "w") as f:
        f.write("Q1:join hash\nQ2:the\nmerge customer\n")
    r = subprocess.run(
        [sys.executable, "-m", "pisa_ray", "--num-cpus", "4", "build",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", idx, "--text-col", "text", "--num-shards", "2"],
        env=env, capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["num_docs"] == 500
    return env, idx, qf


def _run(env, *args):
    return subprocess.run([sys.executable, "-m", "pisa_ray", *args],
                          env=env, capture_output=True, text=True,
                          cwd="/root/repo")


def test_cli_query(cli_env):
    env, idx, qf = cli_env
    r = _run(env, "--num-cpus", "4", "query", "--index", idx,
             "--queries", qf, "-k", "3")
    assert r.returncode == 0
    lines = [l for l in r.stdout.splitlines() if l.startswith("Q1\t")]
    assert len(lines) == 3


def test_cli_evaluate_trec(cli_env, tmp_path):
    env, idx, qf = cli_env
    out = str(tmp_path / "run.txt")
    r = _run(env, "--num-cpus", "4", "evaluate", "--index", idx,
             "--queries", qf, "-k", "3", "--run-id", "rx",
             "--output", out, "--concurrency", "2")
    assert r.returncode == 0, r.stderr[-1500:]
    lines = open(out).read().splitlines()
    assert all(len(l.split()) == 6 and l.split()[1] == "Q0"
               and l.split()[5] == "rx" for l in lines)


def test_cli_thresholds_and_bench(cli_env):
    env, idx, qf = cli_env
    r = _run(env, "--num-cpus", "4", "thresholds", "--index", idx,
             "--queries", qf, "-k", "5")
    assert r.returncode == 0 and len(r.stdout.splitlines()) == 3
    r = _run(env, "--num-cpus", "4", "bench-queries", "--index", idx,
             "--queries", qf, "--runs", "1")
    assert r.returncode == 0
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert {"mean_us", "q50_us", "q99_us"} <= set(stats)


def test_cli_bad_algorithm(cli_env):
    env, idx, qf = cli_env
    r = _run(env, "query", "--index", idx, "--queries", qf,
             "--algorithm", "nope")
    assert r.returncode != 0
    assert "invalid choice" in r.stderr
