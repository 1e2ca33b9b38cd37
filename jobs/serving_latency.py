"""Steal-gated serving-latency probe at 6M docs (round-4 verdict task #8).

Measures warm per-query latency of the vectorized serving kernels
against a bench-built 6M-page index (`bench.py --scaling` leaves one at
/tmp/pisa_ray_bench_index_{8,2}), the single-process analogue of the
reference's `queries.cpp` bench loop (warmup pass + timed repeats,
`tools/queries.cpp:70-115`).  Two query classes over the bench vocab:

* hot     — "thecommon" (df ≈ 90% of docs) + a mid-frequency term: the
            worst-case accumulator scan BMW-style block skipping prunes.
* typical — 2-4 mid-frequency terms, the common case.

Prints one JSON line with per-class mean/p50/p95 ms for block_max_taat
(the engine's fast path; rank-identity vs exhaustive is pinned by
tests + the bm25_topk_bmt driver entry) and taat_maxscore as the
unpruned comparator, plus /proc/stat steal observed during the timed
window so a polluted run is visible in the artifact.

Usage: python jobs/serving_latency.py [index_dir]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _percentile(xs, p):
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, int(round(p / 100 * (len(xs) - 1)))))
    return xs[i]


def main() -> int:
    index_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/pisa_ray_bench_index_8"
    if not os.path.exists(os.path.join(index_dir, "stats.json")):
        print(f"no index at {index_dir}; run bench.py --scaling first",
              file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from bench import _LoadMonitor

    from pisa_ray.query.engine import QueryEngine

    t0 = time.time()
    eng = QueryEngine(index_dir)
    load_s = time.time() - t0

    hot = [f"thecommon w{(131 * i) % 5000:04d}" for i in range(12)]
    typical = [" ".join(f"w{(i * 131 + j * 977) % 5000:04d}"
                        for j in range(2 + i % 3)) for i in range(24)]
    classes = {"hot": hot, "typical": typical}
    algos = ("block_max_taat", "taat_maxscore")

    # warmup: decode+score every term once (per-actor cache fill — the
    # mmap-warm analogue); untimed
    for qs in classes.values():
        for q in qs:
            eng.run(q, k=10, algorithm="block_max_taat")

    out = {"metric": "serving latency at 6M docs (warm, single process)",
           "index_dir": index_dir,
           "num_docs": eng.index.stats.num_docs,
           "engine_load_sec": round(load_s, 2)}
    with _LoadMonitor() as mon:
        for algo in algos:
            for cls, qs in classes.items():
                lat = []
                for q in qs:
                    t = time.time()
                    res = eng.run(q, k=10, algorithm=algo)
                    lat.append((time.time() - t) * 1000)
                    assert res, q
                out[f"{algo}_{cls}_ms"] = {
                    "mean": round(sum(lat) / len(lat), 1),
                    "p50": round(_percentile(lat, 50), 1),
                    "p95": round(_percentile(lat, 95), 1),
                    "n": len(lat)}
    out["steal_cpus"] = round(mon.steal_cpus, 1)
    out["mean_load"] = round(mon.mean(), 1)
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
