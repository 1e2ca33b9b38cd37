"""Cluster entrypoint for the index build — the `ray job submit` surface.

The north-star protocol runs the build on a fixed-size multi-node Ray
cluster at two cluster sizes::

    ray job submit --working-dir . \
        --runtime-env-json '{"py_modules": ["pisa_ray"]}' -- \
        python jobs/build_job.py \
            --input s3://bucket/pages/ \
            --output /shared/index \
            --url-col url --html-col html \
            --exchange partition --codec bitpack

On a cluster the script connects to the running Ray (``address="auto"``);
standalone it starts a local one.  It is resumable: rerunning with the
same output dir and config skips completed stages/partitions via the
per-partition lineage manifests, so a preempted job continues where it
stopped.  Prints ONE JSON metrics line (docs, postings, wall seconds,
docs/sec) — the artifact a scaling-efficiency comparison between an
N-node and a 4N-node submission reads.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="build_job")
    ap.add_argument("--input", required=True,
                    help="parquet file or directory of pages")
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default=None)
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--html-col", default=None)
    ap.add_argument("--tokenizer", default="english")
    ap.add_argument("--token-filters", default="lowercase")
    ap.add_argument("--codec", default="bitpack")
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--exchange", default="partition",
                    choices=["partition", "sort"])
    ap.add_argument("--quantize-bits", type=int, default=0)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="decode-and-verify the finished index against "
                         "the fwd checkpoint (compress --check semantics)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # on a cluster (ray job submit) this attaches to the running Ray;
        # standalone (no cluster, no RAY_ADDRESS) address="auto" raises
        # ConnectionError — fall back to a local session
        try:
            ray.init(address="auto", ignore_reinit_error=True)
        except ConnectionError:
            ray.init(address="local", ignore_reinit_error=True)

    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index

    cfg = IndexConfig(
        tokenizer=args.tokenizer,
        token_filters=tuple(f for f in args.token_filters.split(",") if f),
        codec=args.codec, num_shards=args.num_shards,
        exchange=args.exchange, quantize_bits=args.quantize_bits)
    corpus = ray.data.read_parquet(args.input)
    t0 = time.time()
    stats = build_index(
        corpus, args.output, config=cfg, text_col=args.text_col,
        id_col=args.id_col or None, url_col=args.url_col or None,
        html_col=args.html_col, resume=not args.no_resume)
    wall = time.time() - t0
    cstats = stats["stats"]  # CollectionStats dataclass
    print(json.dumps({
        "num_docs": cstats.num_docs,
        "collection_len": cstats.collection_len,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(cstats.num_docs / max(wall, 1e-9), 1),
        "output": args.output,
        "config_hash": cfg.config_hash(),
        "cluster_cpus": int(ray.cluster_resources().get("CPU", 0)),
        "cluster_nodes": len([n for n in ray.nodes() if n.get("Alive")]),
    }))
    if args.check:
        from pisa_ray.index.check import check_index

        summary = check_index(args.output)
        print(json.dumps({"check_ok": summary["ok"],
                          "check_errors": summary["errors"]}))
        return 0 if summary["ok"] else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
