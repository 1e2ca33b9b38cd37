"""Command-line interface — the reference's CLI tool family as one binary.

    python -m pisa_ray build   --input pages/ --output idx/ [--url-col url
                               --html-col html | --text-col text] ...
    python -m pisa_ray query   --index idx/ --queries q.txt [--algorithm bmw]
    python -m pisa_ray evaluate --index idx/ --queries q.txt --run-id r1
    python -m pisa_ray bench-queries --index idx/ --queries q.txt
    python -m pisa_ray thresholds --index idx/ --queries q.txt

Query files use the reference's line format ``qid:term term ...`` (colon id
optional, ``/root/reference/src/query/queries.cpp:14-47``).  ``evaluate``
writes TREC run lines ``qid Q0 doc rank score runid``
(``tools/evaluate_queries.cpp:149-162``); ``bench-queries`` reports
mean/q50/q90/q95/q99 μs with an untimed warmup pass then timed runs
(``tools/queries.cpp:70-115`` protocol).

The CLI owns its Ray session (guarded init per repo contract).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List, Tuple


def _parse_query_file(path: str) -> List[Tuple[str, str]]:
    out = []
    with open(path) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            head, sep, rest = line.partition(":")
            if sep and " " not in head:
                qid, terms = head, rest
            else:
                qid, terms = str(i), line
            out.append((qid.strip() or str(i), terms.strip()))
    return out


def _init_ray(num_cpus):
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index

    _init_ray(args.num_cpus)
    # default text column is "text" (build_index's default); include it
    # in the pruned read or the analyze stage finds no text column when
    # --text-col isn't given explicitly
    text_col = args.text_col or (None if args.html_col else "text")
    cols = [c for c in (args.url_col, args.html_col, text_col,
                        args.id_col) if c]
    corpus = ray.data.read_parquet(args.input, columns=cols or None)
    cfg = IndexConfig(
        tokenizer=args.tokenizer,
        token_filters=tuple(args.token_filters.split(",")) if
        args.token_filters else (),
        stopwords=tuple(_read_lines(args.stopwords)) if args.stopwords else (),
        kstem_lexicon=args.kstem_lexicon,
        kstem_exceptions=args.kstem_exceptions,
        scorer=args.scorer, codec=args.codec, block_size=args.block_size,
        num_shards=args.num_shards, exchange=args.exchange,
        quantize_bits=args.quantize_bits,
        wand_block_size=args.wand_block_size, wand_lambda=args.wand_lambda,
    )
    info = build_index(
        corpus, args.output, config=cfg,
        text_col=args.text_col or "text",
        id_col=args.id_col if not args.url_col else None,
        url_col=args.url_col, html_col=args.html_col,
        resume=not args.no_resume)
    print(json.dumps({"out_dir": info["out_dir"],
                      "num_terms": int(info["num_terms"]),
                      "num_docs": info["stats"].num_docs,
                      "avg_len": info["stats"].avg_len}))
    return 0


def _read_lines(path):
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def cmd_query(args) -> int:
    from pisa_ray.query.engine import QueryEngine

    _init_ray(args.num_cpus)
    eng = QueryEngine(args.index, scorer=args.scorer)
    for qid, text in _parse_query_file(args.queries):
        for rank, (score, doc) in enumerate(
                eng.run(text, k=args.k, algorithm=args.algorithm), 1):
            print(f"{qid}\t{rank}\t{doc}\t{score:.6f}")
    return 0


def cmd_evaluate(args) -> int:
    """TREC run output, parallel over queries via the actor pool."""
    from pisa_ray.query.engine import run_queries

    _init_ray(args.num_cpus)
    queries = _parse_query_file(args.queries)
    res = run_queries(queries, args.index, k=args.k,
                      algorithm=args.algorithm, scorer=args.scorer,
                      concurrency=args.concurrency).to_pandas()
    out = open(args.output, "w") if args.output else sys.stdout
    for row in res.sort_values(["qid", "rank"]).itertuples(index=False):
        out.write(f"{row.qid} Q0 {row.doc_id} {row.rank} "
                  f"{row.score:.6f} {args.run_id}\n")
    if args.output:
        out.close()
    return 0


def cmd_bench_queries(args) -> int:
    """Reference timing protocol: untimed warmup, then N timed runs,
    report mean + q50/q90/q95/q99 microseconds."""
    import numpy as np

    from pisa_ray.query.engine import QueryEngine

    _init_ray(args.num_cpus)
    eng = QueryEngine(args.index, scorer=args.scorer)
    queries = _parse_query_file(args.queries)
    for qid, text in queries:  # warmup (also warms block decode caches)
        eng.run(text, k=args.k, algorithm=args.algorithm)
    lat = []
    for _ in range(args.runs):
        for qid, text in queries:
            t0 = time.perf_counter()
            eng.run(text, k=args.k, algorithm=args.algorithm)
            lat.append((time.perf_counter() - t0) * 1e6)
    lat = np.array(lat)
    print(json.dumps({
        "algorithm": args.algorithm, "k": args.k,
        "queries": len(queries), "runs": args.runs,
        "mean_us": round(float(lat.mean()), 1),
        "q50_us": round(float(np.percentile(lat, 50)), 1),
        "q90_us": round(float(np.percentile(lat, 90)), 1),
        "q95_us": round(float(np.percentile(lat, 95)), 1),
        "q99_us": round(float(np.percentile(lat, 99)), 1),
    }))
    return 0


def cmd_thresholds(args) -> int:
    from pisa_ray.query.engine import QueryEngine

    _init_ray(args.num_cpus)
    eng = QueryEngine(args.index, scorer=args.scorer)
    for qid, text in _parse_query_file(args.queries):
        print(f"{qid}\t{eng.threshold(text, k=args.k):.6f}")
    return 0


def cmd_check(args) -> int:
    """Index self-check (the reference's ``compress --check``): decode
    the whole compressed index distributed and compare per-term content
    hashes against the lexicon and the fwd/ checkpoint."""
    import json

    from pisa_ray.index.check import check_index

    _init_ray(args.num_cpus)
    summary = check_index(args.index, against_fwd=not args.no_fwd)
    print(json.dumps(summary, indent=2, default=str))
    return 0 if summary["ok"] else 1


def cmd_extract_topics(args) -> int:
    """No Ray involved — a topics file is a driver-sized artifact."""
    from pisa_ray.io.parsers import extract_topics

    n = extract_topics(args.input, args.output, fmt=args.format,
                       unique=args.unique)
    print(f"extracted {n} records")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pisa_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from parquet")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--text-col", default=None)
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--url-col", default=None)
    b.add_argument("--html-col", default=None)
    b.add_argument("--tokenizer", default="english",
                   choices=["english", "whitespace"])
    b.add_argument("--token-filters", default="lowercase",
                   help="comma list: lowercase,porter2")
    b.add_argument("--stopwords", default=None, help="stopword file")
    b.add_argument("--kstem-lexicon", default=None,
                   help="krovetz headword file (one word per line), or "
                        "'builtin' for the shipped curated list; used by "
                        "the 'krovetz' token filter and recorded in the "
                        "index config for query-side parity")
    b.add_argument("--kstem-exceptions", default=None,
                   help="krovetz direct-conflation file (word<TAB>stem "
                        "per line)")
    b.add_argument("--scorer", default="bm25",
                   choices=["bm25", "qld", "pl2", "dph"])
    from pisa_ray.codecs import CODECS
    b.add_argument("--codec", default="bitpack", choices=sorted(CODECS))
    b.add_argument("--block-size", type=int, default=128)
    b.add_argument("--num-shards", type=int, default=8)
    b.add_argument("--exchange", default="sort",
                   choices=["sort", "partition"])
    b.add_argument("--quantize-bits", type=int, default=0)
    b.add_argument("--wand-block-size", type=int, default=0,
                   help="independent fixed wand-block size (0 = codec blocks)")
    b.add_argument("--wand-lambda", type=float, default=0.0,
                   help="variable-sized wand blocks (SIGIR'17), per-block cost")
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    ck = sub.add_parser("check", help="decode-and-verify index self-check")
    ck.add_argument("--index", required=True)
    ck.add_argument("--no-fwd", action="store_true",
                    help="skip the fwd-checkpoint content compare")
    ck.set_defaults(fn=cmd_check)

    et = sub.add_parser("extract-topics",
                        help="convert TREC topics / AOL logs to query files")
    et.add_argument("-i", "--input", required=True)
    et.add_argument("-o", "--output", required=True, help="output basename")
    et.add_argument("-f", "--format", default="trec", choices=["trec", "aol"])
    et.add_argument("-u", "--unique", action="store_true")
    et.set_defaults(fn=cmd_extract_topics)

    for name, fn in (("query", cmd_query), ("evaluate", cmd_evaluate),
                     ("bench-queries", cmd_bench_queries),
                     ("thresholds", cmd_thresholds)):
        q = sub.add_parser(name)
        q.add_argument("--index", required=True)
        q.add_argument("--queries", required=True)
        q.add_argument("-k", type=int, default=10)
        q.add_argument("--algorithm", default="block_max_wand",
                       choices=["ranked_or", "ranked_or_taat", "ranked_and",
                                "wand", "block_max_wand", "maxscore",
                                "block_max_maxscore", "block_max_ranked_and",
                                "taat_maxscore", "block_max_taat"])
        # override the index-config scorer (a quantized index defaults to
        # the quantized scorer; this flag serves e.g. research reruns)
        q.add_argument("--scorer", default=None,
                       choices=["bm25", "qld", "pl2", "dph", "quantized"])
        if name == "evaluate":
            q.add_argument("--run-id", default="pisa_ray")
            q.add_argument("--output", default=None)
            q.add_argument("--concurrency", type=int, default=4)
        if name == "bench-queries":
            q.add_argument("--runs", type=int, default=2)
        q.set_defaults(fn=fn)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
