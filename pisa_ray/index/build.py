"""Index build: Ray Data pipeline from a corpus to a sharded inverted index.

Capability parity with the reference's four CLI stages fused into one
resumable Ray pipeline (parse_collection → invert → compress →
create_wand_data; see SURVEY.md §3):

    read_parquet(corpus)
      → map_batches(analyze_count_tokens, worker-cached)    # tokenize + tf count
      → [checkpoint] fwd/ parquet: (doc_id, term, tf, doc_len)
      → per-block partial agg → lexicon/                    # term_id = sorted rank
      → map_batches(map_term_ids, broadcast lexicon)        # term → packed u64 key
      → inversion exchange                                  # THE wide shuffle:
          exchange="sort": Dataset.sort(packed key)         #   Ray-Data-native
          exchange="partition": salted map/reduce tasks     #   explicit, resumable
      → map_batches(encode_segments_batch)                  # blocks + WAND fused
      → index/shard=K/ parquet + per-stage (and per-partition) manifests

Inversion-by-sort replaces the reference's in-RAM sort + serial batch merge
(``/root/reference/src/invert.cpp:74-238``): after ``sort(term_id, doc_id)``
each sorted block is encoded independently; a term whose postings span
several blocks yields several *segments* with disjoint ascending docid
ranges, concatenated in first_doc order at read time.  This makes
term-frequency skew a non-issue: a stopword-grade term's postings simply
occupy many blocks, each encoded by a separate task — no giant group ever
materializes in one worker (the salting strategy of SURVEY §4, realized by
range-partitioned sort instead of explicit salt keys).

Doc lengths are carried as a column through the shuffle (4 bytes/posting)
rather than broadcasting a num_docs-sized array to every encoder — the
choice that survives 10^12 documents.

Every stage writes Parquet + a manifest (row counts, config hash); a re-run
with ``resume=True`` skips completed stages — mirroring the reference's
re-runnable merge / staged artifacts (``tools/parse_collection.cpp:45-52``).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from pisa_ray.analysis.analyzer import AnalyzerConfig, TextAnalyzer
from pisa_ray.codecs import BLOCK_SIZE
from pisa_ray.index.postings import encode_segment
from pisa_ray.query.scorers import CollectionStats, make_scorer
from pisa_ray.utils import sorted_with_rank


@dataclass(frozen=True)
class IndexConfig:
    # bump when the on-disk segment layout changes incompatibly (it feeds
    # config_hash, so stale caches/partitions rebuild instead of
    # mis-decoding); v2 = block 0 encodes its first docid relative to the
    # stored first_doc column
    layout_version: int = 2
    tokenizer: str = "english"
    token_filters: tuple = ("lowercase",)
    stopwords: tuple = ()
    # Krovetz headword / direct-conflation files (token filter "krovetz"):
    # None = dictionary-free rule subset; "builtin" = the shipped curated
    # ~400-word list.  A user-supplied Lemur headword file path goes here
    # — it is recorded in the index config, so it must stay readable by
    # query actors too (like the index dir itself).  See README "Krovetz
    # stemmer dictionary" for the delta vs the reference's ~30k-word
    # Lemur dictionary.
    kstem_lexicon: Optional[str] = None
    kstem_exceptions: Optional[str] = None
    scorer: str = "bm25"
    score_dtype: str = "float32"  # float32 = reference parity; float64 = SQL-oracle parity
    block_size: int = BLOCK_SIZE
    codec: str = "bitpack"
    num_shards: int = 8
    quantize_bits: int = 0  # 0 = no quantization; 8 = reference default when on
    # WAND metadata blocks: 0/0.0 = same as codec blocks; wand_block_size
    # picks an independent fixed size; wand_lambda > 0 the SIGIR'17
    # variable-sized partition (wand_utils.hpp:23-83 capabilities)
    wand_block_size: int = 0
    wand_lambda: float = 0.0
    scorer_params: tuple = ()  # e.g. (("k1", 0.9), ("b", 0.4))
    # Inversion exchange: "sort" = Dataset.sort (Ray-Data-native range
    # shuffle); "partition" = explicit salted map/reduce exchange with raw
    # Ray tasks (pisa_ray.index.exchange) — fuses encode+write into the
    # reducers and resumes at partition granularity.
    exchange: str = "sort"
    # Target postings per partition of the "partition" exchange; 0 = the
    # module default (env PISA_RAY_EXCHANGE_ROWS_PER_PART or 1M).  Partition
    # count tracks data volume, not cluster size.
    exchange_rows_per_part: int = 0
    # Packed sort key: the inversion shuffle sorts ONE u64 column
    # ((term_id << doc_id_bits) | doc_id) instead of a two-column key —
    # Ray's multi-key range partitioning falls off the vectorized path and
    # is ~7x slower.  doc_id must fit doc_id_bits (default 2^40 ≈ 10^12
    # docs) and term_id the remaining 24 bits; build_index validates and
    # falls back to the two-key sort if not.
    doc_id_bits: int = 40
    # Finalize the *small* aggregates (lexicon, doc sizes) on the driver
    # from per-block partials: one pass, no shuffle.  Valid while vocab and
    # doc count fit driver memory (≲10^7); at 10^9+ set False to use the
    # distributed groupby paths instead.
    small_tables_on_driver: bool = True

    def __post_init__(self):
        from pisa_ray.codecs import get_codec

        get_codec(self.codec)  # fail fast on typo'd codec names
        if self.score_dtype not in ("float32", "float64"):
            raise ValueError(f"score_dtype must be float32/float64, "
                             f"got {self.score_dtype!r}")
        if self.exchange not in ("sort", "partition"):
            raise ValueError(f"exchange must be sort/partition, "
                             f"got {self.exchange!r}")
        if self.wand_lambda < 0:
            raise ValueError("wand_lambda must be >= 0")

    def analyzer_config(self) -> AnalyzerConfig:
        return AnalyzerConfig(
            tokenizer=self.tokenizer,
            token_filters=tuple(self.token_filters),
            stopwords=frozenset(self.stopwords),
            kstem_lexicon=self.kstem_lexicon,
            kstem_exceptions=self.kstem_exceptions,
        )

    def config_hash(self) -> str:
        return hashlib.sha256(
            json.dumps(asdict(self), sort_keys=True, default=str).encode()
        ).hexdigest()[:16]


# docid broadcast ceiling: above this many docs the sorted-url array stops
# fitting a worker and the build switches to the distributed docmap + hash
# join path (overridable for tests / tighter worker memory budgets)
DOCID_BROADCAST_MAX = int(os.environ.get("PISA_RAY_DOCID_BROADCAST_MAX",
                                         50_000_000))

# term broadcast ceiling: above this many distinct terms the sorted term
# array stops fitting a worker and the encode remap switches from the
# broadcast `map_term_ids` to a distributed hash join against the lexicon
# (tokens ⋈ lexicon on term; term_id/df/occ ride the postings as columns) —
# the term-side mirror of DOCID_BROADCAST_MAX (SURVEY §2.5; reference
# semantics src/forward_index_builder.cpp:73-83)
TERM_BROADCAST_MAX = int(os.environ.get("PISA_RAY_TERM_BROADCAST_MAX",
                                        100_000_000))


def _parquet_row_count(files) -> Optional[int]:
    """Total row count straight from parquet footers — no Ray job, no data
    read.  Returns None if any file lacks usable metadata."""
    try:
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


# ---------------------------------------------------------------------------
# manifests / resume

def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_MANIFEST.json")


def stage_complete(stage_dir: str, cfg_hash: str) -> bool:
    p = _manifest_path(stage_dir)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
        return m.get("config_hash") == cfg_hash and m.get("complete", False)
    except (json.JSONDecodeError, OSError):
        return False


def _fresh_stage_dir(stage_dir: str) -> str:
    """Remove a stale/incomplete stage dir so a rerun can't mix old and new
    part files (the manifest is only written after a complete write)."""
    if os.path.exists(stage_dir):
        shutil.rmtree(stage_dir)
    return stage_dir


def write_manifest(stage_dir: str, cfg_hash: str, **extra) -> None:
    os.makedirs(stage_dir, exist_ok=True)
    m = {"config_hash": cfg_hash, "complete": True,
         "written_at": time.time(), **extra}
    tmp = _manifest_path(stage_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2)
    os.replace(tmp, _manifest_path(stage_dir))


# ---------------------------------------------------------------------------
# stage 1: analyze + count  (stateful actor: compiled regex, stemmer cache)

class AnalyzeCountTokens:
    """map_batches actor: (doc_id, text|html) → (doc_id, term, tf, doc_len).

    Setup (analyzer build, optional url→doc_id broadcast dict) happens once
    per actor in __init__; __call__ is per Arrow batch (zero-copy in).

    With ``id_col=None`` and no broadcast ref, rows are keyed by the URL
    string instead of a docid — the 10^12-doc path, where docids are
    attached downstream by a hash join against the distributed docmap
    (SURVEY §2.5) because the sorted-url array no longer fits a worker.
    """

    def __init__(self, config: AnalyzerConfig, text_col: str, id_col: Optional[str],
                 url_col: Optional[str], html_col: Optional[str],
                 url_to_doc_ref=None):
        cfg = config
        if html_col is not None:
            cfg = AnalyzerConfig(
                tokenizer=cfg.tokenizer, token_filters=cfg.token_filters,
                stopwords=cfg.stopwords, strip_html=True)
        self.analyzer = TextAnalyzer(cfg)
        self.text_col = html_col or text_col
        self.id_col = id_col
        self.url_col = url_col
        if url_to_doc_ref is not None:
            # broadcast = SORTED url Arrow array; convert once per worker
            # to fixed-width bytes so per-batch lookups are one vectorized
            # np.searchsorted (position == docid rank)
            arr = ray.get(url_to_doc_ref)
            self.url_to_doc = np.asarray(
                arr.to_numpy(zero_copy_only=False), dtype="S")
        else:
            self.url_to_doc = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if self.analyzer.fast_path:
            doc_idx, terms_arr, tfs, doc_lens = \
                self.analyzer.count_batch_fast(texts)
            term_col = pa.array(terms_arr.to_pylist(), type=pa.string()) \
                if not isinstance(terms_arr, (pa.Array, pa.ChunkedArray)) \
                else terms_arr
            if isinstance(term_col, pa.ChunkedArray):
                term_col = term_col.combine_chunks()
            if term_col.type != pa.string():
                term_col = term_col.cast(pa.string())
        else:
            doc_idx, terms, tfs, doc_lens = self.analyzer.count_batch(texts)
            term_col = pa.array(terms.astype(str), type=pa.string())
        # dictionary-encode the term column: downstream term→id remaps then
        # hash only each batch's small vocabulary (~5k strings) instead of
        # every posting row (~75k) — under full-node concurrency the
        # per-row string hashing was the single hottest spot in the build
        term_col = term_col.dictionary_encode()
        if self.id_col is not None:
            doc_ids_all = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        elif self.url_to_doc is not None:
            sorted_urls = self.url_to_doc
            batch_urls = np.asarray(batch[self.url_col].to_pylist(),
                                    dtype=sorted_urls.dtype)
            doc_ids_all = np.searchsorted(sorted_urls,
                                          batch_urls).astype(np.uint64)
        else:
            # url-keyed rows: the docid arrives via the docmap hash join
            urls = batch[self.url_col].to_pylist()
            return pa.table({
                self.url_col: pa.array([urls[i] for i in doc_idx],
                                       type=pa.string()),
                "term": term_col,
                "tf": pa.array(tfs, type=pa.uint32()),
                "doc_len": pa.array(doc_lens[doc_idx], type=pa.uint32()),
            })
        return pa.table({
            "doc_id": pa.array(doc_ids_all[doc_idx], type=pa.uint64()),
            "term": term_col,
            "tf": pa.array(tfs, type=pa.uint32()),
            "doc_len": pa.array(doc_lens[doc_idx], type=pa.uint32()),
        })


_ANALYZER_CACHE: Dict = {}


def analyze_count_tokens(batch: pa.Table, *, config: AnalyzerConfig,
                         text_col: str, id_col, url_col, html_col,
                         url_to_doc_ref=None) -> pa.Table:
    """Task-function analyzer stage (same semantics as AnalyzeCountTokens).

    Plain tasks beat a dedicated actor pool here: Ray reuses worker
    processes, so the compiled regex / stemmer cache / broadcast dict live
    in a per-worker cache without pinning CPUs to a pool (pools sized to
    the cluster starve the downstream sort on small clusters, and pool
    spawn cost dominates small jobs)."""
    key = (config, text_col, id_col, url_col, html_col, url_to_doc_ref)
    worker = _ANALYZER_CACHE.get(key)
    if worker is None:
        from pisa_ray.utils import ensure_malloc_tuned

        ensure_malloc_tuned()  # worker hot path; not an import side effect
        worker = AnalyzeCountTokens(config, text_col, id_col, url_col,
                                    html_col, url_to_doc_ref)
        _ANALYZER_CACHE[key] = worker
    return worker(batch)


def fused_analyze_write(batch: pa.Table, *, config: AnalyzerConfig,
                        text_col: str, id_col, url_col, html_col,
                        fwd_dir: Optional[str], url_to_doc_ref=None
                        ) -> pa.Table:
    """Fused stage 1: analyze a batch, write its forward-index block as a
    resume checkpoint (side-effect), and return the token table — which
    stays in the object store for the downstream partial-aggregate pass and
    the inversion exchange, so neither re-reads the checkpoint from disk.

    The fwd file name is a content hash of the batch's doc ids, so a
    Ray-level task retry overwrites the same file (atomic tmp+rename)
    instead of duplicating postings.
    """
    tokens = analyze_count_tokens(
        batch, config=config, text_col=text_col, id_col=id_col,
        url_col=url_col, html_col=html_col, url_to_doc_ref=url_to_doc_ref)
    if fwd_dir is not None:
        name = hashlib.sha1(
            tokens["doc_id"].to_numpy(zero_copy_only=False).tobytes()
            + str(batch.num_rows).encode()).hexdigest()[:20]
        os.makedirs(fwd_dir, exist_ok=True)
        tmp = os.path.join(fwd_dir, f".{name}.tmp")
        pq.write_table(tokens, tmp)
        os.replace(tmp, os.path.join(fwd_dir, f"part-{name}.parquet"))
    return tokens


def _partial_both(tokens: pa.Table) -> pa.Table:
    """Per-block partial aggregates for BOTH small tables in one output.

    Schema (union of two row kinds, split again by the driver):
      kind int8 (0 = lexicon partial, 1 = doc size),
      term string (null for sizes), v1 int64 (df_part | doc_id),
      v2 int64 (occ_part | doc_len).
    """
    lex = _partial_term_stats(tokens)
    # one (doc_id, doc_len) row per doc with ≥1 surviving token — identical
    # to deriving sizes from the fwd rows (a doc appears in exactly one batch)
    sz = pa.TableGroupBy(tokens.select(["doc_id", "doc_len"]),
                         "doc_id").aggregate([("doc_len", "max")])
    n_lex, n_sz = lex.num_rows, sz.num_rows
    return pa.table({
        "kind": pa.array(np.concatenate([
            np.zeros(n_lex, dtype=np.int8),
            np.ones(n_sz, dtype=np.int8)])),
        "term": pa.concat_arrays([
            lex["term"].combine_chunks().cast(pa.string()),
            pa.nulls(n_sz, pa.string())]),
        "v1": pa.concat_arrays([
            lex["df_part"].combine_chunks().cast(pa.int64()),
            sz.column("doc_id").combine_chunks().cast(pa.int64())]),
        "v2": pa.concat_arrays([
            lex["occ_part"].combine_chunks().cast(pa.int64()),
            sz.column("doc_len_max").combine_chunks().cast(pa.int64())]),
    })


# ---------------------------------------------------------------------------
# stage 2: lexicon (partial agg inside map_batches → small groupby → rank)

def _partial_term_stats(batch: pa.Table) -> pa.Table:
    """Per-batch (term, df_part, occ_part) partials.  Dictionary-encoded
    term chunks aggregate by ``np.bincount`` over the indices — no per-row
    string hashing; duplicate terms across chunks are fine (downstream
    sums partials)."""
    col = batch["term"]
    tf_all = batch["tf"].to_numpy(zero_copy_only=False)
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = []
    off = 0
    for c in chunks:
        n = len(c)
        tfc = tf_all[off:off + n]
        off += n
        if pa.types.is_dictionary(c.type):
            idx = c.indices.to_numpy(zero_copy_only=False)
            k = len(c.dictionary)
            dfp = np.bincount(idx, minlength=k)
            occ = np.bincount(idx, weights=tfc, minlength=k) \
                .astype(np.int64)
            nz = np.flatnonzero(dfp)
            parts.append(pa.table({
                "term": c.dictionary.take(pa.array(nz)).cast(pa.string()),
                "df_part": pa.array(dfp[nz], type=pa.int64()),
                "occ_part": pa.array(occ[nz], type=pa.int64()),
            }))
        else:
            t = pa.table({"term": c, "tf": pa.array(tfc)})
            g = pa.TableGroupBy(t, "term").aggregate(
                [("tf", "count"), ("tf", "sum")])
            parts.append(pa.table({
                "term": g.column("term").cast(pa.string()),
                "df_part": pc.cast(g.column("tf_count"), pa.int64()),
                "occ_part": pc.cast(g.column("tf_sum"), pa.int64()),
            }))
    return pa.concat_tables(parts) if parts else pa.table({
        "term": pa.array([], type=pa.string()),
        "df_part": pa.array([], type=pa.int64()),
        "occ_part": pa.array([], type=pa.int64()),
    })


def build_lexicon(fwd: "ray.data.Dataset") -> "ray.data.Dataset":
    """term → (term_id = sorted rank, df, occ).  The groupby shuffles only
    per-batch partials (≤ vocab-size rows per input block), not postings."""
    partials = fwd.map_batches(_partial_term_stats, batch_format="pyarrow")
    agg = partials.groupby("term").sum(["df_part", "occ_part"])
    agg = agg.map_batches(
        lambda t: pa.table({
            "term": t["term"],
            "df": t["sum(df_part)"],
            "occ": t["sum(occ_part)"],
        }),
        batch_format="pyarrow",
    )
    return sorted_with_rank(agg, "term", "term_id", pa.uint32())


# ---------------------------------------------------------------------------
# stage 3: term-id remap (broadcast sorted term list; id = position)
#
# These wide-pipeline stages are plain *task* functions, not actor pools: an
# actor pool pins CPUs for the stage's whole lifetime, and two pools around
# a sort deadlock a small cluster (pools hold every CPU while the shuffle
# between them waits for one).  The broadcast state is ray.put once and
# cached per worker process instead.

_WORKER_CACHE: Dict = {}


def _cached_get(ref):
    val = _WORKER_CACHE.get(ref)
    if val is None:
        val = ray.get(ref)
        _WORKER_CACHE[ref] = val
    return val


def term_ids_from_column(col, terms) -> np.ndarray:
    """term→term_id (uint64) for a string OR dictionary-encoded column.

    Dictionary chunks remap only their (small) dictionary through
    ``pc.index_in`` and gather per-row ids with one numpy take — per-row
    string hashing was the hottest kernel in the whole build under
    many-core concurrency."""
    from pisa_ray.utils import alloc_array

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out = alloc_array(sum(len(c) for c in chunks), np.uint64)
    off = 0
    for c in chunks:
        n = len(c)
        if pa.types.is_dictionary(c.type):
            dmap = pc.index_in(c.dictionary, value_set=terms) \
                .to_numpy(zero_copy_only=False).astype(np.uint64)
            idx = c.indices.to_numpy(zero_copy_only=False)
            out[off:off + n] = dmap[idx]
        else:
            out[off:off + n] = pc.index_in(c, value_set=terms) \
                .to_numpy(zero_copy_only=False).astype(np.uint64)
        off += n
    return out


def map_term_ids(batch: pa.Table, *, terms_ref, doc_id_bits: int = 0) -> pa.Table:
    """Vectorized term→term_id: ``pc.index_in`` against the sorted lexicon
    (position in the sorted value_set IS the term id).  At 10^9-term scale,
    swap the broadcast for a hash join on ``term`` (SURVEY §2.5).

    With ``doc_id_bits`` > 0, term_id and doc_id are packed into a single
    u64 ``sort_key`` so the shuffle sorts one numeric column (see
    IndexConfig.doc_id_bits); the encoder unpacks them."""
    terms = _cached_get(terms_ref)
    tid = term_ids_from_column(batch["term"], terms)
    if doc_id_bits:
        did = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        key = (tid << np.uint64(doc_id_bits)) | did
        return pa.table({
            "sort_key": pa.array(key, type=pa.uint64()),
            "tf": batch["tf"],
            "doc_len": batch["doc_len"],
        })
    return pa.table({
        "term_id": pa.array(tid.astype(np.uint32), type=pa.uint32()),
        "doc_id": batch["doc_id"],
        "tf": batch["tf"],
        "doc_len": batch["doc_len"],
    })


def map_term_ids_joined(batch: pa.Table, *, doc_id_bits: int = 0) -> pa.Table:
    """Join-mode remap (vocab > TERM_BROADCAST_MAX): term_id/df/occ were
    hash-joined in as columns, so there is no vocab-sized broadcast — the
    per-term stats ride the postings through the sort into the encoder."""
    tid = batch["term_id"].to_numpy(zero_copy_only=False) \
        .astype(np.uint64, copy=False)
    carried = {"tf": batch["tf"], "doc_len": batch["doc_len"],
               "df": batch["df"], "occ": batch["occ"]}
    if doc_id_bits:
        did = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        key = (tid << np.uint64(doc_id_bits)) | did
        return pa.table({"sort_key": pa.array(key, type=pa.uint64()),
                         **carried})
    return pa.table({
        "term_id": pa.array(tid.astype(np.uint32), type=pa.uint32()),
        "doc_id": batch["doc_id"],
        **carried,
    })


# ---------------------------------------------------------------------------
# stage 4: encode sorted runs into posting-list segments

def encode_segments_batch(batch: pa.Table, *, stats: CollectionStats,
                          term_stats_ref, config: IndexConfig,
                          max_score_ref=None,
                          num_terms: Optional[int] = None) -> pa.Table:
    """map_batches over (term_id, doc_id)-sorted blocks: encode each
    term-run as one segment row (blocks + WAND metadata in one pass,
    mirroring the fused compress+wand design of SURVEY §3.3).

    ``term_stats_ref=None`` = join mode: per-term df/occ arrive as batch
    COLUMNS (joined from the lexicon) instead of a vocab-sized broadcast;
    ``num_terms`` must then be passed for the shard assignment."""
    cfg = config
    if term_stats_ref is not None:
        df_arr, occ_arr = _cached_get(term_stats_ref)
        if num_terms is None:
            num_terms = len(df_arr)
        df_col = occ_col = None
    else:
        df_arr = occ_arr = None
        df_col = batch["df"].to_numpy(zero_copy_only=False)
        occ_col = batch["occ"].to_numpy(zero_copy_only=False)
    dtype = np.float32 if cfg.score_dtype == "float32" else np.float64
    scorer = make_scorer(cfg.scorer, dtype=dtype, **dict(cfg.scorer_params))
    from pisa_ray.utils import alloc_array

    if "sort_key" in batch.column_names:
        key = batch["sort_key"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        # populate-backed scratch; ufunc out= avoids fresh faulting allocs
        term_ids = alloc_array(len(key), np.uint64)
        np.right_shift(key, np.uint64(cfg.doc_id_bits), out=term_ids)
        doc_ids = alloc_array(len(key), np.uint64)
        np.bitwise_and(key, np.uint64((1 << cfg.doc_id_bits) - 1),
                       out=doc_ids)
    else:
        term_ids = batch["term_id"].to_numpy(zero_copy_only=False)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    quantizer = None
    if cfg.quantize_bits and max_score_ref is not None:
        from pisa_ray.query.scorers import quantize_scores

        global_max = _cached_get(max_score_ref)
        quantizer = lambda sc: quantize_scores(sc, global_max,
                                               cfg.quantize_bits)
    tfs = batch["tf"].to_numpy(zero_copy_only=False) \
        .astype(np.uint32, copy=False)
    doc_lens = batch["doc_len"].to_numpy(zero_copy_only=False) \
        .astype(np.uint32, copy=False)

    rows: Dict[str, list] = {k: [] for k in (
        "term_id", "shard", "df", "occ", "first_doc", "last_doc",
        "doc_payload", "freq_payload", "doc_endpoints", "freq_endpoints",
        "block_last_docs", "block_max_scores", "wand_last_docs",
        "wand_max_scores", "max_score")}

    boundaries = np.flatnonzero(np.diff(term_ids)) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [len(term_ids)]))
    for lo, hi in zip(starts, ends):
        tid = int(term_ids[lo])
        seg_docs = doc_ids[lo:hi]
        seg_tfs = tfs[lo:hi]
        if df_col is None:
            t_df, t_occ = int(df_arr[tid]), int(occ_arr[tid])
        else:
            t_df, t_occ = int(df_col[lo]), int(occ_col[lo])
        ts = scorer.term_scorer(t_df, t_occ, stats)
        scores = ts(seg_tfs, doc_lens[lo:hi])
        if quantizer is not None:
            # quantized index: store the quantized impact score AS the
            # frequency and derive block maxes from it (the reference's
            # quantized build, src/compress.cpp:73-91 + scorer/quantized)
            seg_tfs = quantizer(scores)
            scores = seg_tfs.astype(np.float32)
        enc = encode_segment(seg_docs, seg_tfs, scores,
                             block_size=cfg.block_size, codec=cfg.codec,
                             wand_block_size=cfg.wand_block_size,
                             wand_lambda=cfg.wand_lambda)
        rows["term_id"].append(tid)
        rows["shard"].append(tid * cfg.num_shards // max(1, num_terms))
        rows["occ"].append(int(seg_tfs.sum()))
        for k in ("df", "first_doc", "last_doc", "doc_payload",
                  "freq_payload", "doc_endpoints", "freq_endpoints",
                  "block_last_docs", "block_max_scores", "wand_last_docs",
                  "wand_max_scores", "max_score"):
            rows[k].append(enc[k])

    return pa.table({
        "term_id": pa.array(rows["term_id"], type=pa.uint32()),
        "shard": pa.array(rows["shard"], type=pa.int32()),
        "df": pa.array([int(x) for x in rows["df"]], type=pa.int64()),
        "occ": pa.array(rows["occ"], type=pa.int64()),
        "first_doc": pa.array([int(x) for x in rows["first_doc"]], type=pa.uint64()),
        "last_doc": pa.array([int(x) for x in rows["last_doc"]], type=pa.uint64()),
        "doc_payload": pa.array(rows["doc_payload"], type=pa.binary()),
        "freq_payload": pa.array(rows["freq_payload"], type=pa.binary()),
        "doc_endpoints": pa.array([x.tolist() for x in rows["doc_endpoints"]],
                                  type=pa.list_(pa.uint32())),
        "freq_endpoints": pa.array([x.tolist() for x in rows["freq_endpoints"]],
                                   type=pa.list_(pa.uint32())),
        "block_last_docs": pa.array([x.tolist() for x in rows["block_last_docs"]],
                                    type=pa.list_(pa.uint64())),
        "block_max_scores": pa.array([x.tolist() for x in rows["block_max_scores"]],
                                     type=pa.list_(pa.float32())),
        "wand_last_docs": pa.array([x.tolist() for x in rows["wand_last_docs"]],
                                   type=pa.list_(pa.uint64())),
        "wand_max_scores": pa.array([x.tolist() for x in rows["wand_max_scores"]],
                                    type=pa.list_(pa.float32())),
        "max_score": pa.array([float(x) for x in rows["max_score"]],
                              type=pa.float32()),
    })


# ---------------------------------------------------------------------------
# the pipeline

def build_index(
    corpus: "ray.data.Dataset",
    out_dir: str,
    *,
    config: Optional[IndexConfig] = None,
    text_col: str = "text",
    id_col: Optional[str] = "doc_id",
    url_col: Optional[str] = None,
    html_col: Optional[str] = None,
    resume: bool = True,
    analyzer_concurrency: Optional[int] = None,
    analyzer_batch_size: int = 1024,
) -> Dict[str, object]:
    """Build a full index under ``out_dir``.  Returns the stats dict.

    ``id_col``: dense 0..N-1 document ids (like the reference's arrival-order
    docids).  Pass ``url_col`` (with ``id_col=None``) to assign docids as the
    global sorted-url rank — the reference's "reorder by URL feature"
    (``/root/reference/include/pisa/reorder_docids.hpp:240-266``) for free.
    ``html_col``: extract text from this binary column first (byte-identical
    gumbo semantics) instead of reading ``text_col``.
    """
    def _trace(msg):
        if os.environ.get("PISA_RAY_TRACE"):
            print(f"[build {time.time() % 1000:.1f}] {msg}", flush=True)

    _trace("start")
    # driver-side finalize work (small-table parquet writes) runs on this
    # pool so it overlaps the cluster-side stages; every future is joined
    # before build_index returns (Arrow/parquet kernels release the GIL)
    bg_pool = ThreadPoolExecutor(max_workers=2)
    bg_futures: List = []

    def _join_bg():
        for fut in bg_futures:
            fut.result()  # re-raises a failed checkpoint write
        bg_pool.shutdown(wait=True)

    config = config or IndexConfig()
    if analyzer_concurrency is None:
        # leave headroom for the read/write/shuffle stages so the actor
        # pools don't starve them
        analyzer_concurrency = max(
            2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    cfg_hash = config.config_hash()
    paths = {s: os.path.join(out_dir, s)
             for s in ("fwd", "lexicon", "index", "docmap", "sizes")}
    os.makedirs(out_dir, exist_ok=True)

    # -- docid assignment ---------------------------------------------------
    # doc_id = global sorted-url rank.  Below the broadcast threshold the
    # rank is computed driver-side in one pass (pull the url column,
    # Arrow-sort) and the sorted url array is broadcast for vectorized
    # searchsorted lookup; beyond it the docmap stays DISTRIBUTED
    # (sorted_with_rank → parquet) and tokens get their docids via a hash
    # join on url (SURVEY §2.5) — nothing of docmap size ever lands on the
    # driver or in a single worker.
    url_to_doc_ref = None
    docid_join = False
    num_docs = None
    if id_col is None:
        if url_col is None:
            raise ValueError("need id_col or url_col")
        dm = None
        if resume and stage_complete(paths["docmap"], cfg_hash):
            dm_files = [os.path.join(paths["docmap"], f)
                        for f in sorted(os.listdir(paths["docmap"]))
                        if f.endswith(".parquet")]
            num_docs = _parquet_row_count(dm_files)
            if num_docs is not None and num_docs > DOCID_BROADCAST_MAX:
                docid_join = True
            else:
                dm = pa.concat_tables([pq.read_table(f) for f in dm_files])
                num_docs = dm.num_rows
        else:
            # prune the url read: go straight to the source files when the
            # corpus is a plain parquet read (select_columns alone may not
            # push the projection down, and html columns are wide)
            src_files = []
            try:
                src_files = corpus.input_files()
            except Exception:
                src_files = []
            approx_rows = _parquet_row_count(src_files) if src_files else None
            if approx_rows is None:
                approx_rows = corpus.count()
            if approx_rows > DOCID_BROADCAST_MAX:
                # distributed path: sort+rank stays in the cluster; the
                # docmap is never read back whole
                docmap = sorted_with_rank(
                    corpus.select_columns([url_col]), url_col, "doc_id",
                    pa.uint64())
                docmap.write_parquet(_fresh_stage_dir(paths["docmap"]))
                write_manifest(paths["docmap"], cfg_hash)
                num_docs = int(approx_rows)
                docid_join = True
            else:
                # driver fast path: read the url column straight off the
                # parquet footers (thread-parallel C reads, no Ray job),
                # sort with Arrow's C kernel; doc_id of row i in the SORTED
                # table is simply i
                if src_files:
                    with ThreadPoolExecutor(min(8, len(src_files))) as ex:
                        u_tabs = list(ex.map(
                            lambda f: pq.read_table(f, columns=[url_col]),
                            src_files))
                    u_col = pa.concat_tables(u_tabs)[url_col].combine_chunks()
                else:
                    u_col = pa.concat_tables(
                        ray.get(corpus.select_columns([url_col])
                                .to_arrow_refs()))[url_col].combine_chunks()
                sorted_urls_arr = pc.take(u_col, pc.sort_indices(u_col))
                num_docs = len(sorted_urls_arr)

                def _write_docmap(arr=sorted_urls_arr):
                    dm_t = pa.table({url_col: arr,
                                     "doc_id": pa.array(
                                         np.arange(len(arr), dtype=np.uint64),
                                         type=pa.uint64())})
                    _fresh_stage_dir(paths["docmap"])
                    os.makedirs(paths["docmap"], exist_ok=True)
                    pq.write_table(dm_t, os.path.join(paths["docmap"],
                                                      "part-00000.parquet"))
                    write_manifest(paths["docmap"], cfg_hash)

                # the checkpoint write overlaps the analyze stage; joined
                # before build_index returns
                bg_futures.append(bg_pool.submit(_write_docmap))
                # broadcast the SORTED url column as an Arrow array
                # (zero-copy into plasma); each worker converts it once to
                # a fixed-width bytes numpy array for vectorized
                # searchsorted — that conversion cost is paid in parallel
                # on workers, not serially on the driver
                url_to_doc_ref = ray.put(sorted_urls_arr)
        if dm is not None:
            # resume path: dm was read back from the checkpoint (arbitrary
            # row order) — broadcast the doc_id-ordered url column
            dm_sorted = dm.sort_by("doc_id")
            url_to_doc_ref = ray.put(dm_sorted[url_col].combine_chunks())
    else:
        src_files = []
        try:
            src_files = corpus.input_files()
        except Exception:
            src_files = []
        num_docs = (_parquet_row_count(src_files) if src_files else None)
        if num_docs is None:
            num_docs = corpus.count()

    _trace("docids done")
    analyzer_kwargs = {"config": config.analyzer_config(),
                       "text_col": text_col, "id_col": id_col,
                       "url_col": url_col, "html_col": html_col,
                       "url_to_doc_ref": url_to_doc_ref}
    stage1_done = all(
        resume and stage_complete(paths[s], cfg_hash)
        for s in ("fwd", "sizes", "lexicon"))
    tokens_md = None  # materialized token dataset (plasma blocks)
    if config.small_tables_on_driver and not docid_join and not stage1_done:
        # -- FUSED stage 1: ONE pass over the corpus produces (a) the token
        # dataset, materialized in the object store for every downstream
        # consumer (partial aggregates, inversion exchange) and (b) fwd
        # parquet checkpoint blocks as side-effect writes for resume.  No
        # stage re-reads the checkpoint from disk in the happy path.
        for s in ("fwd", "sizes", "lexicon"):
            _fresh_stage_dir(paths[s])
        tokens_md = corpus.map_batches(
            fused_analyze_write,
            fn_kwargs={**analyzer_kwargs, "fwd_dir": paths["fwd"]},
            batch_format="pyarrow",
            batch_size=analyzer_batch_size).materialize()
        write_manifest(paths["fwd"], cfg_hash)
        _trace("fused analyze done")
        # partial aggregates over the in-memory token blocks, coalesced to
        # ~1M-row batches (few tasks, vocab-sized outputs); finalized on the
        # driver with Arrow's C groupby/sort kernels (pandas is ~10× slower
        # at the multi-million-row drain).  Safe to coalesce: the driver
        # groupbys below dedupe a doc or term split across batch boundaries.
        ptab = pa.concat_tables(ray.get(
            tokens_md.map_batches(
                _partial_both, batch_format="pyarrow",
                batch_size=1 << 20).to_arrow_refs()))
        _trace("partials done")

        def _finalize_sizes(sz=ptab.filter(pc.equal(ptab["kind"], 1))):
            # doc-sizes finalize doesn't feed any later build stage — it
            # runs on the driver pool, overlapping the inversion exchange
            g = pa.TableGroupBy(sz.select(["v1", "v2"]), "v1").aggregate(
                [("v2", "max")])
            g = g.take(pc.sort_indices(g["v1"]))
            os.makedirs(paths["sizes"], exist_ok=True)
            pq.write_table(
                pa.table({"doc_id": g["v1"].cast(pa.uint64()),
                          "doc_len": g["v2_max"].cast(pa.uint32())}),
                os.path.join(paths["sizes"], "part-00000.parquet"))
            write_manifest(paths["sizes"], cfg_hash)

        bg_futures.append(bg_pool.submit(_finalize_sizes))

        lx = ptab.filter(pc.equal(ptab["kind"], 0))
        lx = pa.TableGroupBy(lx.select(["term", "v1", "v2"]),
                             "term").aggregate([("v1", "sum"), ("v2", "sum")])
        lx = lx.take(pc.sort_indices(lx["term"]))
        lex_out = pa.table({
            "term": lx["term"].cast(pa.string()),
            "df": lx["v1_sum"].cast(pa.int64()),
            "occ": lx["v2_sum"].cast(pa.int64()),
            "term_id": pa.array(np.arange(lx.num_rows, dtype=np.uint32),
                                type=pa.uint32()),
        })
        os.makedirs(paths["lexicon"], exist_ok=True)
        pq.write_table(lex_out, os.path.join(paths["lexicon"],
                                             "part-00000.parquet"))
        write_manifest(paths["lexicon"], cfg_hash)
    elif not stage1_done:
        # -- distributed stage path (vocab / doc count beyond driver memory):
        # separate resumable stages, groupby shuffles for the small tables.
        if not (resume and stage_complete(paths["fwd"], cfg_hash)):
            fwd = corpus.map_batches(
                analyze_count_tokens,
                fn_kwargs=analyzer_kwargs,
                batch_format="pyarrow",
                batch_size=analyzer_batch_size,
            )
            if docid_join:
                # url-keyed tokens ⋈ distributed docmap → docid'd tokens;
                # the docmap side ships only (url, doc_id), never the
                # postings, and neither side is ever collected
                cpus = int(ray.cluster_resources().get("CPU", 8))
                dm_ds = ray.data.read_parquet(paths["docmap"])
                fwd = fwd.join(dm_ds, join_type="inner",
                               num_partitions=max(2, cpus),
                               on=(url_col,), right_on=(url_col,))
                fwd = fwd.map_batches(
                    lambda t: pa.table({
                        "doc_id": pc.cast(t["doc_id"], pa.uint64()),
                        "term": t["term"],
                        "tf": t["tf"],
                        "doc_len": t["doc_len"],
                    }),
                    batch_format="pyarrow")
            _trace("fwd: writing")
            fwd.write_parquet(_fresh_stage_dir(paths["fwd"]))
            write_manifest(paths["fwd"], cfg_hash)
        _trace("fwd done")

        if not (resume and stage_complete(paths["sizes"], cfg_hash)):
            def _partial_sizes(t: pa.Table) -> pa.Table:
                g = pa.TableGroupBy(t, "doc_id").aggregate(
                    [("doc_len", "max")])
                return pa.table({"doc_id": g.column("doc_id"),
                                 "doc_len": g.column("doc_len_max")})

            sizes = (
                ray.data.read_parquet(paths["fwd"],
                                      columns=["doc_id", "doc_len"])
                .map_batches(_partial_sizes, batch_format="pyarrow")
                .groupby("doc_id").max("doc_len")
                .map_batches(
                    lambda t: pa.table({"doc_id": t.column("doc_id"),
                                        "doc_len": t.column("max(doc_len)")}),
                    batch_format="pyarrow")
            )
            sizes.write_parquet(_fresh_stage_dir(paths["sizes"]))
            write_manifest(paths["sizes"], cfg_hash)

        _trace("sizes done")
        if not (resume and stage_complete(paths["lexicon"], cfg_hash)):
            # distributed rank: per-batch partials → small groupby →
            # sorted_with_rank (term_id = global sorted-term rank) →
            # sharded parquet.  Nothing vocab-sized lands on the driver
            # (this branch's whole purpose is vocab beyond driver memory).
            lex_ds = build_lexicon(ray.data.read_parquet(
                paths["fwd"], columns=["term", "tf"]))
            lex_ds = lex_ds.map_batches(
                lambda t: pa.table({
                    "term": pc.cast(t["term"], pa.string()),
                    "df": pc.cast(t["df"], pa.int64()),
                    "occ": pc.cast(t["occ"], pa.int64()),
                    "term_id": t["term_id"],
                }),
                batch_format="pyarrow")
            lex_ds.write_parquet(_fresh_stage_dir(paths["lexicon"]))
            write_manifest(paths["lexicon"], cfg_hash)
    lex_files = [os.path.join(paths["lexicon"], f)
                 for f in sorted(os.listdir(paths["lexicon"]))
                 if f.endswith(".parquet")]
    n_terms_meta = _parquet_row_count(lex_files)
    # join-mode remap: vocab beyond worker memory.  The partition exchange
    # and the quantized global-max pass still need the broadcast, so the
    # join path pairs with the default sort exchange.
    term_join = (config.exchange == "sort" and not config.quantize_bits
                 and n_terms_meta is not None
                 and n_terms_meta > TERM_BROADCAST_MAX)
    if term_join:
        lex_table = None
        num_terms = int(n_terms_meta)
        # Σocc = Σ doc_len without pulling the lexicon to the driver
        collection_len = int(ray.data.read_parquet(
            paths["lexicon"], columns=["occ"]).sum("occ") or 0)
    else:
        lex_table = pa.concat_tables(
            [pq.read_table(f) for f in lex_files]).sort_by("term_id")
        num_terms = lex_table.num_rows

        # collection stats fall out of the lexicon: Σocc = Σ doc_len
        collection_len = int(pc.sum(lex_table["occ"]).as_py() or 0)
    stats = CollectionStats(
        num_docs=int(num_docs),
        avg_len=collection_len / num_docs if num_docs else 0.0,
        collection_len=collection_len,
    )
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(asdict(stats), f)

    _trace("lexicon+stats done")
    # consume the in-memory token blocks when stage 1 just ran; fall back to
    # the fwd parquet checkpoint on resume
    fwd = tokens_md if tokens_md is not None \
        else ray.data.read_parquet(paths["fwd"])
    # -- stage: encode ------------------------------------------------------
    if term_join:
        if not (resume and stage_complete(paths["index"], cfg_hash)):
            use_packed = (config.doc_id_bits > 0
                          and num_docs <= (1 << config.doc_id_bits)
                          and num_terms <= (1 << (64 - config.doc_id_bits)))
            cpus = int(ray.cluster_resources().get("CPU", 8))
            lex_ds = ray.data.read_parquet(
                paths["lexicon"], columns=["term", "term_id", "df", "occ"])
            # plain-string join key: token blocks carry dictionary-encoded
            # term columns, which the hash join won't key on
            tok = fwd.map_batches(
                lambda t: pa.table({
                    "term": pc.cast(t["term"], pa.string()),
                    "doc_id": t["doc_id"],
                    "tf": t["tf"],
                    "doc_len": t["doc_len"],
                }),
                batch_format="pyarrow")
            joined = tok.join(lex_ds, join_type="inner",
                              num_partitions=max(2, cpus),
                              on=("term",), right_on=("term",))
            encoded = (
                joined.map_batches(
                    map_term_ids_joined,
                    fn_kwargs={"doc_id_bits": config.doc_id_bits
                               if use_packed else 0},
                    batch_format="pyarrow")
                .sort("sort_key" if use_packed else ["term_id", "doc_id"])
                .map_batches(encode_segments_batch,
                             fn_kwargs={"stats": stats,
                                        "term_stats_ref": None,
                                        "config": config,
                                        "num_terms": int(num_terms)},
                             batch_format="pyarrow",
                             batch_size=None))
            _trace("encode (term join): writing")
            encoded.write_parquet(_fresh_stage_dir(paths["index"]),
                                  partition_cols=["shard"])
            _trace("encode done (term join)")
            write_manifest(paths["index"], cfg_hash,
                           num_terms=int(num_terms),
                           num_shards=config.num_shards)
    elif not (resume and stage_complete(paths["index"], cfg_hash)):
        terms_ref = ray.put(lex_table["term"].combine_chunks())
        df_np = lex_table["df"].to_numpy()
        occ_np = lex_table["occ"].to_numpy()
        term_stats_ref = ray.put((df_np, occ_np))
        max_score_ref = None
        if config.quantize_bits:
            def _batch_max(t: pa.Table) -> pa.Table:
                df_a, occ_a = _cached_get(term_stats_ref)
                dtype = (np.float32 if config.score_dtype == "float32"
                         else np.float64)
                sc = make_scorer(config.scorer, dtype=dtype,
                                 **dict(config.scorer_params))
                tids = term_ids_from_column(
                    t["term"], _cached_get(terms_ref)).astype(np.int64)
                tfs_np = t["tf"].to_numpy(zero_copy_only=False)
                dls = t["doc_len"].to_numpy(zero_copy_only=False)
                mx = 0.0
                for tid in np.unique(tids):
                    m = tids == tid
                    ts_fn = sc.term_scorer(int(df_a[tid]), int(occ_a[tid]),
                                           stats)
                    mx = max(mx, float(ts_fn(tfs_np[m], dls[m]).max()))
                return pa.table({"mx": pa.array([mx], type=pa.float64())})

            gmax = (fwd
                    .map_batches(_batch_max, batch_format="pyarrow")
                    .max("mx"))
            max_score_ref = ray.put(float(gmax))
        if config.exchange == "partition":
            import glob as _glob

            from pisa_ray.index.exchange import run_exchange

            if tokens_md is not None:
                # exchange straight over the materialized plasma blocks —
                # zero-copy reads, no checkpoint decode
                fwd_input = [block_ref
                             for bundle in
                             tokens_md.iter_internal_ref_bundles()
                             for block_ref, _meta in bundle.blocks]
            else:
                fwd_input = sorted(_glob.glob(os.path.join(paths["fwd"],
                                                           "*.parquet")))
            # posting mass per term bucket, straight off the lexicon —
            # drives the skew-proportional partition plan
            tb = (np.arange(num_terms, dtype=np.int64)
                  * config.num_shards // max(1, num_terms))
            bucket_occ = np.bincount(tb, weights=occ_np.astype(np.float64),
                                     minlength=config.num_shards)
            info = run_exchange(
                fwd_input, out_dir, terms_ref=terms_ref,
                term_stats_ref=term_stats_ref, stats=stats, config=config,
                num_terms=int(num_terms), num_docs=int(num_docs),
                bucket_occ=bucket_occ, resume=resume)
            _trace(f"encode done (partition exchange: {info})")
            write_manifest(paths["index"], cfg_hash, num_terms=int(num_terms),
                           num_shards=config.num_shards, **info)
            with open(os.path.join(out_dir, "config.json"), "w") as f:
                json.dump({**asdict(config), "config_hash": cfg_hash,
                           "num_terms": int(num_terms)}, f, indent=2,
                          default=str)
            _join_bg()
            return {"stats": stats, "num_terms": num_terms,
                    "out_dir": out_dir}

        use_packed = (config.doc_id_bits > 0
                      and num_docs <= (1 << config.doc_id_bits)
                      and num_terms <= (1 << (64 - config.doc_id_bits)))
        encoded = (
            fwd.map_batches(map_term_ids,
                            fn_kwargs={"terms_ref": terms_ref,
                                       "doc_id_bits": config.doc_id_bits
                                       if use_packed else 0},
                            batch_format="pyarrow")
            .sort("sort_key" if use_packed else ["term_id", "doc_id"])
            .map_batches(encode_segments_batch,
                         fn_kwargs={"stats": stats,
                                    "term_stats_ref": term_stats_ref,
                                    "config": config,
                                    "max_score_ref": max_score_ref},
                         batch_format="pyarrow",
                         batch_size=None)  # one call per sorted block
        )
        _trace("encode: writing")
        encoded.write_parquet(_fresh_stage_dir(paths["index"]),
                              partition_cols=["shard"])
        _trace("encode done")
        write_manifest(paths["index"], cfg_hash, num_terms=int(num_terms),
                       num_shards=config.num_shards)

    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({**asdict(config), "config_hash": cfg_hash,
                   "num_terms": int(num_terms)}, f, indent=2, default=str)
    _join_bg()
    return {"stats": stats, "num_terms": num_terms, "out_dir": out_dir}
