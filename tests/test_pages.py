import numpy as np

from pisa_ray.analysis.html import html_to_text
from pisa_ray.io.pages import generate_pages, write_pages


def test_schema_and_determinism():
    a = generate_pages(50, seed=42)
    b = generate_pages(50, seed=42)
    assert a.equals(b)
    assert [f.name for f in a.schema] == ["url", "warc_ts", "html", "text", "lang"]
    assert len(set(a["url"].to_pylist())) == 50


def test_byte_identical_extraction():
    """The engine invariant: html_to_text(html) == text, byte for byte,
    for every generated page (input_hint per-row invariant)."""
    tbl = generate_pages(300, seed=123)
    htmls = tbl["html"].to_pylist()
    texts = tbl["text"].to_pylist()
    bad = []
    for i, (h, t) in enumerate(zip(htmls, texts)):
        got = html_to_text(h)
        if got != t:
            bad.append((i, got[:80], t[:80]))
    assert not bad, f"{len(bad)} mismatches, first: {bad[:3]}"


def test_hot_term_skew():
    tbl = generate_pages(200, seed=42)
    texts = tbl["text"].to_pylist()
    frac = np.mean(["thecommon" in t for t in texts])
    assert frac > 0.8


def test_write_pages_multifile(tmp_path):
    import pyarrow.parquet as pq

    import glob

    path = write_pages(str(tmp_path / "pages"), 120, rows_per_file=50)
    files = sorted(glob.glob(path + "/*.parquet"))
    assert len(files) == 3
    assert sum(pq.ParquetFile(f).metadata.num_rows for f in files) == 120
