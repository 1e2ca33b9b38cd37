"""Collection-parser tests (plaintext / trectext / trecweb / wapo)."""

import json

from pisa_ray.io.parsers import (parse_plaintext, parse_trectext,
                                 parse_trecweb, parse_wapo)

TRECTEXT = b"""
<DOC>
<DOCNO> WSJ870324-0001 </DOCNO>
<HL> some headline </HL>
<TEXT>
First paragraph of text.
</TEXT>
<TEXT>second block</TEXT>
</DOC>
<DOC>
<DOCNO>WSJ870324-0002</DOCNO>
<TEXT>other doc</TEXT>
</DOC>
<DOC>
<HL> no docno -> skipped </HL>
</DOC>
"""

TRECWEB = b"""
<DOC>
<DOCNO>clueweb09-en0000-00-00000</DOCNO>
<DOCHDR>
http://example.com/page.html
HTTP/1.1 200 OK
Content-Type: text/html
</DOCHDR>
<html><body>Hello web</body></html>
</DOC>
"""


def test_plaintext():
    recs = list(parse_plaintext(b"d1 the content here\nd2 more text\n\n"))
    assert recs == [("d1", "the content here", None),
                    ("d2", "more text", None)]


def test_trectext():
    recs = list(parse_trectext(TRECTEXT))
    assert len(recs) == 2
    docno, content, url = recs[0]
    assert docno == "WSJ870324-0001"
    assert "First paragraph of text." in content
    assert "second block" in content
    assert url is None
    assert recs[1][0] == "WSJ870324-0002"


def test_trecweb():
    recs = list(parse_trecweb(TRECWEB))
    assert len(recs) == 1
    docno, content, url = recs[0]
    assert docno == "clueweb09-en0000-00-00000"
    assert url == "http://example.com/page.html"
    assert "Hello web" in content
    assert "HTTP/1.1" not in content  # headers stay in DOCHDR


def test_wapo():
    rec = {
        "id": "abc-123",
        "article_url": "https://wapo.example/x",
        "contents": [
            {"type": "kicker", "content": "Opinion"},
            {"type": "title", "content": "A headline"},
            {"type": "byline", "content": "By Someone"},
            {"type": "sanitized_html", "content": "Body text here."},
            {"type": "author_info", "name": "Someone", "bio": "writes"},
            {"type": "image", "fullcaption": "a photo", "blurb": "blurb"},
        ],
    }
    blob = (json.dumps(rec) + "\n" + "not json\n").encode()
    recs = list(parse_wapo(blob))
    assert len(recs) == 1
    docno, content, url = recs[0]
    assert docno == "abc-123"
    assert url == "https://wapo.example/x"
    for frag in ["Opinion", "A headline", "By Someone", "Body text here.",
                 "writes", "a photo", "blurb"]:
        assert frag in content


def test_read_collection_dataset(ray_session, tmp_path):
    p = tmp_path / "part1.trectext"
    p.write_bytes(TRECTEXT)
    from pisa_ray.io.parsers import read_collection

    ds = read_collection([str(p)], fmt="trectext")
    df = ds.to_pandas().sort_values("docno").reset_index(drop=True)
    assert list(df["docno"]) == ["WSJ870324-0001", "WSJ870324-0002"]
    assert "First paragraph" in df["text"][0]


TOPICS = """
<top>
<num> Number: 301
<title> International Organized Crime

<desc> Description:
Identify organizations that participate in international
criminal activity.

<narr> Narrative:
A relevant document must as a minimum identify the organization.
</top>

<top>
<num> Number: 302 </num>
<title> Poliomyelitis and Post-Polio </title>
<desc> Description: Is the disease under control?
<narr> Narrative: Vaccination programs count.
</top>
"""


def test_parse_trec_topics():
    from pisa_ray.io.parsers import parse_trec_topics

    topics = parse_trec_topics(TOPICS)
    assert [t["num"] for t in topics] == ["301", "302"]
    t = topics[0]
    assert t["title"] == "International Organized Crime"
    # newlines collapsed to single spaces, label stripped
    assert t["desc"] == ("Identify organizations that participate in "
                         "international criminal activity.")
    assert t["narr"].startswith("A relevant document must")
    assert topics[1]["title"] == "Poliomyelitis and Post-Polio"


def test_parse_aol_queries():
    from pisa_ray.io.parsers import parse_aol_queries

    text = ("u1\tcheap flights\t2006-03-01\t1\thttp://x\n"
            "u2\t-\t2006-03-01\t1\thttp://y\n"
            "u3\t\t2006-03-01\t1\thttp://z\n"
            "u4\tshort line\t2006-03-01\n")  # 3 fields only -> skipped
    qs = parse_aol_queries(text)
    assert qs == ["cheap flights"]


def test_extract_topics_cli(tmp_path):
    from pisa_ray.cli import main

    inp = tmp_path / "topics.sgml"
    inp.write_text(TOPICS)
    base = str(tmp_path / "out")
    rc = main(["extract-topics", "-i", str(inp), "-o", base, "-f", "trec"])
    assert rc == 0
    titles = (tmp_path / "out.title").read_text().splitlines()
    assert titles == ["301:International Organized Crime",
                      "302:Poliomyelitis and Post-Polio"]
    descs = (tmp_path / "out.desc").read_text().splitlines()
    assert descs[0].startswith("301:Identify organizations")
    assert (tmp_path / "out.narr").exists()


def test_extract_topics_aol_unique(tmp_path):
    from pisa_ray.io.parsers import extract_topics

    inp = tmp_path / "aol.txt"
    inp.write_text("u1\tzebra\t1\t2\nu2\tapple\t1\t2\nu3\tzebra\t1\t2\n")
    n = extract_topics(str(inp), str(tmp_path / "q"), fmt="aol", unique=True)
    assert n == 3
    assert (tmp_path / "q.query").read_text().splitlines() == [
        "0:zebra", "1:apple", "2:zebra"]
    assert (tmp_path / "q.query.unique").read_text().splitlines() == [
        "0:apple", "1:zebra"]
