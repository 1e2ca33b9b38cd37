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
