import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(texts, ids=None):
    import ray.data

    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


@pytest.fixture(scope="module")
def near_dup_corpus(ray_session):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep dark forest tonight")
    texts = [
        base,                                      # 0
        base,                                      # 1: exact dup of 0
        base.replace("tonight", "today"),          # 2: near dup of 0
        "completely different words here about spark and ray data engines",
        "another unrelated document speaking of parquet files and arrow",
        base.upper(),                              # 5: case-dup of 0
    ]
    return texts


def test_exact_dedup(near_dup_corpus, ray_session):
    from pisa_ray.ops.dedup import exact_dedup

    res = exact_dedup(_docs_ds(near_dup_corpus)).to_pandas()
    # 0,1,5 collapse (lowercased); keeper = min id = 0 with 3 dups
    grp = res.set_index("doc_id")["n_dups"].to_dict()
    assert grp[0] == 3
    assert grp[2] == 1 and grp[3] == 1 and grp[4] == 1
    assert len(res) == 4


def test_ngram_jaccard_pairs(near_dup_corpus, ray_session):
    from pisa_ray.ops.dedup import ngram_jaccard_pairs, _word_shingles

    res = ngram_jaccard_pairs(
        _docs_ds(near_dup_corpus), threshold=0.5).to_pandas()
    pairs = {(a, b): j for a, b, j in
             zip(res["doc_a"], res["doc_b"], res["jaccard"])}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 < pairs[(0, 2)] < 1.0
    # brute-force check of the (0, 2) value
    s0 = set(_word_shingles(near_dup_corpus[0].lower()))
    s2 = set(_word_shingles(near_dup_corpus[2].lower()))
    want = len(s0 & s2) / len(s0 | s2)
    assert pairs[(0, 2)] == pytest.approx(want, abs=1e-6)
    assert not any((3 in p or 4 in p) for p in pairs)


def test_minhash_lsh_pairs(near_dup_corpus, ray_session):
    from pisa_ray.ops.dedup import minhash_lsh_pairs

    res = minhash_lsh_pairs(_docs_ds(near_dup_corpus),
                            verify_threshold=0.5).to_pandas()
    pairs = set(zip(res["doc_a"], res["doc_b"]))
    assert (0, 1) in pairs  # exact dup always collides
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup found
    assert (3, 4) not in pairs


def test_simhash_pairs(near_dup_corpus, ray_session):
    from pisa_ray.ops.dedup import simhash_pairs

    res = simhash_pairs(_docs_ds(near_dup_corpus), max_hamming=10).to_pandas()
    pairs = set(zip(res["doc_a"], res["doc_b"]))
    assert (0, 1) in pairs
    assert (0, 5) in pairs  # case-normalized identical
    assert (3, 4) not in pairs


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16))
    base[1] = base[0] + 0.01 * rng.standard_normal(16)  # near dup of 0
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(20), type=pa.int64()),
        "embedding": pa.array([r.astype(np.float32).tolist() for r in base],
                              type=pa.list_(pa.float32())),
    })), base


def test_ann_topk_matches_bruteforce(emb_ds, ray_session):
    from pisa_ray.ops.similarity import ann_topk

    ds, base = emb_ds
    qm = base[:2].astype(np.float32).astype(np.float64)
    res = ann_topk(ds, qm, [0, 1], k=5).to_pandas()
    bn = base.astype(np.float32).astype(np.float64)
    bn = bn / np.linalg.norm(bn, axis=1, keepdims=True)
    for qi in (0, 1):
        sims = bn @ bn[qi]
        order = np.lexsort((np.arange(20), -np.round(sims, 6)))[:5]
        got = res[res["qid"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == list(order)


def test_cosine_dup_pairs(emb_ds, ray_session):
    from pisa_ray.ops.similarity import cosine_dup_pairs

    ds, _ = emb_ds
    res = cosine_dup_pairs(ds, threshold=0.99).to_pandas()
    assert set(zip(res["vec_a"], res["vec_b"])) == {(0, 1)}


def test_cosine_dup_pairs_blocked_equals_exact(ray_session):
    """The LSH-blocked scale path finds the same pair set as the exact
    block-pair path on planted near-dups (recall bound 1-1e-6 at τ)."""
    import ray.data

    from pisa_ray.ops.similarity import cosine_dup_pairs, lsh_band_plan

    rng = np.random.default_rng(11)
    base = rng.standard_normal((300, 32))
    # plant 25 near-duplicate pairs (sim >= ~0.99)
    for i in range(25):
        base[2 * i + 1] = base[2 * i] + 0.05 * rng.standard_normal(32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(300), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in base],
                              type=pa.list_(pa.float64())),
    }))
    exact = cosine_dup_pairs(ds, threshold=0.95, mode="exact").to_pandas()
    blocked = cosine_dup_pairs(ds, threshold=0.95, mode="blocked").to_pandas()
    se = set(zip(exact["vec_a"], exact["vec_b"]))
    sb = set(zip(blocked["vec_a"], blocked["vec_b"]))
    assert len(se) >= 25
    assert se == sb
    # sims agree where both emit
    me = dict(zip(zip(exact["vec_a"], exact["vec_b"]), exact["sim"]))
    mb = dict(zip(zip(blocked["vec_a"], blocked["vec_b"]), blocked["sim"]))
    for k in me:
        assert abs(me[k] - mb[k]) < 1e-9


def test_lsh_band_plan():
    from pisa_ray.ops.similarity import lsh_band_plan

    plan = lsh_band_plan(0.95)
    assert plan is not None
    r, L = plan
    p = 1.0 - np.arccos(0.95) / np.pi
    assert (1.0 - p ** r) ** L <= 1e-6          # recall bound holds
    assert lsh_band_plan(0.35) is None          # too low for banding


def test_lsh_ann_finds_self(emb_ds, ray_session):
    from pisa_ray.ops.similarity import lsh_ann_topk

    ds, base = emb_ds
    res = lsh_ann_topk(ds, base[:3], [0, 1, 2], k=3).to_pandas()
    for qi in (0, 1, 2):
        sub = res[res["qid"] == qi].sort_values("rank")
        assert sub.iloc[0]["vec_id"] == qi  # own vector = top hit


def test_textstats(ray_session):
    from pisa_ray.ops.textstats import (lang_id, quality_scores,
                                        token_counts, fingerprints)

    texts = ["The cat is on the mat", "xyz abc", ""]
    lid = lang_id(_docs_ds(texts)).to_pandas().set_index("doc_id")
    assert lid.loc[0, "pred_lang"] == "en"
    assert lid.loc[1, "pred_lang"] == "unk"
    # "the", "is", "on", "the" → 4 of 6 tokens
    assert lid.loc[0, "stop_ratio"] == pytest.approx(4 / 6, abs=1e-6)

    q = quality_scores(_docs_ds(texts)).to_pandas().set_index("doc_id")
    assert q.loc[0, "n_tokens"] == 6
    assert q.loc[2, "n_tokens"] == 0 and q.loc[2, "alnum_ratio"] == 0.0

    tc = token_counts(_docs_ds(["a-b c", "x y z"])).to_pandas()
    assert tc["ws_tokens"].tolist() == [2, 3]
    assert tc["en_tokens"].tolist() == [3, 3]

    fp = fingerprints(_docs_ds(["Same", "same", "other"])).to_pandas()
    assert fp.loc[0, "fp_md5"] == fp.loc[1, "fp_md5"] != fp.loc[2, "fp_md5"]
    assert fp.loc[0, "fp_roll"] == fp.loc[1, "fp_roll"]


def test_multimodal_stubs(ray_session):
    import ray.data

    from pisa_ray.ops.multimodal import (binary_metadata, decode_images,
                                         embed_binary, ImageDecodeStub)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "payload": pa.array([b"\x89PNGfake", b""], type=pa.binary()),
    }))
    meta = binary_metadata(ds).to_pandas()
    assert meta["n_bytes"].tolist() == [8, 0]
    dec = decode_images(ds, concurrency=1).to_pandas()
    assert set(dec.columns) == {"doc_id", "width", "height", "thumb"}
    assert all(16 <= w < 272 for w in dec["width"])
    # determinism: same payload → same fake decode
    dec2 = decode_images(ds, concurrency=1).to_pandas()
    pd.testing.assert_frame_equal(
        dec.sort_values("doc_id").reset_index(drop=True),
        dec2.sort_values("doc_id").reset_index(drop=True))
    emb = embed_binary(ds, dim=8, concurrency=1).to_pandas()
    assert all(len(e) == 8 for e in emb["embedding"])
    with pytest.raises(NotImplementedError):
        ImageDecodeStub(mode="real")(pa.table({
            "doc_id": pa.array([1], type=pa.int64()),
            "payload": pa.array([b"x"], type=pa.binary())}))


def test_tumbling_window(ray_session):
    import datetime as dt

    import ray.data

    from pisa_ray.ops.windows import tumbling_window

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(100):
        rows.append({"ts": base + dt.timedelta(minutes=7 * i),
                     "event_type": "a" if i % 3 else "b",
                     "value": float(i)})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)
    got = tumbling_window(ds).to_pandas()
    want = (df.assign(window_start=df["ts"].dt.floor("h"))
            .groupby(["event_type", "window_start"])
            .agg(n=("value", "count"), sum_value=("value", "sum"))
            .reset_index())
    merged = got.merge(want, on=["event_type", "window_start"],
                       suffixes=("", "_w"))
    assert len(merged) == len(want) == len(got)
    assert (merged["n"] == merged["n_w"]).all()
    assert np.allclose(merged["sum_value"], merged["sum_value_w"])


def test_session_windows(ray_session):
    import datetime as dt

    import ray.data

    from pisa_ray.ops.windows import session_windows

    base = dt.datetime(2024, 1, 1)
    rows = [
        {"user_id": 1, "ts": base},
        {"user_id": 1, "ts": base + dt.timedelta(minutes=5)},
        {"user_id": 1, "ts": base + dt.timedelta(hours=2)},  # new session
        {"user_id": 2, "ts": base},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = session_windows(ds).to_pandas()
    u1 = got[got["user_id"] == 1]
    assert len(u1) == 2
    assert sorted(u1["n_events"]) == [1, 2]
    assert len(got[got["user_id"] == 2]) == 1


def _make_bmp(img: "np.ndarray") -> bytes:
    """Minimal 24-bit BI_RGB bottom-up BMP encoder (test fixture)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h - 1, -1, -1):
        row = img[r, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    px = b"".join(rows)
    header = (b"BM" + (54 + len(px)).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(px).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + px


def test_image_decode_real_kernels():
    from pisa_ray.ops.multimodal import decode_bmp, decode_ppm, resize_nearest

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(_make_bmp(img)), img)
    ppm = b"P6\n# comment\n7 5\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(ppm), img)
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    pgm = b"P5\n6 4 255\n" + gray.tobytes()
    assert np.array_equal(decode_ppm(pgm), gray)
    rz = resize_nearest(img, 10, 14)
    assert rz.shape == (10, 14, 3)
    assert np.array_equal(rz[::2, ::2], img)  # 2x upsample keeps originals
    # CRLF-terminated header (some Windows tools): the LF is skipped
    # whenever a full raster remains — including with trailing bytes
    ppm_crlf = b"P6\n7 5\n255\r\n" + img.tobytes()
    assert np.array_equal(decode_ppm(ppm_crlf), img)
    assert np.array_equal(decode_ppm(ppm_crlf + b"\n"), img)
    # truncated raster / non-whitespace after maxval raise, never decode
    # silently-corrupt pixels
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n7 5\n255\n" + img.tobytes()[:-3])
    with pytest.raises(ValueError, match="whitespace"):
        decode_ppm(b"P6\n7 5\n255")  # header ends at maxval, no separator
    with pytest.raises(ValueError):  # junk fused into the maxval field
        decode_ppm(b"P6\n7 5\n255" + img.tobytes())


def test_image_decode_real_pipeline(ray_session):
    import ray.data

    from pisa_ray.ops.multimodal import decode_images

    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for h, w in ((8, 8), (12, 6), (3, 9))]
    payloads = [_make_bmp(imgs[0]),
                b"P6\n6 12\n255\n" + imgs[1].tobytes(),
                b"\x89PNG fake"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary())}))
    out = decode_images(ds, mode="real", on_error="skip",
                        concurrency=1).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [0, 1]  # PNG skipped
    assert list(out["width"]) == [8, 6]
    assert list(out["height"]) == [8, 12]
    assert all(len(t) == 64 for t in out["thumb"])
    # on_error="raise" surfaces the honest codec-unavailable error
    import pytest as _pytest
    with _pytest.raises(Exception):
        decode_images(ds, mode="real", concurrency=1).to_pandas()


def test_ivf_full_probe_equals_bruteforce(emb_ds, ray_session):
    """nprobe == n_centroids probes every cell -> bit-identical to the
    exact ann_topk output (same dot products, same merge)."""
    from pisa_ray.ops.similarity import ann_topk, ivf_ann_topk

    ds, base = emb_ds
    qm = base[:3].astype(np.float64)
    exact = (ann_topk(ds, qm, [0, 1, 2], k=5).to_pandas()
             .sort_values(["qid", "rank"]).reset_index(drop=True))
    full = (ivf_ann_topk(ds, qm, [0, 1, 2], k=5, n_centroids=4, nprobe=4,
                         train_sample=20).to_pandas()
            .sort_values(["qid", "rank"]).reset_index(drop=True))
    assert exact.equals(full)


def test_ivf_partial_probe_recall_and_determinism(ray_session):
    import ray.data

    from pisa_ray.ops.similarity import ann_topk, ivf_ann_topk

    rng = np.random.default_rng(5)
    # clustered data so cells are meaningful: 8 blobs of 40 vectors
    centers = rng.standard_normal((8, 24)) * 4
    pts = np.concatenate([c + rng.standard_normal((40, 24))
                          for c in centers])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(pts)), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in pts],
                              type=pa.list_(pa.float64())),
    }))
    qm = pts[::40][:4]
    qids = [0, 1, 2, 3]
    exact = ann_topk(ds, qm, qids, k=10).to_pandas()
    approx = ivf_ann_topk(ds, qm, qids, k=10, n_centroids=8, nprobe=3,
                          train_sample=320).to_pandas()
    hits = 0
    for qi in qids:
        want = set(exact[exact["qid"] == qi]["vec_id"])
        got = set(approx[approx["qid"] == qi]["vec_id"])
        hits += len(want & got)
    assert hits / (10 * len(qids)) >= 0.8  # recall@10 on blob data
    # deterministic end to end (sampling, init, assignment, merge)
    again = ivf_ann_topk(ds, qm, qids, k=10, n_centroids=8, nprobe=3,
                         train_sample=320).to_pandas()
    a = approx.sort_values(["qid", "rank"]).reset_index(drop=True)
    b = again.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_ivf_train_deterministic_and_normalized(emb_ds, ray_session):
    from pisa_ray.ops.similarity import ivf_train

    ds, _ = emb_ds
    c1 = ivf_train(ds, n_centroids=4, train_sample=20)
    c2 = ivf_train(ds, n_centroids=4, train_sample=20)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_minhash_carry_equals_join_many_dups(ray_session):
    """Carry mode (first-collision emission, 2 distributed ops) and join
    mode (candidate join-back) produce the SAME pair set on a corpus with
    many planted duplicates — exact dups collide in every band, so the
    earlier-band suppression path is heavily exercised; each pair must
    still appear exactly once."""
    import ray.data

    from pisa_ray.ops.dedup import minhash_lsh_pairs

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    rng = np.random.default_rng(23)
    texts = []
    for i in range(40):
        base = " ".join(rng.choice(words, size=30))
        texts.append(base)
        texts.append(base)                       # exact dup: all bands
        texts.append(base.replace("alpha", "omega"))  # near dup: many bands
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    carry = minhash_lsh_pairs(ds, verify_threshold=0.4,
                              verify_mode="carry").to_pandas()
    # exactly once per pair
    assert not carry.duplicated(["doc_a", "doc_b"]).any()
    join = minhash_lsh_pairs(ds, verify_threshold=0.4,
                             verify_mode="join").to_pandas()
    c = carry.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    j = join.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(c) >= 40  # the planted dups were found
    assert c[["doc_a", "doc_b"]].equals(j[["doc_a", "doc_b"]])
    assert np.allclose(c["est_jaccard"], j["est_jaccard"])


def test_audio_decode_features(ray_session):
    """REAL WAV round-trip: stdlib-encoded PCM decodes to the exact
    synthesized samples; RMS/ZCR/frames match direct numpy computation."""
    import io
    import wave

    import ray.data

    from pisa_ray.ops.multimodal import AudioDecode, decode_audio, synth_wav
    from pisa_ray.utils import round_half_away

    ids = [0, 3, 7]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "payload": pa.array([synth_wav(d) for d in ids], type=pa.binary()),
    }))
    res = decode_audio(ds, n_frames=4).to_pandas().set_index("doc_id")
    for d in ids:
        n = 800 + (d % 5) * 160
        freq = 7 + (d % 8) * 13
        i = np.arange(n, dtype=np.int64)
        s = ((i * freq) % 2000 - 1000) / 32768.0
        row = res.loc[d]
        assert row["sample_rate"] == 8000 and row["channels"] == 1
        assert row["n_samples"] == n
        assert row["rms"] == float(round_half_away(np.sqrt(np.mean(s * s)), 6))
        assert row["zcr"] == float(round_half_away(
            np.mean(s[:-1] * s[1:] < 0), 6))
        assert len(row["frame_rms"]) == 4
        b = np.linspace(0, n, 5).astype(int)
        assert row["frame_rms"][0] == pytest.approx(
            np.sqrt(np.mean(s[b[0]:b[1]] ** 2)))

    # stereo + 8-bit paths
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(4000)
        inter = np.array([100, 300, -100, -300], dtype="<i2")  # 2 frames
        w.writeframes(inter.tobytes())
    dec = AudioDecode()
    out = dec(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "payload": pa.array([buf.getvalue()], type=pa.binary()),
    })).to_pylist()[0]
    assert out["channels"] == 2 and out["n_samples"] == 2
    assert out["rms"] == pytest.approx(float(round_half_away(np.sqrt(
        np.mean(np.array([200 / 32768.0, -200 / 32768.0]) ** 2)), 6)))

    # non-WAV payload: honest codec error / skip mode
    bad = pa.table({"doc_id": pa.array([9], type=pa.int64()),
                    "payload": pa.array([b"ID3\x03mp3data"],
                                        type=pa.binary())})
    with pytest.raises(ValueError, match="RIFF"):
        AudioDecode()(bad)
    assert AudioDecode(on_error="skip")(bad).num_rows == 0


def test_video_frame_sample(ray_session):
    """REAL Y4M round-trip: parse header + raw 4:2:0 frames, stride
    sampling, mean-luma features match the synthesis pattern."""
    import ray.data

    from pisa_ray.ops.multimodal import (VideoFrameSample,
                                         sample_video_frames, synth_y4m)

    ids = [0, 5]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "payload": pa.array([synth_y4m(d) for d in ids], type=pa.binary()),
    }))
    res = sample_video_frames(ds, step=2).to_pandas().set_index("doc_id")
    for d in ids:
        nf = 4 + (d % 4)
        row = res.loc[d]
        assert row["width"] == 16 and row["height"] == 16
        assert row["n_frames"] == nf
        assert list(row["frame_idx"]) == list(range(0, nf, 2))
        p = np.arange(256, dtype=np.int64)
        for j, f in enumerate(row["frame_idx"]):
            want = ((p + 7 * f + d) % 251).mean()
            assert row["frame_mean_luma"][j] == pytest.approx(want, abs=1e-6)

    # non-Y4M payload: honest codec error / skip
    bad = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                    "payload": pa.array([b"\x00\x00\x00 ftypmp42"],
                                        type=pa.binary())})
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        VideoFrameSample()(bad)
    assert VideoFrameSample(on_error="skip")(bad).num_rows == 0


def test_minhash_tokenless_docs_carry_no_signature(ray_session):
    """Empty/whitespace docs have no shingles: they must not pair with
    each other as fake est=1.0 dups (MinHash undefined on empty sets —
    and the SQL oracle generates no rows for them)."""
    import ray.data

    from pisa_ray.ops.dedup import minhash_lsh_pairs, minhash_signatures

    texts = ["", "   ", "alpha beta gamma delta", "alpha beta gamma delta"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    sigs = minhash_signatures(ds).to_pandas()
    assert set(sigs["doc_id"]) == {2, 3}
    pairs = minhash_lsh_pairs(ds, verify_threshold=0.5).to_pandas()
    assert set(zip(pairs["doc_a"], pairs["doc_b"])) == {(2, 3)}


def test_minhash_empty_docs_exact_mode(ray_session):
    """empty_docs="exact": IDENTICAL normalized token-less texts pair via
    exact-dedup semantics (representative=min id -> others, score 1.0);
    DISTINCT short texts never pair; defaults unchanged ("drop")."""
    import ray.data

    from pisa_ray.ops.dedup import minhash_jaccard_dups, minhash_lsh_pairs

    texts = ["", "", "   ",               # 0,1 identical empty; 2 whitespace
             "\t\n",                      # 3: whitespace-only, != 2's text
             "alpha beta gamma delta",    # 4
             "alpha beta gamma delta"]    # 5
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    # default drops token-less docs entirely
    default = minhash_lsh_pairs(ds, verify_threshold=0.5).to_pandas()
    assert set(zip(default["doc_a"], default["doc_b"])) == {(4, 5)}
    got = minhash_lsh_pairs(ds, verify_threshold=0.5,
                            empty_docs="exact").to_pandas()
    # (0,1) identical empties pair; 2 and 3 are DISTINCT whitespace texts
    # and pair with nothing
    assert set(zip(got["doc_a"], got["doc_b"])) == {(0, 1), (4, 5)}
    assert (got.set_index(["doc_a", "doc_b"])
            .loc[(0, 1), "est_jaccard"]) == 1.0
    # regression: tiny candidate sets used to kill the chained joins
    # (empty join partitions emit degenerate key+right-only blocks)
    base = minhash_jaccard_dups(ds, threshold=0.9).to_pandas()
    assert set(zip(base["doc_a"], base["doc_b"])) == {(4, 5)}
    dups = minhash_jaccard_dups(ds, threshold=0.9,
                                empty_docs="exact").to_pandas()
    assert set(zip(dups["doc_a"], dups["doc_b"])) == {(0, 1), (4, 5)}
    with pytest.raises(ValueError, match="empty_docs"):
        minhash_lsh_pairs(ds, empty_docs="bogus")


def test_zero_candidate_corpora_return_empty(ray_session):
    """Regression: with NO duplicate pairs at all, every dedup/near-dup
    pipeline must return a typed empty frame — Ray's hash join rejects an
    all-empty input even with a correct schema, so the chains
    short-circuit on a zero candidate count instead of joining."""
    import ray.data

    from pisa_ray.ops.dedup import (minhash_jaccard_dups, minhash_lsh_pairs,
                                    ngram_jaccard_pairs)
    from pisa_ray.ops.similarity import cosine_dup_pairs

    texts = ["alpha beta gamma delta epsilon",
             "zeta eta theta iota kappa"]
    ds = _docs_ds(texts)
    # (Ray 2.49 collapses any 0-row dataset to a schema-less frame, so a
    # typed empty isn't representable — emptiness without a crash is the
    # contract under test)
    assert len(ngram_jaccard_pairs(ds, threshold=0.1).to_pandas()) == 0
    assert len(minhash_jaccard_dups(ds, threshold=0.9).to_pandas()) == 0
    assert len(minhash_lsh_pairs(ds, verify_mode="join",
                                 verify_threshold=0.5).to_pandas()) == 0
    # empty_docs='exact' pairs still flow through the short-circuit path
    ds2 = _docs_ds(texts + ["", ""], ids=[0, 1, 2, 3])
    jd2 = minhash_jaccard_dups(ds2, threshold=0.9,
                               empty_docs="exact").to_pandas()
    assert set(zip(jd2["doc_a"], jd2["doc_b"])) == {(2, 3)}
    # orthogonal embeddings -> zero cosine candidates, both modes
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 1], type=pa.int64()),
        "emb": pa.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]],
                        type=pa.list_(pa.float64())),
    }))
    for mode in ("blocked", "exact"):
        cd = cosine_dup_pairs(emb, id_col="vec_id", vec_col="emb",
                              threshold=0.95, mode=mode).to_pandas()
        assert len(cd) == 0, mode
