"""Training-data extension operators: text analysis, ANN, embedding
near-dup, multimodal plumbing, documents-table dedup family."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from hyrise_generalized_dedup_ray.relational import load_table


# --- text analysis --------------------------------------------------------

def test_quality_features_counts():
    from hyrise_generalized_dedup_ray.functions.textstats import quality_features

    batch = pa.table({"text": ["hello world!", "", "a b c, d. e"]})
    q = quality_features(batch)
    assert q.column("n_tokens").to_pylist() == [2, 0, 5]
    assert q.column("n_punct").to_pylist() == [1, 0, 2]
    assert q.column("n_chars").to_pylist() == [12, 0, 11]


def test_language_scores():
    from hyrise_generalized_dedup_ray.functions.textstats import language_scores

    preds, hits = language_scores([
        "the cat and the dog is in that house",
        "der hund ist nicht in der stadt und ich",
        "xyzzy qwerty",
    ])
    assert preds[0] == "en"
    assert preds[1] == "de"
    assert preds[2] == "und"
    assert hits.shape[1] == 5


def test_token_count_matches_re2_oracle(ray_session, sf_dir):
    import duckdb
    from hyrise_generalized_dedup_ray.pipelines.suite import token_stats

    ours = token_stats(sf_dir).to_pandas().sort_values("lang").reset_index(drop=True)
    exp = duckdb.sql(f"""
        SELECT lang, COUNT(*) n_docs,
               CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) sum_tokens
        FROM read_parquet('{sf_dir}/documents.parquet') GROUP BY lang ORDER BY lang
    """).fetchdf()
    assert (ours["sum_tokens"].to_numpy() == exp["sum_tokens"].to_numpy()).all()


# --- char shingles --------------------------------------------------------

def test_char_shingles_csr():
    from hyrise_generalized_dedup_ray.functions.text import char_shingles

    flat, offs = char_shingles(["abcdef", "", "xy"], 3)
    assert list(np.diff(offs)) == [4, 0, 0]   # 6-3+1, 0, len<n
    f2, _ = char_shingles(["abcdef"], 3)
    assert (flat[:4] == f2).all()             # boundary masking correct


# --- ANN ------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_embeddings(ray_session):
    import ray
    rng = np.random.default_rng(7)
    n, d = 200, 16
    mat = rng.standard_normal((n, d)).astype(np.float32)
    offs = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    t = pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.ListArray.from_arrays(offs, pa.array(mat.ravel())),
    })
    return ray.data.from_arrow(t), mat


def test_brute_force_topk_exact(small_embeddings):
    from hyrise_generalized_dedup_ray.stages.ann import brute_force_topk

    ds, mat = small_embeddings
    qids = np.array([0, 5])
    qmat = mat[[0, 5]].astype(np.float64)
    res = brute_force_topk(ds, qids, qmat, k=5).to_pandas()
    assert len(res) == 10
    # numpy oracle
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qi, qid in enumerate(qids):
        sims = norm @ norm[qid]
        order = np.lexsort((np.arange(len(sims)), -sims))[:5]
        got = res[res.query_id == qid].sort_values(
            ["sim", "vec_id"], ascending=[False, True]).vec_id.to_numpy()
        assert set(got) == set(order)
        assert got[0] == qid  # self is nearest


def test_lsh_topk_recall(small_embeddings):
    from hyrise_generalized_dedup_ray.stages.ann import (brute_force_topk,
                                                         lsh_bucket_topk)

    ds, mat = small_embeddings
    qids = np.array([1, 2, 3])
    qmat = mat[[1, 2, 3]].astype(np.float64)
    exact = brute_force_topk(ds, qids, qmat, k=3).to_pandas()
    approx = lsh_bucket_topk(ds, qids, qmat, k=3, num_planes=4,
                             multiprobe=1).to_pandas()
    # each query at least finds itself, results are subsets of the corpus
    for qid in qids:
        got = set(approx[approx.query_id == qid].vec_id)
        assert int(qid) in got
    # recall vs exact is positive (loose: approximate structure)
    inter = 0
    for qid in qids:
        inter += len(set(approx[approx.query_id == qid].vec_id)
                     & set(exact[exact.query_id == qid].vec_id))
    assert inter >= len(qids)  # at least the self-hits


# --- embedding near-dup ---------------------------------------------------

def test_embedding_near_dup_pairs(ray_session):
    import ray
    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 8)).astype(np.float32)
    # plant 5 near-identical pairs: vec 50+i ≈ vec i
    dup = base[:5] + rng.standard_normal((5, 8)).astype(np.float32) * 1e-3
    mat = np.vstack([base, dup])
    n, d = mat.shape
    offs = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.ListArray.from_arrays(offs, pa.array(mat.ravel())),
    }))
    from hyrise_generalized_dedup_ray.stages.embed_dedup import (
        embedding_near_dup_pairs, embedding_near_dup_pairs_lsh)

    pairs = embedding_near_dup_pairs(ds, tau=0.999).to_pandas()
    assert {(int(a), int(b)) for a, b in zip(pairs.a, pairs.b)} == \
        {(i, 50 + i) for i in range(5)}
    # LSH variant finds most planted pairs (recall check, 4 tables)
    lsh = embedding_near_dup_pairs_lsh(ds, tau=0.999).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(lsh.a, lsh.b)}
    assert len(found & {(i, 50 + i) for i in range(5)}) >= 4


# --- multimodal -----------------------------------------------------------

def test_multimodal_decode_plumbing(ray_session, sf_dir):
    from hyrise_generalized_dedup_ray.stages.multimodal import (
        DecodeBackend, decode_media, documents_as_media)

    docs = load_table(sf_dir, "documents").limit(50)
    out = decode_media(documents_as_media(docs)).to_pandas()
    assert len(out) == 50
    assert set(out.media_type) <= {"image", "audio", "video"}
    assert (out.n_bytes > 0).all()
    feats = np.stack(out.features.to_numpy())
    assert feats.shape == (50, 8)
    # determinism: same payload → same features
    b = DecodeBackend("fake")
    assert np.allclose(b.features(b"hello"), b.features(b"hello"))
    # real mode rejects junk payloads with a clear error
    with pytest.raises(ValueError):
        DecodeBackend("real").decode("image", b"...")


def test_multimodal_resize_and_frame_sample_plumbing(ray_session, sf_dir):
    from hyrise_generalized_dedup_ray.stages.multimodal import (
        DecodeBackend, documents_as_media, resize_images,
        sample_video_frames)

    docs = load_table(sf_dir, "documents").limit(30)
    media = documents_as_media(docs).materialize()
    resized = resize_images(media, 32, 16).to_pandas()
    is_img = resized.media_type == "image"
    # images re-encoded to the 3-bytes/pixel budget; others untouched
    assert (resized.payload[is_img].map(len) == 32 * 16 * 3).all()
    orig = media.to_pandas()
    assert (resized.payload[~is_img].map(len).to_numpy()
            == orig.payload[~orig.media_type.eq("image")].map(len)
            .to_numpy()).all()

    frames = sample_video_frames(media, every=50).to_pandas()
    n_videos = int((orig.media_type == "video").sum())
    assert set(frames.media_id) <= set(
        orig.media_id[orig.media_type == "video"])
    assert len(frames) >= n_videos  # ≥1 sampled frame per video
    assert (frames.frame.map(len) == 64).all()
    # determinism: same payload + index → same frame bytes
    b = DecodeBackend("fake")
    assert b.sample_frames(b"xyz", 10) == b.sample_frames(b"xyz", 10)
    with pytest.raises(ValueError):        # junk payload, clear error
        DecodeBackend("real").resize(b"p", 8, 8)
    with pytest.raises(NotImplementedError):   # no codec lib here
        DecodeBackend("real").sample_frames(b"p", 5)


def test_repetition_features_known_values():
    from hyrise_generalized_dedup_ray.functions.textstats import \
        repetition_features

    r = repetition_features([
        "a b a b a b",     # 2-grams: ab ba ab ba ab → 5 total, 2 distinct
        "x y z",           # 2 total, 2 distinct
        "w",               # no 2-grams
    ])
    assert r["n_2grams"].tolist() == [5, 2, 0]
    assert r["n_distinct_2grams"].tolist() == [2, 2, 0]
    # floor((5-2)*1e6/5 + 0.5) = 600000
    assert r["dup_2gram_frac_e6"].tolist() == [600000, 0, 0]


def test_redact_pii_on_synthetic_text(ray_session, tmp_path):
    import os
    import pyarrow.parquet as pq
    from hyrise_generalized_dedup_ray.pipelines.suite import (ORACLE_SQL,
                                                              redact_pii)

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": ["mail me at jo.doe+x@site.org or 555-123 4567 89 ok",
                 "no pii here", "two mails a@b.co c@d.io"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": pa.array([10, 11, 23], type=pa.int64()),
    })
    sf = str(tmp_path)
    pq.write_table(t, os.path.join(sf, "documents.parquet"))
    out = redact_pii(sf).to_pandas().sort_values("doc_id")
    assert out["n_emails"].tolist() == [1, 0, 2]
    assert out["n_phones"].tolist() == [1, 0, 0]
    assert out["redacted"].iloc[0] == "mail me at <EMAIL> or <PHONE> ok"
    assert out["redacted"].iloc[2] == "two mails <EMAIL> <EMAIL>"
    # and the DuckDB twin agrees on the same synthetic table
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    exp = con.execute(ORACLE_SQL["redact_pii"]).df().sort_values("doc_id")
    assert exp["redacted"].tolist() == out["redacted"].tolist()
    assert exp["n_phones"].tolist() == out["n_phones"].tolist()


# --- documents dedup family ----------------------------------------------

def test_simhash_blocking_finds_planted_near_dups(ray_session):
    import ray
    from hyrise_generalized_dedup_ray.pipelines.docs import simhash_near_dup_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(500)]
    # long docs: a 1-token edit flips ~5 of ~300 shingles → small Hamming
    texts = [" ".join(rng.choice(vocab, size=300)) for _ in range(40)]
    t0 = texts[0].split(); t0[3] = "zzz"
    t1 = texts[1].split(); t1[10] = "qqq"
    texts += [" ".join(t0), " ".join(t1)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    }))
    pairs = simhash_near_dup_pairs(ds, max_hamming=8, num_partitions=4).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs.a, pairs.b)}
    assert (0, 40) in found
    assert (1, 41) in found


def test_exact_dedup_docs(ray_session):
    import ray
    from hyrise_generalized_dedup_ray.pipelines.docs import exact_dedup_docs

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([3, 1, 2, 7], type=pa.int64()),
        "text": pa.array(["x", "y", "x", "x"]),
    }))
    out = exact_dedup_docs(ds).to_pandas().sort_values("rep_id").reset_index(drop=True)
    assert out.rep_id.tolist() == [1, 2]
    assert out.n_copies.tolist() == [1, 3]


def test_ivf_full_probe_equals_brute_force(ray_session, sf_dir):
    """n_probe = n_lists probes every list → exact brute-force result
    (same sim values, same vec_id tiebreak order)."""
    import numpy as np
    import ray.data  # noqa: F401

    from hyrise_generalized_dedup_ray.pipelines.suite import _query_matrix
    from hyrise_generalized_dedup_ray.relational import load_table
    from hyrise_generalized_dedup_ray.stages.ann import (brute_force_topk,
                                                         ivf_topk)

    qids, qmat = _query_matrix(sf_dir)
    emb = load_table(sf_dir, "embeddings")
    exact = brute_force_topk(emb, qids, qmat, k=5).to_pandas()
    ivf = ivf_topk(emb, qids, qmat, k=5, n_lists=16, n_probe=16).to_pandas()
    key = ["query_id", "sim", "vec_id"]
    a = exact.sort_values(key).reset_index(drop=True)
    b = ivf.sort_values(key).reset_index(drop=True)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert np.allclose(a["sim"], b["sim"])


def test_ivf_default_probe_recall(ray_session, sf_dir):
    """Recall@5 of the default-probe IVF vs exact ≥ 0.6 on the
    near-orthogonal synthetic embeddings (a loose floor — real
    clustered data probes far better)."""
    from hyrise_generalized_dedup_ray.pipelines.suite import _query_matrix
    from hyrise_generalized_dedup_ray.relational import load_table
    from hyrise_generalized_dedup_ray.stages.ann import (brute_force_topk,
                                                         ivf_topk)

    qids, qmat = _query_matrix(sf_dir)
    emb = load_table(sf_dir, "embeddings")
    exact = brute_force_topk(emb, qids, qmat, k=5).to_pandas()
    ivf = ivf_topk(emb, qids, qmat, k=5, n_lists=16, n_probe=6).to_pandas()
    hits = 0
    total = 0
    for q in set(exact["query_id"]):
        want = set(exact[exact["query_id"] == q]["vec_id"])
        got = set(ivf[ivf["query_id"] == q]["vec_id"])
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.6, f"IVF recall {hits/total:.2f}"


def _make_wav(rate=8000, seconds=0.05, channels=1) -> bytes:
    import io
    import wave
    n = int(rate * seconds)
    t = np.arange(n * channels)
    samples = (np.sin(t * 0.3) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_real_backend_decodes_png_and_wav():
    """The 'real' backend actually decodes: a PNG encoded by the pure
    codec comes back with its true dimensions and pixel-derived
    features; a stdlib-written WAV reports its true frame count and
    sample rate.  Video (no codec lib in this container) raises at
    the call site; non-PNG image payloads error clearly."""
    from hyrise_generalized_dedup_ray.functions.png import (decode_png,
                                                            encode_png)
    from hyrise_generalized_dedup_ray.stages.multimodal import DecodeBackend

    be = DecodeBackend("real")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    png = encode_png(img)
    info = be.decode("image", png)
    assert (info["width"], info["height"]) == (17, 24)
    feats = be.features(png, "image")
    assert feats.shape == (8,)
    assert abs(feats[0] - img[:, :, 0].mean() / 255.0) < 1e-6

    wav = _make_wav(rate=8000, seconds=0.05)
    ainfo = be.decode("audio", wav)
    assert ainfo["sample_rate"] == 8000 and ainfo["frames"] == 400
    afeats = be.features(wav, "audio")
    assert afeats.shape == (8,) and afeats[7] == np.float32(8000 / 96000)

    with pytest.raises(NotImplementedError):
        be.decode("video", b"\x00" * 64)
    with pytest.raises(ValueError):
        be.decode("image", b"not a png at all")


def test_real_backend_resize_reencodes():
    from hyrise_generalized_dedup_ray.functions.png import decode_png, encode_png
    from hyrise_generalized_dedup_ray.stages.multimodal import DecodeBackend

    be = DecodeBackend("real")
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    resized = be.resize(encode_png(img), 8, 4)
    out = decode_png(resized)
    assert out.shape == (4, 8, 3)
    # nearest-neighbor: corner pixels survive exactly
    assert (out[0, 0] == img[0, 0]).all()


def test_decode_media_real_mode_end_to_end(ray_session):
    """decode_media(mode='real') over an actor pool on actual PNG/WAV
    payloads — the full Ray plumbing with genuine decodes."""
    import ray

    from hyrise_generalized_dedup_ray.functions.png import encode_png
    from hyrise_generalized_dedup_ray.stages.multimodal import decode_media

    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        if i % 2 == 0:
            img = rng.integers(0, 256, (10 + i, 20, 3), dtype=np.uint8)
            rows.append((i, "image", encode_png(img)))
        else:
            rows.append((i, "audio", _make_wav(rate=16000,
                                               seconds=0.01 * (i + 1))))
    media = pa.table({
        "media_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "media_type": pa.array([r[1] for r in rows]),
        "payload": pa.array([r[2] for r in rows], type=pa.binary()),
        "meta": pa.array(["{}"] * len(rows)),
    })
    out = decode_media(ray.data.from_arrow(media), mode="real") \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert out["height"].tolist()[::2] == [10, 12, 14]
    assert out["width"].tolist()[::2] == [20, 20, 20]
    assert out["sample_rate"].tolist()[1::2] == [16000] * 3
    assert out["frames"].tolist()[1::2] == [320, 640, 960]


def test_decontaminate_planted_overlap(ray_session):
    """A train doc sharing a 5-gram with the eval set is flagged with
    the exact count of distinct shared grams; clean docs are not."""
    import ray

    from hyrise_generalized_dedup_ray.pipelines.decontam import decontaminate

    leak = "the quick brown fox jumps"          # one 5-gram
    ev = pa.table({
        "doc_id": pa.array([100, 101], type=pa.int64()),
        "text": [f"benchmark question {leak} answer choice",
                 "completely different evaluation prompt here"],
    })
    train = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": [
            f"some page then {leak} and more text",   # contaminated
            "an unrelated clean training document body",  # clean
            # shares the gram TWICE -> still 1 distinct overlap
            f"{leak} mid {leak}",
        ],
    })
    out = decontaminate(ray.data.from_arrow(train),
                        ray.data.from_arrow(ev), n=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["contaminated"].tolist() == [True, False, True]
    assert out["n_overlap"].tolist()[0] >= 1
    assert out["n_overlap"].tolist()[1] == 0
    # doc 2: "leak mid leak" also creates bridging grams; the planted
    # gram itself must count exactly once (distinct)
    assert out["n_overlap"].tolist()[2] >= 1


def test_line_dedup_planted_boilerplate(ray_session):
    """Lines in >=k distinct docs vanish; unique lines survive with
    order and delimiter preserved; counts are exact."""
    import ray

    from hyrise_generalized_dedup_ray.pipelines.lines import line_dedup

    banner = "accept all cookies"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": [
            f"{banner}\nunique zero\nfooter",
            f"{banner}\nunique one\nfooter",
            f"intro two\n{banner}\nfooter",
            "totally unique document",
        ],
    })
    out = line_dedup(ray.data.from_arrow(docs), k=3, delimiter="\n") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # banner + footer appear in 3 docs -> boilerplate; uniques survive
    assert out["text_clean"].tolist() == [
        "unique zero", "unique one", "intro two",
        "totally unique document"]
    assert out["n_lines"].tolist() == [3, 3, 3, 1]
    assert out["n_removed"].tolist() == [2, 2, 2, 0]


def test_line_dedup_all_removed_and_dup_within_doc(ray_session):
    """A doc whose every line is boilerplate becomes ''; a line
    repeated WITHIN one doc counts that doc once (distinct-doc
    counting), and removal drops every occurrence."""
    import ray

    from hyrise_generalized_dedup_ray.pipelines.lines import line_dedup

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        # "nav" repeats inside doc 0 but is only in 2 distinct docs ->
        # kept at k=3; "foot" is in all 3 -> removed everywhere
        "text": ["nav\nnav\nfoot", "nav\nbody\nfoot", "foot"],
    })
    out = line_dedup(ray.data.from_arrow(docs), k=3, delimiter="\n") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["text_clean"].tolist() == ["nav\nnav", "nav\nbody", ""]
    assert out["n_removed"].tolist() == [1, 1, 1]


def test_bloom_filter_properties(ray_session):
    """No false negatives ever; false-positive rate near the design
    fpp on a disjoint probe set."""
    import ray

    from hyrise_generalized_dedup_ray.stages.bloom import (
        _test_bits, bloom_params, build_bloom)
    from hyrise_generalized_dedup_ray.functions.hashing import hash_strings

    members = [f"member-{i}" for i in range(5000)]
    others = [f"other-{i}" for i in range(5000)]
    ds = ray.data.from_arrow(pa.table({"text": members})) \
        .repartition(4)
    ref, m_bits, k = build_bloom(ds, "text", n_items_hint=5000, fpp=0.01)
    bitmap = ray.get(ref)
    assert _test_bits(bitmap, hash_strings(np.array(members,
                                                    dtype=object)),
                      m_bits, k).all()
    fp = _test_bits(bitmap, hash_strings(np.array(others, dtype=object)),
                    m_bits, k).mean()
    assert fp < 0.05   # designed 0.01 + slack
    m2, k2 = bloom_params(5000, 0.01)
    assert (m2, k2) == (m_bits, k)


def test_incremental_dedup_exact(ray_session):
    """Bloom prefilter + exact confirm equals a plain anti-join
    ground truth, including bloom false positives being corrected."""
    import ray

    from hyrise_generalized_dedup_ray.stages.bloom import incremental_dedup

    existing = pa.table({
        "doc_id": pa.array(range(100), type=pa.int64()),
        "text": [f"seen text {i % 40}" for i in range(100)],
    })
    incoming = pa.table({
        "doc_id": pa.array(range(1000, 1060), type=pa.int64()),
        # 0..29 -> dup of existing (i%40 in 0..29), 30..59 -> new
        "text": [f"seen text {i}" if i < 30 else f"fresh text {i}"
                 for i in range(60)],
    })
    out = incremental_dedup(ray.data.from_arrow(existing),
                            ray.data.from_arrow(incoming)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 60
    assert out["is_new"].tolist() == [False] * 30 + [True] * 30


def test_semantic_dedup_matches_sequential(ray_session):
    """Distributed SemDeDup (train-in-task centroids, one cluster-id
    exchange, blocked per-cluster kernel) reproduces a sequential
    brute-force of the same rule exactly."""
    import ray

    from hyrise_generalized_dedup_ray.stages.ann import (
        _embedding_matrix, _normalize, _train_centroids)
    from hyrise_generalized_dedup_ray.stages.embed_dedup import semantic_dedup

    rng = np.random.default_rng(7)
    dim, n_fill = 8, 80
    groups = [rng.normal(size=dim) for _ in range(3)]
    vecs, expect_dup = [], []
    for g in groups:                      # 4 near-copies per group
        for _ in range(4):
            vecs.append(g + rng.normal(scale=1e-3, size=dim))
    vecs += [rng.normal(size=dim) for _ in range(n_fill)]
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([list(np.asarray(v, dtype=np.float32))
                               for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    tau, k, iters, seed = 0.95, 4, 8, 0x5EED
    out = semantic_dedup(ray.data.from_arrow(t), tau=tau, n_clusters=k,
                         train_sample=len(vecs), iters=iters, seed=seed) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(out) == len(vecs)

    # sequential oracle: same deterministic centroids, brute force rule
    cent = ray.get(_train_centroids.remote(
        [ray.put(t)], "embedding", k, iters, seed))
    ids, mat = _embedding_matrix(t, "embedding")
    x = _normalize(mat)
    cl = np.argmax(x @ cent.T, axis=1)
    kept_seq = {}
    for c in np.unique(cl):
        member = np.flatnonzero(cl == c)
        member = member[np.argsort(ids[member])]
        for pos, j in enumerate(member):
            lower = member[:pos]
            dup = len(lower) and (x[lower] @ x[j] >= tau).any()
            kept_seq[int(ids[j])] = not dup
    assert out.set_index("vec_id")["is_kept"].to_dict() == kept_seq
    # sanity: the planted near-copy groups actually lost members
    n_dropped = int((~out["is_kept"]).sum())
    assert n_dropped >= 6


def test_aggregate_quantiles_nulls_and_two_keys(ray_session):
    """Exact per-group quantiles vs DuckDB quantile_cont, including a
    NULL group key and a two-column key."""
    import duckdb
    import ray

    from hyrise_generalized_dedup_ray.relational import aggregate_quantiles

    rng = np.random.default_rng(3)
    n = 400
    t = pa.table({
        "g": pa.array([None if i % 17 == 0 else f"g{i % 5}"
                       for i in range(n)]),
        "h": pa.array([i % 2 for i in range(n)], type=pa.int64()),
        "v": pa.array(rng.integers(0, 1000, n), type=pa.int64()),
    })
    out = aggregate_quantiles(ray.data.from_arrow(t), ["g", "h"], "v",
                              [0.5, 0.9], num_partitions=3).to_pandas()
    exp = duckdb.connect().execute(
        "SELECT g, h, quantile_cont(v, 0.5) AS q50, "
        "quantile_cont(v, 0.9) AS q90 FROM t GROUP BY g, h").fetchdf()
    a = out.sort_values(["g", "h"], na_position="first") \
        .reset_index(drop=True)
    b = exp.sort_values(["g", "h"], na_position="first") \
        .reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["g"].isna() == b["g"].isna()).all()
    np.testing.assert_allclose(a["q50"], b["q50"])
    np.testing.assert_allclose(a["q90"], b["q90"])


def test_line_dedup_universal_line_across_blocks(ray_session):
    """A line present in EVERY doc across many blocks is removed even
    though the per-batch hot-line cap ships only k pairs per batch;
    a line with k-1 distinct docs split across blocks survives the cap
    logic correctly when it reaches k corpus-wide."""
    import ray

    from hyrise_generalized_dedup_ray.pipelines.lines import line_dedup

    n = 60
    texts = []
    for i in range(n):
        # "nav" universal; "pair" in docs 10,20,30 (crosses blocks)
        extra = "\npair line" if i in (10, 20, 30) else ""
        texts.append(f"nav bar{extra}\nunique {i}")
    docs = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": texts,
    })
    out = line_dedup(ray.data.from_arrow(docs).repartition(8),
                     k=3, delimiter="\n") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (out["text_clean"] == [f"unique {i}" for i in range(n)]).all()
    exp_removed = [2 if i in (10, 20, 30) else 1 for i in range(n)]
    assert out["n_removed"].tolist() == exp_removed


def test_hll_approx_count_distinct(ray_session):
    """HLL estimate within ~3x its theoretical error at several
    cardinalities, deterministic across partitionings."""
    import ray

    from hyrise_generalized_dedup_ray.relational import (
        approx_count_distinct)

    for true_n in (50, 1000, 20000):
        vals = [f"value-{i % true_n}" for i in range(true_n * 2)]
        t = pa.table({"v": pa.array(vals)})
        got = approx_count_distinct(
            ray.data.from_arrow(t).repartition(6), "v", p=12) \
            .to_pandas()["n_approx"].iloc[0]
        err = abs(got - true_n) / true_n
        assert err < 0.05, (true_n, got, err)
        got2 = approx_count_distinct(
            ray.data.from_arrow(t).repartition(2), "v", p=12) \
            .to_pandas()["n_approx"].iloc[0]
        assert got2 == got   # partition-independent
