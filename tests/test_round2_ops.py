"""Round-2 operator coverage: stable/NULLS-FIRST sort, Arrow-native
broadcast join (null-key semantics, duplicate-key fan-out), band join,
correlated EXISTS rewrite, .tbl loader, Print, float mod, top-k tie
boundaries, vectorized language ID, single-shuffle count-distinct."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hyrise_generalized_dedup_ray import relational as R


def _ds(ray, tbl: pa.Table):
    return ray.data.from_arrow(tbl)


def _pd(ds) -> pd.DataFrame:
    return ds.to_pandas()


# ---------------------------------------------------------------- sort

def test_sort_nulls_first_and_tiebreak(ray_session):
    t = pa.table({
        "k": pa.array([3.0, None, 1.0, None, 2.0, 1.0]),
        "id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
    })
    out = _pd(R.sort(_ds(ray_session, t), ["k"], descending=True,
                     nulls_first=True, tiebreak="id"))
    # NULLS FIRST (id asc among nulls), then 3, 2, 1 (tie broken by id)
    assert out["id"].tolist() == [2, 4, 1, 5, 3, 6]
    out = _pd(R.sort(_ds(ray_session, t), ["k"], descending=False,
                     nulls_first=False, tiebreak="id"))
    assert out["id"].tolist() == [3, 6, 5, 1, 2, 4]


def test_top_k_tie_at_boundary(ray_session):
    # 30 rows all tied on key → LIMIT 5 must take the 5 smallest ids
    t = pa.table({"key": pa.array([7.0] * 30),
                  "id": pa.array(list(range(30)), type=pa.int64())})
    ds = _ds(ray_session, t).repartition(6)  # ties straddle blocks
    out = _pd(R.top_k(ds, "key", 5, descending=True, tiebreak="id"))
    assert out["id"].tolist() == [0, 1, 2, 3, 4]


# ------------------------------------------------------ broadcast join

def test_broadcast_join_inner_fanout_and_left_nulls(ray_session):
    left = pa.table({"k": pa.array([1, 2, 3, None], type=pa.int64()),
                     "l": pa.array([10, 20, 30, 40], type=pa.int64())})
    small = pa.table({"k": pa.array([1, 1, 2, None], type=pa.int64()),
                      "r": pa.array([100, 101, 200, 999], type=pa.int64())})
    inner = _pd(R.broadcast_join(_ds(ray_session, left), small, on=["k"]))
    assert sorted(zip(inner["l"], inner["r"])) == \
        [(10, 100), (10, 101), (20, 200)]
    lj = _pd(R.broadcast_join(_ds(ray_session, left), small, on=["k"],
                              how="left_outer"))
    assert len(lj) == 5  # 3 matches + 2 unmatched left rows (3, None)
    unmatched = lj[lj["r"].isna()]["l"].tolist()
    assert sorted(unmatched) == [30, 40]


def test_semi_anti_null_keys_never_match(ray_session):
    left = pa.table({"k": pa.array([1, None, 5], type=pa.int64()),
                     "l": pa.array([1, 2, 3], type=pa.int64())})
    right = pa.table({"k": pa.array([1, None], type=pa.int64())})
    semi = _pd(R.semi_join(_ds(ray_session, left), right, on=["k"]))
    assert semi["l"].tolist() == [1]  # null-keyed left row does NOT match
    anti = _pd(R.anti_join(_ds(ray_session, left), right, on=["k"]))
    # AntiNullAsFalse: null key has no match → kept
    assert sorted(anti["l"].tolist()) == [2, 3]


def test_broadcast_join_rejects_outer_modes(ray_session):
    left = pa.table({"k": pa.array([1], type=pa.int64())})
    with pytest.raises(ValueError):
        R.broadcast_join(_ds(ray_session, left), left, on=["k"],
                         how="full_outer")


# ------------------------------------------------------------ band join

def test_hash_sample_deterministic_and_partition_invariant(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    from hyrise_generalized_dedup_ray.relational.operators import hash_sample

    ids = pa.table({"id": pa.array(np.arange(20_000), type=pa.int64())})
    a = hash_sample(ray.data.from_arrow(ids).repartition(3),
                    "id", rate_ppm=250_000, seed=11).to_pandas()
    b = hash_sample(ray.data.from_arrow(ids).repartition(17),
                    "id", rate_ppm=250_000, seed=11).to_pandas()
    c = hash_sample(ray.data.from_arrow(ids), "id",
                    rate_ppm=250_000, seed=12).to_pandas()
    assert sorted(a["id"]) == sorted(b["id"])       # partition-invariant
    assert 0.23 < len(a) / 20_000 < 0.27            # ~rate
    assert sorted(c["id"]) != sorted(a["id"])       # seed changes the set


def test_band_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    ak = rng.integers(0, 1000, 300)
    bk = rng.integers(0, 1000, 300)
    a = pa.table({"a_id": pa.array(range(300), type=pa.int64()),
                  "a_k": pa.array(ak, type=pa.int64())})
    b = pa.table({"b_id": pa.array(range(300), type=pa.int64()),
                  "b_k": pa.array(bk, type=pa.int64())})
    lo, hi = -3, 12
    out = _pd(R.band_join(_ds(ray_session, a), _ds(ray_session, b),
                          "a_k", "b_k", lo, hi, num_partitions=4))
    got = set(zip(out["a_id"], out["b_id"]))
    want = {(i, j) for i in range(300) for j in range(300)
            if lo <= bk[j] - ak[i] <= hi}
    assert got == want


# --------------------------------------------------- correlated exists

def test_exists_join_with_residual(ray_session):
    c = pa.table({"ck": pa.array([1, 2, 3], type=pa.int64()),
                  "bal": pa.array([5.0, 50.0, 500.0])})
    o = pa.table({"ok": pa.array([1, 1, 2, 9], type=pa.int64()),
                  "price": pa.array([4.0, 6.0, 10.0, 1.0])})
    e = _pd(R.exists_join(_ds(ray_session, c), _ds(ray_session, o),
                          on=["ck"], right_on=["ok"],
                          residual=R.col("price") > R.col("bal"),
                          num_partitions=2))
    assert sorted(e["ck"].tolist()) == [1]  # only ck=1 has price>bal
    ne = _pd(R.exists_join(_ds(ray_session, c), _ds(ray_session, o),
                           on=["ck"], right_on=["ok"],
                           residual=R.col("price") > R.col("bal"),
                           negate=True, num_partitions=2))
    assert sorted(ne["ck"].tolist()) == [2, 3]


# ----------------------------------------------------------- tbl loader

def test_load_tbl_reference_format(ray_session, tmp_path):
    p = tmp_path / "mini.tbl"
    p.write_text("a|b|c\nint|float_null|string\n"
                 "1|2.5|x\n2|null|null\n3|4.0|y\n")
    out = _pd(R.load_tbl(str(p)))
    assert out["a"].tolist() == [1, 2, 3]
    assert out["b"].isna().tolist() == [False, True, False]
    # non-nullable string keeps the literal "null"
    assert out["c"].tolist() == ["x", "null", "y"]


def test_tbl_roundtrip(ray_session, tmp_path):
    t = pa.table({
        "i": pa.array([1, 2, None], type=pa.int32()),
        "d": pa.array([1.5, None, 3.0], type=pa.float64()),
        "s": pa.array(["x", "null", "z"]),
    })
    p = tmp_path / "rt.tbl"
    R.export_tbl(_ds(ray_session, t), str(p))
    back = _pd(R.load_tbl(str(p)))
    assert back["i"].fillna(-1).tolist() == [1, 2, -1]
    assert back["s"].tolist() == ["x", "null", "z"]
    assert back["d"].fillna(-1).tolist() == [1.5, -1, 3.0]


def test_print_table(ray_session):
    t = pa.table({"x": pa.array([1, 2], type=pa.int64()),
                  "y": pa.array(["a", "b"])})
    s = R.print_table(_ds(ray_session, t), n=5)
    assert "x:int64" in s and "a" in s and s.count("\n") >= 3


# ------------------------------------------------------- expressions

def test_mod_float_and_int(ray_session):
    t = pa.table({"x": pa.array([7.5, -7.5, 9.0]),
                  "i": pa.array([7, -7, 9], type=pa.int64())})
    out = _pd(R.projection(_ds(ray_session, t), {
        "mf": R.mod(R.col("x"), R.lit(2.0)),
        "mi": R.mod(R.col("i"), R.lit(2)),
    }))
    np.testing.assert_allclose(out["mf"], [1.5, -1.5, 1.0])
    assert out["mi"].tolist() == [1, -1, 1]


# -------------------------------------------------- vectorized lang id

def test_language_scores_matches_naive():
    from hyrise_generalized_dedup_ray.functions.textstats import (
        STOPWORDS, language_scores)

    texts = ["the cat and the hat", "der hund und die katze",
             "le chat est dans la maison", "", "xyzzy plugh",
             "  the  THE the ", "el perro y el gato en la casa"]
    preds, hits = language_scores(texts)
    langs = sorted(STOPWORDS)
    for i, t in enumerate(texts):
        toks = t.lower().split()
        naive = [sum(1 for w in toks if w in STOPWORDS[c]) for c in langs]
        assert hits[i].tolist() == naive, t
        want = "und" if max(naive) == 0 else langs[int(np.argmax(naive))]
        assert preds[i] == want


# ------------------------------------------------ alias / unary minus

def test_alias_and_unary_minus(ray_session):
    t = pa.table({"x": pa.array([1, -2, 3], type=pa.int64()),
                  "y": pa.array([1.5, 2.5, -3.5])})
    out = _pd(R.alias(_ds(ray_session, t), {"x": "renamed_x"}))
    assert list(out.columns) == ["renamed_x", "y"]
    neg = _pd(R.projection(_ds(ray_session, t),
                           {"nx": R.neg(R.col("x")), "ny": -R.col("y")}))
    assert neg["nx"].tolist() == [-1, 2, -3]
    assert neg["ny"].tolist() == [-1.5, -2.5, 3.5]


# ------------------------------------------------ batched winnowing

def test_batch_winnow_matches_per_doc():
    from hyrise_generalized_dedup_ray.functions.substr import (
        batch_winnow_fingerprints, winnow_fingerprints)

    rng = np.random.default_rng(5)
    texts = ["", "short", "x" * 31, "y" * 50,
             *(" ".join(rng.choice(["aa", "bb", "cc", "dd"], rng.integers(5, 80)))
               for _ in range(30))]
    batched = batch_winnow_fingerprints(texts)
    for t, got in zip(texts, batched):
        np.testing.assert_array_equal(got, winnow_fingerprints(t), err_msg=t[:20])


def test_small_group_fast_path_matches_suffix_array():
    from hyrise_generalized_dedup_ray.functions.substr import (
        PAIRWISE_MAX_GROUP, _small_group_repeats, cross_doc_repeats,
        suffix_array)  # noqa: F401  (suffix_array: ensure SA path importable)

    rng = np.random.default_rng(9)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    shared = " ".join(rng.choice(vocab, 15))  # > 50 bytes
    mk = lambda: " ".join(rng.choice(vocab, 40))
    with_run = [(mk() + " " + shared + " " + mk()).encode(),
                (mk() + " " + shared).encode()]
    without = [mk().encode(), ("zulu " * 30).encode()]
    assert cross_doc_repeats(with_run, 50) == [(0, 1)]
    assert _small_group_repeats(with_run, 50) == [(0, 1)]
    assert cross_doc_repeats(without, 50) == []
    # 4-doc group: all-pairs among run-sharers, none to the outsider
    grp = [with_run[0], with_run[1], (mk() + " " + shared).encode(),
           mk().encode()]
    assert set(cross_doc_repeats(grp, 50)) == {(0, 1), (0, 2), (1, 2)}
    assert len(grp) <= PAIRWISE_MAX_GROUP


# -------------------------------------------- vectorized union-find

def test_vector_components_matches_union_find():
    from hyrise_generalized_dedup_ray.functions.pairs import UnionFind
    from hyrise_generalized_dedup_ray.stages.components import (
        _vector_components)

    rng = np.random.default_rng(1)
    # mix of rings, stars, long chains, singleton-ish edges
    edges = []
    base = 0
    for size, shape in [(500, "chain"), (64, "ring"), (300, "star"),
                        (1000, "chain")]:
        ids = list(range(base, base + size))
        if shape == "chain":
            edges += list(zip(ids, ids[1:]))
        elif shape == "ring":
            edges += list(zip(ids, ids[1:])) + [(ids[-1], ids[0])]
        else:
            edges += [(ids[0], x) for x in ids[1:]]
        base += size + 10
    rng.shuffle(edges)
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    nodes, labels = _vector_components(a, b)
    uf = UnionFind()
    for x, y in edges:
        uf.union(x, y)
    want = uf.labels(nodes.tolist())
    got = dict(zip(nodes.tolist(), labels.tolist()))
    assert got == want


# -------------------------------------------- simhash hot-block cap

def test_simhash_mega_block_is_capped_and_still_finds_dups(ray_session):
    """A boilerplate mega-block (hundreds of docs sharing simhash
    chunks) must not OOM and near-identical planted pairs must
    survive the deterministic sub-blocking."""
    from dataclasses import replace

    from hyrise_generalized_dedup_ray.config import DEFAULT_ENGINE_CONFIG
    from hyrise_generalized_dedup_ray.pipelines.docs import (
        simhash_near_dup_pairs)

    rng = np.random.default_rng(11)
    base = " ".join(rng.choice(["alpha", "beta", "gamma", "delta",
                                "epsilon", "zeta"], 120))
    texts, ids = [], []
    # 300 docs sharing the same long template → one mega block per chunk
    for i in range(300):
        texts.append(base + f" unique{i}")
        ids.append(i)
    # planted exact near-dup pair (identical text → hamming 0)
    texts += [base + " twin", base + " twin"]
    ids += [1000, 1001]
    docs = ray_session.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts),
    }))
    eng = replace(DEFAULT_ENGINE_CONFIG, simhash_block_cap=64)
    out = _pd(simhash_near_dup_pairs(docs, eng=eng, max_hamming=3,
                                     num_partitions=4))
    got = set(zip(out["a"], out["b"]))
    # twins hash identically → same sub-block by construction
    assert (1000, 1001) in got


# ------------------------------------- single-shuffle count-distinct

def test_aggregate_count_distinct_partition_kernel(ray_session):
    rng = np.random.default_rng(3)
    n = 5000
    g = rng.choice(["a", "b", "c"], n)
    v = rng.integers(0, 50, n).astype(float)
    d = rng.integers(0, 40, n)
    mask = rng.random(n) < 0.1
    vv = v.copy()
    vv[mask] = np.nan
    t = pa.table({"g": pa.array(g), "v": pa.array(vv, from_pandas=True),
                  "d": pa.array(d, type=pa.int64())})
    out = _pd(R.aggregate(_ds(ray_session, t).repartition(5), ["g"], {
        "n": R.agg("count_star"), "nv": R.agg("count", "v"),
        "s": R.agg("sum", "v"), "mn": R.agg("min", "v"),
        "mx": R.agg("max", "v"), "av": R.agg("avg", "v"),
        "sd": R.agg("std", "v"), "nd": ("count_distinct", "d"),
    })).set_index("g").sort_index()
    df = pd.DataFrame({"g": g, "v": vv, "d": d})
    want = df.groupby("g").agg(
        n=("v", "size"), nv=("v", "count"), s=("v", "sum"),
        mn=("v", "min"), mx=("v", "max"), av=("v", "mean"),
        sd=("v", "std"), nd=("d", "nunique")).sort_index()
    for c in ["n", "nv", "nd"]:
        assert out[c].tolist() == want[c].tolist(), c
    for c in ["s", "mn", "mx", "av", "sd"]:
        np.testing.assert_allclose(out[c], want[c], rtol=1e-12, err_msg=c)


# ------------------------------------- views / prepared plans (§2.9)

def test_create_load_drop_view(ray_session, tmp_path):
    from hyrise_generalized_dedup_ray.relational import catalog as C

    t = pa.table({"k": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "v": pa.array(["a", "b", "c", "d"])})
    import pyarrow.parquet as pq
    pq.write_table(t, str(tmp_path / "region.parquet"))

    def big_keys(sf_dir, min_k=3):
        ds = C.load_table(sf_dir, "region")
        return ds.filter(lambda row: row["k"] >= min_k)

    C.create_view("big_keys", big_keys)
    with pytest.raises(ValueError):
        C.create_view("big_keys", big_keys)        # duplicate
    with pytest.raises(ValueError):
        C.create_view("region", big_keys)          # shadows base table
    assert "big_keys" in C.list_views()

    # default + bound prepared-plan parameter
    out = _pd(C.load_view(str(tmp_path), "big_keys")).sort_values("k")
    assert out["k"].tolist() == [3, 4]
    out2 = _pd(C.load_view(str(tmp_path), "big_keys", min_k=2))
    assert sorted(out2["k"].tolist()) == [2, 3, 4]

    C.drop_view("big_keys")
    with pytest.raises(KeyError):
        C.drop_view("big_keys")
    C.drop_view("big_keys", if_exists=True)        # no raise


def test_batch_docset_keys_matches_loop():
    from hyrise_generalized_dedup_ray.functions.pairs import (
        batch_docset_keys, docset_key)

    rng = np.random.default_rng(7)
    sizes = np.array([2, 3, 1, 4096, 4097, 9000, 2], dtype=np.int64)
    ids = rng.integers(0, 1 << 62, int(sizes.sum()), dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    got = batch_docset_keys(ids, starts, sizes)
    want = np.array([docset_key(np.sort(ids[s:s + n]) * 0 + ids[s:s + n])
                     for s, n in zip(starts, sizes)], dtype=np.uint64)
    assert got.tolist() == want.tolist()


def test_stratified_sample_null_group_and_dict_rates(ray_session):
    """The dictionary-encoded rate lookup keeps hash_sample parity per
    group and gives null group values the default rate."""
    import pyarrow as pa
    import ray
    from hyrise_generalized_dedup_ray.relational.operators import (
        hash_sample, stratified_sample)
    n = 4000
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "g": pa.array((["en", "de", None, "fr"] * n)[:n]),
    })
    rates = {"en": 500_000, "de": 100_000, "fr": 0}
    out = stratified_sample(ray.data.from_arrow(t).repartition(5),
                            "id", "g", rates, default_ppm=250_000,
                            seed=3).to_pandas()
    # per group, membership must equal hash_sample at that group's rate
    full = t.to_pandas()
    for g, ppm in [("en", 500_000), ("de", 100_000), ("fr", 0),
                   (None, 250_000)]:
        grp_ids = full[full["g"].isna() if g is None else
                       (full["g"] == g)]["id"]
        kept = hash_sample(
            ray.data.from_arrow(pa.table({"id": pa.array(grp_ids,
                                                         pa.int64())})),
            "id", ppm, seed=3).to_pandas()
        got = sorted(out[out["g"].isna() if g is None else
                         (out["g"] == g)]["id"])
        assert got == sorted(kept["id"] if len(kept) else []), g


def test_execlog_worker_records_reach_driver(ray_session):
    """record_exec inside a Ray task routes through the detached sink
    actor and shows up in the driver's exec_rows()/log_rows() — the
    real-cluster behavior the meta_exec/meta_log tables promise."""
    import ray

    from hyrise_generalized_dedup_ray.state import execlog

    execlog.clear()
    execlog.record_exec("driver_stage", 0.5, 10)

    @ray.remote
    def worker_stage():
        from hyrise_generalized_dedup_ray.state import execlog as el
        el.record_exec("worker_stage", 1.25, 42)
        el.log("from a worker", level="warn")
        return True

    assert ray.get(worker_stage.remote())
    # fire-and-forget append: poll briefly for the sink to drain
    import time
    for _ in range(50):
        rows = execlog.exec_rows()
        if any(r[0] == "worker_stage" for r in rows):
            break
        time.sleep(0.1)
    rows = execlog.exec_rows()
    assert ("driver_stage", 0.5, 10) in rows
    assert ("worker_stage", 1.25, 42) in rows
    assert any(m == "from a worker" and lv == "warn"
               for _, lv, m in execlog.log_rows())
    execlog.clear()
    assert execlog.exec_rows() == []
