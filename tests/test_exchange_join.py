"""Exchange-join edge cases: the hash-exchange equality join
(stages/exchange.exchange_join) must reproduce SQL join semantics —
NULL keys never match but outer rows survive, semi/anti modes, string
and multi-column keys consistent across shards, float -0.0 == +0.0,
empty sides — against a DuckDB oracle on the same in-memory tables.

Reference semantics: join_hash.hpp:20-46 (mode list and null
behavior); the per-shard Acero join is the local build/probe.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray

from hyrise_generalized_dedup_ray.stages.exchange import exchange_join


def _dset(tbl: pa.Table):
    return ray.data.from_arrow(tbl).repartition(3)


def _sorted_rows(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:  # widen numerics: nullable int comes back float
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.astype(object)
    df = df.where(pd.notna(df), None)  # None vs NaN repr for nulls
    return sorted(map(repr, df.itertuples(index=False)))


def _oracle(sql: str, **tables) -> pd.DataFrame:
    con = duckdb.connect()
    for name, t in tables.items():
        con.register(name, t.to_pandas())
    return con.execute(sql).df()


L = pa.table({
    "k": [1, 2, 2, None, 5, 0],
    "s": ["a", "b", "c", "d", "e", "f"],
})
R_ = pa.table({
    "rk": [2, 2, 3, None, 0, 9],
    "v": [10, 20, 30, 40, 50, 60],
})


@pytest.mark.parametrize("how,sql_how", [
    ("inner", "JOIN"), ("left_outer", "LEFT JOIN"),
    ("full_outer", "FULL JOIN"),
])
def test_exchange_join_null_keys_match_sql(ray_session, how, sql_how):
    out = exchange_join(_dset(L), _dset(R_), on=["k"], right_on=["rk"],
                        how=how, num_partitions=5).to_pandas()
    exp = _oracle(f"SELECT l.s, r.v FROM l {sql_how} r ON l.k = r.rk",
                  l=L, r=R_)
    assert _sorted_rows(out[["s", "v"]]) == _sorted_rows(exp)


def test_exchange_join_right_outer(ray_session):
    out = exchange_join(_dset(L), _dset(R_), on=["k"], right_on=["rk"],
                        how="right_outer", num_partitions=4).to_pandas()
    exp = _oracle("SELECT l.s, r.v FROM l RIGHT JOIN r ON l.k = r.rk",
                  l=L, r=R_)
    assert _sorted_rows(out[["s", "v"]]) == _sorted_rows(exp)


@pytest.mark.parametrize("how,op", [("semi", "IN"), ("anti", "NOT IN")])
def test_exchange_join_semi_anti_null_semantics(ray_session, how, op):
    out = exchange_join(_dset(L), _dset(R_), on=["k"], right_on=["rk"],
                        how=how, num_partitions=4).to_pandas()
    # SQL IN/NOT IN with a NULL in the subquery: use EXISTS twins, which
    # match hash-join semi/anti (nulls never match; anti keeps null left)
    neg = "NOT " if how == "anti" else ""
    exp = _oracle(f"SELECT l.k, l.s FROM l WHERE {neg}EXISTS "
                  "(SELECT 1 FROM r WHERE r.rk = l.k)", l=L, r=R_)
    assert _sorted_rows(out) == _sorted_rows(exp)


def test_exchange_join_string_and_multicol_keys(ray_session):
    lt = pa.table({"a": [1, 1, 2, 2, None], "b": ["x", "y", "x", None, "x"],
                   "p": [1.0, 2.0, 3.0, 4.0, 5.0]})
    rt = pa.table({"a2": [1, 2, 2, None], "b2": ["x", "x", "zz", "x"],
                   "q": [100, 200, 300, 400]})
    out = exchange_join(_dset(lt), _dset(rt), on=["a", "b"],
                        right_on=["a2", "b2"], how="left_outer",
                        num_partitions=7).to_pandas()
    exp = _oracle("SELECT l.p, r.q FROM l LEFT JOIN r "
                  "ON l.a = r.a2 AND l.b = r.b2", l=lt, r=rt)
    assert _sorted_rows(out[["p", "q"]]) == _sorted_rows(exp)


def test_exchange_join_float_negative_zero_coloc(ray_session):
    lt = pa.table({"f": [0.0, 1.5, -2.0], "s": ["z", "o", "m"]})
    rt = pa.table({"f2": [-0.0, 1.5, 7.0], "v": [1, 2, 3]})
    out = exchange_join(_dset(lt), _dset(rt), on=["f"], right_on=["f2"],
                        num_partitions=8).to_pandas()
    # 0.0 joins -0.0 (SQL equality) — the hash must co-locate them
    assert _sorted_rows(out[["s", "v"]]) == _sorted_rows(
        pd.DataFrame({"s": ["z", "o"], "v": [1, 2]}))


def test_exchange_join_empty_sides(ray_session):
    # no repartition: Ray degrades empty repartitioned blocks to a
    # zero-column schema, at which point no join can recover the names
    empty = ray.data.from_arrow(L.schema.empty_table())
    out = exchange_join(empty, _dset(R_), on=["k"], right_on=["rk"],
                        how="inner", num_partitions=3)
    assert out.count() == 0
    out2 = exchange_join(_dset(R_), empty, on=["rk"], right_on=["k"],
                         how="left_outer", num_partitions=3).to_pandas()
    assert len(out2) == R_.num_rows and out2["s"].isna().all()


def test_semi_anti_size_guard_routes_to_exchange(ray_session, monkeypatch):
    """Above SEMI_BROADCAST_MAX_BYTES the semi/anti operators switch
    from broadcast to the exchange join — results must be identical."""
    from hyrise_generalized_dedup_ray.relational import operators as ops

    left = _dset(L)
    right = _dset(R_.select(["rk"]))
    base_semi = sorted(ops.semi_join(left, right, on=["k"],
                                     right_on=["rk"]).to_pandas()["s"])
    base_anti = sorted(ops.anti_join(left, right, on=["k"],
                                     right_on=["rk"]).to_pandas()["s"])
    monkeypatch.setattr(ops, "SEMI_BROADCAST_MAX_BYTES", 0)
    ex_semi = sorted(ops.semi_join(left, right, on=["k"],
                                   right_on=["rk"]).to_pandas()["s"])
    ex_anti = sorted(ops.anti_join(left, right, on=["k"],
                                   right_on=["rk"]).to_pandas()["s"])
    assert ex_semi == base_semi and ex_anti == base_anti


def test_hierarchical_join_matches_flat(ray_session):
    """Two-level join must equal the flat exchange join in every mode,
    including per_group == 1 and > 1 and empty sides."""
    from hyrise_generalized_dedup_ray.stages.exchange import \
        exchange_join_hierarchical

    for how in ["inner", "left_outer", "right_outer", "full_outer"]:
        flat = exchange_join(_dset(L), _dset(R_), on=["k"],
                             right_on=["rk"], how=how,
                             num_partitions=6).to_pandas()
        for P, G in [(6, 2), (6, 6), (8, 2)]:
            hier = exchange_join_hierarchical(
                _dset(L), _dset(R_), on=["k"], right_on=["rk"], how=how,
                num_partitions=P, num_groups=G).to_pandas()
            assert _sorted_rows(hier) == _sorted_rows(flat), (how, P, G)
    # empty left side
    empty = ray.data.from_arrow(L.schema.empty_table())
    out = exchange_join_hierarchical(empty, _dset(R_), on=["k"],
                                     right_on=["rk"], how="right_outer",
                                     num_partitions=4, num_groups=2)
    assert out.count() == R_.num_rows


try:
    from hypothesis import given, settings, strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:
    _keys = st.lists(st.one_of(st.integers(-3, 6), st.none()),
                     min_size=0, max_size=12)

    @settings(max_examples=20, deadline=None)
    @given(lk=_keys, rk=_keys,
           how=st.sampled_from(["inner", "left_outer", "right_outer",
                                "full_outer"]),
           p=st.integers(2, 7))
    def test_exchange_join_property_vs_duckdb(ray_session, lk, rk, how, p):
        """Randomized semantics check: any key multiset (with NULLs) in
        any mode must match DuckDB on the same tables."""
        lt = pa.table({"k": pa.array(lk, type=pa.int64()),
                       "s": pa.array([f"l{i}" for i in range(len(lk))],
                                     type=pa.string())})
        rt = pa.table({"rk": pa.array(rk, type=pa.int64()),
                       "v": pa.array(list(range(len(rk))),
                                     type=pa.int64())})
        out = exchange_join(ray.data.from_arrow(lt),
                            ray.data.from_arrow(rt),
                            on=["k"], right_on=["rk"], how=how,
                            num_partitions=p).to_pandas()
        sql_how = {"inner": "JOIN", "left_outer": "LEFT JOIN",
                   "right_outer": "RIGHT JOIN",
                   "full_outer": "FULL JOIN"}[how]
        exp = _oracle(f"SELECT l.s, r.v FROM l {sql_how} r "
                      "ON l.k = r.rk", l=lt, r=rt)
        if len(exp) == 0:
            # Ray's to_pandas drops columns on an all-empty dataset
            assert len(out) == 0
            return
        assert _sorted_rows(out[["s", "v"]]) == _sorted_rows(exp)


def test_exchange_join_skewed_key_single_shard(ray_session):
    # one hot key: all rows land in ONE reduce and still join correctly
    n = 5000
    lt = pa.table({"k": [7] * n, "i": list(range(n))})
    rt = pa.table({"k2": [7, 7], "tag": ["a", "b"]})
    out = exchange_join(_dset(lt), _dset(rt), on=["k"], right_on=["k2"],
                        num_partitions=6)
    assert out.count() == 2 * n


@pytest.mark.parametrize("how", ["inner", "left_outer", "semi", "anti"])
def test_exchange_join_salted_matches_unsalted(ray_session, how):
    """Hot-key salting spreads a skewed probe key across reduces
    without changing the join result, in every mode it supports."""
    n = 4000
    lt = pa.table({"k": [7] * n + [1, 2], "i": list(range(n + 2))})
    rt = pa.table({"k2": [7, 7, 1, 9], "tag": ["a", "b", "c", "d"]})
    base = exchange_join(_dset(lt), _dset(rt), on=["k"], right_on=["k2"],
                         how=how, num_partitions=6).to_pandas()
    salted = exchange_join(_dset(lt), _dset(rt), on=["k"],
                           right_on=["k2"], how=how, num_partitions=6,
                           salt=4)
    # the hot key's output now spans >1 reduce (output block)
    per_block = [b.num_rows for b in ray.get(salted.to_arrow_refs())]
    sp = salted.to_pandas()
    assert _sorted_rows(sp) == _sorted_rows(base)
    if how in ("inner", "left_outer"):
        assert sum(1 for c in per_block if c > 0) > 1
    with pytest.raises(ValueError):
        exchange_join(_dset(lt), _dset(rt), on=["k"], right_on=["k2"],
                      how="full_outer", salt=4)


def test_exchange_join_salted_coalesce_false_and_suffixes(ray_session):
    """ADVICE fix: salt must compose with coalesce_keys=False (Acero
    emits TWO __salt key columns) and with explicit suffixes (the salt
    columns come back renamed) — no KeyError, no leaked salt columns."""
    lt = pa.table({"k": [7] * 100 + [1], "i": list(range(101))})
    rt = pa.table({"k2": [7, 1, 9], "tag": ["a", "c", "d"]})
    base = exchange_join(_dset(lt), _dset(rt), on=["k"], right_on=["k2"],
                         num_partitions=4, coalesce_keys=False,
                         left_suffix="_l", right_suffix="_r").to_pandas()
    for kwargs in (dict(coalesce_keys=False),
                   dict(coalesce_keys=False, left_suffix="_l",
                        right_suffix="_r"),
                   dict(left_suffix="_l", right_suffix="_r")):
        out = exchange_join(_dset(lt), _dset(rt), on=["k"],
                            right_on=["k2"], num_partitions=4, salt=3,
                            **kwargs)
        sp = out.to_pandas()
        assert not any(c.startswith("__salt") for c in sp.columns), kwargs
        assert len(sp) == len(base)
        assert sorted(sp["i"]) == sorted(base["i"])


def test_exchange_join_cross_width_keys_widen(ray_session):
    """Same-kind key types of different widths widen instead of
    crashing inside the per-shard Acero join."""
    lt = pa.table({"k": pa.array([1, 2, 3], pa.int32()), "a": [10, 20, 30]})
    rt = pa.table({"k": pa.array([2, 3, 4], pa.int64()), "b": [1, 2, 3]})
    out = exchange_join(_dset(lt), _dset(rt), on=["k"],
                        num_partitions=3).to_pandas()
    assert sorted(out["a"]) == [20, 30]
    # string vs large_string
    l2 = pa.table({"k": pa.array(["a", "b"], pa.large_string()), "a": [1, 2]})
    r2 = pa.table({"k": pa.array(["b", "c"], pa.string()), "b": [5, 6]})
    out2 = exchange_join(_dset(l2), _dset(r2), on=["k"],
                         num_partitions=2).to_pandas()
    assert list(out2["a"]) == [2]
    # mixed timestamp units: equal instants must match
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    l3 = pa.table({"k": pa.array([t0], pa.timestamp("s")), "a": [1]})
    r3 = pa.table({"k": pa.array([t0], pa.timestamp("us")), "b": [9]})
    out3 = exchange_join(_dset(l3), _dset(r3), on=["k"],
                         num_partitions=2).to_pandas()
    assert len(out3) == 1


def test_exchange_join_cross_kind_keys_raise_driver_side(ray_session):
    """Cross-kind key types fail fast with a driver-side TypeError, not
    an ArrowInvalid buried in a Ray task."""
    lt = pa.table({"k": [1, 2], "a": [1, 2]})
    rt = pa.table({"k": ["1", "2"], "b": [1, 2]})
    with pytest.raises(TypeError, match="incompatible key types"):
        exchange_join(_dset(lt), _dset(rt), on=["k"], num_partitions=2)
    rf = pa.table({"k": [1.0, 2.0], "b": [1, 2]})
    with pytest.raises(TypeError, match="incompatible key types"):
        exchange_join(_dset(lt), _dset(rf), on=["k"], num_partitions=2)
