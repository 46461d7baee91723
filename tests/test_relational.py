"""Relational operator library vs DuckDB oracle on the sf0.001 tables —
the reference's SQLite-testrunner strategy (SURVEY.md §5.2) recast:
each operator both unit-checked on tiny in-memory tables and diffed
against the equivalent SQL."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hyrise_generalized_dedup_ray import relational as R


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def assert_same(ours: pd.DataFrame, sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    theirs = con.execute(sql).fetchdf()
    a, b = _sorted(ours), _sorted(theirs)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            np.testing.assert_allclose(av.astype(float), bv.astype(float),
                                       rtol=1e-9)
        else:
            assert (av == bv).all(), c


def test_scan_filter_expressions(ray_session, sf_dir):
    li = R.load_table(sf_dir, "lineitem")
    out = R.table_scan(
        li, (R.col("l_quantity") > R.lit(45.0)) & (R.col("l_discount") <= R.lit(0.02))
    ).select_columns(["l_orderkey", "l_linenumber"]).to_pandas()
    assert_same(out, "SELECT l_orderkey, l_linenumber FROM lineitem "
                     "WHERE l_quantity > 45 AND l_discount <= 0.02", sf_dir)


def test_projection_scalar_functions(ray_session, sf_dir):
    c = R.load_table(sf_dir, "customer")
    out = R.projection(c, {
        "k": "c_custkey",
        "pfx": R.substr(R.col("c_name"), 1, 8),
        "lbl": R.concat(R.col("c_mktsegment"), R.lit("_"), R.col("c_custkey")),
        "neg": R.case((R.col("c_acctbal") < R.lit(0.0), R.lit(1)), else_=R.lit(0)),
    }).to_pandas()
    assert_same(out, """
        SELECT c_custkey AS k, SUBSTR(c_name,1,8) AS pfx,
               c_mktsegment || '_' || CAST(c_custkey AS VARCHAR) AS lbl,
               CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS neg
        FROM customer""", sf_dir)


def test_aggregate_with_count_distinct(ray_session, sf_dir):
    li = R.load_table(sf_dir, "lineitem")
    out = R.aggregate(li, ["l_returnflag"], {
        "n": R.agg("count_star"),
        "nd": ("count_distinct", "l_partkey"),
        "mx": R.agg("max", "l_quantity"),
    }).to_pandas()
    assert_same(out, """
        SELECT l_returnflag, COUNT(*) AS n,
               COUNT(DISTINCT l_partkey) AS nd, MAX(l_quantity) AS mx
        FROM lineitem GROUP BY l_returnflag""", sf_dir)


def test_hash_join_modes(ray_session, sf_dir):
    c = R.load_table(sf_dir, "customer")
    n = R.load_table(sf_dir, "nation")
    inner = R.hash_join(c, n, on=["c_nationkey"], right_on=["n_nationkey"],
                        num_partitions=4)
    out = R.aggregate(inner, ["n_name"], {"cnt": R.agg("count_star")}).to_pandas()
    assert_same(out, "SELECT n_name, COUNT(*) AS cnt FROM customer "
                     "JOIN nation ON c_nationkey=n_nationkey GROUP BY n_name",
                sf_dir)


def test_semi_anti_broadcast(ray_session, sf_dir):
    o = R.load_table(sf_dir, "orders")
    c = R.load_table(sf_dir, "customer")
    rich = R.table_scan(c, R.col("c_acctbal") > R.lit(5000.0)).select_columns(["c_custkey"])
    semi_n = R.semi_join(o, rich, on=["o_custkey"], right_on=["c_custkey"]).count()
    anti_n = R.anti_join(o, rich, on=["o_custkey"], right_on=["c_custkey"]).count()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf_dir}/customer.parquet')")
    exp_semi = con.execute("SELECT COUNT(*) FROM orders WHERE o_custkey IN "
                           "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000)").fetchone()[0]
    assert semi_n == exp_semi
    assert anti_n == o.count() - exp_semi


def test_top_k_matches_full_sort(ray_session, sf_dir):
    o = R.load_table(sf_dir, "orders")
    tk = R.top_k(o, "o_totalprice", 20, descending=True,
                 tiebreak="o_orderkey").to_pandas()
    assert_same(tk[["o_orderkey", "o_totalprice"]],
                "SELECT o_orderkey, o_totalprice FROM orders "
                "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20", sf_dir)


def test_set_ops(ray_session, sf_dir):
    c = R.projection(R.load_table(sf_dir, "customer"), {"k": "c_nationkey"})
    s = R.projection(R.load_table(sf_dir, "supplier"), {"k": "s_nationkey"})
    assert R.union_distinct(c, s).count() == 25
    assert R.intersect(c, s).count() == 10
    dif = R.difference(c, s).count()
    con = duckdb.connect()
    exp = con.execute(
        f"SELECT COUNT(*) FROM (SELECT c_nationkey FROM read_parquet('{sf_dir}/customer.parquet') "
        f"EXCEPT SELECT s_nationkey FROM read_parquet('{sf_dir}/supplier.parquet'))"
    ).fetchone()[0]
    assert dif == exp


def test_between_in_like_null_kernels(ray_session):
    import ray
    t = pa.table({
        "x": pa.array([1, 5, 10, None], type=pa.int64()),
        "s": pa.array(["alpha", "beta", "alp%ha", None]),
    })
    ds = ray.data.from_arrow(t)
    assert R.table_scan(ds, R.between(R.col("x"), 2, 10)).count() == 2
    assert R.table_scan(ds, R.between(R.col("x"), 2, 10, "[)")).count() == 1
    assert R.table_scan(ds, R.in_(R.col("x"), [1, 10])).count() == 2
    assert R.table_scan(ds, R.is_null(R.col("x"))).count() == 1
    assert R.table_scan(ds, R.like(R.col("s"), "al%")).count() == 2
    assert R.table_scan(ds, R.like(R.col("s"), "alp\\%ha")).count() == 1
    assert R.table_scan(ds, R.is_not_null(R.col("s")) & (R.col("x") < R.lit(6))).count() == 2


def test_cross_product(ray_session):
    import ray
    left = ray.data.from_arrow(pa.table({"a": [1, 2, 3]}))
    right = pa.table({"b": ["x", "y"]})
    out = R.product(left, right).to_pandas()
    assert len(out) == 6
    assert set(map(tuple, out.values)) == {(i, c) for i in (1, 2, 3) for c in "xy"}


def test_import_export_roundtrip(ray_session, tmp_path, sf_dir):
    from hyrise_generalized_dedup_ray.relational.catalog import (
        export_table, import_file)

    nat = R.load_table(sf_dir, "nation")
    csv_dir = str(tmp_path / "nation_csv")
    pq_dir = str(tmp_path / "nation_pq")
    export_table(nat, csv_dir, "csv")
    export_table(nat, pq_dir, "parquet")
    back_csv = import_file(csv_dir, "csv").to_pandas()
    back_pq = import_file(pq_dir).to_pandas()  # auto → parquet
    orig = nat.to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    for back in (back_csv, back_pq):
        back = back.sort_values("n_nationkey").reset_index(drop=True)
        assert (back["n_name"] == orig["n_name"]).all()
        assert len(back) == 25


def test_print_table_renders_header_and_rows(ray_session, sf_dir):
    """Print operator (print.hpp:22): schema header + n preview rows."""
    from hyrise_generalized_dedup_ray.relational import load_table, print_table

    text = print_table(load_table(sf_dir, "region"), n=3)
    lines = text.splitlines()
    assert "r_regionkey" in lines[0] and "r_name" in lines[0]
    assert "int" in lines[0]           # schema types in the header
    assert len(lines) == 2 + 3         # header, rule, 3 rows
