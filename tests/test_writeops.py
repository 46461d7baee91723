"""Write path (§2.9): CREATE/INSERT/DELETE/UPDATE on the snapshot-
versioned parquet table (relational/writeops.py) — append reuses
committed files, a pinned version is a consistent snapshot across later
commits, delete/update semantics match their SQL twins."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest
import ray

from hyrise_generalized_dedup_ray.relational import writeops as W
from hyrise_generalized_dedup_ray.relational.expressions import col, lit


@pytest.fixture
def root(tmp_path):
    return str(tmp_path)


T0 = pa.table({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]})


def test_create_insert_read_roundtrip(ray_session, root):
    W.create_table(root, "t", T0)
    assert W.current_version(root, "t") == 0
    v = W.insert_into(root, "t", pa.table({"k": [4, 5], "v": [40.0, 50.0]}))
    assert v == 1
    df = W.read_table(root, "t").to_pandas().sort_values("k")
    assert df["k"].tolist() == [1, 2, 3, 4, 5]
    # append REUSED the v0 files: v1 manifest is a superset of v0's
    m0 = json.load(open(os.path.join(root, "t", "v0.manifest.json")))
    m1 = json.load(open(os.path.join(root, "t", "v1.manifest.json")))
    assert set(m0["files"]) < set(m1["files"])


def test_snapshot_isolation_across_commits(ray_session, root):
    W.create_table(root, "t", T0)
    pinned = W.current_version(root, "t")
    W.delete_where(root, "t", col("k") == lit(2))
    # new readers see the delete; the pinned snapshot does not
    assert sorted(W.read_table(root, "t").to_pandas()["k"]) == [1, 3]
    assert sorted(W.read_table(root, "t", version=pinned)
                  .to_pandas()["k"]) == [1, 2, 3]


def test_update_where_matches_sql_semantics(ray_session, root):
    W.create_table(root, "t", T0)
    W.update_where(root, "t", col("k") >= lit(2),
                   {"v": col("v") * lit(2.0)})
    df = W.read_table(root, "t").to_pandas().sort_values("k")
    assert df["v"].tolist() == [10.0, 40.0, 60.0]
    assert W.current_version(root, "t") == 1


def test_create_empty_with_schema_and_drop(ray_session, root):
    W.create_table(root, "e", schema=T0.schema)
    assert W.read_table(root, "e").count() == 0
    W.insert_into(root, "e", T0)
    assert W.read_table(root, "e").count() == 3
    W.drop_table(root, "e")
    with pytest.raises(Exception):
        W.read_table(root, "e")
    W.drop_table(root, "e", if_exists=True)  # no-op


def test_delete_all_rows_commits_empty_version(ray_session, root):
    W.create_table(root, "t", T0)
    v = W.delete_where(root, "t", col("k") >= lit(0))
    assert v == 1 and W.read_table(root, "t").count() == 0
    # the empty version is a real snapshot: inserts continue from it
    W.insert_into(root, "t", T0)
    assert W.read_table(root, "t").count() == 3


def test_update_swap_uses_old_row_values(ray_session, root):
    # SQL UPDATE t SET k = v, v = k evaluates both RHS on the OLD row
    W.create_table(root, "s", pa.table({"k": [1], "v": [2]}))
    W.update_where(root, "s", col("k") == lit(1),
                   {"k": col("v"), "v": col("k")})
    df = W.read_table(root, "s").to_pandas()
    assert df["k"].tolist() == [2] and df["v"].tolist() == [1]


def test_create_duplicate_rejected(ray_session, root):
    W.create_table(root, "t", T0)
    with pytest.raises(ValueError):
        W.create_table(root, "t", T0)


def test_create_if_not_exists_keeps_first_table(ray_session, root):
    W.create_table(root, "t", T0)
    # second CREATE with a different schema is a no-op, not an error
    W.create_table(root, "t", schema=pa.schema([("b", pa.int32())]),
                   if_not_exists=True)
    assert W.read_table(root, "t").count() == 3
    with pytest.raises(ValueError):
        W.create_table(root, "t", T0)


def test_truncate_then_insert(ray_session, root):
    W.create_table(root, "t", T0)
    v = W.delete_where(root, "t")  # DELETE FROM t (no WHERE)
    assert v == 1 and W.read_table(root, "t").count() == 0
    # schema survives the truncate: typed inserts continue
    W.insert_into(root, "t", T0)
    assert W.read_table(root, "t").count() == 3


def test_view_catalog_semantics(ray_session, root):
    W.create_table(root, "base", T0)
    name = f"v_{os.path.basename(root)}"
    W.create_view(name, lambda: W.read_table(root, "base"))
    assert W.has_view(name) and name in W.view_names()
    with pytest.raises(ValueError):
        W.create_view(name, lambda: W.read_table(root, "base"))
    # a view is a deferred plan: base-table writes show through it
    assert W.read_view(name).count() == 3
    W.insert_into(root, "base", pa.table({"k": [4], "v": [40.0]}))
    assert W.read_view(name).count() == 4
    # column aliases rename the output; arity must match
    W.create_view(name, lambda: W.read_table(root, "base"),
                  columns=["kk", "vv"], or_replace=True)
    assert W.read_view(name).schema().names == ["kk", "vv"]
    W.create_view(name + "_bad", lambda: W.read_table(root, "base"),
                  columns=["only_one"])
    with pytest.raises(ValueError):
        W.read_view(name + "_bad")
    W.drop_view(name + "_bad")
    W.drop_view(name)
    assert not W.has_view(name)
    with pytest.raises(ValueError):
        W.drop_view(name)
    W.drop_view(name, if_exists=True)  # no-op
