"""Reference golden-file parity for Product, UnionAll and the
UnionPositions (OR-predicate) recast, against the reference's expected
tables and the exact pairings its operator tests use
(product_test.cpp:32-58, union_all_test.cpp:33-43,
union_positions_test.cpp:65-98)."""

from __future__ import annotations

import math
import os

import pytest
import ray

from hyrise_generalized_dedup_ray.relational import (col, lit, product,
                                                     table_scan, union_all)
from hyrise_generalized_dedup_ray.relational.catalog import load_tbl

TBL = "/root/reference/resources/test_data/tbl"
pytestmark = pytest.mark.skipif(not os.path.isdir(TBL),
                                reason="reference tree not present")


def _parse_positional(path: str) -> list[tuple]:
    with open(path) as f:
        f.readline()
        types = f.readline().strip().split("|")
        rows = []
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            vals = []
            for t, v in zip(types, line.split("|")):
                if v == "null":
                    vals.append(None)
                elif t.startswith(("int", "long")):
                    vals.append(int(v))
                else:
                    vals.append(round(float(v), 4))
            rows.append(tuple(vals))
    return sorted(rows, key=repr)


def _rows(ds, cols, int_cols) -> list[tuple]:
    out = []
    for r in ds.to_pandas().to_dict("records"):
        vals = []
        for c in cols:
            v = r[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif c in int_cols:
                vals.append(int(v))
            else:
                vals.append(round(float(v), 4))
        out.append(tuple(vals))
    return sorted(out, key=repr)


def _take_all_arrow(ds):
    import pyarrow as pa
    return pa.concat_tables(
        [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns])


def test_product_matches_reference_golden(ray_session):
    a = load_tbl(os.path.join(TBL, "int.tbl"))          # column a
    b = load_tbl(os.path.join(TBL, "float.tbl"))        # column a (float)
    bt = _take_all_arrow(b).rename_columns(["a_r"])
    got = _rows(product(a, bt), ["a", "a_r"], int_cols={"a"})
    want = _parse_positional(os.path.join(TBL, "int_float_product.tbl"))
    assert got == want


def test_self_product_matches_reference_golden(ray_session):
    c = load_tbl(os.path.join(TBL, "int_int.tbl"))      # columns a, b
    ct = _take_all_arrow(c).rename_columns(["a_r", "b_r"])
    got = _rows(product(c, ct), ["a", "b", "a_r", "b_r"],
                int_cols={"a", "b", "a_r", "b_r"})
    want = _parse_positional(os.path.join(TBL, "int_int_self_product.tbl"))
    assert got == want


def test_union_all_matches_reference_golden(ray_session):
    a = load_tbl(os.path.join(TBL, "int_float.tbl"))
    b = load_tbl(os.path.join(TBL, "int_float2.tbl"))
    got = _rows(union_all(a, b), ["a", "b"], int_cols={"a"})
    want = _parse_positional(os.path.join(TBL, "int_float_union.tbl"))
    assert got == want


@pytest.mark.parametrize("lo,hi,golden", [
    # SelfUnionExlusiveRanges: a < 10 OR a > 200 → exclusive-ranges tbl
    (10, 200, "10_ints_exclusive_ranges.tbl"),
    # SelfUnionOverlappingRanges: a > 20 OR a < 100 → the whole table,
    # WITHOUT duplicating rows matched by both scans
    (100, 20, "10_ints.tbl"),
])
def test_union_positions_or_recast_matches_golden(ray_session, lo, hi,
                                                  golden):
    """UnionPositions (union_positions.hpp) deduplicates PosLists from
    two scans of the SAME table; the engine's recast is one OR-mask
    scan — each row emitted exactly once regardless of how many
    disjuncts match."""
    t = load_tbl(os.path.join(TBL, "10_ints.tbl"))
    got = _rows(table_scan(t, (col("a") < lit(lo)) | (col("a") > lit(hi))),
                ["a"], int_cols={"a"})
    want = _parse_positional(os.path.join(TBL, golden))
    assert got == want
