"""Reference golden-file parity for Sort (sort_test.cpp:131-145):
multi-key asc/desc over a nullable column, compared ORDERED against
the reference's expected tables — proves NULLS FIRST in BOTH
directions (types.hpp:219-221).

The reference sort is stable (equal keys keep input order,
sort.cpp:379); ours pins the same total order by passing an
input-row-index ``tiebreak`` — exactly the documented contract of
``relational.sort``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
import ray

from hyrise_generalized_dedup_ray.relational import sort

SORT_DIR = "/root/reference/resources/test_data/tbl/sort"
pytestmark = pytest.mark.skipif(not os.path.isdir(SORT_DIR),
                                reason="reference tree not present")


def _read_tbl(path: str) -> pa.Table:
    with open(path) as f:
        names = f.readline().strip().split("|")
        types = f.readline().strip().split("|")
        cols: list[list] = [[] for _ in names]
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            for i, (t, v) in enumerate(zip(types, line.split("|"))):
                if v == "null":
                    cols[i].append(None)
                elif t.startswith("int"):
                    cols[i].append(int(v))
                elif t.startswith(("float", "double")):
                    cols[i].append(float(v))
                else:
                    cols[i].append(v)
    arrays = []
    for t, c in zip(types, cols):
        typ = pa.int64() if t.startswith("int") else (
            pa.float64() if t.startswith(("float", "double")) else pa.string())
        arrays.append(pa.array(c, type=typ))
    return pa.table(dict(zip(names, arrays)))


@pytest.mark.parametrize("keys,desc,golden", [
    (["a"], [False], "a_asc.tbl"),
    (["a"], [True], "a_desc.tbl"),
    (["a", "b"], [False, True], "a_asc_b_desc.tbl"),
    (["a", "b"], [True, False], "a_desc_b_asc.tbl"),
])
def test_sort_matches_reference_golden(ray_session, keys, desc, golden):
    inp = _read_tbl(os.path.join(SORT_DIR, "input.tbl"))
    # input-order index = the reference's stability tiebreak
    inp = inp.append_column("_idx", pa.array(range(len(inp)), type=pa.int64()))
    ds = ray.data.from_arrow(inp).repartition(4)
    out = sort(ds, keys, descending=desc, nulls_first=True,
               tiebreak="_idx").to_pandas()
    want = _read_tbl(os.path.join(SORT_DIR, golden)).to_pandas()
    got = out[["a", "b", "c"]].reset_index(drop=True)
    # ORDERED comparison, null == null
    import pandas as pd

    assert len(got) == len(want), golden
    for col in ("a", "b", "c"):
        g = [None if pd.isna(v) else v for v in got[col]]
        w = [None if pd.isna(v) else v for v in want[col]]
        assert g == w, f"{golden} column {col}: {g[:12]} != {w[:12]}"
