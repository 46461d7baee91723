"""Reference golden-file parity: run our operators over the
reference's own `.tbl` test inputs and compare to its expected-output
`.tbl` files (resources/test_data/tbl/aggregateoperator/*) —
the reference's AggregateOperator test strategy ported verbatim
(SURVEY.md §5).  Comparison is order-insensitive with the goldens'
printed float precision.
"""

from __future__ import annotations

import math
import os

import pytest

from hyrise_generalized_dedup_ray.relational import agg, aggregate
from hyrise_generalized_dedup_ray.relational.catalog import load_tbl

BASE = "/root/reference/resources/test_data/tbl/aggregateoperator"
pytestmark = pytest.mark.skipif(not os.path.isdir(BASE),
                                reason="reference tree not present")


def _parse_tbl(path: str) -> list[dict]:
    with open(path) as f:
        names = f.readline().strip().split("|")
        types = f.readline().strip().split("|")
        rows = []
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            vals = line.split("|")
            row = {}
            for n, t, v in zip(names, types, vals):
                if v == "null":
                    row[n] = None
                elif t.startswith(("int", "long")):
                    row[n] = int(v)
                elif t.startswith(("float", "double")):
                    row[n] = float(v)
                else:
                    row[n] = v
            rows.append(row)
    return rows


def _canon(rows: list[dict], float_tol_digits: int = 4) -> set:
    out = set()
    for r in rows:
        key = []
        for k in sorted(r):
            v = r[k]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                key.append((k, None))
            elif isinstance(v, float):
                key.append((k, round(v, float_tol_digits)))
            else:
                key.append((k, v))
        out.add(tuple(key))
    return out


CASES = [
    # (input file, golden file, group keys, {out_col: agg spec})
    ("input.tbl", "sum.tbl", ["a"], {"SUM(b)": agg("sum", "b")}),
    ("input.tbl", "avg.tbl", ["a"], {"AVG(b)": agg("avg", "b")}),
    ("input.tbl", "min.tbl", ["a"], {"MIN(b)": agg("min", "b")}),
    ("input.tbl", "max.tbl", ["a"], {"MAX(b)": agg("max", "b")}),
    ("input.tbl", "count.tbl", ["a"], {"COUNT(b)": agg("count", "b")}),
    ("input.tbl", "count_star.tbl", ["a"], {"COUNT(*)": agg("count_star")}),
    ("input.tbl", "count_distinct.tbl", ["a"],
     {"COUNT(DISTINCT b)": agg("count_distinct", "b")}),
    ("input.tbl", "stddev_samp.tbl", ["a"],
     {"STDDEV_SAMP(b)": agg("std", "b")}),
    ("input_null.tbl", "sum_null.tbl", ["a"], {"SUM(b)": agg("sum", "b")}),
    ("input_null.tbl", "avg_null.tbl", ["a"], {"AVG(b)": agg("avg", "b")}),
    ("input_null.tbl", "min_null.tbl", ["a"], {"MIN(b)": agg("min", "b")}),
    ("input_null.tbl", "max_null.tbl", ["a"], {"MAX(b)": agg("max", "b")}),
    ("input_null.tbl", "count_null.tbl", ["a"],
     {"COUNT(b)": agg("count", "b")}),
    ("input_null.tbl", "count_star_null.tbl", ["a"],
     {"COUNT(*)": agg("count_star")}),
    # count_distinct_null.tbl is EXCLUDED: it is referenced by no
    # reference test and contradicts its own input (group a=-2 holds
    # {-17.0, -10.0, -3.0} = 3 distinct values, the golden says 2);
    # DuckDB agrees with 3 — a stale fixture in the reference tree.
    ("input_null.tbl", "stddev_samp_null.tbl", ["a"],
     {"STDDEV_SAMP(b)": agg("std", "b")}),
]


@pytest.mark.parametrize("inp,golden,keys,spec",
                         CASES, ids=[c[1] for c in CASES])
def test_aggregate_matches_reference_golden(ray_session, inp, golden,
                                            keys, spec):
    d = os.path.join(BASE, "groupby_int_1gb_1agg")
    ds = load_tbl(os.path.join(d, inp))
    got = aggregate(ds, keys, spec).to_pandas().to_dict("records")
    # normalize NaN → None for comparison
    for r in got:
        for k, v in r.items():
            if isinstance(v, float) and math.isnan(v):
                r[k] = None
    want = _parse_tbl(os.path.join(d, golden))
    assert _canon(got) == _canon(want), f"{golden}: {got} != {want}"


def test_global_aggregates_match_reference_golden(ray_session):
    """0gb (no GROUP BY) golden: SUM/MAX over the whole table."""
    d = os.path.join(BASE, "0gb_1agg")
    files = os.listdir(d)
    if "sum.tbl" not in files:
        pytest.skip("no global sum golden")
    ds = load_tbl(os.path.join(d, "input.tbl"))
    got = aggregate(ds, [], {"SUM(b)": agg("sum", "b")}).to_pandas()
    want = _parse_tbl(os.path.join(d, "sum.tbl"))
    assert _canon(got.to_dict("records")) == _canon(want)


# ---------------------------------------------------------------------------
# Round-3 tranche: global (0gb), two-group-key, string-group-key and
# multi-aggregate goldens — the rest of the reference's
# aggregate_test.cpp matrix (SURVEY.md §5 conformance breadth).
# ---------------------------------------------------------------------------

TRANCHE = [
    # (dir, input, golden, keys, {out_col: agg spec})
    ("0gb_1agg", "input.tbl", "sum.tbl", [], {"SUM(b)": agg("sum", "b")}),
    ("0gb_1agg", "input.tbl", "avg.tbl", [], {"AVG(b)": agg("avg", "b")}),
    ("0gb_1agg", "input.tbl", "min.tbl", [], {"MIN(b)": agg("min", "b")}),
    ("0gb_1agg", "input.tbl", "max.tbl", [], {"MAX(b)": agg("max", "b")}),
    ("0gb_1agg", "input.tbl", "count.tbl", [],
     {"COUNT(b)": agg("count", "b")}),
    ("0gb_1agg", "input.tbl", "stddev_samp.tbl", [],
     {"STDDEV_SAMP(b)": agg("std", "b")}),
    ("groupby_int_2gb_1agg", "input.tbl", "sum.tbl", ["a", "b"],
     {"SUM(c)": agg("sum", "c")}),
    ("groupby_int_2gb_1agg", "input.tbl", "avg.tbl", ["a", "b"],
     {"AVG(c)": agg("avg", "c")}),
    ("groupby_int_2gb_1agg", "input.tbl", "min.tbl", ["a", "b"],
     {"MIN(c)": agg("min", "c")}),
    ("groupby_int_2gb_1agg", "input.tbl", "max.tbl", ["a", "b"],
     {"MAX(c)": agg("max", "c")}),
    ("groupby_int_2gb_1agg", "input.tbl", "count.tbl", ["a", "b"],
     {"COUNT(c)": agg("count", "c")}),
    ("groupby_string_1gb_1agg", "input.tbl", "sum.tbl", ["a"],
     {"SUM(b)": agg("sum", "b")}),
    ("groupby_string_1gb_1agg", "input.tbl", "avg.tbl", ["a"],
     {"AVG(b)": agg("avg", "b")}),
    ("groupby_string_1gb_1agg", "input.tbl", "max.tbl", ["a"],
     {"MAX(b)": agg("max", "b")}),
    ("groupby_string_1gb_1agg", "input.tbl", "min.tbl", ["a"],
     {"MIN(b)": agg("min", "b")}),
    ("groupby_string_1gb_1agg", "input.tbl", "count.tbl", ["a"],
     {"COUNT(b)": agg("count", "b")}),
    ("groupby_string_1gb_1agg", "input.tbl", "count_str.tbl", ["a"],
     {"COUNT(a)": agg("count", "a")}),
    ("groupby_string_1gb_1agg", "input_null.tbl", "count_str_null.tbl",
     ["a"], {"COUNT(b)": agg("count", "b")}),
    ("groupby_string_1gb_1agg", "input.tbl", "min_str.tbl", [],
     {"MIN(a)": agg("min", "a")}),
    ("groupby_string_1gb_1agg", "input.tbl", "max_str.tbl", [],
     {"MAX(a)": agg("max", "a")}),
    ("groupby_int_1gb_2agg", "input.tbl", "sum_avg.tbl", ["a"],
     {"SUM(b)": agg("sum", "b"), "AVG(c)": agg("avg", "c")}),
    ("groupby_int_1gb_2agg", "input.tbl", "sum_sum.tbl", ["a"],
     {"SUM(b)": agg("sum", "b"), "SUM(c)": agg("sum", "c")}),
    ("groupby_int_1gb_2agg", "input.tbl", "min_max.tbl", ["a"],
     {"MIN(b)": agg("min", "b"), "MAX(c)": agg("max", "c")}),
    ("groupby_int_1gb_2agg", "input.tbl", "sum_count.tbl", ["a"],
     {"SUM(b)": agg("sum", "b"), "COUNT(c)": agg("count", "c")}),
    ("groupby_int_1gb_2agg", "input.tbl", "max_stddev_samp.tbl", ["a"],
     {"MAX(b)": agg("max", "b"),
      "STDDEV_SAMP(c)": agg("std", "c")}),
    ("groupby_int_2gb_2agg", "input.tbl", "max_avg.tbl", ["a", "b"],
     {"MAX(c)": agg("max", "c"), "AVG(d)": agg("avg", "d")}),
    # NB: this dir's avg_avg.tbl is a stale fixture the reference never
    # loads (values are actually MIN/AVG); aggregate_test.cpp:523 uses
    # min_avg.tbl.
    ("groupby_int_2gb_2agg", "input.tbl", "min_avg.tbl", ["a", "b"],
     {"MIN(c)": agg("min", "c"), "AVG(d)": agg("avg", "d")}),
    ("groupby_int_2gb_2agg", "input.tbl", "sum_sum.tbl", ["a", "b"],
     {"SUM(c)": agg("sum", "c"), "SUM(d)": agg("sum", "d")}),
    ("groupby_int_2gb_2agg", "input.tbl", "sum_count.tbl", ["a", "b"],
     {"SUM(c)": agg("sum", "c"), "COUNT(d)": agg("count", "d")}),
]


@pytest.mark.parametrize("d,inp,golden,keys,spec", TRANCHE,
                         ids=[f"{c[0]}/{c[2]}" for c in TRANCHE])
def test_aggregate_tranche_matches_reference_golden(ray_session, d, inp,
                                                    golden, keys, spec):
    base = os.path.join(BASE, d)
    ds = load_tbl(os.path.join(base, inp))
    got = aggregate(ds, keys, spec).to_pandas().to_dict("records")
    for r in got:
        for k, v in r.items():
            if isinstance(v, float) and math.isnan(v):
                r[k] = None
    want = _parse_tbl(os.path.join(base, golden))
    assert _canon(got) == _canon(want), f"{d}/{golden}"
