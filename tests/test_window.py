"""Window-function kernel edges (relational/window.py): rank ties,
dense_rank gaps, lag/lead nulls at partition boundaries, cumsum resets,
single-row partitions — against a DuckDB oracle on a hand-built table."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import ray

from hyrise_generalized_dedup_ray.relational.window import window_over

T = pa.table({
    "p": pa.array([1, 1, 1, 1, 2, 3, 3], type=pa.int64()),
    "o": pa.array([10, 10, 20, 30, 5, 7, 7], type=pa.int64()),
    "tb": pa.array([1, 2, 3, 4, 5, 6, 7], type=pa.int64()),
    "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0]),
})


def test_window_over_matches_duckdb(ray_session):
    out = window_over(
        ray.data.from_arrow(T).repartition(3), "p", ["o", "tb"], {
            "rn": ("row_number", None),
            "rk": ("rank", None),
            "dr": ("dense_rank", None),
            "pv": ("lag", "v"),
            "nv": ("lead", "v"),
            "cs": ("cumsum", "v"),
        }, rank_keys=1, num_partitions=3,
    ).to_pandas().sort_values("tb").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", T.to_pandas())
    exp = con.execute("""
        SELECT p, o, tb, v,
               ROW_NUMBER() OVER w AS rn,
               RANK() OVER (PARTITION BY p ORDER BY o) AS rk,
               DENSE_RANK() OVER (PARTITION BY p ORDER BY o) AS dr,
               LAG(v) OVER w AS pv,
               LEAD(v) OVER w AS nv,
               SUM(v) OVER (PARTITION BY p ORDER BY o, tb
                            ROWS UNBOUNDED PRECEDING) AS cs
        FROM t WINDOW w AS (PARTITION BY p ORDER BY o, tb)
        ORDER BY tb
    """).df()
    for c in ["rn", "rk", "dr", "cs"]:
        assert out[c].astype(float).tolist() == \
            exp[c].astype(float).tolist(), c
    for c in ["pv", "nv"]:
        a = [None if pd.isna(x) else x for x in out[c]]
        b = [None if pd.isna(x) else x for x in exp[c]]
        assert a == b, c
    # explicit spot checks: tie on o=10 → rank 1,1 then 3; dense 1,1,2,3
    assert out["rk"].tolist()[:4] == [1, 1, 3, 4]
    assert out["dr"].tolist()[:4] == [1, 1, 2, 3]
    assert pd.isna(out["pv"].iloc[4])  # single-row partition p=2


def test_cumsum_int64_exact_past_2_53(ray_session):
    """ADVICE fix: integer cumsum accumulates natively in int64 —
    running sums beyond 2^53 stay exact (float64 would round)."""
    big = (1 << 53) + 1  # not representable in float64
    t = pa.table({"p": [0, 0, 0], "o": [1, 2, 3],
                  "v": pa.array([big, 1, 1], pa.int64())})
    out = window_over(
        ray.data.from_arrow(t), "p", ["o"], {"cs": ("cumsum", "v")},
        num_partitions=2,
    ).to_pandas().sort_values("o")
    assert out["cs"].tolist() == [big, big + 1, big + 2]
