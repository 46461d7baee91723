"""Time-series operator edges: tumbling/hopping window membership,
sessionize gap boundary (> gap splits, == gap does not), as-of join
ties (equal ts matches; equal right ts breaks by largest id) and
no-match nulls.  Kernel-level semantics the sf-level DuckDB oracle
queries can't isolate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from hyrise_generalized_dedup_ray.stages.timeseries import (
    add_hopping_windows, add_tumbling_window, asof_join, sessionize)

US = 1_000_000
H = 3600 * US


def _ts(*secs):
    return pa.array(np.array(secs, dtype=np.int64) * US,
                    type=pa.int64()).cast(pa.timestamp("us"))


def test_tumbling_window_floor(ray_session):
    t = pa.table({"ts": _ts(0, 3599, 3600, 7201), "v": [1, 2, 3, 4]})
    out = add_tumbling_window(ray.data.from_arrow(t), "ts", H).to_pandas()
    got = (out["win_start"].astype("int64") // H).tolist()
    assert got == [0, 0, 1, 2]


def test_hopping_window_membership(ray_session):
    # event at t=3600s, size 1h, hop 15m: containing windows are the
    # hop-aligned starts s with s <= t < s + size → 2700 < s <= 3600
    t = pa.table({"ts": _ts(3600), "v": [1]})
    out = add_hopping_windows(ray.data.from_arrow(t), "ts",
                              size_us=H, hop_us=900 * US).to_pandas()
    starts = sorted(out["win_start"].astype("int64") // US)
    assert starts == [900, 1800, 2700, 3600]


def test_sessionize_gap_boundary_and_ties(ray_session):
    gap = 100 * US
    # user 1: gaps of exactly 100s (NO split) then 101s (split);
    # user 2: one event; tie timestamps stay in one session
    t = pa.table({
        "u": [1, 1, 1, 2, 3, 3],
        "ts": _ts(0, 100, 201, 50, 7, 7),
        "v": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
        "eid": [1, 2, 3, 4, 5, 6],
    })
    out = sessionize(ray.data.from_arrow(t), "u", "ts", gap_us=gap,
                     sum_col="v", tiebreak_col="eid",
                     num_partitions=3).to_pandas()
    out = out.sort_values(["u", "session_start"]).reset_index(drop=True)
    assert out["u"].tolist() == [1, 1, 2, 3]
    assert out["n_events"].tolist() == [2, 1, 1, 2]
    assert out["sum_v"].tolist() == [3.0, 4.0, 8.0, 48.0]
    ends = (out["session_end"].astype("int64") // US).tolist()
    assert ends == [100, 201, 50, 7]


def test_asof_join_ties_and_nulls(ray_session):
    left = pa.table({
        "eid": [10, 11, 12],
        "ts": _ts(100, 50, 10),
        "u": [1, 1, 2],
    })
    right = pa.table({
        "eid": [1, 2, 3, 4],
        "ts": _ts(50, 50, 99, 20),
        "u": [1, 1, 1, 3],
        "val": [1.0, 2.0, 3.0, 4.0],
    })
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    key_col="u", ts_col="ts", right_id_col="eid",
                    right_cols=["eid", "val"], num_partitions=3
                    ).to_pandas().sort_values("eid").reset_index(drop=True)
    # eid=10 (t=100): latest right ≤100 is eid 3 (t=99)
    # eid=11 (t=50): ties at t=50 → larger right eid (2) wins
    # eid=12 (u=2): no right rows for u=2 → nulls
    assert out["b_eid"].tolist()[:2] == [3, 2]
    assert np.isnan(out["b_val"].iloc[2])  # u=2 unmatched → null
    assert out["b_val"].tolist()[:2] == [3.0, 2.0]


def test_asof_join_empty_right(ray_session):
    left = pa.table({"eid": [1], "ts": _ts(5), "u": [1]})
    right = pa.table({"eid": pa.array([], type=pa.int64()),
                      "ts": pa.array([], type=pa.timestamp("us")),
                      "u": pa.array([], type=pa.int64()),
                      "val": pa.array([], type=pa.float64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    key_col="u", ts_col="ts", right_id_col="eid",
                    right_cols=["val"], num_partitions=2).to_pandas()
    assert len(out) == 1 and out["b_val"].isna().all()
