"""Console entry point (hyriseConsole analog, SURVEY §3.1): list,
describe, run with preview + export."""

from __future__ import annotations

import os

from hyrise_generalized_dedup_ray.console import main


def test_console_list_and_describe(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "flagship_dedup" in out
    assert main(["describe", "exact_dedup"]) == 0
    assert main(["describe", "no_such_query"]) == 2


def test_console_run_preview_and_export(ray_session, sf_dir, tmp_path,
                                        capsys):
    out_dir = str(tmp_path / "seg_csv")
    rc = main(["run", "distinct_segments", sf_dir, "--limit", "3",
               "--out", out_dir])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "c_mktsegment" in printed and "5 rows" in printed
    assert os.path.isdir(out_dir) and os.listdir(out_dir)
    import ray
    assert ray.is_initialized()  # console must NOT tear down our session


def test_console_run_arrow_table_query(ray_session, sf_dir, capsys):
    # meta_* queries return a bare pyarrow.Table — the conversion must
    # key on the type, not hasattr('schema') (pa.Table has one too)
    assert main(["run", "meta_plugins", sf_dir, "--limit", "2"]) == 0
    assert "plugin_name" in capsys.readouterr().out
