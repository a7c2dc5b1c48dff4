"""CLI smoke tests (the reference's user surface: run_mr_real.sh /
analyze_*.py / run_batch.sh analogs)."""

from __future__ import annotations

import glob
import os

from mapreduce511_spark.cli import main
from tests.conftest import SF_SMOKE


def test_cli_wordcount_parquet(spark, tmp_path, capsys):
    out = str(tmp_path / "wc")
    rc = main(
        [
            "wordcount",
            "--input", f"{SF_SMOKE}/documents.parquet",
            "--format", "parquet",
            "--output", out,
        ]
    )
    assert rc == 0
    files = glob.glob(out + "/part-*")
    assert len(files) == 1
    first = open(files[0]).readline().rstrip("\n").split("\t")
    assert len(first) == 2 and first[1].isdigit()
    assert "distinct words" in capsys.readouterr().out


def test_cli_analyze_reference_tree(spark, tmp_path, capsys):
    tree = "/root/reference/MapReduceLog"
    if not os.path.isdir(tree):
        import pytest

        pytest.skip("reference tree not available")
    out = str(tmp_path / "results")
    rc = main(["analyze", "--tree", tree, "--out", out])
    assert rc == 0
    for name in (
        "result_raw result_time result_map result_shuffle "
        "result_reduce result_overlap result_cpu"
    ).split():
        assert glob.glob(f"{out}/{name}/part-*.csv"), name
    assert "7 report tables" in capsys.readouterr().out


def test_cli_sweep(spark, capsys):
    rc = main(["sweep", "--sf-dir", SF_SMOKE, "--values", "4", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("shuffle.partitions=") == 2
    assert "<- best" in out
