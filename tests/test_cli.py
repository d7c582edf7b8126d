"""End-to-end CLI parity: the reference's command surface
(init/load/query/stats/export/rollup/chunk) driven in-process against a
temp warehouse, using the reference's own sample trace XML."""

import glob
import os

import pytest

from db_loganalyzer_spark import cli

REF_XML_DIR = "/root/reference/data/log_example/simlogs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_XML_DIR), reason="reference samples not present"
)


@pytest.fixture(scope="module")
def warehouse(tmp_path_factory, spark):
    wh = str(tmp_path_factory.mktemp("wh"))
    base = ["--db", wh, "--database", "cli_test"]
    assert cli.main(base + ["init"]) == 0
    xml = sorted(glob.glob(f"{REF_XML_DIR}/*.xml"))[0]
    assert cli.main(base + ["load", xml, "--mode", "overwrite"]) == 0
    return base


def test_cli_load_and_query(spark, warehouse, capsys):
    assert (
        cli.main(
            warehouse + ["query", "SELECT COUNT(*) AS n FROM events"]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "n" in out and any(line.strip("| ").isdigit() for line in out.splitlines())


def test_cli_stats(warehouse, capsys):
    assert cli.main(warehouse + ["stats"]) == 0
    out = capsys.readouterr().out
    assert "Total events:" in out
    assert "Severity distribution:" in out
    assert "Role distribution" in out


def test_cli_rollup(spark, warehouse):
    assert cli.main(warehouse + ["rollup", "--window", "60"]) == 0
    roll = spark.table("cli_test.rollups_60s")
    assert roll.count() > 0
    assert {"window_start", "role", "metric_name", "n", "avg_value"} <= set(
        roll.columns
    )


def test_cli_export(warehouse, tmp_path):
    out = str(tmp_path / "export_csv")
    assert (
        cli.main(
            warehouse
            + [
                "export",
                "SELECT event, COUNT(*) AS n FROM events GROUP BY event",
                "--out",
                out,
                "--format",
                "csv",
                "--single-file",
            ]
        )
        == 0
    )
    files = glob.glob(f"{out}/*.csv")
    assert len(files) == 1
    with open(files[0]) as f:
        header = f.readline().strip()
    assert header == "event,n"


def test_cli_chunk(warehouse, capsys):
    assert cli.main(warehouse + ["chunk"]) == 0
    assert "chunk_id" in capsys.readouterr().out
