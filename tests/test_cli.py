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


# ---------------------------------------------------------------------------
# Full round-trip on the reference's own fixtures, checked against a pure-
# Python oracle (no Spark): load sample_log.json, append a simlogs XML
# (ids must continue past the JSON's), rollup, stats, export — row counts,
# severity distribution, and every rollup cell pinned to independently
# recomputed values.
# ---------------------------------------------------------------------------

SAMPLE_JSON = "/root/reference/data/sample_log.json"


def _ref_attrs(path):
    """Parse a reference trace file exactly like the ingest contract:
    JSONL object per line (values as strings), or <Event .../> attribute
    bags for XML; blank / non-Event lines dropped."""
    import json as _json
    import re

    out = []
    with open(path) as f:
        for ln in f:
            t = ln.strip()
            if not t:
                continue
            if t.startswith("<Event"):
                out.append(dict(re.findall(r'(\w+)="([^"]*)"', t)))
            elif t.startswith("{"):
                out.append({k: str(v) for k, v in _json.loads(t).items()})
            elif path.endswith((".json", ".jsonl")):
                # plaintext k=v fallback lines (none in the sample, but
                # keep the oracle honest about the contract)
                out.append(dict(re.findall(r"(\w+)=([^\s]+)", t)))
    return out


def _oracle_rollup(attr_dicts, window=60):
    """(window_start, role, metric_name) -> (n, avg, max) recomputed with
    plain Python floats: the reference's EAV melt (every float-parseable
    non-envelope field) + 60s epoch buckets on the strict DateTime parse."""
    import calendar
    from datetime import datetime

    from db_loganalyzer_spark.model.schemas import MANDATORY_FIELDS

    cells = {}
    for attrs in attr_dicts:
        b = None
        dt = attrs.get("DateTime")
        if dt:
            try:
                ts = datetime.strptime(dt, "%Y-%m-%dT%H:%M:%SZ")
                b = int(calendar.timegm(ts.timetuple())) // window * window
            except ValueError:
                b = None
        role = attrs.get("Roles")
        for k, v in attrs.items():
            if k in MANDATORY_FIELDS:
                continue
            try:
                mv = float(v)
            except (TypeError, ValueError):
                continue
            cells.setdefault((b, role, k), []).append(mv)
    return {
        key: (len(vs), sum(vs) / len(vs), max(vs)) for key, vs in cells.items()
    }


@pytest.fixture(scope="module")
def ref_roundtrip(tmp_path_factory, spark):
    wh = str(tmp_path_factory.mktemp("wh_ref"))
    base = ["--db", wh, "--database", "cli_ref"]
    assert cli.main(base + ["init"]) == 0
    assert cli.main(base + ["load", SAMPLE_JSON, "--mode", "overwrite"]) == 0
    xml = sorted(glob.glob(f"{REF_XML_DIR}/*.xml"))[0]
    assert cli.main(base + ["load", xml, "--mode", "append"]) == 0
    return base, _ref_attrs(SAMPLE_JSON), _ref_attrs(xml)


def test_roundtrip_counts_and_id_continuation(spark, ref_roundtrip):
    base, js, xs = ref_roundtrip
    ev = spark.table("cli_ref.events")
    assert ev.count() == len(js) + len(xs)
    # event ids stay unique across the two CLI invocations
    assert ev.select("event_id").distinct().count() == len(js) + len(xs)


def test_roundtrip_severity_distribution(spark, ref_roundtrip):
    base, js, xs = ref_roundtrip
    expected = {}
    for attrs in js + xs:
        try:
            sev = int(attrs.get("Severity"))
        except (TypeError, ValueError):
            sev = None
        expected[sev] = expected.get(sev, 0) + 1
    got = {
        r["severity"]: r["n"]
        for r in spark.sql(
            "SELECT severity, COUNT(*) AS n FROM cli_ref.events GROUP BY 1"
        ).collect()
    }
    assert got == expected


def test_roundtrip_rollup_matches_python_oracle(spark, ref_roundtrip):
    import math

    base, js, xs = ref_roundtrip
    assert cli.main(base + ["rollup", "--window", "60"]) == 0
    want = _oracle_rollup(js + xs, window=60)
    got = {
        (r["window_start"], r["role"], r["metric_name"]): (
            r["n"],
            r["avg_value"],
            r["max_value"],
        )
        for r in spark.table("cli_ref.rollups_60s").collect()
    }
    assert set(got) == set(want)
    for key, (n, avg, mx) in want.items():
        gn, gavg, gmx = got[key]
        assert gn == n, key
        if math.isnan(avg):
            assert math.isnan(gavg), key
        else:
            assert math.isclose(gavg, avg, rel_tol=1e-9, abs_tol=1e-12), key
        assert gmx == mx or (math.isnan(mx) and math.isnan(gmx)), key


def test_roundtrip_export_row_count(spark, ref_roundtrip, tmp_path):
    base, js, xs = ref_roundtrip
    out = str(tmp_path / "ref_export")
    assert (
        cli.main(
            base
            + [
                "export",
                "SELECT event, COUNT(*) AS n FROM events GROUP BY event",
                "--out",
                out,
                "--format",
                "json",
                "--single-file",
            ]
        )
        == 0
    )
    import json as _json

    files = glob.glob(f"{out}/*.json")
    assert len(files) == 1
    with open(files[0]) as f:
        rows = [_json.loads(l) for l in f if l.strip()]
    types = {a.get("Type") for a in js + xs}
    assert {r["event"] for r in rows} == {t for t in types if t is not None}
    assert sum(r["n"] for r in rows if "n" in r) >= len(js) + len(xs) - sum(
        1 for a in js + xs if a.get("Type") is None
    )
