"""CLI entry points (`python -m refined_ray ...`) — run/flagship write
atomic parquet; multipart ingest is idempotent and finalize promotes
atomically (≙ reference job_service add_part/finalize state machine)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from conftest import SF_SMALL
from refined_ray.cli import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "er_clusters" in out and "[oracle]" in out and "[rows-only]" in out


def test_cli_run_writes_parquet(ray_session, tmp_path, capsys):
    out = str(tmp_path / "norm.parquet")
    assert main(["run", "part_norm", "--sf-dir", SF_SMALL, "--out", out]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rows = pads.dataset(out).count_rows()
    assert rows == summary["rows"] > 0
    # re-run overwrites atomically (no stale .part left behind)
    assert main(["run", "part_norm", "--sf-dir", SF_SMALL, "--out", out]) == 0
    assert not os.path.exists(out + ".part")
    assert pads.dataset(out).count_rows() == rows


def test_cli_run_unknown_query(ray_session):
    assert main(["run", "no_such_query", "--sf-dir", SF_SMALL]) == 2


def test_cli_flagship_checkpointed_resume(ray_session, tmp_path, capsys):
    out = str(tmp_path / "clusters.parquet")
    cp = str(tmp_path / "cp")
    assert main(["flagship", "--sf-dir", SF_SMALL, "--out", out,
                 "--checkpoint-root", cp]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["rows"] > 0
    # rerun resumes from the checkpoints and yields identical output
    out2 = str(tmp_path / "clusters2.parquet")
    assert main(["flagship", "--sf-dir", SF_SMALL, "--out", out2,
                 "--checkpoint-root", cp]) == 0
    a = pads.dataset(out).to_table().sort_by("url")
    b = pads.dataset(out2).to_table().sort_by("url")
    assert a.equals(b)


def test_cli_subprocess_owns_ray_session(tmp_path):
    """`python -m refined_ray run ...` in a FRESH process: _ensure_ray
    must start (and shut down) its own Ray session — the path the
    in-process tests never exercise because pytest's session is up."""
    import subprocess
    import sys

    out = str(tmp_path / "q.parquet")
    r = subprocess.run(
        [sys.executable, "-m", "refined_ray", "run", "token_quantiles",
         "--sf-dir", SF_SMALL, "--out", out],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 5
    assert pads.dataset(out).count_rows() == 5


@pytest.fixture()
def staged_parts(tmp_path):
    t1 = pa.table({"url": ["a", "b"], "n": [1, 2]})
    t2 = pa.table({"url": ["c"], "n": [3]})
    p1, p2 = str(tmp_path / "p1.parquet"), str(tmp_path / "p2.parquet")
    pq.write_table(t1, p1)
    pq.write_table(t2, p2)
    return p1, p2


def test_cli_ingest_add_finalize_roundtrip(staged_parts, tmp_path, capsys):
    p1, p2 = staged_parts
    staging, dest = str(tmp_path / "stage"), str(tmp_path / "dest")
    assert main(["ingest", "add-part", p1, "--staging", staging, "--table", "pages"]) == 0
    assert main(["ingest", "add-part", p2, "--staging", staging, "--table", "pages"]) == 0
    # re-adding the same fragment is a no-op (content-hash names)
    assert main(["ingest", "add-part", p1, "--staging", staging, "--table", "pages"]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["dedup"] is True
    assert main(["ingest", "finalize", "--staging", staging, "--dest", dest]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["tables"] == {"pages": 3}
    promoted = pads.dataset(os.path.join(dest, "pages.parquet"))
    assert promoted.count_rows() == 3
    assert sorted(promoted.to_table()["url"].to_pylist()) == ["a", "b", "c"]
    # finalized staging refuses further parts
    assert main(["ingest", "add-part", p1, "--staging", staging, "--table", "pages"]) == 2


def test_cli_ingest_ignores_uncommitted_part_temp(staged_parts, tmp_path, capsys):
    """A killed add-part leaves a *.parquet.part temp: finalize must
    neither schema-check nor promote nor count it."""
    p1, p2 = staged_parts
    staging, dest = str(tmp_path / "stage"), str(tmp_path / "dest")
    assert main(["ingest", "add-part", p1, "--staging", staging, "--table", "pages"]) == 0
    import shutil

    shutil.copyfile(p2, os.path.join(staging, "pages", "part-dead.parquet.part"))
    assert main(["ingest", "finalize", "--staging", staging, "--dest", dest]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["tables"] == {"pages": 2}  # only p1's rows
    assert not os.path.exists(
        os.path.join(dest, "pages.parquet", "part-dead.parquet.part"))
    # double-finalize refused
    assert main(["ingest", "finalize", "--staging", staging, "--dest", dest]) == 2


def test_cli_flagship_exact_verify_checkpointed(ray_session, tmp_path, capsys):
    """--exact-verify with --checkpoint-root runs the exact tier and
    matches the uncheckpointed exact pipeline."""
    out = str(tmp_path / "clusters.parquet")
    assert main(["flagship", "--sf-dir", SF_SMALL, "--checkpoint-root",
                 str(tmp_path / "cp"), "--exact-verify", "--out", out]) == 0
    capsys.readouterr()
    from refined_ray.pipelines.entity_resolution import er_cluster_pages

    direct = er_cluster_pages(SF_SMALL, exact_verify=True).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    mine = pads.dataset(out).to_table().to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert mine.equals(direct)


def test_cli_ingest_csv_part_and_schema_guard(tmp_path, capsys):
    staging, dest = str(tmp_path / "stage"), str(tmp_path / "dest")
    csvf = str(tmp_path / "rows.csv")
    with open(csvf, "w") as f:
        f.write("url,n\nx,9\ny,8\n")
    assert main(["ingest", "add-part", csvf, "--staging", staging, "--table", "pages"]) == 0
    # a part with a different schema fails finalize with a clear error
    bad = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"other": [1.5]}), bad)
    assert main(["ingest", "add-part", bad, "--staging", staging, "--table", "pages"]) == 0
    assert main(["ingest", "finalize", "--staging", staging, "--dest", dest]) == 3


def test_parser_serve_subcommand():
    from refined_ray.cli import build_parser, cmd_serve

    args = build_parser().parse_args(
        ["serve", "--sf-dir", "/tmp/x", "--port", "0"])
    assert args.fn is cmd_serve and args.needs_ray
    assert args.sf_dir == "/tmp/x" and args.port == 0
    assert args.host == "127.0.0.1"
