"""jobs/ingest.py CLI (C1) — generate + replay in both modes, in-process."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO))


def _main():
    spec = importlib.util.spec_from_file_location("jobs_ingest", os.path.join(REPO, "jobs", "ingest.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main


def test_cli_generate_and_replay_both_modes(spark, tmp_path, capsys):
    main = _main()
    events = str(tmp_path / "events")
    main(["generate", "--out", events, "--n-events", "2000", "--batch-size", "1000"])
    gen = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert gen["rows"] > 2000  # duplicates re-emitted

    main(["replay", "--events", events, "--table", str(tmp_path / "t_batch"), "--no-warmup"])
    batch = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert batch["version"] == 2 and batch["table_rows"] > 0

    main([
        "replay", "--events", events, "--table", str(tmp_path / "t_stream"),
        "--mode", "stream", "--no-warmup",
    ])
    stream = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stream["table_rows"] == batch["table_rows"]

    # jvm-hash variant produces the IDENTICAL final state (per-row sha
    # equality) — validates the scaling bench's UDF-isolation variant
    main(["replay", "--events", events, "--table", str(tmp_path / "t_jvm"), "--jvm-hash", "--no-warmup"])
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from pyorchdb_spark.sources.lake import LakeTable

    def sig(root):
        snap = LakeTable(spark, root).snapshot()
        return {tuple(r) for r in snap.select("repo", "path", "content_sha256").collect()}

    assert sig(str(tmp_path / "t_batch")) == sig(str(tmp_path / "t_jvm")) == sig(str(tmp_path / "t_stream"))
