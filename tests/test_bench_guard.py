"""Pins bench.py's record-staleness guard (VERDICT r3 weak #1): a
benchmark record is only promoted to the sec/mesh headline when the
pipeline sources (surs_tpu/, apps/) are unchanged since the record's
commit. Pure-git logic — runs on CPU without touching the device."""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _head():
    return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          cwd=REPO, capture_output=True,
                          text=True).stdout.strip()


def test_staleness_reasons():
    assert bench.record_staleness("") == "no git_commit in record"
    assert "unknown commit" in bench.record_staleness("deadbeef1234")
    # 2b000de predates the round-3 extractor rework: the exact commit
    # whose record the round-3 bench silently promoted as fresh
    reason = bench.record_staleness("2b000de")
    assert reason and "2b000de" in reason


def test_head_record_fresh_when_tree_clean():
    dirty = subprocess.run(
        ["git", "diff", "--quiet", "HEAD", "--", "surs_tpu", "apps"],
        cwd=REPO).returncode
    reason = bench.record_staleness(_head())
    if dirty:
        assert reason  # uncommitted pipeline edits stale the record too
    else:
        assert reason == ""


def test_load_record_annotates_stale(tmp_path, monkeypatch):
    rec_path = os.path.join(REPO, "test_stale_record_tmp.json")
    with open(rec_path, "w") as f:
        json.dump({"git_commit": "2b000de", "gen_mesh_wall_sec": 1.0}, f)
    try:
        logs = []
        rec = bench.load_record("test_stale_record_tmp.json", logs.append)
        assert rec["stale"] and logs and "STALE" in logs[0]
        rec2 = bench.load_record("test_stale_record_tmp.json", logs.append,
                                 check_commit=False)
        assert "stale" not in rec2
    finally:
        os.remove(rec_path)
    assert bench.load_record("no_such_record.json", logs.append) is None
