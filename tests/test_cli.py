"""User CLI roundtrip — the client/cli.py analog (submit → poll → storage
ops) driven end-to-end against a raw-files corpus."""

from __future__ import annotations

import json

from tools.cli import main as cli


def _out_lines(capsys) -> list[str]:
    return [l for l in capsys.readouterr().out.strip().splitlines() if l]


def test_cli_extract_poll_storage_roundtrip(spark, tmp_path, capsys):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "a.txt").write_text("plain text content here")
    (raw / "b.html").write_bytes(
        b'<html><body><nav><a href="/">Home</a></nav>'
        b"<article><p>the main article body text</p></article></body></html>"
    )
    out = str(tmp_path / "out")

    # submit (ocr_upload analog) — run id is the task id
    assert cli(["extract", "--input", str(raw), "--out", out, "--run-id", "t1"]) == 0
    summary = json.loads(_out_lines(capsys)[-1])
    assert summary["docs"] == 2

    # poll (result --task_id analog)
    assert cli(["result", "--out", out, "--run-id", "t1"]) == 0
    rows = [json.loads(l) for l in _out_lines(capsys)]
    done = [r for r in rows if r["status"] == "done"]
    assert done and sum(r["docs_done"] for r in done) == 2

    # unknown run → PENDING (the reference's unknown-task answer)
    assert cli(["result", "--out", out, "--run-id", "nope"]) == 0
    assert json.loads(_out_lines(capsys)[-1])["state"] == "PENDING"

    # storage ops (list_files / load_file / delete_file analogs)
    assert cli(["list-tables", "--base", out]) == 0
    names = _out_lines(capsys)
    assert "results" in names and "progress" in names

    assert cli(["show", "--location", f"{out}/results", "--limit", "1"]) == 0
    row = json.loads(_out_lines(capsys)[-1])
    assert row["run_id"] == "t1" and row["spans"]

    # clear-cache on a run with no cache table reports cleared=false
    assert cli(["clear-cache", "--out", out]) == 0
    assert json.loads(_out_lines(capsys)[-1])["cleared"] is False

    assert cli(["delete-table", "--location", f"{out}/results"]) == 0
    assert json.loads(_out_lines(capsys)[-1])["deleted"] is True
    assert cli(["list-tables", "--base", out]) == 0
    assert "results" not in _out_lines(capsys)
