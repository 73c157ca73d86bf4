"""The driver's correctness gate captures only the first ~50 entries of
``queries()`` per round, so the registration order is load-bearing: gates
never hash-matched by an official CORRECTNESS_r0N.json must come first.
These tests pin the dynamic rotation (no Spark needed)."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402


def _captured_from_disk() -> set:
    caught = set()
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rec = json.loads(p.read_text())
        for name, row in rec.items():
            if (
                isinstance(row, dict)
                and row.get("hash_match") is True
                and row.get("rows_match") is True
                and row.get("err") is None
            ):
                caught.add(name)
    return caught


def test_captured_gates_matches_disk():
    assert entry._captured_gates() == _captured_from_disk()


def test_uncaptured_gates_sort_first():
    caught = _captured_from_disk()
    order = list(entry.queries().keys())
    # once a captured gate appears, no uncaptured gate may follow it
    tail = False
    for name in order:
        if name in caught:
            tail = True
        else:
            assert not tail, f"uncaptured gate {name!r} after captured block"


def test_failed_rows_do_not_count_as_captured(tmp_path, monkeypatch):
    bad = {
        "g_fail": {"rows_match": True, "hash_match": False, "err": None},
        "g_err": {"rows_match": True, "hash_match": True, "err": "boom"},
        "g_ok": {"rows_match": True, "hash_match": True, "err": None},
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(bad))
    # _captured_gates globs CORRECTNESS_r*.json next to __spark_entry__.py;
    # point the glob at the temp dir to isolate the predicate under test
    import glob as _glob

    real_glob = _glob.glob
    monkeypatch.setattr(
        _glob,
        "glob",
        lambda pat: real_glob(str(tmp_path / "CORRECTNESS_r*.json")),
    )
    assert entry._captured_gates() == {"g_ok"}


def test_every_query_has_oracle_or_is_documented():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q
    assert len(q) == len(entry.queries())
