"""The scaling-evidence ratchet (bench.record_and_merge_sweep) is the ONE
merge implementation shared by full sweeps (bench --scaling) and focused
partial sweeps (scripts/converge_legs.py). These tests pin its rules
against a throwaway repo root so no real evidence files are touched:
per-config best-only merging, the same-revision/same-sf reset discipline
(round-2 lesson, commit d70ddb9), the raw-append audit trail, and
BASELINE.md regeneration only once every pair leg exists.
"""

import json
import os

import pytest

import bench


def _leg(docs_per_sec: float, cores: int) -> dict:
    return {
        "docs": 100,
        "tables": 200,
        "wall_sec": round(100 / docs_per_sec, 3),
        "docs_per_sec": docs_per_sec,
        "tables_per_sec": docs_per_sec * 2,
        "cores": cores,
    }


@pytest.fixture()
def repo(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    return tmp_path


def test_ratchet_keeps_per_config_best(repo):
    merged, effs = bench.record_and_merge_sweep("0.1", {4: _leg(100.0, 4)})
    assert merged[4]["docs_per_sec"] == 100.0
    merged, _ = bench.record_and_merge_sweep("0.1", {4: _leg(90.0, 4)})
    assert merged[4]["docs_per_sec"] == 100.0  # slower rerun never lowers
    merged, _ = bench.record_and_merge_sweep("0.1", {4: _leg(110.0, 4)})
    assert merged[4]["docs_per_sec"] == 110.0


def test_partial_sweeps_merge_and_are_marked(repo):
    bench.record_and_merge_sweep("0.1", {4: _leg(100.0, 4), 8: _leg(190.0, 8)})
    merged, _ = bench.record_and_merge_sweep(
        "0.1", {16: _leg(350.0, 16)}, partial=True
    )
    assert set(merged) == {4, 8, 16}
    lines = [
        json.loads(l)
        for l in (repo / "BENCH" / "SCALING_RUNS.jsonl").read_text().splitlines()
    ]
    assert "partial" not in lines[0]
    assert lines[1]["partial"] is True


def test_sf_mismatch_resets_evidence(repo):
    bench.record_and_merge_sweep("0.1", {4: _leg(100.0, 4)})
    merged, _ = bench.record_and_merge_sweep("0.01", {4: _leg(50.0, 4)})
    assert merged == {4: _leg(50.0, 4)}  # different corpus: start over


def test_rev_mismatch_resets_evidence(repo):
    bench.record_and_merge_sweep("0.1", {4: _leg(100.0, 4)})
    best_path = repo / "BENCH" / "scaling_best.json"
    prev = json.loads(best_path.read_text())
    prev["rev"] = "0" * 16  # simulate evidence from another build
    best_path.write_text(json.dumps(prev))
    merged, _ = bench.record_and_merge_sweep("0.1", {4: _leg(50.0, 4)})
    assert merged[4]["docs_per_sec"] == 50.0  # stale-rev best discarded


def test_effs_and_baseline_md_only_when_pairs_complete(repo):
    _, effs = bench.record_and_merge_sweep(
        "0.1", {4: _leg(100.0, 4), 16: _leg(320.0, 16)}, partial=True
    )
    assert effs == {(4, 16): 0.8}
    assert not (repo / "BENCH" / "BASELINE.md").exists()
    _, effs = bench.record_and_merge_sweep(
        "0.1", {8: _leg(190.0, 8), 32: _leg(380.0, 32)}, partial=True
    )
    assert effs == {(4, 16): 0.8, (8, 32): 0.5}
    md = (repo / "BENCH" / "BASELINE.md").read_text()
    assert "| 4 → 16 | **0.8** |" in md
    assert "0.5 (BELOW target)" in md
