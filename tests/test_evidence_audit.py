"""scripts/evidence_audit.py mechanics: citation extraction + the
exists/non-empty/content checks, on a synthetic repo layout (the live
audit over the real docs runs in the end-of-round gate, not here — mid-
round it legitimately reports in-flight runs as incomplete)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import evidence_audit  # noqa: E402


def _mkrepo(tmp_path, readme: str) -> str:
    (tmp_path / "BENCH").mkdir(exist_ok=True)
    (tmp_path / "README.md").write_text(readme)
    return str(tmp_path)


def test_missing_artifact_is_violation(tmp_path):
    repo = _mkrepo(tmp_path, "see BENCH/ghost.md for numbers\n")
    res = evidence_audit.audit(repo)
    assert [v["artifact"] for v in res["violations"]] == ["BENCH/ghost.md"]
    assert "does not exist" in res["violations"][0]["problem"]
    assert res["violations"][0]["cited"] == ["README.md:1"]


def test_empty_artifact_is_violation(tmp_path):
    repo = _mkrepo(tmp_path, "see BENCH/empty.md\n")
    (tmp_path / "BENCH" / "empty.md").write_text("")
    res = evidence_audit.audit(repo)
    assert [v["problem"] for v in res["violations"]] == ["cited but empty"]


def test_backed_citation_is_clean(tmp_path):
    repo = _mkrepo(tmp_path, "numbers in BENCH/real.md, twice: BENCH/real.md\n")
    (tmp_path / "BENCH" / "real.md").write_text("| 1 | data |\n")
    res = evidence_audit.audit(repo)
    assert res["violations"] == []
    # both citations of one artifact collapse to one entry with count 2
    assert res["citations"] == {"BENCH/real.md": 2}


def test_partial_endurance_log_flagged(tmp_path):
    repo = _mkrepo(tmp_path, "tail: BENCH/endurance_log.jsonl\n")
    rows = [{"kind": "wave", "wave": 0, "total_events": 63_000_000}] + [
        {"kind": "batch", "batch_id": i} for i in range(8)
    ]
    (tmp_path / "BENCH" / "endurance_log.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    res = evidence_audit.audit(repo)
    probs = " ".join(v["problem"] for v in res["violations"])
    assert "1/16 wave rows" in probs
    assert "8/128 batch rows" in probs


def test_complete_endurance_log_clean(tmp_path):
    repo = _mkrepo(tmp_path, "tail: BENCH/endurance_log.jsonl\n")
    rows = [
        {"kind": "wave", "wave": w, "total_events": (w + 1) * 64_000_000}
        for w in range(16)
    ] + [{"kind": "batch", "batch_id": i} for i in range(128)]
    (tmp_path / "BENCH" / "endurance_log.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    assert evidence_audit.audit(repo)["violations"] == []


def test_report_covering_fewer_waves_than_log_flagged(tmp_path):
    repo = _mkrepo(tmp_path, "write-up: BENCH/endurance.md\n")
    rows = [{"kind": "wave", "wave": w, "total_events": 10**9} for w in range(16)]
    rows += [{"kind": "batch"} for _ in range(128)]
    (tmp_path / "BENCH" / "endurance_log.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    # report tabulates only one wave — round-3's bug in a new coat
    (tmp_path / "BENCH" / "endurance.md").write_text(
        "| wave | events |\n|---|---|\n| 0 | 63.1M |\n"
    )
    res = evidence_audit.audit(repo)
    assert any("tabulates 1 waves but the log records 16" in v["problem"]
               for v in res["violations"])


_SOAK_SCRIPT = """
checks["core_equal"] = True
checks["doctor_ok"] = True
checks["classifier_derive_equal"] = True
"""


def _mk_soak_repo(tmp_path, record: str) -> str:
    repo = _mkrepo(tmp_path, "composition proof: BENCH/soak_latest.md\n")
    (tmp_path / "scripts").mkdir(exist_ok=True)
    (tmp_path / "scripts" / "soak_kitchen_sink.py").write_text(_SOAK_SCRIPT)
    (tmp_path / "BENCH" / "soak_latest.md").write_text(record)
    return repo


def test_soak_record_without_gate_block_flagged(tmp_path):
    """A record predating the machine-readable gate block (round-4's
    stale-soak escape) must fail the audit, even though it says PASS."""
    repo = _mk_soak_repo(tmp_path, "# soak\n**VERDICT: PASS**\n")
    res = evidence_audit.audit(repo)
    assert any("no gate-checks block" in v["problem"] for v in res["violations"])


def test_soak_record_missing_script_gate_flagged(tmp_path):
    """Script implements a gate the record never ran → violation (the
    exact round-4 case: classifier_derive_equal added to the script,
    record predates it)."""
    gates = json.dumps({"core_equal": True, "doctor_ok": True})
    repo = _mk_soak_repo(
        tmp_path, f"# soak\n**VERDICT: PASS**\n<!-- gate-checks: {gates} -->\n"
    )
    res = evidence_audit.audit(repo)
    probs = " ".join(v["problem"] for v in res["violations"])
    assert "classifier_derive_equal" in probs


def test_soak_record_current_and_passing_clean(tmp_path):
    gates = json.dumps(
        {"core_equal": True, "doctor_ok": True, "classifier_derive_equal": True}
    )
    repo = _mk_soak_repo(
        tmp_path, f"# soak\n**VERDICT: PASS**\n<!-- gate-checks: {gates} -->\n"
    )
    assert evidence_audit.audit(repo)["violations"] == []


def test_live_docs_cite_only_known_artifact_kinds():
    """Every citation the regex finds in the real docs parses as a path
    under the repo — guards the regex against matching prose."""
    cites = evidence_audit.find_citations()
    assert cites, "real docs should cite at least one artifact"
    for rel in cites:
        assert not rel.endswith((".", ",", ")")), rel
        assert rel.split("/")[0] in {"BENCH", "CORRECTNESS_local.json",
                                     "PLANS.md", "COPYCHECK.json"}, rel
