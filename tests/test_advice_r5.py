"""Round-5 ADVICE regressions (scripts/gate.py mechanics).

ADVICE r4 (low, scripts/gate.py:33): the gate short-circuited at the
first failing step, so an oracle failure hid the evidence audit's
violations and forced two fix-rerun cycles; and the default sf_dir was
hardcoded to this host. These tests pin the fixed behavior: both steps
always run, exit is nonzero if any failed, and $GATE_SF_DIR overrides
the default. (The soak-record audit widening from the same ADVICE
batch is pinned in tests/test_evidence_audit.py.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import gate  # noqa: E402


class _Proc:
    def __init__(self, rc):
        self.returncode = rc


def _run_gate(monkeypatch, rcs, argv=None, env_sf=None):
    """Run gate.main with subprocess.run stubbed to pop return codes
    off `rcs`; returns (exit_code, recorded_cmds)."""
    calls = []

    def fake_run(cmd, *a, **k):
        calls.append(cmd)
        return _Proc(rcs[len(calls) - 1])

    monkeypatch.setattr(gate.subprocess, "run", fake_run)
    monkeypatch.setattr(gate.sys, "argv", ["gate.py"] + (argv or []))
    if env_sf is None:
        monkeypatch.delenv("GATE_SF_DIR", raising=False)
    else:
        monkeypatch.setenv("GATE_SF_DIR", env_sf)
    return gate.main(), calls


def test_both_steps_run_when_first_fails(monkeypatch):
    rc, calls = _run_gate(monkeypatch, [1, 0])
    assert rc == 1
    assert len(calls) == 2, "evidence audit must run even when oracles fail"


def test_failure_in_second_step_still_nonzero(monkeypatch):
    rc, calls = _run_gate(monkeypatch, [0, 2])
    assert rc == 1 and len(calls) == 2


def test_all_green_exits_zero(monkeypatch):
    rc, calls = _run_gate(monkeypatch, [0, 0])
    assert rc == 0 and len(calls) == 2


def test_sf_dir_from_env(monkeypatch):
    _, calls = _run_gate(monkeypatch, [0, 0], env_sf="/some/sf9")
    assert calls[0][-1] == "/some/sf9"


def test_sf_dir_argv_beats_env(monkeypatch):
    _, calls = _run_gate(monkeypatch, [0, 0], argv=["/cli/sf"], env_sf="/env/sf")
    assert calls[0][-1] == "/cli/sf"
