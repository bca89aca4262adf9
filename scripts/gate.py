"""End-of-round gate, one command: the full-registry oracle check
(which itself regenerates PLANS.md so plan evidence can't lag the
registry), then the docs-vs-disk evidence audit. Exit 0 only when
every query matches its oracle AND every doc citation is backed by an
artifact on disk that says what the doc claims.

Usage: python scripts/gate.py [sf_dir]
  sf_dir default: $GATE_SF_DIR, else /root/testdata/sf0.01

Both steps ALWAYS run (an oracle failure does not hide the evidence
audit's findings — one run shows everything to fix); exit is nonzero
if either failed. Run this before the final commit of a round; it is
the mechanised form of the round-3 lesson (docs cited an endurance
report that did not exist) plus the round-2 one (PLANS.md lagged the
registry).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    default_sf = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.01")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else default_sf
    steps = [
        ("oracles+plans", [sys.executable,
                           os.path.join(REPO, "scripts", "check_oracles.py"), sf_dir]),
        ("evidence", [sys.executable,
                      os.path.join(REPO, "scripts", "evidence_audit.py")]),
    ]
    failed: list[tuple[str, int]] = []
    for name, cmd in steps:
        print(f"== gate step: {name} ==", flush=True)
        rc = subprocess.run(cmd).returncode
        if rc != 0:
            failed.append((name, rc))
    if failed:
        for name, rc in failed:
            print(f"GATE FAIL at {name} (exit {rc})")
        return 1
    print("GATE PASS: oracles green, plans current, every doc citation backed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
