"""Exit-status plumbing of the verification tools (r6 ADVICE, both high
items): every tool's ``__main__`` block must propagate ``main()``'s 0/1
status to the process exit code, and exit_gate must record a stage whose
subprocess fails as status FAIL and itself exit non-zero.

Without this, fuzz divergences / invariance violations / superlinear
scale regressions were printed but the process exited 0, so
EXITGATE.json recorded 'pass' for failing stages.
"""

from __future__ import annotations

import json
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = [
    "check.py",
    "empty_check.py",
    "exit_gate.py",
    "fuzz_check.py",
    "invariance_check.py",
    "scale_stress.py",
]


@pytest.mark.parametrize("tool", TOOLS)
def test_main_block_propagates_status(tool: str) -> None:
    src = open(os.path.join(REPO, "tools", tool)).read()
    block = src[src.index('if __name__ == "__main__":'):]
    assert re.search(r"sys\.exit\(main\(\)\)|SystemExit\(main\(\)\)", block), (
        f"tools/{tool} __main__ discards main()'s status — the process "
        "always exits 0 and exit_gate records failing stages as pass"
    )


def test_exit_gate_forced_fail_stage(tmp_path, monkeypatch) -> None:
    """A stage whose subprocess exits 1 must surface as FAIL + exit 1."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import exit_gate
    finally:
        sys.path.pop(0)

    out = str(tmp_path / "gate.json")
    fake = [
        ("good", [sys.executable, "-c", "print('ok')"]),
        ("bad", [sys.executable, "-c", "raise SystemExit(1)"]),
    ]
    monkeypatch.setattr(exit_gate, "STAGES", fake)
    monkeypatch.setattr(sys, "argv", ["exit_gate.py", "--out", out])
    rc = exit_gate.main()
    record = json.load(open(out))
    assert record["stages"]["good"]["status"] == "pass"
    assert record["stages"]["bad"]["status"] == "FAIL"
    assert record["pass"] is False
    assert rc == 1

    # and all-green → exit 0
    monkeypatch.setattr(exit_gate, "STAGES", fake[:1])
    rc = exit_gate.main()
    assert rc == 0 and json.load(open(out))["pass"] is True
