"""Gate for the hot/frozen registry split (tools/registry_freeze.py,
VERDICT r12 ask #2).

The freeze contract: a frozen query is witnessed by "plan digest
unchanged since its last green driver signal" instead of a fresh
signal. These tests pin (a) the committed freeze map's structural
invariants against the real CORRECTNESS history and digest-evidence
chain, and (b) the auto-promotion rule — a digest change MUST eject a
query from the frozen set so the rotation guard ages it again.
No SparkSession needed: everything reads committed artifacts.
"""

from __future__ import annotations

import json
import os

import pytest

from tools import registry_freeze as rf
from tools.registry_digest import load_committed


@pytest.fixture(scope="module")
def freeze_data():
    return rf.load_freeze()


@pytest.fixture(scope="module")
def specs():
    return rf._specs()


def test_committed_freeze_map_valid(freeze_data, specs):
    """Every committed frozen entry satisfies the full evidence chain
    (registered + green at its freeze round + freeze-time digest equals
    the digest committed at that round) — i.e. `check` finds 0 invalid."""
    hist = rf.correctness_history()
    maps: dict[int, dict | None] = {}
    for name, meta in freeze_data.get("frozen", {}).items():
        assert name in specs, f"{name} frozen but not registered"
        assert specs[name].oracle is not None, (
            f"{name} frozen but rows-only — rows-only queries must keep "
            f"rotating (their driver signal is their only value witness)"
        )
        r = meta["last_green_round"]
        checks = dict(hist.get(name, []))
        assert checks.get(r), f"{name}: r{r} driver signal missing/not green"
        greens = sum(1 for g in dict(hist[name]).values() if g)
        assert greens >= rf.MIN_GREENS
        if r not in maps:
            maps[r] = rf.digest_map_at_round(r)
        assert maps[r] is not None, f"no digest map committed at r{r}"
        assert maps[r].get(name) == meta["digest"], (
            f"{name}: freeze-time digest disagrees with the digest map "
            f"committed at r{r} — evidence chain corrupt"
        )


def test_frozen_names_requires_current_digest_match(freeze_data):
    """frozen_names() returns exactly the entries whose freeze-time
    digest still equals the CURRENT committed map (which the suite
    separately gates against HEAD plans in test_registry_digest)."""
    committed = load_committed()
    expected = {
        n for n, m in freeze_data.get("frozen", {}).items()
        if committed.get(n) == m["digest"]
    }
    assert rf.frozen_names() == expected


def test_digest_drift_auto_promotes(freeze_data, monkeypatch):
    """THE promotion rule: change one frozen query's committed digest and
    it must leave frozen_names() — back into the hot (age-6) rotation."""
    frozen = freeze_data.get("frozen", {})
    if not frozen:
        pytest.skip("no frozen entries committed")
    victim = sorted(frozen)[0]
    real = load_committed()
    drifted = dict(real)
    drifted[victim] = "0" * 16
    monkeypatch.setattr(
        "tools.registry_digest.load_committed", lambda: drifted
    )
    names = rf.frozen_names()
    assert victim not in names
    assert names == {
        n for n, m in frozen.items()
        if n != victim and real.get(n) == m["digest"]
    }


def test_freeze_refuses_ineligible(tmp_path, monkeypatch, specs):
    """`freeze` must refuse a query with a red check in its history, and
    must not touch the freeze file when refusing."""
    fake = tmp_path / "freeze.json"
    monkeypatch.setattr(rf, "FREEZE_FILE", str(fake))
    # a never-checked name is ineligible by construction
    rc = rf.cmd_freeze(["definitely_not_a_registered_query"], False)
    assert rc == 1
    assert not fake.exists()


def test_rotation_report_excludes_frozen(freeze_data):
    """The rotation guard must pass with the committed freeze map, and
    its hot count must be registry minus frozen-intact."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "rotation_report.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    n_frozen = len(rf.frozen_names())
    assert f"{n_frozen} frozen-intact" in out.stdout
