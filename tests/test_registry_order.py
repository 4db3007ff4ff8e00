"""The round driver oracle-checks only the first 50 catalog entries (round 1
recorded exactly queries()[0:50]); these tests pin the invariants that keep
that prefix representative."""

from __future__ import annotations

import re

from nba_data_pipeline_spark.plans.registry import _FRONT, load_all

DRIVER_PREFIX = 50

FAMILY_PATTERNS = {
    "analytics": r"^(flagship|a\d|a_|skew)",
    "dedup": r"^d\d",
    "filters": r"^f\d",
    "joins_sets": r"^[ju]\d",
    "multimodal": r"^mm_",
    "normalize": r"^(n_|nba_|ud5)",
    "similarity": r"^sim_",
    "similarity_ivf": r"^sim_ivf",
    "sinks": r"^snk",
    "streaming": r"^(s\d|src_)",
    "text": r"^(ta_|x\d|x_|ud4|ud13|corpus)",
    "windows": r"^w\d",
}


def test_front_names_all_registered():
    reg = load_all()
    missing = [n for n in _FRONT if n not in reg]
    assert not missing, f"_FRONT names not in registry: {missing}"


def test_driver_prefix_covers_every_family():
    """Since the r4 rotation the prefix is spent on never-checked entries,
    so the representativeness invariant is cumulative: every family must be
    green in (this round's prefix) ∪ (entries already driver-verified in a
    prior round's CORRECTNESS file)."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    covered = set(list(load_all())[:DRIVER_PREFIX])
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r0*.json")):
        with open(path) as f:
            rec = json.load(f)
        covered.update(
            n
            for n, row in rec.items()
            if isinstance(row, dict) and row.get("rows_match")
        )
    uncovered = [
        fam
        for fam, pat in FAMILY_PATTERNS.items()
        if not any(re.match(pat, n) for n in covered)
    ]
    assert not uncovered, f"families never driver-checked: {uncovered}"


def test_driver_prefix_all_oracle_checked():
    """Every query in the checked prefix must carry a SQL oracle — a
    rows-only entry in the prefix wastes a hard-signal slot."""
    reg = load_all()
    weak = [n for n in list(reg)[:DRIVER_PREFIX] if reg[n].oracle is None]
    assert not weak, f"prefix queries without oracle: {weak}"
