"""Bench-regression gate: compare the latest ``bench_full.json`` per-query
timings against the committed budgets in ``bench_budget.json`` and fail on
any breach.

The budget file maps query name -> allowed seconds (1.5x the accepted
baseline timing, floored at 0.5 s so sub-100 ms queries don't flap on
scheduler noise). The audit exists because r2 shipped a 1.7x regression on
``d5_minhash_lsh_pairs`` that nothing mechanical watched; type/plan/value
gates all passed while the constant factor doubled.

Workflow (README "pre-commit loop"):

    python bench.py                  # refreshes bench_full.json at sf0.1
    python tools/benchaudit.py       # exit 1 on any budget breach

Refreshing budgets after an ACCEPTED perf change:

    python tools/benchaudit.py --rebase   # budgets = 1.5x current timings

Round-4 note: full-run timings show run-level noise concentrated on a
shifting subset (one run doubled the x-suite, the next the streaming
drains, with totals 156-173 s over four runs of identical code). When two
clean full runs are available, prefer budgets = 1.5x the per-query MAX of
the two (what the r4 session committed) over a single-run --rebase — it
keeps the gate meaningful for real >1.5x regressions without flapping on
whichever family the next run's noise lands on.

New queries absent from the budget file are reported (so --rebase gets run)
but are not failures; removed queries are dropped on the next --rebase.

Round-10 addition — RUN-CLASS normalization: r9's only breach was
``x12_team_mentions`` at +0.02 s, an artifact of rebasing budgets from a
~205 s close-run class and then auditing a 218 s driver-run class. The
budget file now records the reference run's total under ``__total__`` at
rebase time; the audit scales every budget by the ratio of the audited
run's total to that reference, pro-rated to the query set shared by both
runs (clamped to [1, 1.25] — only ever LOOSENS,
and never by more than the plausible scheduler-noise band), so a
uniformly slower run class cannot manufacture per-query breaches while a
genuine single-query regression still fires. A small absolute epsilon
(``ABS_EPS``) additionally keeps sub-0.1 s jitter from ever breaching by
construction.

Round-9 addition — the FROZEN floor ledger (``bench_floor.json``): budgets
are rebased every round (max-of-two), so the 1.5x gate only tracks
round-over-round drift — a query could decay 1.4x every round forever
without a breach. The floor file records each query's BEST-EVER accepted
timing and is only ever lowered (``--update-floor`` merges
min(current, floor)); the audit WARNS (not fails) when a timing exceeds
``FLOOR_DRIFT``x its floor, surfacing cumulative decay that per-round
rebasing masks. Floor warnings demand a look, not an automatic revert —
a deliberate scale-correctness trade (e.g. sky1's r8 rewrite) legitimately
raises small-SF cost; after accepting one, refresh that query's floor by
hand or let it stand as a documented trade.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench_full.json")
BUDGET = os.path.join(REPO, "bench_budget.json")
FLOOR = os.path.join(REPO, "bench_floor.json")

HEADROOM = 1.5
FLOOR_SEC = 0.5
#: warn when a timing exceeds this multiple of its best-ever floor
FLOOR_DRIFT = 2.0
#: absolute per-query jitter floor: a breach must clear the budget by this
#: many seconds, so 0.02 s-class scheduler noise can't fire by construction
ABS_EPS = 0.15
#: run-class budget scaling is clamped here — loosening beyond ~25% would
#: start absorbing real regressions instead of run-class noise
CLASS_RATIO_CAP = 1.25
#: key under which --rebase records its reference run's total seconds
TOTAL_KEY = "__total__"


def main() -> int:
    with open(BENCH) as f:
        bench = json.load(f)
    timings: dict[str, float] = {
        k: v for k, v in bench["queries"].items() if v >= 0
    }
    failed_queries = [k for k, v in bench["queries"].items() if v < 0]

    floors: dict[str, float] = {}
    if os.path.exists(FLOOR):
        with open(FLOOR) as f:
            floors = json.load(f)

    if "--update-floor" in sys.argv:
        merged = {
            k: round(min(v, floors.get(k, v)), 3) for k, v in timings.items()
        }
        lowered = sum(1 for k in merged if merged[k] < floors.get(k, float("inf")))
        new_q = len(set(merged) - set(floors))
        floors.update(merged)
        with open(FLOOR, "w") as f:
            json.dump(dict(sorted(floors.items())), f, indent=1, sort_keys=True)
            f.write("\n")
        print(
            f"benchaudit: floor ledger updated ({lowered} lowered, "
            f"{new_q} new) into {FLOOR}"
        )
        return 0

    if "--rebase" in sys.argv:
        budgets = {
            k: round(max(v * HEADROOM, FLOOR_SEC), 2) for k, v in sorted(timings.items())
        }
        budgets[TOTAL_KEY] = round(sum(timings.values()), 2)
        with open(BUDGET, "w") as f:
            json.dump(budgets, f, indent=1, sort_keys=True)
            f.write("\n")
        print(
            f"benchaudit: rebased {len(budgets) - 1} budgets into {BUDGET} "
            f"(reference run total {budgets[TOTAL_KEY]:.2f}s)"
        )
        return 0

    if not os.path.exists(BUDGET):
        print("benchaudit: no bench_budget.json — run with --rebase first")
        return 1
    with open(BUDGET) as f:
        budgets = json.load(f)

    # run-class normalization (see module docstring): scale budgets by the
    # audited run's total vs the reference run's total, clamped to only
    # ever loosen and never past the scheduler-noise band.
    ref_total = budgets.pop(TOTAL_KEY, None)
    ratio = 1.0
    if ref_total:
        shared = [k for k in timings if k in budgets]
        cur_total = sum(timings[k] for k in shared)
        # Reference for the shared set = the RECORDED __total__ (the actual
        # reference run's seconds, per the docstring contract), pro-rated
        # to the shared set by budget mass so added/removed queries don't
        # skew the class ratio. Pro-rating by budget mass (rather than
        # summing budget/HEADROOM directly) keeps FLOOR_SEC-floored
        # sub-0.33 s entries from inflating the reference: the floor
        # inflation appears in numerator and denominator of the shared
        # fraction and cancels to second order, while the absolute scale
        # comes from __total__, which the floor never touched.
        mass_all = sum(budgets.values())
        mass_shared = sum(budgets[k] for k in shared)
        ref_shared = ref_total * (mass_shared / max(mass_all, 1e-9))
        ratio = max(1.0, min(cur_total / max(ref_shared, 1e-9), CLASS_RATIO_CAP))

    breaches = {
        k: (t, budgets[k] * ratio)
        for k, t in timings.items()
        if k in budgets and t > budgets[k] * ratio + ABS_EPS
    }
    new = sorted(set(timings) - set(budgets))
    for name, (t, cap) in sorted(breaches.items(), key=lambda kv: -kv[1][0]):
        print(f"BREACH  {name}: {t:.2f}s > budget {cap:.2f}s")
    for name in new:
        print(f"note: {name} has no budget yet (run --rebase to add)")
    for name in failed_queries:
        print(f"BREACH  {name}: bench run FAILED (-1)")
    # floor drift: cumulative decay the per-round budget rebase can't see.
    # Warnings, not failures — see the module docstring.
    drifted = {
        k: (t, floors[k])
        for k, t in timings.items()
        if k in floors and t > max(floors[k] * FLOOR_DRIFT, FLOOR_SEC)
    }
    for name, (t, fl) in sorted(drifted.items(), key=lambda kv: -kv[1][0]):
        print(
            f"WARN    {name}: {t:.2f}s > {FLOOR_DRIFT}x best-ever floor "
            f"{fl:.2f}s (cumulative drift — investigate or accept+refresh)"
        )
    unfloored = sorted(set(timings) - set(floors))
    ok = not breaches and not failed_queries
    print(
        f"benchaudit: {len(timings) - len(breaches)}/{len(timings)} within budget"
        + (f", {len(new)} unbudgeted" if new else "")
        + (f", {len(drifted)} floor-drift warning(s)" if drifted else "")
        + (f", {len(unfloored)} unfloored" if unfloored else "")
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
