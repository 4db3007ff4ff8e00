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
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench_full.json")
BUDGET = os.path.join(REPO, "bench_budget.json")

HEADROOM = 1.5
FLOOR_SEC = 0.5


def main() -> int:
    with open(BENCH) as f:
        bench = json.load(f)
    timings: dict[str, float] = {
        k: v for k, v in bench["queries"].items() if v >= 0
    }
    failed_queries = [k for k, v in bench["queries"].items() if v < 0]

    if "--rebase" in sys.argv:
        budgets = {
            k: round(max(v * HEADROOM, FLOOR_SEC), 2) for k, v in sorted(timings.items())
        }
        with open(BUDGET, "w") as f:
            json.dump(budgets, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"benchaudit: rebased {len(budgets)} budgets into {BUDGET}")
        return 0

    if not os.path.exists(BUDGET):
        print("benchaudit: no bench_budget.json — run with --rebase first")
        return 1
    with open(BUDGET) as f:
        budgets = json.load(f)

    breaches = {
        k: (t, budgets[k]) for k, t in timings.items() if k in budgets and t > budgets[k]
    }
    new = sorted(set(timings) - set(budgets))
    for name, (t, cap) in sorted(breaches.items(), key=lambda kv: -kv[1][0]):
        print(f"BREACH  {name}: {t:.2f}s > budget {cap:.2f}s")
    for name in new:
        print(f"note: {name} has no budget yet (run --rebase to add)")
    for name in failed_queries:
        print(f"BREACH  {name}: bench run FAILED (-1)")
    ok = not breaches and not failed_queries
    print(
        f"benchaudit: {len(timings) - len(breaches)}/{len(timings)} within budget"
        + (f", {len(new)} unbudgeted" if new else "")
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
