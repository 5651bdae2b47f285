"""Single-entry fleet plan-guard — the per-landing checklist step.

Runs the SAME plan-hygiene checks as the fleet pytest guards
(tests/test_plan_properties.py: test_no_query_plans_cartesian_or_row_python
and test_no_query_plans_unpartitioned_window_over_unbounded_relation) on
just the named entries, so a post-battery landing can certify its plan
shape in seconds instead of re-running the whole battery. r11 verdict
item 2: the round's only red was a commit that ran correctness but
skipped the guards — this makes the guard cheap enough that skipping it
has no excuse.

Usage: python tools/plan_guard.py <entry> [entry ...]
       python tools/plan_guard.py --all            # whole registry

Exit 0 = every named entry is guard-clean; exit 1 otherwise, with the
offending physical-plan lines printed.
"""

from __future__ import annotations

import importlib.util
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from z316_sales_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"  # plan shape is SF-independent


def _load_guard_defs():
    """Import the detector + allowlist from the test module itself so
    this tool can never drift from what the fleet guard enforces."""
    spec = importlib.util.spec_from_file_location(
        "plan_props", "/root/repo/tests/test_plan_properties.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._unpartitioned_ordered_windows, mod._BOUNDED_GLOBAL_WINDOW_SITES


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    qs = entrymod.bench_queries()
    if names == ["--all"]:
        names = list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown entries: {unknown}")
        return 2
    detector, allowlist = _load_guard_defs()
    spark = get_spark()
    bad = 0
    for name in names:
        plan = qs[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        issues = [m for m in ("CartesianProduct", "BatchEvalPython") if m in plan]
        if name not in allowlist:
            issues += [f"global-window: {h[:140]}" for h in detector(plan)]
        if issues:
            bad += 1
            print(f"FAIL  {name}")
            for i in issues:
                print(f"      {i}")
        else:
            print(f"OK    {name}")
    print(f"\n{bad} guard failures over {len(names)} entries")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
