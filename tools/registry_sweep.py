"""Full-registry latency sweep (VERDICT r7 item 6): one timed run of
EVERY bench_queries() entry at sf0.01, so regressions in the ~two
thirds of the registry that the headline bench never times are visible
round-over-round.

One run per entry keeps the sweep cheap (~3-4 min); that makes single
numbers noisy, so the alert logic is deliberately coarse — an entry
only flags when it is BOTH >2.5x its recorded baseline AND >0.5 s
absolute above it (the VM's noise floor swallows anything smaller;
bench.py's min-of-3 is the precise instrument, this is the tripwire).

Usage:
    python tools/registry_sweep.py [sf_dir] [out_json]
        writes {name: seconds} plus alerts vs docs/SWEEP_BASELINE.json
    python tools/registry_sweep.py --rebaseline [sf_dir]
        overwrites the baseline with a fresh sweep
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from z316_sales_data_pipeline_spark.session import get_spark  # noqa: E402

REPO = Path(__file__).resolve().parents[1]
BASELINE = REPO / "docs" / "SWEEP_BASELINE.json"
RATIO, DELTA = 2.5, 0.5


def sweep(sf_dir: str) -> dict[str, float]:
    spark = get_spark("registry_sweep")
    out: dict[str, float] = {}
    for name, fn in entrymod.bench_queries().items():
        t0 = time.time()
        fn(spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        print(f"  {name}: {out[name]:.2f}s", file=sys.stderr)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--rebaseline"]
    rebaseline = "--rebaseline" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_path = Path(args[1]) if len(args) > 1 else None

    t0 = time.time()
    times = sweep(sf_dir)
    total = round(time.time() - t0, 1)

    if rebaseline or not BASELINE.exists():
        BASELINE.write_text(json.dumps(times, indent=1, sort_keys=True) + "\n")
        print(json.dumps({"rebaselined": True, "n": len(times), "total_s": total}))
        return

    base = json.loads(BASELINE.read_text())
    alerts = {
        n: {"now": t, "baseline": base[n]}
        for n, t in times.items()
        if n in base and t > base[n] * RATIO and t - base[n] > DELTA
    }
    report = {
        "sf_dir": sf_dir,
        "n": len(times),
        "total_s": total,
        "alerts": alerts,
        "new_entries": sorted(set(times) - set(base)),
        "times": times,
    }
    line = json.dumps(report)
    if out_path:
        out_path.write_text(line + "\n")
    print(line)
    if alerts:
        # Gate, not a report (VERDICT r8 item 4): an alert fails the
        # battery run. Triage path: rerun the named queries (noise on
        # this VM is real — bench.py's min-of-3 is the precise
        # instrument), write the triage note in the round doc, then
        # either fix or --rebaseline with the note as justification.
        print(
            f"SWEEP GATE FAILED: {len(alerts)} untriaged alert(s): "
            + ", ".join(sorted(alerts)),
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
