"""Freeze the bench golden baseline: BENCH_GOLDEN.json.

Runs ``bench.py`` in N INDEPENDENT sessions (fresh JVM + fresh Python
process each — the round-3 postmortem showed heavy queries swing
±50% between sessions, so a single-session baseline is meaningless),
then records, per query:

- ``median``: median of the per-session medians (the anchor value)
- ``lo``/``hi``: min/max per-session median (the observed
  cross-session variance band)

``bench.py`` embeds a ``vs_golden`` self-grading block in every
subsequent run: per-query ratio to ``median``, flagged above
2× ``hi`` — "within 2×" finally tests against something absolute
(r3 VERDICT "what's wrong" #1 / "next round" #1).

Usage::

    python tools/make_bench_golden.py [n_sessions]   # default 3

Environment: same knobs as bench.py (SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_session(i: int) -> dict:
    print(f"[golden] session {i} starting", file=sys.stderr)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = proc.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    # r5: runs_per_query moved off the contract line into the sidecar
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        data["runs_per_query"] = json.load(f)["runs_per_query"]
    print(
        f"[golden] session {i}: total {data['value']} s "
        f"({data['runs_per_query']} runs/query)",
        file=sys.stderr,
    )
    return data


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sessions = [run_session(i) for i in range(1, n + 1)]
    names = sessions[0]["queries"].keys()
    per_query = {}
    for name in names:
        meds = [s["queries"][name] for s in sessions]
        per_query[name] = {
            "median": round(statistics.median(meds), 3),
            "lo": min(meds),
            "hi": max(meds),
        }
    golden = {
        "n_sessions": n,
        "sf": sessions[0]["sf"],
        "runs_per_query": sessions[0]["runs_per_query"],
        "session_totals": [s["value"] for s in sessions],
        "per_query": per_query,
    }
    out = os.path.join(REPO, "BENCH_GOLDEN.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
        f.write("\n")
    # consecutive-session agreement (r3 VERDICT done-criterion: two
    # consecutive invocations within 10% median on unchanged plans)
    for a, b in zip(sessions, sessions[1:]):
        rs = [b["queries"][q] / a["queries"][q] for q in names if a["queries"][q] > 0]
        print(
            f"[golden] consecutive-session median ratio: "
            f"{statistics.median(rs):.3f}",
            file=sys.stderr,
        )
    print(out)


if __name__ == "__main__":
    main()
