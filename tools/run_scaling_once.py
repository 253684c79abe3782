"""Fire ONE scaling phase (no headline queries) and append it to
BENCH/history.jsonl — used to chase calm-window e2e efficiency evidence
(VERDICT r3 directive #3) without paying the headline phase.

Usage:  XEMA_BENCH_SCALE_N=10000000 XEMA_BENCH_SCALE_LEVELS=2,8 \
            python tools/run_scaling_once.py
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (reads env at import)


def main() -> None:
    print(f"levels={bench.SCALE_LEVELS} n_docs={bench.SCALE_N} "
          f"partitions={bench.FIXED_PARTITIONS}", flush=True)
    control = bench.cpu_control(bench.SCALE_LEVELS)
    print("cpu_control:", json.dumps(control), flush=True)
    levels = bench.run_scaling_interleaved(
        bench.SCALE_LEVELS, bench.SCALE_N, bench.SCALE_REPS)
    bench.append_history(levels, control)
    # first/last, not a 2-tuple unpack: XEMA_BENCH_SCALE_LEVELS accepts any
    # comma list and losing the RESULT line after hours of measurement over
    # an unpack ValueError would be absurd; efficiency is reported for the
    # widest pair
    lo, hi = levels[0], levels[-1]
    factor = hi["cpus"] / lo["cpus"]
    out = {
        "n_docs": bench.SCALE_N,
        "levels": [{k: lvl[k] for k in ("cpus", "all_runs_sec",
                                        "all_scan_sec", "rep_health")}
                   for lvl in levels],
        "eff_e2e_min": round((min(lo["all_runs_sec"]) /
                              min(hi["all_runs_sec"])) / factor, 3),
        "eff_scan_min": round((min(lo["all_scan_sec"]) /
                               min(hi["all_scan_sec"])) / factor, 3),
        "minima_pool": bench.history_minima(),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
