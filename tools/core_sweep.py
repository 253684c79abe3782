"""Sequential core-count sweep: WHERE does the single-pass job stop scaling
on this host?

The interleaved 2-level protocol (bench.run_scaling_interleaved) answers the
north_rule's N->4N question for one pair; this tool maps the whole curve.
One worker JVM at a time (no core competition between levels), pinned to
cores 0..k-1, health monitor on the box's last core, pure-Python spin
control at the same widths. If the spin control keeps scaling where the
Spark scan flattens, the ceiling is a shared host resource (memory
bandwidth on the parquet/Tungsten row path), not CPU steal and not the
engine's plan — the distinction the 6->24 scaling attempts could not make
from two points.

Usage:  python tools/core_sweep.py            # levels 2,4,6,8,12,16,24,32
        XEMA_SWEEP_LEVELS=2,8,32 XEMA_SWEEP_N=2400000 python tools/core_sweep.py

Appends one JSON line per sweep to BENCH/core_sweep.jsonl and prints a
markdown table; run it in a calm window (same rule as bench.py: nothing
else on the box).
"""
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

LEVELS = tuple(int(x) for x in
               os.environ.get("XEMA_SWEEP_LEVELS", "2,4,6,8,12,16,24,32").split(","))
N_DOCS = int(os.environ.get("XEMA_SWEEP_N", str(bench.SCALE_N)))
REPS = int(os.environ.get("XEMA_SWEEP_REPS", "3"))


def spin_control(cpus: int, seconds: float = 2.0) -> float:
    """Aggregate pure-Python ops/sec over `cpus` pinned spin processes —
    the CPU-availability ceiling for the same core range the worker used."""
    procs = []
    for i in range(cpus):
        cmd = ["taskset", "-c", str(i), sys.executable, "-c", bench._SPIN,
               str(seconds)]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
    total = 0.0
    for p in procs:
        out, _ = p.communicate(timeout=seconds * 10)
        total += float(out.strip())
    return total / seconds


def run_level(cpus: int) -> dict:
    """One pinned worker JVM (bench.py --scale-worker protocol: untimed
    JIT warm-up, then REP-per-line), REPS timed reps, minimum kept —
    steal is additive on a deterministic job, so min is the estimator."""
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.abspath(bench.__file__), "--scale-worker", str(cpus)]
    env = dict(os.environ, XEMA_BENCH_SCALE_N=str(N_DOCS))
    p = subprocess.Popen(cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, text=True, env=env,
                         cwd=os.path.dirname(os.path.abspath(bench.__file__)))
    try:
        while True:
            line = p.stdout.readline()
            if not line:
                raise RuntimeError(f"sweep worker local[{cpus}] died during init")
            if line.startswith("{") and json.loads(line).get("ready"):
                break
        reps = []
        for _ in range(REPS):
            t0 = time.time()
            p.stdin.write("REP\n")
            p.stdin.flush()
            line = p.stdout.readline()
            if not line:
                raise RuntimeError(f"sweep worker local[{cpus}] died mid-rep")
            r = json.loads(line)
            r["t0"], r["t1"] = t0, time.time()
            reps.append(r)
        p.stdin.write("EXIT\n")
        p.stdin.flush()
        p.wait(timeout=120)
    finally:
        # never orphan a JVM on a box whose methodology is "nothing else
        # running" — a leaked worker poisons every later measurement
        if p.poll() is None:
            p.kill()
            p.wait()
    return {
        "cpus": cpus,
        "min_scan_sec": min(r["scan_elapsed_sec"] for r in reps),
        "min_wall_sec": min(r["elapsed_sec"] for r in reps),
        "med_scan_sec": round(statistics.median(
            r["scan_elapsed_sec"] for r in reps), 3),
        "all_scan_sec": [r["scan_elapsed_sec"] for r in reps],
        "all_wall_sec": [r["elapsed_sec"] for r in reps],
    }


def main() -> None:
    mon_core = (os.cpu_count() or 32) - 1
    monitor = bench.HealthMonitor(mon_core)
    mon_live = True
    levels = []
    try:
        for cpus in LEVELS:
            if mon_live and cpus > mon_core:
                # the worker/spin core range 0..cpus-1 now includes the
                # monitor's core: a reading here would count the sweep's own
                # worker as steal AND shave a core off the level being
                # measured — stop the monitor, record health as unknown
                monitor.stop()
                mon_live = False
            t0 = time.time()
            lvl = run_level(cpus)
            lvl["health"] = (bench.HealthMonitor.window_health(
                monitor.peek(), t0, time.time()) if mon_live else None)
            lvl["spin_ops_per_sec"] = spin_control(cpus)
            levels.append(lvl)
            print(f"# local[{cpus:2d}]  scan min {lvl['min_scan_sec']:7.2f}s  "
                  f"wall min {lvl['min_wall_sec']:7.2f}s  "
                  f"health {lvl['health']}", flush=True)
    finally:
        # a failed level must not strand the spin monitor on its pinned core
        if mon_live:
            monitor.stop()

    base = levels[0]
    rows = ["| cores | scan s (min) | scan speedup | scan eff | spin speedup "
            "| spin eff | health |",
            "|---|---|---|---|---|---|---|"]
    for lvl in levels:
        f = lvl["cpus"] / base["cpus"]
        su = base["min_scan_sec"] / lvl["min_scan_sec"]
        sp = lvl["spin_ops_per_sec"] / base["spin_ops_per_sec"]
        rows.append(
            f"| {lvl['cpus']} | {lvl['min_scan_sec']:.2f} | {su:.2f}x "
            f"| {su / f:.3f} | {sp:.2f}x | {sp / f:.3f} "
            f"| {lvl['health']} |")
    table = "\n".join(rows)
    print(table)

    record = {"ts": round(time.time(), 1), "n_docs": N_DOCS,
              "partitions": bench.FIXED_PARTITIONS, "reps": REPS,
              "levels": levels}
    os.makedirs("BENCH", exist_ok=True)
    with open(os.path.join("BENCH", "core_sweep.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print("RESULT " + json.dumps({
        "n_docs": N_DOCS,
        "scan_eff_vs_2": {str(l["cpus"]): round(
            (base["min_scan_sec"] / l["min_scan_sec"]) / (l["cpus"] / base["cpus"]), 3)
            for l in levels},
    }))


if __name__ == "__main__":
    main()
