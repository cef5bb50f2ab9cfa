"""Two-parallelism scaling evidence (north_rule: efficiency >= 0.8, N→4N).

No real cluster exists in this sandbox, so the identical extraction job
runs on identical input at two parallelism levels in separate JVMs, with
the lower level pinned to that many physical CPUs via ``taskset`` (an
N-executor cluster has no spare cores for helper threads — leaving the
remaining CPUs idle would flatter the baseline).

Three N→4N windows are measured by default: 2→8 (added round 6, VERDICT
r05 #5 — the window where the VM's memory-bus ceiling demonstrably does
not bind, so the raw >= 0.8 criterion is checkable without the control
normalization), 4→16 and 8→32. A pure-Python
multiprocessing control (no Spark, same per-turn kernel, same corpus
generator) runs at every level to expose the *hardware* scaling ceiling of
this 32-vCPU VM — beyond ~16 busy cores, per-core throughput collapses from
memory-bandwidth/host contention even with zero framework overhead, so the
meaningful figure for the 8→32 window is Spark's efficiency relative to
that ceiling. Results append to ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def spark_level(cores: int, n_turns: int) -> dict:
    cmd = [
        sys.executable,
        os.path.join(ROOT, "tools", "throughput.py"),
        str(cores),
        str(n_turns),
    ]
    if cores < (os.cpu_count() or 32):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _mp_work(args):
    n0, n1 = args
    from htep_spark.reference import extract_turn
    from htep_spark.sources.io import make_turn_text

    for i in range(n0, n1):
        extract_turn(make_turn_text(i)[0])
    return n1 - n0


def python_control(procs: int, n_turns: int) -> float:
    """Frameworkless control: same kernel, same corpus, raw processes."""
    chunks = [
        (i * n_turns // procs, (i + 1) * n_turns // procs) for i in range(procs)
    ]
    with mp.Pool(procs) as pool:
        pool.map(_mp_work, [(0, 50)] * procs)  # warm imports + memos
        t0 = time.time()
        pool.map(_mp_work, chunks)
        dt = time.time() - t0
    return round(n_turns / dt, 1)


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000
    windows = (
        tuple(
            tuple(int(x) for x in w.split("-"))
            for w in sys.argv[2].split(",")
        )
        if len(sys.argv) > 2
        else ((2, 8), (4, 16), (8, 32))
    )
    rows = []
    for low, high in windows:
        s_low = spark_level(low, n_turns)
        s_high = spark_level(high, n_turns)
        c_low = python_control(low, min(n_turns, 16_000))
        c_high = python_control(high, min(n_turns, 16_000))
        eff = round(s_high["turns_per_sec"] / s_low["turns_per_sec"] / (high / low), 3)
        hw_eff = round(c_high / c_low / (high / low), 3)
        rel = round(eff / hw_eff, 3) if hw_eff else None
        row = {
            "window": f"{low}->{high}",
            "turns": n_turns,
            f"tps_spark_{low}": s_low["turns_per_sec"],
            f"tps_spark_{high}": s_high["turns_per_sec"],
            "spark_efficiency": eff,
            "hw_ceiling_efficiency": hw_eff,
            "spark_vs_hw_ceiling": rel,
            "meets_0.8": eff >= 0.8,
        }
        rows.append(row)
        print(json.dumps(row))

    bench_dir = os.path.join(ROOT, "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    path = os.path.join(bench_dir, "BASELINE.md")
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE.md — measured throughput + scaling evidence\n"
                "\n"
                "Metric: steady-state full per-turn extraction (payload decode →\n"
                "dictionary correction → segmentation+spans → field extraction →\n"
                "classification) over the deterministic synthetic transcript corpus\n"
                "(`htep_spark.sources.io.synthesize_transcripts`, mixed plain/noisy/\n"
                "HTML/PDF-layout/markdown payloads, one skewed mega-conversation).\n"
                "Identical input at two parallelism levels in separate JVMs; the\n"
                "lower level is CPU-pinned (`taskset`) — the sandbox proxy for N vs\n"
                "4N executors mandated by the task brief. One untimed pass warms\n"
                "JVM/codegen/Python workers/memo tables; the timed pass measures the\n"
                "steady-state regime a 10^12-turn job lives in.\n"
                "\n"
                "`hw ceiling` = the same kernel under raw multiprocessing (no Spark):\n"
                "this 32-vCPU VM itself stops scaling past ~16 busy cores (memory\n"
                "bandwidth / host contention), so Spark efficiency in the 8→32\n"
                "window is also shown relative to that hardware ceiling.\n"
                "\n"
                "| window | turns | tps @N | tps @4N | spark eff | hw ceiling eff | spark/hw | ≥0.8 |\n"
                "|---|---|---|---|---|---|---|---|\n"
            )
        for r in rows:
            low, high = r["window"].split("->")
            f.write(
                f"| {r['window']} | {r['turns']} | {r[f'tps_spark_{low}']} "
                f"| {r[f'tps_spark_{high}']} | {r['spark_efficiency']} "
                f"| {r['hw_ceiling_efficiency']} | {r['spark_vs_hw_ceiling']} "
                f"| {'yes' if r['meets_0.8'] else 'no'} |\n"
            )
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
