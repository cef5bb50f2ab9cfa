"""Two-parallelism scaling evidence (north_rule: efficiency >= 0.8, N→4N).

No real cluster exists in this sandbox, so the same extraction job runs on
the same input at local[8] and local[32] (separate JVMs) and
``efficiency = (tps_32 / tps_8) / (32 / 8)``. Results append to
``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, n_turns: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "throughput.py"), str(cores), str(n_turns)],
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    low = run_level(8, n_turns)
    print(json.dumps(low))
    high = run_level(32, n_turns)
    print(json.dumps(high))
    speedup = high["turns_per_sec"] / low["turns_per_sec"]
    efficiency = speedup / (32 / 8)
    summary = {
        "turns": n_turns,
        "tps_local8": low["turns_per_sec"],
        "tps_local32": high["turns_per_sec"],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "meets_0.8_target": efficiency >= 0.8,
    }
    print(json.dumps(summary))

    bench_dir = os.path.join(ROOT, "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    path = os.path.join(bench_dir, "BASELINE.md")
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE.md — measured throughput + scaling evidence\n\n"
                "Metric: full per-turn extraction (decode → dictionary-correct →\n"
                "segment → field-extract → classify) over the deterministic\n"
                "synthetic transcript corpus, identical input at two parallelism\n"
                "levels (local[8] vs local[32]; sandbox proxy for N vs 4N\n"
                "executors per the task's two-cluster-size rule).\n\n"
                "| turns | tps local[8] | tps local[32] | speedup 8→32 | efficiency | ≥0.8 |\n"
                "|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {summary['turns']} | {summary['tps_local8']} | {summary['tps_local32']} "
            f"| {summary['speedup_8_to_32']} | {summary['scaling_efficiency']} "
            f"| {'yes' if summary['meets_0.8_target'] else 'NO'} |\n"
        )
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
