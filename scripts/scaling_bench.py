"""Two-parallelism scaling measurement (the sandbox stand-in for the north
rule's N vs 4N executor criterion): run bench.py at local[8] and local[32]
on the same input, report throughput at both plus scaling efficiency, and
write BENCH/BASELINE.md.

eff = T_8 / (4 * T_32)  (equivalently throughput_32 / (4 * throughput_8));
target >= 0.8.  Each run is a fresh subprocess so the JVM/core count is
honest.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# The scaling measurement needs compute-dominated queries: small runs are
# stage-latency-bound and show no speedup no matter the engine.  Size the
# workload up so local[8] spends minutes computing.
SCALE_ENV = {
    "YG_BENCH_PAGES": os.environ.get("YG_BENCH_PAGES", "1600000"),
    "YG_BENCH_RASTER_REPEAT": os.environ.get("YG_BENCH_RASTER_REPEAT", "192"),
    "YG_BENCH_MINHASH_DOCS": os.environ.get("YG_BENCH_MINHASH_DOCS", "100000"),
}


def run_once(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR, **SCALE_ENV)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, check=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    small = run_once(8)
    big = run_once(32)
    t8, t32 = small["value"], big["value"]
    eff = t8 / (4 * t32)
    report = {
        "sf": small["sf"],
        "t_local8_sec": t8,
        "t_local32_sec": t32,
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
        "queries_local8": small["queries"],
        "queries_local32": big["queries"],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w", encoding="utf-8") as fp:
        fp.write(
            "# Scaling measurement (local[8] vs local[32], same input)\n\n"
            "Sandbox evidence for the north rule's two-cluster-size criterion\n"
            "(N and 4N executors): the same bench suite on the same sf dir at\n"
            "two parallelism levels.\n\n"
            f"- input: `{SF_DIR}`\n"
            f"- wall local[8]:  **{t8:.2f} s**  (throughput {small['throughput_rows_per_s']:.0f} rows/s)\n"
            f"- wall local[32]: **{t32:.2f} s**  (throughput {big['throughput_rows_per_s']:.0f} rows/s)\n"
            f"- speedup 8→32 cores: **{t8 / t32:.2f}x** (ideal 4x)\n"
            f"- scaling efficiency: **{eff:.3f}** (target ≥ 0.8)\n\n"
            "Per-query seconds:\n\n"
            "| query | local[8] | local[32] | speedup |\n|---|---|---|---|\n"
            + "\n".join(
                f"| {q} | {small['queries'][q]:.2f} | {big['queries'][q]:.2f} | "
                f"{small['queries'][q] / max(big['queries'][q], 1e-9):.2f}x |"
                for q in small["queries"]
            )
            + "\n\n```json\n" + json.dumps(report, indent=1) + "\n```\n"
        )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
