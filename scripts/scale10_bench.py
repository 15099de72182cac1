"""10x scale datapoint (VERDICT r4 item 8): run the three heaviest bench
queries at the standard sf0.1-equivalent workload AND at 10x that input
(sf1-equivalent) on local[32], and report wall time + peak tree RSS for
both plus the scale ratio.

The 100-TB story otherwise rests on plan shape alone; one measured
order-of-magnitude point confirms there is no hidden superlinear term
(open-bin growth, bucket-count skew, collect creep).  Wall ratio ~10x
(or below, where fixed costs amortise) and sub-linear memory growth are
the pass criteria; a ratio well above 10x names a superlinear suspect.

Peak memory is the max over 0.5 s samples of the bench process tree's
summed RSS (bench python + JVM + Python workers), read from /proc —
peak-sampled, so short spikes between samples can be missed; adequate
for an order-of-magnitude check.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = "conv2d_sum,pages_text_quality,minhash_lsh"

# sf0.1-equivalent bench defaults and their 10x (sf1-equivalent) scaling.
BASE = {"YG_BENCH_PAGES": 400_000, "YG_BENCH_RASTER_REPEAT": 48,
        "YG_BENCH_MINHASH_DOCS": 50_000}


def _tree_pids(root: int) -> "list[int]":
    pids, stack = [], [root]
    while stack:
        pid = stack.pop()
        pids.append(pid)
        try:
            for task in os.listdir(f"/proc/{pid}/task"):
                with open(f"/proc/{pid}/task/{task}/children") as fp:
                    stack.extend(int(c) for c in fp.read().split())
        except OSError:
            continue
    return pids


def _tree_rss_bytes(root: int) -> int:
    total = 0
    for pid in _tree_pids(root):
        try:
            with open(f"/proc/{pid}/statm") as fp:
                total += int(fp.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
        except OSError:
            continue
    return total


def run_level(mult: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="32",
        YG_BENCH_ONLY=QUERIES,
        YG_BENCH_REPEATS="1",
        **{k: str(v * mult) for k, v in BASE.items()},
    )
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    peak = {"rss": 0}
    stop = threading.Event()

    def sample() -> None:
        while not stop.is_set():
            peak["rss"] = max(peak["rss"], _tree_rss_bytes(proc.pid))
            time.sleep(0.5)

    t = threading.Thread(target=sample, daemon=True)
    t.start()
    out, _ = proc.communicate(timeout=7200)
    stop.set()
    t.join(timeout=2)
    if proc.returncode:
        raise RuntimeError(f"bench.py failed at {mult}x")
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    rec["peak_rss_gib"] = round(peak["rss"] / (1 << 30), 2)
    return rec


def main() -> int:
    one = run_level(1)
    ten = run_level(10)
    rows = []
    for q in QUERIES.split(","):
        t1, t10 = one["queries"][q], ten["queries"][q]
        rows.append({"query": q, "t_1x_sec": t1, "t_10x_sec": t10,
                     "wall_ratio": round(t10 / t1, 2)})
    report = {
        "queries": rows,
        "peak_rss_1x_gib": one["peak_rss_gib"],
        "peak_rss_10x_gib": ten["peak_rss_gib"],
        "mem_ratio": round(ten["peak_rss_gib"] / max(one["peak_rss_gib"], 0.01), 2),
    }
    md = (
        "\n## 10x scale datapoint (sf0.1-equivalent vs sf1-equivalent input, "
        "local[32])\n\n"
        "One order-of-magnitude empirical point for the heaviest queries — "
        "a wall ratio near (or below) 10x and sub-linear peak-memory growth "
        "confirm no hidden superlinear term behind the plan-shape argument.\n\n"
        "| query | 1x sec | 10x sec | wall ratio (ideal <=10x) |\n|---|---|---|---|\n"
        + "\n".join(
            f"| {r['query']} | {r['t_1x_sec']:.2f} | {r['t_10x_sec']:.2f} | "
            f"{r['wall_ratio']:.2f}x |" for r in rows
        )
        + f"\n\nPeak process-tree RSS: {one['peak_rss_gib']:.1f} GiB at 1x -> "
        f"{ten['peak_rss_gib']:.1f} GiB at 10x "
        f"(ratio {report['mem_ratio']:.2f}x; sampled at 0.5 s).\n"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a", encoding="utf-8") as fp:
        fp.write(md)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
