"""Two-cluster-size scaling evidence (north_rule): run the SAME pipeline
on the SAME input at local[2] (N cores), local[8] (4N) and local[32]
(16N) in separate JVMs; report throughput at each and the scaling
efficiency throughput(4N) / (4 x throughput(N)). Appends a measured
section to BASELINE.md when run with --write.

    python scripts/bench_scaling.py [--feeds 1440] [--reps 6] [--write]

NOISE PROTOCOL — the host is co-tenanted and the RATIO is the fragile
quantity: a burst that lands on one level's measurement window biases
the efficiency (local[2] barely feels host contention, local[8]/[32]
absorb it fully — observed 0.64-0.80 "efficiencies" from bursts vs
0.86-0.90 quiet, on identical code). Defenses:

1. All level JVMs stay ALIVE simultaneously and reps are INTERLEAVED
   rep-by-rep (2, 8, 32, 2, 8, 32, ...) via a stdin/stdout ping-pong —
   only one executes at a time, so adjacent reps of different levels
   see the same host weather and best-of-N pairs come from comparable
   windows.
2. A quiet-window probe gate before each rep (all-core JVM burn vs its
   own quiet best, bounded wait) plus per-rep probe-ratio/loadavg in
   the artifact so the reader can bound residual noise.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, ".")
from gtfs2lc_spark.session import build_session
from gtfs2lc_spark import extraction, fixtures, pipeline, sinks

cpus = int(sys.argv[1]); n_feeds = int(sys.argv[2])
spark = build_session(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")

def force(df): df.write.format("noop").mode("overwrite").save()

def probe():
    t0 = time.perf_counter()
    spark.range(64_000_000).selectExpr("sum(cast(xxhash64(id) as double))").collect()
    return time.perf_counter() - t0

def build(n):
    pages = fixtures.pages_df_scaled(spark, n, noise_pages=40, n_partitions=cpus * 2).cache()
    pages.count()
    e = extraction.extract_entities(pages)
    return sinks.connections_to_triples(pipeline.convert(
        e["stop_times"], e["trips"], e["routes"], e["stops"],
        e["calendar"], e["calendar_dates"], salt_n=64))

force(build(2))  # warm codegen/JIT through the identical plan shape
probe_best = min(probe() for _ in range(3))

def wait_quiet(budget=30.0):
    global probe_best
    waited = 0.0
    while True:
        p = probe(); probe_best = min(probe_best, p)
        r = p / probe_best
        if r <= 1.5 or waited >= budget:
            return round(r, 2)
        time.sleep(5); waited += 5

# plan built ONCE; per-rep py4j plan construction (~2 s, constant in
# cluster size) is not engine throughput
df = build(n_feeds)
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "go":
        break
    r = wait_quiet()
    load = round(os.getloadavg()[0], 1)
    t0 = time.perf_counter(); force(df); sec = time.perf_counter() - t0
    print(json.dumps({"sec": round(sec, 3), "probe_ratio": r, "loadavg": load}),
          flush=True)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--feeds", type=int, default=1440)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--levels", type=int, nargs="*", default=[2, 8, 32])
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs: dict[int, subprocess.Popen] = {}
    for cpus in args.levels:
        procs[cpus] = subprocess.Popen(
            [sys.executable, "-u", "-c", RUNNER, str(cpus), str(args.feeds)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, cwd=cwd,
        )
    for cpus, p in procs.items():
        while True:
            line = p.stdout.readline()
            if not line:
                raise RuntimeError(f"runner local[{cpus}] died during warmup")
            if line.strip() == "READY":
                break

    def read_json_line(cpus: int) -> dict:
        # skip any stray non-JSON stdout (JVM banners, warnings); EOF =
        # the runner died — fail with the level named instead of a
        # bare JSONDecodeError
        while True:
            line = procs[cpus].stdout.readline()
            if not line:
                raise RuntimeError(f"runner local[{cpus}] died mid-run")
            if line.lstrip().startswith("{"):
                return json.loads(line)

    runs: dict[int, list[dict]] = {c: [] for c in args.levels}
    for _ in range(args.reps):
        for cpus in args.levels:  # interleave: 2, 8, 32, 2, 8, 32, ...
            p = procs[cpus]
            p.stdin.write("go\n")
            p.stdin.flush()
            runs[cpus].append(read_json_line(cpus))
    for p in procs.values():
        p.stdin.close()
        try:
            p.wait(timeout=120)
        except subprocess.TimeoutExpired:
            p.kill()  # a slow JVM shutdown must not lose the results

    triples = args.feeds * 29992
    level = {}
    for cpus in args.levels:
        sec = min(r["sec"] for r in runs[cpus])
        level[cpus] = {
            "cpus": cpus, "n_feeds": args.feeds, "sec": sec,
            "all_runs": [r["sec"] for r in runs[cpus]],
            "probe_ratio_at_rep": [r["probe_ratio"] for r in runs[cpus]],
            "loadavg_at_rep": [r["loadavg"] for r in runs[cpus]],
            "triples": triples,
            "triples_per_sec": round(triples / sec, 1),
        }
    result = {f"local{c}": level[c] for c in args.levels}
    if 2 in level and 8 in level:
        result["efficiency_2_to_8"] = round(
            level[8]["triples_per_sec"] / (4 * level[2]["triples_per_sec"]), 3
        )
    if 8 in level and 32 in level:
        result["efficiency_8_to_32"] = round(
            level[32]["triples_per_sec"] / (4 * level[8]["triples_per_sec"]), 3
        )
    print(json.dumps(result))

    if args.write and 2 in level and 8 in level:
        section = f"""
## Measured scaling ({args.feeds} feeds, interleaved best-of-{args.reps} per level, quiet-window gated)

| cores | wall (s) | triples/sec |
|---|---|---|
""" + "".join(
            f"| local[{c}] | {level[c]['sec']} | {level[c]['triples_per_sec']:,} |\n"
            for c in args.levels
        ) + f"""
Efficiency N->4N (2->8): {result['efficiency_2_to_8']:.3f}"""
        if "efficiency_8_to_32" in result:
            section += f"""; 8->32: {result['efficiency_8_to_32']:.3f}
(single shared JVM saturates DRAM bandwidth past ~8 threads).
"""
        with open("BASELINE.md", "a") as f:
            f.write(section)


if __name__ == "__main__":
    main()
