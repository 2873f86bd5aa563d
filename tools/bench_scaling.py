"""Scaling-efficiency evidence for the north rule: run the identical ER job at two
parallelism levels (local[8] vs local[32] — the sandbox stand-in for N vs 4N
executors) on the same input and report throughput at both plus efficiency.

Each measurement runs in a fresh subprocess (own JVM) so the two runs share
nothing. The job is the full pipeline on a generated corpus of --entities
synthetic entities (deterministic, seed=42).

Usage: python tools/bench_scaling.py [--entities 4000] [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from entity_resolution_spark.plans.pipeline import PipelineConfig, resolve
from entity_resolution_spark.session import get_spark
from entity_resolution_spark.synth.generator import SynthConfig, generate_corpus

cores = int(sys.argv[1])
n_entities = int(sys.argv[2])
parquet_dir = sys.argv[3]

# 8 tasks per core: with 2/core the scoring stage's largest task WAS the stage
# span (62.7s straggler at local[16]); finer granules pack the tail
spark = get_spark("scaling", master=f"local[{{cores}}]", shuffle_partitions=max(cores * 8, 8))
repo_files = spark.read.parquet(parquet_dir)
n_files = repo_files.count()

tm = {{}}
t0 = time.monotonic()
# production-shaped: one action end-to-end (eager=False) — per-stage count()
# barriers would serialize subtrees Spark can otherwise run concurrently
# (vectors ∥ assignments). stage_sec records where the lazy DAG actually
# blocks (internal actions), not per-stage cost.
out = resolve(spark, repo_files, PipelineConfig(), eager=False, timings=tm)
n_clusters = out["clusters"].select("cluster_id").distinct().count()
wall = time.monotonic() - t0
print(json.dumps({{"cores": cores, "files": n_files, "wall_sec": wall,
                   "files_per_sec": n_files / wall, "clusters": n_clusters,
                   "stage_sec": tm}}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=4000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    ap.add_argument("--cores", default="8,32")
    ap.add_argument(
        "--load-gate", type=float, default=2.0,
        help="wait for 1-min host loadavg below this before launching each "
        "sample (shared host: neighbor load otherwise contaminates walls)",
    )
    ap.add_argument(
        "--steal-retries", type=int, default=3,
        help="extra attempts per config when a sample's hypervisor steal "
        "exceeds 2%% of its core-seconds (neighbor contamination)",
    )
    ap.add_argument(
        "--repeats", type=int, default=3,
        help="alternating repeats per config; min wall is reported (the sandbox "
        "host is shared — load from other tenants adds noise that min-of-N "
        "suppresses)",
    )
    args = ap.parse_args()

    # materialize the corpus once so both runs read identical parquet
    sys.path.insert(0, REPO)
    from entity_resolution_spark.session import get_spark
    from entity_resolution_spark.synth.generator import SynthConfig, corpus_dataframes

    corpus_dir = f"/tmp/scaling_corpus_{args.entities}"
    if not os.path.exists(corpus_dir):
        # generate+write of the 703k-file corpus OOMs the 8g default heap at
        # local[32]; the job samples below run in their own subprocesses and
        # keep the session default
        if "SPARK_DRIVER_MEMORY" not in os.environ:
            os.environ["SPARK_DRIVER_MEMORY"] = "32g"
        spark = get_spark("gen", master="local[32]")
        df_files, _, _ = corpus_dataframes(
            spark, SynthConfig(seed=42, n_entities=args.entities)
        )
        df_files.repartition(64).write.mode("overwrite").parquet(corpus_dir)
        spark.stop()

    child_src = CHILD.format(repo=REPO)
    core_list = [int(c) for c in args.cores.split(",")]

    # hardware-ceiling probe: N vs 4N raw CPU processes on this (SHARED) host.
    # Whatever the pipeline measures is bounded above by this number — external
    # tenant load means the machine itself may not deliver 4x the cores.
    def hw_ceiling(lo_n: int, hi_n: int) -> dict:
        import multiprocessing as mp
        import time as _t

        def spin(q):
            t0 = _t.time()
            n = 0
            while _t.time() - t0 < 3.0:
                sum(i * i for i in range(10000))
                n += 1
            q.put(n)

        out = {}
        for procs in (lo_n, hi_n):
            q = mp.Queue()
            ps = [mp.Process(target=spin, args=(q,)) for _ in range(procs)]
            [p.start() for p in ps]
            [p.join() for p in ps]
            out[procs] = sum(q.get() for _ in ps)
        ceiling = (out[hi_n] / out[lo_n]) / (hi_n / lo_n)
        return {"raw": out, "ceiling_efficiency": round(ceiling, 3)}

    def wait_for_quiet_host(max_wait_s: float = 1800.0) -> float:
        """Block until external tenant load subsides (1-min loadavg below
        --load-gate), so a sample measures the JOB, not the neighbors. min-of-N
        alone proved insufficient: BENCH_r02-era 16-core samples under load 4-14
        ran 2x slower than the same job on a quiet host."""
        import time as _t

        t0 = _t.time()
        while _t.time() - t0 < max_wait_s:
            load = os.getloadavg()[0]
            if load < args.load_gate:
                return load
            _t.sleep(20)
        return os.getloadavg()[0]

    wait_for_quiet_host()
    ceiling = hw_ceiling(core_list[0], core_list[-1])
    print(json.dumps({"hw_ceiling": ceiling}), flush=True)

    runs: dict[int, list[dict]] = {c: [] for c in core_list}
    for rep in range(args.repeats):
        for cores in core_list:
            retries_left = args.steal_retries
            load = wait_for_quiet_host()
            env = dict(os.environ)
            # deliberately NOT raising spark.driver.memory: the 8g session
            # default measured 2.3x FASTER than 48g on the 703k-file job at
            # local[16] (456s -> 200s; GC 427 CPU-s -> 84 CPU-s, total task CPU
            # 6,739s -> 2,783s). A big heap makes unified memory hold huge
            # deserialized aggregation/cache state with brutal object churn,
            # while the small heap spills early to /dev/shm, which is nearly
            # free. (On a real cluster this is executor sizing: many small
            # executors beat few huge heaps for this job shape.)
            env.pop("SPARK_DRIVER_MEMORY", None)

            def _steal() -> int:
                with open("/proc/stat") as f:
                    return int(f.readline().split()[8])

            while True:
                st0 = _steal()
                p = subprocess.run(
                    [sys.executable, "-c", child_src, str(cores), str(args.entities), corpus_dir],
                    capture_output=True, text=True, env=env, timeout=3600,
                )
                line = [l for l in p.stdout.splitlines() if l.startswith("{")]
                if not line:
                    print(p.stdout[-2000:], p.stderr[-4000:])
                    return 1
                r = json.loads(line[-1])
                r["host_load_before"] = round(load, 1)
                # hypervisor CPU steal during the sample (jiffies → cpu-s):
                # the sandbox's neighbors live OUTSIDE the VM, so loadavg
                # can't see them — steal can
                r["steal_cpu_s"] = round((_steal() - st0) / 100.0, 1)
                # steal-aware retry: a sample whose hypervisor steal exceeds
                # 2% of its core-seconds was measured against neighbors, not
                # the job (a 98-steal-s 16-core sample ran 12% slower than the
                # same job on a quiet host). min-of-N can't fix a config whose
                # EVERY sample is dirty — redo dirty samples while budget lasts.
                dirty = r["steal_cpu_s"] > 0.02 * cores * r["wall_sec"]
                if dirty and retries_left > 0:
                    retries_left -= 1
                    r["discarded_dirty"] = True
                    print(json.dumps(r), flush=True)
                    load = wait_for_quiet_host()
                    continue
                runs[cores].append(r)
                print(json.dumps(r), flush=True)
                break

    # min wall per config — the least-contended sample approximates the
    # uncontended job; cluster counts must agree across every run
    results = [min(runs[c], key=lambda r: r["wall_sec"]) for c in core_list]
    for c in core_list:
        assert len({r["clusters"] for r in runs[c]}) == 1
    lo, hi = results[0], results[-1]
    ratio = hi["files_per_sec"] / lo["files_per_sec"]
    eff = ratio / (hi["cores"] / lo["cores"])
    summary = {
        "throughput_low": round(lo["files_per_sec"], 1),
        "throughput_high": round(hi["files_per_sec"], 1),
        "speedup": round(ratio, 3),
        "cores_ratio": hi["cores"] / lo["cores"],
        "scaling_efficiency": round(eff, 3),
        "clusters_identical": lo["clusters"] == hi["clusters"],
    }
    print(json.dumps(summary))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# BENCH — scaling-efficiency evidence (north rule)\n\n"
            "Identical ER job (full pipeline: features → blocking → candidate pairs →\n"
            "scoring → splitter → connected components) on the same pre-materialized\n"
            f"parquet corpus ({lo['files']} files, {args.entities} entities, seed 42),\n"
            "run in fresh single-JVM subprocesses at two parallelism levels — the\n"
            "sandbox evidence for N vs 4N executors.\n\n"
            f"Each config ran {args.repeats}× alternating; best (min-wall) sample shown.\n"
            "The sandbox host is SHARED: each sample is load-gated (launched only\n"
            f"when 1-min host loadavg < {args.load_gate}; the pre-launch load is recorded\n"
            "below) and min-of-N suppresses residual neighbor noise.\n\n"
            f"Hardware ceiling measured at bench time (raw CPU processes, {core_list[0]}→{core_list[-1]}):\n"
            f"max attainable scaling efficiency on this host = **{ceiling['ceiling_efficiency']}**\n"
            f"(raw aggregate iterations: {ceiling['raw']}). Job efficiency should be read\n"
            "against this ceiling, not against an ideal 1.0.\n\n"
            "| cores | wall (s) | files/sec | clusters | host load before |\n|---|---|---|---|---|\n"
            + "".join(
                f"| local[{r['cores']}] | {r['wall_sec']:.1f} | {r['files_per_sec']:.1f} | {r['clusters']} | {r.get('host_load_before', '?')} |\n"
                for r in results
            )
            + "\nAll samples:\n\n"
            + "```\n"
            + "\n".join(json.dumps(r) for c in core_list for r in runs[c])
            + "\n```\n"
            + f"\n- speedup {lo['cores']}→{hi['cores']} cores: **{ratio:.2f}×**\n"
            f"- scaling efficiency (speedup / core-ratio): **{eff:.3f}** (target ≥ 0.8)\n"
            f"- cluster outputs identical across parallelism levels: **{summary['clusters_identical']}**\n"
        )
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
