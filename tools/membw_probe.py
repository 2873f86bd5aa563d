"""Memory-bandwidth scaling ceiling: N vs 4N processes streaming a DRAM-sized
working set.

The raw-CPU ceiling probe in bench_scaling.py runs an L1-resident integer loop,
which scales near-perfectly (0.93-0.97 on this host) — but a Spark ER job's
tasks stream shuffle blocks, Arrow batches, and hash tables through DRAM, so
the attainable N->4N efficiency is bounded by the memory system, not the ALUs.
This probe measures that bound: each process xor-reduces a 256 MB int64 array
(working set >> LLC), and we compare aggregate throughput at N vs 4N
processes. Read the ER job's measured scaling efficiency against THIS ceiling
for memory-traffic-heavy stages.

Usage: python tools/membw_probe.py [--lo 4] [--hi 16] [--seconds 8]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def stream(q, mb: int, seconds: float) -> None:
    a = np.arange(mb * 131072, dtype=np.int64)  # mb MiB of int64
    t0 = time.time()
    n = 0
    acc = 0
    while time.time() - t0 < seconds:
        acc ^= int(np.bitwise_xor.reduce(a))  # one full streaming pass
        n += 1
    q.put((n, acc))


def run(procs: int, mb: int, seconds: float) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=stream, args=(q, mb, seconds)) for _ in range(procs)]
    [p.start() for p in ps]
    total = sum(q.get()[0] for _ in ps)
    [p.join() for p in ps]
    return total * mb / seconds  # aggregate MB/s streamed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()
    lo = run(args.lo, args.mb, args.seconds)
    hi = run(args.hi, args.mb, args.seconds)
    eff = (hi / lo) / (args.hi / args.lo)
    print(
        json.dumps(
            {
                "probe": "membw_stream",
                "mb_per_proc": args.mb,
                "agg_mb_s": {args.lo: round(lo, 1), args.hi: round(hi, 1)},
                "membw_ceiling_efficiency": round(eff, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys_exit = main()
    raise SystemExit(sys_exit)
