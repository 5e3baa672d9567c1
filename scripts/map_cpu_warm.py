#!/usr/bin/env python
"""CPU mapping benchmark, cold + warm (VERDICT r4 weak #5: the round-4
figure was one cold data point). Same shape as map_cpu_r4.json; writes
bench_results/map_cpu_r5.json. Run with the tunnel bypass:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/map_cpu_warm.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/swtpu-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from swtpu.dist.mapping import map_reads  # noqa: E402
from tpu_round4 import synth_mapping_workload  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "bench_results",
                   "map_cpu_r5.json")


def main():
    L, B, qlen = 1_000_000, 2000, 100
    ref, reads = synth_mapping_workload(L, B, qlen)
    t0 = time.perf_counter()
    res = map_reads(ref, reads)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = map_reads(ref, reads)
    warm = time.perf_counter() - t0
    mapped = sum(1 for r in res.records if not r.is_unmapped)
    out = {"name": "map-cpu-r5", "B": B, "qlen": qlen, "L": L,
           "mapped": mapped,
           "cold_s": round(cold, 2), "cold_reads_per_s": round(B / cold, 1),
           "warm_s": round(warm, 2), "warm_reads_per_s": round(B / warm, 1),
           "note": "host-simd both-strand top-2 search + native hit "
                   "alignment, single CPU host, warm = second call in "
                   "the same process (compiles + memos hot)"}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
