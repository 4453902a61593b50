"""10M-scale serving snapshot: the 16-query warm-median protocol BASELINE.md
cites (round 4+). Usage:

    python tools/serve_snapshot.py <index_dir> [--cold]

Builds a 4-actor parallel engine (result_cache=False — scoring, not repeat
serving), runs one untimed warm pass per query, then reports the median of 5
timed repeats per query plus the SET p50/p95. --cold also reports each
query's FIRST-pass latency (first-ever decodes; box-sensitive — compare only
same-window interleaved pairs, see BASELINE.md's box-drift protocol).

The single-thread parse1000 canary brackets the run: it catches scheduler
degradation but NOT memory-bandwidth thrash (BASELINE round 5) — treat any
cross-run comparison without interleaving as unattributable.
"""
import os
import statistics as st
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QS = [
    "data", "the data", "data OR query OR join", "role:assistant AND data",
    '"data query"', '"data query"~2', '"the data query"~3',
    '"data xylophone42"~6', "data AND query AND NOT join", "dat*", "d?ta",
    "data~1", "[data TO deploy]", "xylophone42", "role:user",
    "(deploy OR data)^2 AND query",
]


def main() -> None:
    import numpy as np
    import ray

    idx = sys.argv[1]
    cold_too = "--cold" in sys.argv
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import bench
    from lucille_ray.search.engine import SearchEngine

    print("canary:", round(bench._canary_parse1000_ms(), 1), "ms")
    eng = SearchEngine(idx, parallel=True, result_cache=False)
    eng.warm()
    lat, cold = {}, {}
    for qs in QS:
        t0 = time.perf_counter()
        eng.search(qs, k=10)
        cold[qs] = (time.perf_counter() - t0) * 1e3
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            eng.search(qs, k=10)
            reps.append(time.perf_counter() - t0)
        lat[qs] = st.median(reps) * 1e3
    print("SCORING (result_cache=False), median of 5 warm:")
    for q, v in lat.items():
        print(f"  {q!r}: {v:.1f}")
    meds = sorted(lat.values())
    print(f"  SET p50 {np.percentile(meds, 50):.1f} ms  "
          f"p95 {np.percentile(meds, 95):.1f} ms")
    if cold_too:
        print("COLD first pass:")
        for q, v in cold.items():
            print(f"  {q!r}: {v:.1f}")
    eng.shutdown()
    print("canary end:", round(bench._canary_parse1000_ms(), 1), "ms")
    ray.shutdown()


if __name__ == "__main__":
    main()
