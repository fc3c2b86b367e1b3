"""Single-thread hot-loop microbenchmark — the host-weather-independent
regression check (BASELINE.md §D3).

This host shows multi-hour degraded memory-bandwidth windows where
wall-clock benches are meaningless; the flagship's per-block stage
kernels, run single-threaded on one deterministic 1500-doc synth block,
move far less (scalar CPU stays normal) and pin code regressions:

    round-3 best: explode 0.169  ocr 0.03  finalize 0.119  (total 0.32 s)
    round-5 best: explode 0.145  ocr 0.03  finalize 0.119  (total ~0.29 s)

Usage: ``python microbench.py`` — prints one JSON line. No Ray session
(pure local kernels), safe to run any time.
"""
import json
import time


def _best(fn, arg, n=5):
    best = 9e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(arg)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    from unravel_ray.stages import explode_extract, finalize_block, ocr_task
    from unravel_ray.synth import make_corpus_range

    # host-weather probe alongside, so a recorded number is interpretable;
    # shared with bench.py (pinned BLAS threads — the harness env sets
    # OMP_NUM_THREADS=1, under which an in-process probe reads ~1.2 s on a
    # quiet host)
    from bench import _host_probe

    probe = _host_probe()

    blk = make_corpus_range(0, 1500)
    explode_extract(blk)  # warm imports/regex caches untimed
    t_explode, wu = _best(explode_extract, blk)
    t_ocr, oc = _best(lambda b: ocr_task(b, "fake", ("fake",)), wu)
    t_fin, done = _best(finalize_block, oc)
    print(json.dumps({
        "metric": "single-thread hot-loop sec per 1500-doc synth block",
        "explode_sec": round(t_explode, 4),
        "ocr_sec": round(t_ocr, 4),
        "finalize_sec": round(t_fin, 4),
        "total_sec": round(t_explode + t_ocr + t_fin, 4),
        "workunits": wu.num_rows,
        "docs_out": done.num_rows,
        "host_probe_matmul_sec": probe,
    }))


if __name__ == "__main__":
    main()
