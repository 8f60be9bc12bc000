"""Scaling-rung study: 1.34B (24-layer) train step + batch-size search (r3).

Measures bench.bench_train at the shipped 0.94B config's width for
24 layers (the 16 GB scaling rung: bf16 weights + 8-bit Adam moments),
and a batch ladder on the 0.94B config to see whether larger batches
amortize the fixed optimizer cost (63 ms) into higher MFU.
"""
import os
import sys
import time

# sys.path[0] is scripts/, where the bench/ package dir shadows repo-root bench.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

bench._enable_compile_cache()


def run(label, **kw):
    t0 = time.perf_counter()
    try:
        tok_s, mfu = bench.bench_train(**kw)
        print(f"{label:40s} {tok_s:8.0f} tok/s  MFU {mfu:5.1f}%  "
              f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{label:40s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "scale"):
        run("1.34B: layers=24 b4", layers=24)
    if which in ("all", "scale2"):
        run("1.34B: layers=24 b2", layers=24, batch=2)
    if which in ("all", "batch"):
        run("0.94B: b8", batch=8)
    if which in ("all", "batch6"):
        run("0.94B: b6", batch=6)
    # ---- r5: the 1.34B lever study (VERDICT r4 ask #4) ----
    if which in ("r5", "accum2"):
        # optimizer amortization: micro-batch 2 x accum 2 = the same 4x2048
        # effective batch (and update frequency) as the 0.94B rung
        run("1.34B: b2 accum2 (eff 4x2048)", layers=24, batch=2, accum=2)
    if which in ("r5", "accum4"):
        run("1.34B: b2 accum4 (eff 8x2048)", layers=24, batch=2, accum=4)
    if which in ("r5", "b3"):
        # what does the b3 compile-OOM actually cost? (documented, not used)
        run("1.34B: b3 (expected compile-OOM)", layers=24, batch=3)
    if which in ("r5", "b2base"):
        run("1.34B: b2 baseline (re-measure)", layers=24, batch=2)
    if which in ("r5accum094", "accum094"):
        # control: does accum help where the optimizer is ALREADY amortized?
        run("0.94B: b4 accum2 (eff 8x2048)", batch=4, accum=2)
