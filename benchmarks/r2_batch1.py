"""Round-2 TPU batch 1: pending raster A/Bs + headline refresh, ONE
process so numbers are comparable (session speed varies ~2x between
processes — BENCH.md caveat).

  1. raster stages (1080p stress): clip_pack_bin with argsort vs
     chunked counting-sort (RASTER_BIN_SORT), raster kernel (affine
     coeff records), G-buffer build.
  2. bench.py headline + breakdown in the same process.

Run from the repo dir: python - < benchmarks/r2_batch1.py
"""
import os
import sys

sys.path.insert(0, os.getcwd())

print("=== part 1: raster stages (argsort) ===", flush=True)
os.environ["RASTER_BIN_SORT"] = "argsort"
from benchmarks import raster_stages

raster_stages.main()

print("=== part 1b: clip_pack_bin (chunked counting sort) ===", flush=True)
os.environ["RASTER_BIN_SORT"] = "chunked"
raster_stages.main()

print("=== part 2: bench.py headline + breakdown ===", flush=True)
os.environ["RASTER_BIN_SORT"] = "argsort"
os.environ.setdefault("BENCH_FRAMES", "8")
import bench

bench.main()
