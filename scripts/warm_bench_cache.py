"""Warm the persistent XLA compile cache with every program bench.py
measures (search buckets + slope fori_loop programs), so a
deadline-bounded bench run never pays a remote compile.

Run after any change to the hybrid search path:
    python scripts/warm_bench_cache.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("BENCH_DEADLINE_S", "100000")

from legal_rag_tpu.utils.cache import enable_compile_cache

enable_compile_cache(os.path.join(REPO, ".bench_cache", "jax"))

import bench  # noqa: E402

bench._install_handler()
metrics = {}
# run only through the slope compiles + measurements, skipping encode
os.environ["BENCH_SKIP_ENCODE"] = "1"
t0 = time.time()
bench.main(metrics)
print(f"warm complete in {time.time()-t0:.0f}s; metrics={metrics}",
      file=sys.stderr)
