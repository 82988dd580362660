"""Host-parse thread scaling: native tile-parallel entropy parse
(DecCfg.threads analog, vp9_decodeframe.c decode_tiles_mt counterpart).

Parses a multi-tile stream with 1..N threads and prints parse-only fps
per thread count.  Run on a multi-core host (the 1-core dev box can
only demonstrate bit-exactness, which tests/test_threads.py gates).

Usage: python tools/profiling/parse_threads.py <ivf> [max_threads] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from cuda_vp9_tpu.containers import IvfReader  # noqa: E402
from cuda_vp9_tpu.native import NativeParser  # noqa: E402

ivf = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..",
    "tests", "fixtures", "hd01_1920x1080_t4.ivf")
max_threads = int(sys.argv[2]) if len(sys.argv) > 2 else \
    min(8, os.cpu_count() or 1)
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

with IvfReader(ivf) as r:
    packets = [d for d, _ in r]
print(f"{ivf}: {len(packets)} packets, host cores={os.cpu_count()}")

base = None
for n in [1, 2, 4, 8]:
    if n > max_threads:
        break
    best = 0.0
    for _ in range(reps):
        parser = NativeParser(threads=n)
        t0 = time.time()
        for p in packets:
            parser.parse(p)
        dt = time.time() - t0
        best = max(best, len(packets) / dt)
    if base is None:
        base = best
    print(f"threads={n}: {best:6.1f} fps  ({best / base:.2f}x)",
          flush=True)
