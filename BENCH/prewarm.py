#!/usr/bin/env python
"""Pre-fault guest page frames so benchmark JVMs recycle warm pages.

This sandbox VM serves first-touch page faults through a host handler
whose throughput oscillates between ~60 MB/s and ~4 GB/s aggregate.
Pages already served stay host-backed after the process exits (the
guest free list hands them to the next allocator without re-faulting),
so faulting a large arena here — however slowly — converts the next
Spark JVM's startup+run from fault-bound to compute-bound.

Usage: python BENCH/prewarm.py [GiB]   (default 16)
"""

from __future__ import annotations

import ctypes
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def prewarm(gib: int = 16, threads: int = 32) -> float:
    n = gib << 30
    a = np.empty(n, dtype=np.uint8)
    addr = a.ctypes.data
    stripe = (n + threads - 1) // threads
    t0 = time.monotonic()
    with ThreadPoolExecutor(threads) as ex:
        list(
            ex.map(
                lambda i: ctypes.memset(
                    addr + i * stripe, 0, min(stripe, n - i * stripe)
                ),
                range(threads),
            )
        )
    return time.monotonic() - t0


if __name__ == "__main__":
    gib = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    wall = prewarm(gib)
    print(f"pre-faulted {gib} GiB in {wall:.1f}s ({gib * 1024 / wall:.0f} MB/s)")
