#!/usr/bin/env python3
"""Canonical host-health probe (see BASELINE.md bench protocol).

Single-core fixed-work loop; prints integer ops/sec. The local[32] host's
CPU throughput cycles between healthy and throttled epochs (hypervisor
level; no steal or cgroup quota visible), so every published bench record
must be bracketed by a before/after probe reading. Bench.scala embeds this
exact loop (via python3 -c) and records both readings in its JSON as
probe_before / probe_after.

Calibration on this container (2026-08-14): healthy epoch reads
>= ~10.5M ops/s STANDALONE; throttled epochs read ~7.8-9.4M (-30%).
Identical full-suite Spark code measured 63s healthy vs 105s throttled,
so a record bracketed by two sub-10.5M readings undersells the code and
must not be compared per-query against a healthy-epoch record.

When Bench.scala runs this loop co-resident with its own sbt/Spark JVM,
readings deflate by a further constant ~30% (measured twice, stable):
healthy-epoch IN-BENCH readings are >= ~7.2M. Interpret probe_before /
probe_after in BENCH json on that scale, not the standalone one.
"""
import time

def probe(seconds: float = 2.0) -> float:
    t0 = time.perf_counter()
    x, n = 1, 0
    while time.perf_counter() - t0 < seconds:
        for _ in range(100000):
            x = (x * 31 + 7) & 0xffffffff
        n += 100000
    return n / (time.perf_counter() - t0)

if __name__ == "__main__":
    print(int(probe()))
