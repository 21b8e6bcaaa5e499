"""Host contention meter: /proc/stat steal-time sampling for benchmarks.

Round-5 verdict item: an unexplained monotone intra-session drift in the
late-session stress (35.8 -> 77.0 -> 122.6s early runs) and a cross-session
drift in the interleaved multiexec bench (both parallelism levels slowing
together across FRESH JVMs) needed a named cause. Live sampling during the
round-6 runs found it: hypervisor CPU steal, measured at 5-19% of total
machine capacity over adjacent 10s windows on this VM. This module lets
every benchmark record the steal fraction *over its own timed window*, so
each published number carries its contention covariate instead of a generic
"VM noise" caveat.

Steal time is jiffies the hypervisor ran something else while this VM had
runnable work (man proc(5), /proc/stat cpu line, field 8). It is purely a
host-side signal: no Spark, no JVM involvement, identical cost at any
parallelism level.
"""

from __future__ import annotations


def read_cpu_jiffies() -> tuple[int, int]:
    """Return (total_jiffies, steal_jiffies) summed over all CPUs.

    Reads the aggregate `cpu ` line of /proc/stat. Returns (0, 0) on
    non-Linux hosts so callers can no-op gracefully.
    """
    try:
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu "):
                    fields = [int(x) for x in line.split()[1:]]
                    total = sum(fields)
                    steal = fields[7] if len(fields) > 7 else 0
                    return total, steal
    except OSError:
        pass
    return 0, 0


def triad_gbps(mb: int = 128, reps: int = 3) -> float | None:
    """Effective memory bandwidth (GB/s) via a STREAM-triad-style probe.

    Round-6 finding: the cross-session bench drift persists at <1% steal
    with healthy buddyinfo/free-memory/khugepaged — i.e. the interference
    is a shared host resource steal cannot see (memory bandwidth / LLC
    from co-tenants is the standard suspect on multi-tenant hypervisors).
    This 1-2s single-core probe (a = b + 2c over `mb`-MB float64 arrays,
    best of `reps`) gives benches a direct bandwidth covariate: a slow
    triad alongside a slow run and ~0% steal is bandwidth contention;
    a normal triad alongside a slow run points back at the engine.

    Uses a = b + c as ONE out= ufunc pass (no temp allocation — this VM's
    measured ~100MB/s fresh-page pathology would swamp the signal); counts
    3 arrays * 8 bytes/elem of traffic per pass (read b, read c, write a —
    write-allocate ignored, as in STREAM's convention). Returns None if
    numpy is unavailable.
    """
    try:
        import numpy as np
    except ImportError:
        return None
    import time

    n = mb * 1024 * 1024 // 8
    b = np.ones(n)
    c = np.ones(n)
    a = np.empty(n)
    best = float("inf")
    np.add(b, c, out=a)  # touch every page before timing
    for _ in range(reps):
        t0 = time.perf_counter()
        np.add(b, c, out=a)
        best = min(best, time.perf_counter() - t0)
    return round(3 * n * 8 / best / 1e9, 2)


class StealMeter:
    """Measure hypervisor steal fraction over a timed window.

    Usage::

        m = StealMeter()            # snapshots /proc/stat
        ... timed work ...
        pct = m.steal_pct()         # % of machine capacity stolen since start

    `steal_pct()` may be called repeatedly; each call reports the fraction
    since construction (not since the previous call). Use `restart()` to
    re-zero. Returns None when /proc/stat is unavailable or no jiffies have
    elapsed (sub-tick windows).
    """

    def __init__(self) -> None:
        self._t0, self._s0 = read_cpu_jiffies()

    def restart(self) -> None:
        self._t0, self._s0 = read_cpu_jiffies()

    def steal_pct(self) -> float | None:
        t1, s1 = read_cpu_jiffies()
        dt = t1 - self._t0
        if dt <= 0:
            return None
        return round(100.0 * (s1 - self._s0) / dt, 2)
