"""Shared bench statistics: stall-aware frame-time summaries.

The networked axon TPU backend occasionally hangs a single dispatch for
20-60 s (two independent round-3 benches each saw exactly one; one
compile hang lasted 37 min). A bare mean over such a window is garbage
(5.4 FPS printed vs ~70 real in round 3), so every bench reports
median / p95 / mean / ex-stall mean consistently and counts stalls
explicitly in its output JSON (VERDICT r3 #4).
"""

from __future__ import annotations

import time

import numpy as np

#: A frame slower than this is a backend stall, not a compute spike: the
#: worst legitimate per-frame work item ever measured (KF integration +
#: full build + a 5-iteration BA chunk serialized on one chip) is ~300 ms.
STALL_THRESHOLD_S = 5.0


def frame_stats(times_s, stall_threshold_s: float = STALL_THRESHOLD_S,
                prefix: str = "") -> dict:
    """Summarize per-frame wall-clock times (seconds) into a JSON-ready
    dict: median/p95/mean/max in ms, stall count + stalled seconds, and
    the ex-stall mean/FPS (the reproducible signal on this backend)."""
    t = np.asarray(times_s, np.float64)
    assert t.ndim == 1 and len(t) > 0
    stall = t > stall_threshold_s
    ex = t[~stall]
    out = {
        "frames": int(len(t)),
        "median_ms": round(float(np.median(t)) * 1e3, 3),
        "p95_ms": round(float(np.percentile(t, 95)) * 1e3, 3),
        "mean_ms": round(float(t.mean()) * 1e3, 3),
        "max_ms": round(float(t.max()) * 1e3, 3),
        "stalls": int(stall.sum()),
        "stall_total_s": round(float(t[stall].sum()), 2),
        "ex_stall_mean_ms": (round(float(ex.mean()) * 1e3, 3)
                             if len(ex) else None),
        "ex_stall_fps": (round(float(1.0 / ex.mean()), 2)
                         if len(ex) and ex.mean() > 0 else None),
    }
    if prefix:
        out = {prefix + k: v for k, v in out.items()}
    return out


def sync_read(x) -> float:
    """End a timed window by HOST-READING a device value; returns a
    float of its first element.

    Round-5 finding: on the networked axon backend
    ``block_until_ready()`` can return BEFORE the program actually
    executes (a chained 8k bf16 matmul loop "measured" 0.04 ms/call
    with an end-of-loop block, 8.75 ms — the honest v5e number — with
    an end-of-loop host read). The TPU executes programs in order on
    its single core, so one host read of any output of the LAST
    program in a chain fences the whole window. Every timed loop must
    end with this (or another real host read), never with a bare
    block_until_ready."""
    v = np.asarray(x).ravel()
    return float(v[0]) if v.size else 0.0


def read_rtt_s() -> float:
    """Measure the cost of one tiny dispatch + host scalar read (the
    sync_read overhead), for subtracting from short timed windows."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda a, b: a + b)
    z = jnp.zeros(())
    one = jnp.float32(1.0)
    float(f(z, one))                 # compile + settle
    t0 = time.perf_counter()
    float(f(z, one))
    return time.perf_counter() - t0


def fmt_stats(s: dict) -> str:
    """One stderr line for humans."""
    return (f"median={s['median_ms']:.2f}ms p95={s['p95_ms']:.2f}ms "
            f"mean={s['mean_ms']:.2f}ms max={s['max_ms']:.2f}ms "
            f"stalls={s['stalls']} (+{s['stall_total_s']}s) "
            f"ex-stall mean={s['ex_stall_mean_ms']}ms "
            f"(~{s['ex_stall_fps']} FPS)")
