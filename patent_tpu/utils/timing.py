"""Hiccup-guarded differenced timing for the tunneled TPU.

Sub-ms device work cannot be timed per dispatch through the tunnel
(dispatch alone is ~ms), so every bench here times a small and a large
chained run and differences them to cancel the constant overhead.  A
tunnel stall can inflate the small run past the large one, making the
difference nonpositive — and a ``max(dt, eps)`` guard then turns that
into an absurd rate (observed: 6e12 img/s).  Such samples are
nonphysical: re-measure the small run (keeping the min — the
least-hiccup estimate of the constant overhead) up to 3×, and if the
difference still isn't a meaningful fraction of the large run, fall back
to the undifferenced rate, which is conservative (dispatch/fetch
overhead included).

ONE implementation, shared by bench.py and every tools/ microbench — the
hiccup fix previously had to be applied to five hand-copied versions.
"""

from __future__ import annotations

import time


def timed_seconds_per_iter(fn, fetch, n_small: int = 2,
                           n_large: int = 8) -> float:
    """Seconds per iteration of ``fn`` over (n_large − n_small) chained
    iterations, overhead-cancelled, with the hiccup guard above.

    ``fetch(out)`` must force a device→host sync on the last output (e.g.
    fetch one summed scalar) — ``block_until_ready`` acks asynchronously
    through the tunnel.
    """

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        fetch(out)
        return time.perf_counter() - t0

    # measure the small run TWICE and keep the min: a single tunnel stall
    # during t_small shrinks the difference and INFLATES the rate — the
    # mechanism behind round-3's one-off 8,686 img/s embed outlier (all
    # stable-session samples sit within ±0.4%; a +0.13 s stall on the 0.31 s
    # small run reproduces the outlier exactly).  Stalls on the large run
    # only deflate the rate (conservative) and the 3× guard below catches
    # extremes.
    t_small = min(run(n_small), run(n_small))
    t_large = run(n_large)
    # a stall can also hit the LARGE run, inflating the differenced rate
    # downward (a fake regression that the small-run guard below never
    # sees).  Scaling t_small up by n_large/n_small bounds the expected
    # t_large from above (the constant overhead does not scale); allow 3×
    # slack before declaring a hiccup, and re-measure the large run once,
    # keeping the min (the least-hiccup sample).
    if t_small > 0 and t_large > 3.0 * (n_large / n_small) * t_small:
        t_large = min(t_large, run(n_large))
    for _ in range(3):
        dt = t_large - t_small
        if dt > 0.05 * t_large:
            return dt / (n_large - n_small)
        t_small = min(t_small, run(n_small))
    dt = t_large - t_small            # the last re-measure counts too
    if dt > 0.05 * t_large:
        return dt / (n_large - n_small)
    return t_large / n_large


def timed_throughput(fn, fetch, units_per_iter: int, n_small: int = 2,
                     n_large: int = 8) -> float:
    """units/sec form of ``timed_seconds_per_iter``."""
    return units_per_iter / timed_seconds_per_iter(fn, fetch, n_small,
                                                   n_large)


def timed_spread(fn, fetch, units_per_iter: int, n_small: int = 2,
                 n_large: int = 8, reps: int = 3
                 ) -> tuple[float, list[float]]:
    """(median, [min, max]) throughput over ``reps`` repeated measurements
    — the tunnel shows ±6% run-to-run wobble, so a single number cannot be
    distinguished from a real regression."""
    vals = sorted(timed_throughput(fn, fetch, units_per_iter,
                                   n_small, n_large) for _ in range(reps))
    return vals[len(vals) // 2], [vals[0], vals[-1]]
