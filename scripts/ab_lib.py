#!/usr/bin/env python
"""Shared A/B harness discipline (r10 verdict #5).

The r10 staging A/B proved, by running the same experiment twice, that
SEQUENTIAL arms adjudicate nothing on this drifting host: with no
warm-up and arms run back to back, every arm measured faster than the
arm before it (page-cache warming + monotonic host drift), regardless
of which arm it was (SCALING.md, "run 1 adjudicates nothing"). The only
design whose verdicts held was: one UNTIMED warm-up cycle, then arms
INTERLEAVED per cycle — drift lands on every arm equally instead of
flattering whichever ran last.

``warmup_interleaved`` is that design as a function, so every A/B
script states its schedule by construction instead of re-deriving (or
forgetting) it. Arms may depend on shared per-cycle state via ``setup``
(untimed — e.g. rebuilding a store the arms mutate).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Mapping


def warmup_interleaved(
    arms: Mapping[str, Callable[[Any], Any]],
    reps: int,
    setup: Callable[[int], Any] | None = None,
    warmup: bool = True,
    log: Callable[[str], None] | None = print,
) -> tuple[dict[str, list[float]], dict[str, Any]]:
    """Run ``arms`` (ordered name -> callable taking the cycle context)
    for ``reps`` timed cycles, each cycle running EVERY arm once in the
    given order, preceded by one untimed warm-up cycle (``warmup=True``,
    the default — the warm-up also runs ``setup``).

    ``setup(rep)`` runs UNTIMED before each cycle (rep ``-1`` for the
    warm-up) and its return value is passed to every arm in that cycle;
    pass None when arms are self-contained (they then receive None).

    Returns ``(timings, last)``: per-arm wall-second lists (warm-up
    excluded) and each arm's last timed return value (for result
    equality checks across arms).
    """
    if reps < 1:
        raise ValueError(f"reps must be >= 1 (got {reps})")
    timings: dict[str, list[float]] = {name: [] for name in arms}
    last: dict[str, Any] = {}
    cycles = ([-1] if warmup else []) + list(range(reps))
    for rep in cycles:
        ctx = setup(rep) if setup is not None else None
        for name, fn in arms.items():
            t0 = time.perf_counter()
            out = fn(ctx)
            wall = time.perf_counter() - t0
            if rep < 0:
                if log:
                    log(f"warmup {name} wall={wall:.1f}s")
                continue
            timings[name].append(wall)
            last[name] = out
            if log:
                log(f"{name} rep={rep} wall={wall:.1f}s")
    return timings, last


def summarize(timings: dict[str, list[float]]) -> str:
    """One aligned line per arm: min/median/max + the raw walls (the
    format every A/B in SCALING.md reports)."""
    import statistics

    lines = []
    for name, walls in timings.items():
        lines.append(
            f"  {name:<16} min={min(walls):7.2f}s "
            f"median={statistics.median(walls):7.2f}s "
            f"max={max(walls):7.2f}s walls={[round(w, 2) for w in walls]}"
        )
    return "\n".join(lines)
