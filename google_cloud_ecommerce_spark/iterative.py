"""Lineage-guarded iteration template for unrolled iterative algorithms.

PageRank, Lloyd's k-means, BPE merge mining, and power iteration all
unroll a fixed number of rounds into one Catalyst plan. At the registry
round counts (2-4) that is exactly right: the whole computation is one
lazy plan the optimizer can see end-to-end. At production round counts
(30k BPE merges, 100+ PageRank rounds) an unrolled plan is unbounded:
analysis time grows quadratically and the lineage blows the driver.

``iterate`` is the one shared loop. It applies ``step`` ``rounds``
times and — only once the round index passes ``checkpoint_every`` —
pins the evolving state with a ``localCheckpoint(eager=False)`` every
``checkpoint_every`` rounds. Caveat, measured on Spark 4.1 under AQE:
creating a checkpointed frame materializes its upstream query stages
even with ``eager=False`` (AdaptiveSparkPlanExec resolves its final
plan when the RDD is requested) — "lazy" only skips the final
block-materialization pass. The pin therefore executes INSIDE the
registry/bench call that builds the query, so timings still measure
the whole pipeline, and later rounds replan from the pinned result
instead of the full unrolled history.

States that are not a bare DataFrame (e.g. BPE carries (vocab,
per-round bests)) pass a custom ``pin`` that checkpoints just the
growing part.

Below ``checkpoint_every`` rounds the emitted plan is IDENTICAL to the
hand-unrolled loop (no checkpoint nodes are injected), which is what
keeps the registry oracles and plan audits unchanged.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame

S = TypeVar("S")

# How many unrolled rounds a single lineage may accumulate before the
# state is pinned. 8 keeps every registry operator (<= 4 rounds)
# checkpoint-free while bounding production-scale lineage to a
# constant-size plan per segment.
CHECKPOINT_EVERY = 8


def _default_pin(state: S) -> S:
    if isinstance(state, DataFrame):
        return state.localCheckpoint(eager=False)
    raise TypeError(
        f"iterate() state is {type(state).__name__}, not a DataFrame - "
        "pass an explicit pin= for composite states"
    )


def iterate(
    state: S,
    step: Callable[[S, int], S],
    rounds: int,
    *,
    checkpoint_every: int = CHECKPOINT_EVERY,
    pin: Callable[[S], S] | None = None,
) -> S:
    """Run ``state = step(state, round_index)`` for 1..rounds.

    ``round_index`` is 1-based (BPE numbers its merge rounds). The
    state is pinned via ``pin`` (default: lazy ``localCheckpoint``)
    after every ``checkpoint_every``-th round, except after the final
    round — the caller owns the finished state's lifecycle.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    pin = pin or _default_pin
    for i in range(1, rounds + 1):
        state = step(state, i)
        if checkpoint_every and i % checkpoint_every == 0 and i < rounds:
            state = pin(state)
    return state
