"""Loop-body plan capture for iterative operators.

``localCheckpoint`` truncates lineage, so the post-loop plan of an
iterative operator (PageRank, ConnectedComponents, LloydKMeans,
Iterate) audits as "0 shuffles / 0 scans" — the real per-round cost
is invisible to plan tooling (tools/plan_report.py) and, worse, to
the CI CartesianProduct/BNLJ sweep (tests/test_topology_dsl.py): a
scale-killing join could hide inside a loop body unseen.

The fix is an instrumentation hook on the REAL code path (not a
parallel re-implementation that could drift): each iterative operator
calls :func:`probe_loop_plan` on every loop-body DataFrame *before*
lineage truncation / driver collection.  Inactive — the default — the
hook is a single ``None`` check, zero cost in production.  Under
:func:`capture_loop_plans` the DataFrames are recorded so tooling can
audit ``iterative: k × (m shuffles)`` and CI can assert on a genuine
loop-body plan.

The captured DataFrame's lineage reaches back only to the previous
round's checkpoint, so its plan is exactly ONE round — the unit that
repeats k times at scale and therefore the unit to audit.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import TYPE_CHECKING, Iterator

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

#: active capture list, or None when probing is off (the normal case)
_active: "list[tuple[str, DataFrame]] | None" = None

#: active bounded-broadcast capture list, or None when off
_active_bcast: "list[tuple[str, int, int]] | None" = None


def probe_bounded_broadcast(stage: str, n_rows: int, bound: int) -> None:
    """Record a guard-bounded broadcast decision (``stage``, observed
    ``n_rows``, configured ``bound``) when a
    :func:`capture_bounded_broadcasts` context is active; no-op
    otherwise.  Guard-bounded operators (CosineTopK) call this right
    after counting the side they are about to force-broadcast — the
    count that the BNLJ adjudication in CI rests on.  The executed
    plan cannot carry this evidence (the side is localCheckpointed, so
    its bounding Filter is invisible); the probe asserts the OBSERVED
    row count instead, which is strictly stronger."""
    if _active_bcast is not None:
        _active_bcast.append((stage, n_rows, bound))


@contextmanager
def capture_bounded_broadcasts() -> Iterator["list[tuple[str, int, int]]"]:
    """Context manager: collect every :func:`probe_bounded_broadcast`
    call made while active into the yielded
    ``[(stage, n_rows, bound), ...]`` list.  Nestable; not
    thread-safe — intended for plan tooling and tests."""
    global _active_bcast
    prev = _active_bcast
    _active_bcast = captured = []
    try:
        yield captured
    finally:
        _active_bcast = prev


def probe_loop_plan(stage: str, df: "DataFrame") -> None:
    """Record ``df`` under ``stage`` (e.g. ``"PageRank/round"``) when a
    :func:`capture_loop_plans` context is active; no-op otherwise.
    Iterative operators call this on each pre-truncation loop-body
    DataFrame (and on one-time setup DataFrames that are likewise
    checkpointed out of the visible plan)."""
    if _active is not None:
        _active.append((stage, df))


@contextmanager
def capture_loop_plans() -> Iterator["list[tuple[str, DataFrame]]"]:
    """Context manager: collect every :func:`probe_loop_plan` call made
    while active into the yielded ``[(stage, DataFrame), ...]`` list.
    Nestable (the outer capture resumes on exit); not thread-safe —
    intended for single-threaded plan tooling and tests."""
    global _active
    prev = _active
    _active = captured = []
    try:
        yield captured
    finally:
        _active = prev
