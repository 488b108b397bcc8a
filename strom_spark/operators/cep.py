"""CEP: the parcels workload (reference ``test/examples/parcels_test.exs``
— the Zalando Flink CEP problem, ``test/examples/parcels/README.md``).

Reference pipeline: ORDER_CREATED and PARCEL_SHIPPED event streams are
mixed; user code re-orders parcels behind their order, keeps
``{orders_count, parcels}`` state per order_number in an Agent, and
emits a decision per order: ``ALL_PARCELS_SHIPPED`` when every expected
parcel arrived, or ``THRESHOLD_EXCEEDED`` when a parcel arrives more
than 7 days after order creation
(``test/examples/parcels_test.exs:106-201``).

Spark-first translations:

  - **Batch** (``MatchDecide``): a join + group-by — no state machine
    needed.  Orders ⋈ parcels on the business key, per-key aggregate of
    (parcel count, max lateness), decision via ``when``.  Fully
    distributed: one shuffle on the key, broadcastable dimension side.
  - **Streaming**: the same decision as a stateful streaming op with
    keyed state + event-time timers (``streaming/stateful.py``); the
    out-of-order problem the reference solves by hand (``force_order``)
    disappears under event-time processing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F

from ..component import Component
from ..flow import Flow


class MatchDecide(Component):
    """Batch CEP decision: for each key in ``orders`` (the expectation
    stream), look at its events in ``events`` (the occurrence stream)
    and decide.

    Emits one row per order: ``(key, decision)`` where decision is
    ``satisfied_label`` if all ``expected_col`` events arrived and none
    was later than ``deadline`` (an expression over order+event
    columns), else ``timeout_label``.
    """

    def __init__(
        self,
        orders: str,
        events: str,
        output: str,
        *,
        key: str,
        expected_col: str,
        event_ts: str,
        order_ts: str,
        timeout_days: int = 7,
        satisfied_label: str = "ALL_PARCELS_SHIPPED",
        timeout_label: str = "THRESHOLD_EXCEEDED",
        label: str | None = None,
    ):
        self.orders = orders
        self.events = events
        self.output = output
        self.key = key
        self.expected_col = expected_col
        self.event_ts = event_ts
        self.order_ts = order_ts
        self.timeout_days = timeout_days
        self.satisfied_label = satisfied_label
        self.timeout_label = timeout_label
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        orders, events = flow[self.orders], flow[self.events]
        per_key = events.groupBy(self.key).agg(
            F.count("*").alias("__arrived"),
            F.max(self.event_ts).alias("__last_ts"),
        )
        joined = orders.join(per_key, on=self.key, how="left")
        late = F.col("__last_ts") > F.col(self.order_ts) + F.expr(f"INTERVAL {self.timeout_days} DAYS")
        complete = F.coalesce(F.col("__arrived"), F.lit(0)) >= F.col(self.expected_col)
        decision = F.when(complete & ~F.coalesce(late, F.lit(False)), F.lit(self.satisfied_label)).otherwise(
            F.lit(self.timeout_label)
        )
        out = joined.select(F.col(self.key), decision.alias("decision"))
        return flow.without(self.orders, self.events).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.orders, self.events)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
