"""Streaming CEP: the reference's parcels problem with real event-time
timers.

Reference (``test/examples/parcels_test.exs:144-201``): a ``decide``
transformer keeps ``{to_ship, created_at}`` per order in an Agent and
emits ``ALL_PARCELS_SHIPPED`` when every parcel arrived, or
``THRESHOLD_EXCEEDED`` when a parcel arrives past the deadline — plus a
tick stream so orders whose parcels never arrive still decide
(``test/examples/window_test.exs``-style processing-time ticks).

Spark-first translation: one keyed stateful operator over the *mixed*
order+parcel stream (``applyInPandasWithState``), with the tick stream
replaced by **event-time timers**: an order schedules a timeout at
``created_at + timeout``; when the watermark passes it the state times
out and the decision fires.  Late/out-of-order parcels are handled by
event time natively — parcels arriving before their order simply
accumulate in state (the reference needs an explicit ``force_order``
stage for this, ``parcels_test.exs:106-142``).

At scale: state is per-order (bounded by open orders), partitioned
across executors by the order key; decided orders keep a small
tombstone (so late/duplicate events can't re-open them or leak fresh
state) that a GC timer removes one timeout past the deadline — memory
tracks the working set plus one timeout window, not history.
"""

from __future__ import annotations

import pickle
from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..component import Component
from ..flow import Flow

_STATE_SCHEMA = "state binary"
_OUT_SCHEMA = "order_id bigint, decision string"

ALL_SHIPPED = "ALL_PARCELS_SHIPPED"
THRESHOLD = "THRESHOLD_EXCEEDED"


class StreamingMatchDecide(Component):
    """Keyed order/parcel matching with an event-time deadline.

    Input stream rows (a mixed order+parcel stream, watermarked on
    ``ts_col``):

      - order rows: ``type_col == order_type``, carrying
        ``expected_col`` (how many parcels must arrive) and the order
        timestamp (deadline = ts + timeout_s);
      - parcel rows: ``type_col == parcel_type``.

    Decision per order key:

      - ``ALL_PARCELS_SHIPPED``: the expected number of parcels arrived
        and none after the deadline;
      - ``THRESHOLD_EXCEEDED``: a parcel arrived past the deadline, or
        the event-time watermark passed the deadline with parcels still
        missing (state timeout — no tick stream needed).
    """

    def __init__(
        self,
        input: str,
        output: str,
        *,
        key: str,
        type_col: str = "type",
        order_type: str = "ORDER_CREATED",
        parcel_type: str = "PARCEL_SHIPPED",
        expected_col: str = "expected",
        ts_col: str = "ts",
        timeout_s: float,
        label: str | None = None,
    ):
        self.input = input
        self.output = output
        self.key = key
        self.type_col = type_col
        self.order_type = order_type
        self.parcel_type = parcel_type
        self.expected_col = expected_col
        self.ts_col = ts_col
        self.timeout_s = timeout_s
        self.label = label

    def transform_df(self, df: DataFrame) -> DataFrame:
        type_col, order_type, parcel_type = self.type_col, self.order_type, self.parcel_type
        expected_col, ts_col, timeout_s = self.expected_col, self.ts_col, self.timeout_s

        def kernel(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
            order_id = key[0]
            # State invariant (multi-batch safe): the decision replayed
            # in GLOBAL event-time order is ALL_SHIPPED iff the count of
            # ON-TIME parcels (ts <= deadline) reaches `expected` —
            # ts-sorted, every on-time parcel precedes every late one,
            # so the first break of the reference's scan is equivalent —
            # and THRESHOLD otherwise, fired by the deadline timer once
            # the watermark guarantees no on-time parcel can still
            # arrive.  Parcels that land in a micro-batch BEFORE their
            # ORDER_CREATED event cannot be classified yet (deadline
            # unknown): their timestamps buffer in `pending` (bounded by
            # that order's own parcel count) and are re-checked against
            # the deadline when the order event sets it — a pre-order
            # batch split can no longer launder a late parcel into an
            # on-time count.
            acc = pickle.loads(state.get[0]) if state.exists else {
                "expected": None, "deadline": None, "on_time": 0,
                "pending": [], "decided": False,
            }

            if state.hasTimedOut:
                # timer fired: GC the state (tombstones silently; open
                # orders decide THRESHOLD — parcels still missing at
                # the deadline watermark)
                state.remove()
                if not acc["decided"]:
                    yield pd.DataFrame([{"order_id": order_id, "decision": THRESHOLD}])
                return

            def set_timer(ts_ms: int):
                # event-time timers must sit above the watermark;
                # clamping keeps a passed deadline firing on the next
                # watermark advance instead of erroring
                state.setTimeoutTimestamp(max(ts_ms, state.getCurrentWatermarkMs() + 1))

            gc_ms = int((acc["deadline"] or 0) * 1000 + timeout_s * 1000)

            if acc["decided"]:
                # tombstone: a late/duplicate event for an
                # already-decided order must neither re-open it nor
                # emit a second decision; swallow it and refresh the
                # GC timer (event-time timers reset on every call)
                state.update((pickle.dumps(acc),))
                set_timer(gc_ms)
                return

            events = []
            for pdf in pdfs:
                events.extend(pdf.to_dict("records"))
            events.sort(key=lambda e: e[ts_col])

            decision = None
            for e in events:
                if e[type_col] == order_type:
                    acc["expected"] = int(e[expected_col])
                    acc["deadline"] = e[ts_col].timestamp() + timeout_s
                    # classify parcels buffered from earlier batches:
                    # only ts <= deadline count toward the decision
                    acc["on_time"] += sum(
                        1 for p in acc["pending"] if p <= acc["deadline"]
                    )
                    acc["pending"] = []
                elif e[type_col] == parcel_type:
                    pts = e[ts_col].timestamp()
                    if acc["deadline"] is None:
                        acc["pending"].append(pts)  # order not seen yet
                    elif pts <= acc["deadline"]:
                        acc["on_time"] += 1
                    # late parcel: never counts; THRESHOLD comes from
                    # the deadline timer (deciding here would race an
                    # on-time parcel still in flight in a later batch)
                else:
                    continue
                if (
                    acc["expected"] is not None
                    and acc["on_time"] >= acc["expected"]
                ):
                    decision = ALL_SHIPPED
                    break

            if decision is not None:
                # persist a TOMBSTONE (decided=True) instead of
                # removing state: removal would let a late parcel
                # re-create fresh state with expected=None that never
                # times out (unbounded state growth) and a duplicate
                # ORDER event re-open the order.  The tombstone is
                # garbage-collected by its own timer one timeout past
                # the deadline.
                acc["decided"] = True
                state.update((pickle.dumps(acc),))
                set_timer(int((acc["deadline"] or 0) * 1000 + timeout_s * 1000))
                yield pd.DataFrame([{"order_id": order_id, "decision": decision}])
            else:
                state.update((pickle.dumps(acc),))
                if acc["deadline"] is not None:
                    set_timer(int(acc["deadline"] * 1000))

        return df.groupBy(self.key).applyInPandasWithState(
            kernel,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )

    def transform(self, flow: Flow) -> Flow:
        return flow.without(self.input).with_stream(self.output, self.transform_df(flow[self.input]))

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
