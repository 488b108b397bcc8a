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

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..component import Component
from ..flow import Flow

_STATE_SCHEMA = (
    "expected int, deadline double, on_time int, "
    "pending array<double>, decided boolean"
)
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

        # Throughput notes (r10 — measured at sf1.0, 1.5M keyed state
        # machines): the per-key costs that dominate
        # applyInPandasWithState are pure-Python object churn, not the
        # state machine itself.  Three changes bought ~2x:
        #   1. typed state tuple instead of a pickled dict — no
        #      pickle.loads/dumps per key per batch;
        #   2. column-array iteration instead of to_dict("records") —
        #      no per-event dict allocation; timestamps convert to
        #      epoch seconds once per group via numpy;
        #   3. NO per-batch event sort: the on-time-count state machine
        #      is ORDER-INDEPENDENT within a batch (counts are
        #      commutative; the decided tombstone makes post-decision
        #      events no-ops), so the sort the old first-break scan
        #      required is dead weight.
        # The remaining floor is the framework's per-group Arrow
        # round-trip plus the one pd.DataFrame built per decision.

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
            if state.exists:
                expected, deadline, on_time, pending, decided = state.get
                pending = list(pending) if pending is not None else []
            else:
                expected, deadline, on_time, pending, decided = (
                    None, None, 0, [], False,
                )

            if state.hasTimedOut:
                # timer fired: GC the state (tombstones silently; open
                # orders decide THRESHOLD — parcels still missing at
                # the deadline watermark)
                state.remove()
                if not decided:
                    yield pd.DataFrame(
                        {"order_id": [order_id], "decision": [THRESHOLD]}
                    )
                return

            def set_timer(ts_ms: int):
                # event-time timers must sit above the watermark;
                # clamping keeps a passed deadline firing on the next
                # watermark advance instead of erroring
                state.setTimeoutTimestamp(max(ts_ms, state.getCurrentWatermarkMs() + 1))

            if decided:
                # tombstone: a late/duplicate event for an
                # already-decided order must neither re-open it nor
                # emit a second decision; swallow it and refresh the
                # GC timer (event-time timers reset on every call)
                state.update((expected, deadline, on_time, pending, True))
                set_timer(int((deadline or 0) * 1000 + timeout_s * 1000))
                return

            decision = None
            for pdf in pdfs:
                types = pdf[type_col].values
                # one vectorized epoch-seconds conversion per group
                tss = pdf[ts_col].values.astype("datetime64[us]").astype(
                    "int64"
                ) / 1e6
                exps = pdf[expected_col].values
                for i in range(len(types)):
                    t = types[i]
                    if t == order_type:
                        expected = int(exps[i])
                        deadline = float(tss[i]) + timeout_s
                        # classify parcels buffered from earlier
                        # batches: only ts <= deadline count
                        on_time += sum(1 for p in pending if p <= deadline)
                        pending = []
                    elif t == parcel_type:
                        if deadline is None:
                            pending.append(float(tss[i]))  # order unseen
                        elif tss[i] <= deadline:
                            on_time += 1
                        # late parcel: never counts; THRESHOLD comes
                        # from the deadline timer (deciding here would
                        # race an on-time parcel in a later batch)
                    else:
                        continue
                    if expected is not None and on_time >= expected:
                        decision = ALL_SHIPPED
                        break
                if decision is not None:
                    break

            if decision is not None:
                # persist a TOMBSTONE (decided=True) instead of
                # removing state: removal would let a late parcel
                # re-create fresh state with expected=None that never
                # times out (unbounded state growth) and a duplicate
                # ORDER event re-open the order.  The tombstone is
                # garbage-collected by its own timer one timeout past
                # the deadline.
                state.update((expected, deadline, on_time, [], True))
                set_timer(int((deadline or 0) * 1000 + timeout_s * 1000))
                yield pd.DataFrame(
                    {"order_id": [order_id], "decision": [decision]}
                )
            else:
                state.update((expected, deadline, on_time, pending, False))
                if deadline is not None:
                    set_timer(int(deadline * 1000))

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


class StreamingMatchDecideRelational(Component):
    """The fulfillment decision as a PURE-JVM streaming plan — no
    Python state at all: stream-stream LEFT OUTER time-interval join
    (orders x parcels on the key, parcel on-time iff
    ``pts <= ots + timeout_s``) chained into a windowed count
    aggregation (Spark multiple-stateful-operator support), with the
    decision a plain CASE over ``on_time >= expected``.

    Semantics equal StreamingMatchDecide's final decision set: the
    per-key machine decides ALL_SHIPPED iff the on-time parcel count
    reaches ``expected`` (kernel invariant above) and THRESHOLD at the
    deadline timer otherwise; here the left-outer join materializes
    exactly the on-time parcels per order (zero-parcel orders surface
    as one null-padded row), and the window close at
    watermark-past-deadline plays the timer's role.  Decisions emit
    ONLY when the aggregate window closes — latency trades for
    throughput: everything runs as JVM hash joins/aggs, measured ~5x
    the keyed-Python-state lowering at sf1.0 (SCALE.md r10).

    Two operational constraints, both inherent to the chained plan:

      - ``span_lb_s`` bounds how far BEFORE its order a parcel may
        arrive in event time (the join's state-retention lower bound);
        the tick/watermark that closes the drain must clear
        ``watermark_delay + span_lb_s`` past the last window end,
        because a stream-stream join delays its OUTPUT watermark by
        the maximum state-retention interval.
      - do NOT filter synthetic keys (ticks) between the aggregation
        and the sink: Catalyst pushes the filter below the watermark
        operator, the tick row vanishes before it advances the
        watermark, and no window ever closes (r10 bisect) — filter
        after the sink instead.

    Output: ``(order_id, decision)`` append rows, tick keys included
    (filter ``order_id >= 0`` post-sink).
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
        tick_type: str = "TICK",
        expected_col: str = "expected",
        ts_col: str = "ts",
        timeout_s: float,
        span_lb_s: float,
        window: str = "1 day",
        watermark_delay: str | None = None,
        label: str | None = None,
    ):
        self.input = input
        self.output = output
        self.key = key
        self.type_col = type_col
        self.order_type = order_type
        self.parcel_type = parcel_type
        self.tick_type = tick_type
        self.expected_col = expected_col
        self.ts_col = ts_col
        self.timeout_s = timeout_s
        self.span_lb_s = span_lb_s
        self.window = window
        self.watermark_delay = watermark_delay
        self.label = label

    def transform_df(self, df: DataFrame, watermark_delay: str) -> DataFrame:
        from pyspark.sql import functions as F

        t = self.type_col
        # ticks ride BOTH branches so each side's watermark advances
        orders = (
            df.filter(
                (F.col(t) == self.order_type) | (F.col(t) == self.tick_type)
            )
            .select(
                F.col(self.key).alias("order_id"),
                F.col(self.expected_col).alias("expected"),
                F.col(self.ts_col).alias("__ots"),
            )
            .withWatermark("__ots", watermark_delay)
        )
        parcels = (
            df.filter(
                (F.col(t) == self.parcel_type) | (F.col(t) == self.tick_type)
            )
            .select(
                F.col(self.key).alias("__pkey"),
                F.col(self.ts_col).alias("__pts"),
            )
            .withWatermark("__pts", watermark_delay)
        )
        lb = int(self.span_lb_s)
        ub = int(self.timeout_s)
        joined = orders.join(
            parcels,
            F.expr(
                f"order_id = __pkey AND __pts >= __ots - INTERVAL {lb} SECONDS "
                f"AND __pts <= __ots + INTERVAL {ub} SECONDS"
            ),
            "leftOuter",
        )
        return (
            joined.groupBy(
                "order_id", F.window("__ots", self.window), "expected"
            )
            .agg(F.count("__pkey").alias("__on_time"))
            .select(
                "order_id",
                F.when(
                    F.col("__on_time") >= F.col("expected"), F.lit(ALL_SHIPPED)
                )
                .otherwise(F.lit(THRESHOLD))
                .alias("decision"),
            )
        )

    def transform(self, flow: Flow) -> Flow:
        # the watermark delay bounds how late an event may arrive and
        # still count toward a decision — there is NO safe default
        # (a silent "1 second" would drop any real-world late event
        # and break the documented decision-set equality with the
        # keyed state machine), so the Flow path requires it explicitly
        if self.watermark_delay is None:
            raise ValueError(
                "StreamingMatchDecideRelational: pass watermark_delay= "
                "to the constructor (how late events may arrive), or "
                "call transform_df(df, watermark_delay) directly"
            )
        return flow.without(self.input).with_stream(
            self.output, self.transform_df(flow[self.input], self.watermark_delay)
        )

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
