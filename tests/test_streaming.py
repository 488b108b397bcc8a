"""Structured Streaming parity: the same components over unbounded
input, drained deterministically with availableNow triggers."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from strom_spark import Filter, Flow, Mixer, Pipeline, Source, ReadStream, Transformer, TimeWindow
from strom_spark.streaming.control import run_available
from strom_spark.streaming.stateful import StreamingStatefulTransformer, count_window_kernel


@pytest.fixture()
def stream_dir(spark, sf_dir):
    """Stage the events table as a parquet dir a stream can read."""
    from strom_spark import load_table

    d = tempfile.mkdtemp(prefix="strom_stream_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def test_streaming_filter_transform_mix(spark, stream_dir):
    """simple-numbers shape on a stream: split/transform/mix then drain."""
    events = _read_stream(spark, stream_dir)
    flow = Pipeline(
        [
            Filter("events", F.col("event_type") == "click"),
            Transformer("events", value2=F.col("value") * 2),
        ]
    )(Flow({"events": events}))
    df = flow["events"]
    assert df.isStreaming
    q = run_available(df, query_name="t_stream_basic")
    got = spark.sql("SELECT count(*) AS n, round(sum(value2), 2) AS s FROM t_stream_basic").collect()[0]
    batch = spark.read.parquet(stream_dir).filter("event_type = 'click'")
    expected = batch.agg(
        F.count("*").alias("n"), F.round(F.sum(F.col("value") * 2), 2).alias("s")
    ).collect()[0]
    assert (got.n, got.s) == (expected.n, expected.s)


def test_streaming_time_window_watermark(spark, stream_dir):
    events = _read_stream(spark, stream_dir)
    flow = TimeWindow(
        "events",
        "agg",
        ts="ts",
        size="1 day",
        partition_by=["event_type"],
        aggs={"n": F.count("*")},
        watermark=("ts", "1 hour"),
    )(Flow({"events": events}))
    q = run_available(flow["agg"], query_name="t_stream_window")
    total = spark.sql("SELECT sum(n) AS t FROM t_stream_window").collect()[0].t
    # append mode emits only watermark-closed windows; all but the last
    # day close once the stream drains
    n_events = spark.read.parquet(stream_dir).count()
    assert total is not None and 0 < total <= n_events


def test_streaming_session_window_matches_batch(spark, stream_dir):
    """SessionWindow over a watermarked stream — merging keyed session
    state, the one stateful shape plain windowed aggs can't express —
    drained availableNow must equal the batch lowering EXACTLY.

    Append mode only emits sessions the watermark has passed, so a
    far-future SENTINEL event (its own user) pushes the final
    watermark beyond every real session_end; the sentinel's own
    session is then the only row legitimately withheld or emitted
    late, and both sides exclude its user before comparing."""
    import datetime

    from strom_spark import SessionWindow

    base = spark.read.parquet(stream_dir)
    max_ts = base.agg(F.max("ts")).collect()[0][0]
    sentinel_uid = -999
    sentinel = base.limit(1).select(
        F.lit(10**9).cast("bigint").alias("event_id"),
        F.lit(max_ts + datetime.timedelta(days=30)).alias("ts"),
        F.lit(sentinel_uid).cast("bigint").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    d = tempfile.mkdtemp(prefix="strom_sess_stream_")
    try:
        base.select(sentinel.columns).write.mode("overwrite").parquet(d)
        sentinel.write.mode("append").parquet(d)

        def sessions(df):
            flow = SessionWindow(
                "events",
                "sess",
                ts="ts",
                gap="30 minutes",
                partition_by=["user_id"],
                aggs={"n_events": F.count("*")},
                watermark=("ts", "1 minute"),
            )(Flow({"events": df}))
            return flow["sess"].select(
                "user_id", "session_start", "session_end", "n_events"
            )

        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = sessions(stream)
        assert out.isStreaming
        run_available(out, query_name="t_stream_sessions")
        got = sorted(
            tuple(r)
            for r in spark.sql(
                f"SELECT * FROM t_stream_sessions WHERE user_id != {sentinel_uid}"
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in sessions(spark.read.parquet(d))
            .filter(F.col("user_id") != sentinel_uid)
            .collect()
        )
        assert got == want and len(want) > 100
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_unbounded_rate_source_with_stop_policy(spark):
    """An infinite synthetic stream (reference: infinite Stream.cycle in
    a flow, gen_mix_test.exs:172) through components, halted by a stop
    policy (the no_wait analog): rows must have flowed."""
    from strom_spark import ReadStream, Source
    from strom_spark.streaming.control import stop_when

    flow = Pipeline(
        [
            Source("ticks", ReadStream("rate", rowsPerSecond=100), spark=spark),
            Transformer("ticks", doubled=F.col("value") * 2),
            Filter("ticks", F.col("value") % 2 == 0),
        ]
    )(Flow({}))
    df = flow["ticks"]
    assert df.isStreaming
    q = df.writeStream.format("memory").queryName("t_rate").outputMode("append").start()
    stop_when(
        q,
        lambda q: (q.lastProgress or {}).get("numInputRows", 0) > 0,
        timeout_s=60,
    )
    rows = spark.sql("SELECT value, doubled FROM t_rate").collect()
    assert all(r.doubled == 2 * r.value and r.value % 2 == 0 for r in rows)


def test_streaming_sink_write_sync_drains(spark, stream_dir):
    """Sink(Write, sync=True) on a stream: drains available input to
    parquet (checkpoint defaulted) and blocks until done — the
    reference's sync sink semantics (lib/sink.ex:77-81)."""
    import tempfile

    from strom_spark import Sink, Write

    out_dir = tempfile.mkdtemp(prefix="strom_sink_out_")
    try:
        events = _read_stream(spark, stream_dir)
        flow = Pipeline(
            [
                Filter("events", F.col("event_type") == "click"),
                Sink("events", Write("parquet", out_dir), sync=True),
            ]
        )(Flow({"events": events}))
        assert "events" not in flow  # sink removes the stream
        got = spark.read.parquet(out_dir).count()
        expected = spark.read.parquet(stream_dir).filter("event_type = 'click'").count()
        assert got == expected
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_streaming_stateful_count_window(spark):
    """The reference count-window example on a stream: per-key buffers
    persist across micro-batches via applyInPandasWithState."""
    import pandas as pd

    d = tempfile.mkdtemp(prefix="strom_sscw_")
    try:
        # two files -> two micro-batches; windows must span the boundary
        pd.DataFrame({"k": ["a"] * 7, "value": list(range(1, 8))}).to_parquet(f"{d}/p1.parquet")
        pd.DataFrame({"k": ["a"] * 5, "value": list(range(8, 13))}).to_parquet(f"{d}/p2.parquet")
        schema = "k string, value bigint"
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
        flow = StreamingStatefulTransformer(
            "s",
            count_window_kernel(5),
            schema="window_index bigint, n bigint, sum_value double, avg_value double",
            key_by=["k"],
            order_by=["value"],
        )(Flow({"s": stream}))
        q = run_available(flow["s"], query_name="t_sscw", output_mode="append")
        rows = sorted(
            spark.sql("SELECT * FROM t_sscw").collect(), key=lambda r: r.window_index
        )
        # 12 values -> two full windows of 5 (remainder 2 buffered in state)
        assert [(r.window_index, r.n, r.avg_value) for r in rows] == [
            (0, 5, 3.0),
            (1, 5, 8.0),
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_no_wait_halts_mix_when_finite_input_ends(spark):
    """Port of the reference's no_wait mixer test
    (test/mixer_test.exs:126-147: finite [1..5] mixed with an infinite
    cycle; the mixed stream halts when the finite input ends).  Here:
    a finite file stream mixed with an infinite rate source; the
    no_wait policy detects the finite input's end from per-source
    progress and stops the whole query."""
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F

    from strom_spark import Flow, Mixer
    from strom_spark.streaming.control import halt_when_input_ends

    d = tempfile.mkdtemp(prefix="strom_nowait_")
    try:
        pd.DataFrame({"value": [1, 2, 3, 4, 5]}).astype("int64").to_parquet(
            f"{d}/finite.parquet"
        )
        finite = spark.readStream.schema("value long").parquet(d)
        infinite = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 50)
            .load()
            .select(
                F.element_at(
                    F.array(F.lit(9), F.lit(8), F.lit(7)),
                    (F.col("value") % 3 + 1).cast("int"),
                ).cast("long").alias("value")
            )
        )
        flow = Mixer(["finite", "infinite"], "mixed")(
            Flow({"finite": finite, "infinite": infinite})
        )
        q = (
            flow["mixed"]
            .writeStream.format("memory")
            .queryName("t_nowait")
            .outputMode("append")
            .start()
        )
        ended = halt_when_input_ends(q, d, timeout_s=90.0)
        assert ended, "no_wait policy timed out instead of detecting input end"
        assert not q.isActive
        got = [r.value for r in spark.sql("SELECT * FROM t_nowait").collect()]
        for v in (1, 2, 3, 4, 5):  # every finite element was mixed through
            assert v in got
        assert set(got) <= {1, 2, 3, 4, 5, 9, 8, 7}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_curation_narrow_stages_match_batch(spark, sf_dir):
    """The narrow curation stages — quality/langid scoring, the
    language+quality gate, deterministic mixture sampling, PII
    redaction with audit counts — are all pure Column expressions, so
    the SAME component pipeline runs unmodified over a stream and must
    drain (availableNow) to EXACTLY the batch result, row for row.
    (The stateful stages have their own streaming lowerings:
    StreamingExactDedup for dedup, watermarked windows for aggs.)"""
    import shutil
    import tempfile

    from strom_spark import MixtureSample, load_table
    from strom_spark.functions import text as TXT

    d = tempfile.mkdtemp(prefix="strom_cur_stream_")
    try:
        load_table(spark, sf_dir, "documents").write.mode("overwrite").parquet(d)

        def curate(df):
            counts = TXT.pii_counts("text")
            flow = Pipeline(
                [
                    Transformer(
                        "docs",
                        select={
                            "doc_id": "doc_id",
                            "source": "source",
                            "text": "text",
                            "lang": TXT.lang_id("text"),
                            "q": TXT.quality_features("text")["quality_score"],
                        },
                    ),
                    Filter("docs", (F.col("lang") == "en") & (F.col("q") >= 0.3)),
                    MixtureSample(
                        "docs",
                        key_col="doc_id",
                        group_col="source",
                        rates={"src0": 1.0, "src1": 0.5},
                        default=0.4,
                    ),
                    Transformer(
                        "docs",
                        select={
                            "doc_id": "doc_id",
                            "source": "source",
                            "clean": TXT.redact_pii("text"),
                            "n_pii": counts["n_email"] + counts["n_ipv4"] + counts["n_phone"],
                        },
                    ),
                ]
            )(Flow({"docs": df}))
            return flow["docs"]

        out = curate(_read_stream(spark, d))
        assert out.isStreaming
        run_available(out, query_name="t_stream_curation")
        got = sorted(
            (r.doc_id, r.source, r.clean, r.n_pii)
            for r in spark.sql("SELECT * FROM t_stream_curation").collect()
        )
        want = sorted(
            (r.doc_id, r.source, r.clean, r.n_pii)
            for r in curate(spark.read.parquet(d)).collect()
        )
        assert got == want and len(want) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_fineweb_and_entropy_contracts(spark, sf_dir):
    """fineweb_rules is pure Column expressions (including the
    sorted-neighbor duplicated-line scan — array ops, zero shuffle),
    so the SAME Transformer runs over a stream and drains availableNow
    to EXACTLY the batch flags, row for row."""
    import shutil
    import tempfile

    from strom_spark import load_table
    from strom_spark.functions import text as TXT

    d = tempfile.mkdtemp(prefix="strom_fw_stream_")
    try:
        load_table(spark, sf_dir, "documents").write.mode("overwrite").parquet(d)

        def flags(df):
            fw = TXT.fineweb_rules("text")
            return Transformer(
                "docs",
                select={"doc_id": "doc_id", **{k: fw[k] for k in
                        ("n_rules_passed", "fineweb_keep", "dup_line_char_frac")}},
            )(Flow({"docs": df}))["docs"]

        out = flags(_read_stream(spark, d))
        assert out.isStreaming
        run_available(out, query_name="t_stream_fw")
        got = sorted(
            (r.doc_id, r.n_rules_passed, r.fineweb_keep, r.dup_line_char_frac)
            for r in spark.sql("SELECT * FROM t_stream_fw").collect()
        )
        want = sorted(
            (r.doc_id, r.n_rules_passed, r.fineweb_keep, r.dup_line_char_frac)
            for r in flags(spark.read.parquet(d)).collect()
        )
        assert got == want and len(want) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_cms_matches_batch(spark, stream_dir):
    """CountMinSketch is ONE keyed aggregation, so the SAME component
    runs unmodified over a stream (complete mode — the grid is the
    bounded depth×width state Structured Streaming keeps anyway) and
    must drain availableNow to EXACTLY the batch counter grid.  This
    is the sketch's whole point at 100 TB: the streaming rollup
    carries 2048 counters of state, never a per-key map."""
    from strom_spark import CountMinSketch

    def sketch(df):
        return CountMinSketch("s", "o", key_col="user_id", depth=4, width=64)(
            Flow({"s": df})
        )["o"]

    out = sketch(_read_stream(spark, stream_dir))
    assert out.isStreaming
    run_available(out, query_name="t_stream_cms", output_mode="complete")
    got = sorted(
        (r.seed, r.bucket, r.cnt)
        for r in spark.sql("SELECT * FROM t_stream_cms").collect()
    )
    want = sorted(
        (r.seed, r.bucket, r.cnt)
        for r in sketch(spark.read.parquet(stream_dir)).collect()
    )
    assert got == want and len(want) > 0


def test_streaming_mixture_sample_matches_batch(spark, sf_dir):
    """MixtureSample membership is a pure function of (key, salt) and
    the plan is a narrow CASE-threshold filter, so the SAME component
    on a stream must drain to EXACTLY the batch kept-set; the
    counting ops (TemperatureMix, LineDedup, PhraseBlocklist) are
    batch-only by contract and must raise their typed error."""
    from strom_spark import (
        Flow,
        LineDedup,
        MixtureSample,
        PhraseBlocklist,
        TemperatureMix,
        load_table,
    )

    d = tempfile.mkdtemp(prefix="strom_mix_stream_")
    try:
        load_table(spark, sf_dir, "documents").write.mode("overwrite").parquet(d)

        def mix(df):
            return MixtureSample(
                "docs",
                key_col="doc_id",
                group_col="source",
                rates={"src0": 1.0, "src1": 0.5},
                default=0.25,
            )(Flow({"docs": df}))["docs"]

        out = mix(_read_stream(spark, d).select("doc_id", "source"))
        assert out.isStreaming
        run_available(out, query_name="t_mix_stream")
        got = sorted(
            r.doc_id for r in spark.sql("SELECT doc_id FROM t_mix_stream").collect()
        )
        want = sorted(
            r.doc_id
            for r in mix(spark.read.parquet(d).select("doc_id", "source")).collect()
        )
        assert got == want and len(want) > 0

        stream = _read_stream(spark, d)
        with pytest.raises(TypeError, match="TemperatureMix is batch-only"):
            TemperatureMix(
                "docs", key_col="doc_id", group_col="source"
            )(Flow({"docs": stream}))
        with pytest.raises(TypeError, match="LineDedup is batch-only"):
            LineDedup("docs")(Flow({"docs": stream}))
        deny = spark.createDataFrame([("x y",)], "phrase string")
        # small driver-known blocklists compile to pure predicates and
        # are STREAM-legal; the join form (max_inline=0) now lowers to
        # broadcast membership on streams (round 7) — but must refuse
        # loudly when the phrase set exceeds its broadcast bound
        flagged = PhraseBlocklist("docs", "p", "o")(
            Flow({"docs": stream, "p": deny})
        )["o"]
        assert flagged.isStreaming
        two = spark.createDataFrame([("x y",), ("q r",)], "phrase string")
        with pytest.raises(ValueError, match="max_broadcast_phrases"):
            PhraseBlocklist(
                "docs", "p", "o", max_inline=0, max_broadcast_phrases=1
            )(Flow({"docs": _read_stream(spark, d), "p": two}))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_phrase_blocklist_join_form_matches_batch(spark, sf_dir):
    """The JOIN-form PhraseBlocklist (max_inline=0 — the beyond-inline
    phrase-table path) on a stream: once the normalized phrase set is
    broadcast, the match count is row-local, so the streaming lowering
    (pandas-UDF shingle membership, zero shuffle, zero state) must
    drain availableNow to EXACTLY the batch shingle-join lowering —
    flag counts AND drop kept-set, across phrase lengths 1 and 2,
    including docs with zero matches (count 0, kept)."""
    import shutil
    import tempfile

    from strom_spark import Flow, PhraseBlocklist, load_table

    d = tempfile.mkdtemp(prefix="strom_blocklist_stream_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        docs.write.mode("overwrite").parquet(d)
        # phrases harvested from real docs (guaranteed hits): the first
        # two tokens of every 20th doc (length-2) + one length-1 word +
        # one phrase that matches nothing
        harvested = (
            docs.filter(F.col("doc_id") % 20 == 0)
            .select(
                F.concat_ws(
                    " ", F.slice(F.split(F.lower("text"), r"\s+"), 1, 2)
                ).alias("phrase")
            )
        )
        deny = harvested.union(
            spark.createDataFrame(
                [("the",), ("zz qq vv never occurs",)], "phrase string"
            )
        )

        def block(df, mode):
            return PhraseBlocklist(
                "docs", "p", "o", mode=mode, max_inline=0
            )(Flow({"docs": df, "p": deny}))["o"]

        out = block(_read_stream(spark, d), "flag")
        assert out.isStreaming
        run_available(out, query_name="t_stream_blocklist")
        got = sorted(
            (r.doc_id, r.n_blocklisted, r.blocked)
            for r in spark.sql(
                "SELECT doc_id, n_blocklisted, blocked FROM t_stream_blocklist"
            ).collect()
        )
        want = sorted(
            (r.doc_id, r.n_blocklisted, r.blocked)
            for r in block(spark.read.parquet(d), "flag").collect()
        )
        assert got == want and len(want) > 0
        assert any(b for (_, _, b) in want)  # harvested phrases hit
        assert any(not b for (_, _, b) in want)
        assert any(n > 1 for (_, n, _) in want)  # multi-phrase docs

        out_drop = block(_read_stream(spark, d), "drop")
        assert out_drop.isStreaming
        run_available(out_drop, query_name="t_stream_blocklist_drop")
        got_kept = sorted(
            r.doc_id
            for r in spark.sql(
                "SELECT doc_id FROM t_stream_blocklist_drop"
            ).collect()
        )
        want_kept = sorted(
            r.doc_id for r in block(spark.read.parquet(d), "drop").collect()
        )
        assert got_kept == want_kept and 0 < len(got_kept) < docs.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_decontaminate_matches_batch(spark, sf_dir):
    """Streaming Decontaminate: the contamination decision is row-local
    once eval-shingle membership is broadcast, so the streaming
    lowering (narrow pandas-UDF membership count, zero shuffle, zero
    state) must drain availableNow to EXACTLY the batch join
    lowering's result — flag columns AND drop kept-set — including
    the batch quirk that sub-threshold counts surface as 0."""
    import shutil
    import tempfile

    from strom_spark import Decontaminate, Flow, load_table

    d = tempfile.mkdtemp(prefix="strom_decon_stream_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        docs.write.mode("overwrite").parquet(d)
        # eval corpus: 20 real docs (guaranteed overlap) + one novel
        ev = (
            docs.filter(F.col("doc_id") % 25 == 0)
            .select("text")
            .union(spark.createDataFrame([("zz qq vv ww xx yy",)], "text string"))
        )

        def decon(df, mode):
            return Decontaminate(
                "train", "eval", "o", k=3, min_overlap=3, mode=mode
            )(Flow({"train": df, "eval": ev}))["o"]

        out = decon(_read_stream(spark, d), "flag")
        assert out.isStreaming
        run_available(out, query_name="t_stream_decon")
        got = sorted(
            (r.doc_id, r.n_contaminated, r.contaminated)
            for r in spark.sql(
                "SELECT doc_id, n_contaminated, contaminated FROM t_stream_decon"
            ).collect()
        )
        want = sorted(
            (r.doc_id, r.n_contaminated, r.contaminated)
            for r in decon(spark.read.parquet(d), "flag").collect()
        )
        assert got == want and len(want) > 0
        assert any(c for (_, _, c) in want)  # the overlap docs flag
        assert any(not c for (_, _, c) in want)

        out_drop = decon(_read_stream(spark, d), "drop")
        assert out_drop.isStreaming
        run_available(out_drop, query_name="t_stream_decon_drop")
        got_kept = sorted(
            r.doc_id
            for r in spark.sql("SELECT doc_id FROM t_stream_decon_drop").collect()
        )
        want_kept = sorted(
            r.doc_id for r in decon(spark.read.parquet(d), "drop").collect()
        )
        assert got_kept == want_kept and 0 < len(want_kept) < docs.count()

        # eval side must be batch (it IS the broadcast membership set)
        with pytest.raises(TypeError, match="Decontaminate \\(eval side\\)"):
            Decontaminate("train", "eval", "o")(
                Flow({"train": _read_stream(spark, d), "eval": _read_stream(spark, d)})
            )
        # bounded driver materialization: a too-large eval vocabulary
        # refuses loudly instead of OOMing the driver
        with pytest.raises(ValueError, match="max_broadcast_shingles"):
            Decontaminate(
                "train", "eval", "o", max_broadcast_shingles=5
            )(Flow({"train": _read_stream(spark, d), "eval": ev}))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_media_features_matches_batch(spark):
    """MediaFeatures is a narrow mapInPandas (no shuffle, no state), so
    the SAME component with a REAL decoder runs unmodified over a
    stream of binary assets and must drain availableNow to EXACTLY the
    batch features — the multimodal pipeline is stream-legal end to
    end, not just batch-tested."""
    import shutil
    import tempfile

    from strom_spark import Flow, MediaFeatures, wav_decode, wav_synth

    d = tempfile.mkdtemp(prefix="strom_media_stream_")
    try:
        assets = spark.createDataFrame(
            [
                {"asset_id": i, "media_type": "audio", "content": wav_synth(i)}
                for i in range(24)
            ],
            schema="asset_id bigint, media_type string, content binary",
        )
        assets.write.mode("overwrite").parquet(d)

        def features(df):
            return MediaFeatures("a", "f", decode_fn=wav_decode, chunk=4)(
                Flow({"a": df})
            )["f"]

        out = features(_read_stream(spark, d))
        assert out.isStreaming
        run_available(out, query_name="t_stream_media")
        got = sorted(
            (r.asset_id, r.n_bytes, r.content_hash, tuple(r.feat))
            for r in spark.sql("SELECT * FROM t_stream_media").collect()
        )
        want = sorted(
            (r.asset_id, r.n_bytes, r.content_hash, tuple(r.feat))
            for r in features(spark.read.parquet(d)).collect()
        )
        assert got == want and len(want) == 24
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_stupid_backoff_matches_batch(spark, sf_dir):
    """StupidBackoffLM train/score split: counts trained on a BATCH
    corpus, a STREAM scored against the frozen broadcast counts
    (zero shuffle, zero state) must drain availableNow to EXACTLY the
    batch cross-corpus scoring of the same rows — including the OOV
    contract (out-of-vocab positions skipped but counted in n_tok,
    all-OOV docs scored NULL)."""
    import shutil
    import tempfile

    from strom_spark import Flow, StupidBackoffLM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    train = docs.filter(F.col("doc_id") % 3 != 0)
    score_rows = docs.filter(F.col("doc_id") % 3 == 0).limit(60)
    # one guaranteed all-OOV doc (tokens absent from ANY real corpus)
    extra = spark.createDataFrame(
        [(999_999, "zzqxv9 zzqxv9 wwvvk3")], "doc_id bigint, text string"
    )
    d = tempfile.mkdtemp(prefix="strom_sb_stream_")
    try:
        score_rows.unionByName(extra).coalesce(2).write.mode(
            "overwrite"
        ).parquet(d)

        def scores(df):
            return StupidBackoffLM(
                "docs", "s", id_col="doc_id", text_col="text", train="corpus"
            )(Flow({"docs": df, "corpus": train}))["s"]

        out = scores(_read_stream(spark, d))
        assert out.isStreaming
        run_available(out, query_name="t_stream_backoff")
        got = sorted(
            (r.doc_id, r.n_tok, r.sb_nll)
            for r in spark.sql("SELECT * FROM t_stream_backoff").collect()
        )
        want = sorted(
            (r.doc_id, r.n_tok, r.sb_nll)
            for r in scores(spark.read.parquet(d)).collect()
        )
        assert got == want and len(want) == 61
        oov = [r for r in got if r[0] == 999_999]
        assert oov and oov[0][2] is None and oov[0][1] == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_dsir_matches_batch(spark, sf_dir):
    """DSIRWeights raw/score split: the (raw, target) log-ratio table
    is frozen and broadcast; a STREAM of docs scored against it must
    drain availableNow to EXACTLY the batch cross-corpus weights —
    including the raw-unseen-bucket contract (those features drop
    from n_feats and the weight)."""
    import shutil
    import tempfile

    from strom_spark import Flow
    from strom_spark.operators.textrank import DSIRWeights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    raw = docs.filter(F.col("doc_id") % 3 == 1)
    target = docs.filter(F.col("doc_id") % 29 == 0)
    score_rows = docs.filter(F.col("doc_id") % 3 == 0).limit(50)
    extra = spark.createDataFrame(
        [(999_999, "zzqxv9 wwvvk3 unseen tokens only")],
        "doc_id bigint, text string",
    )
    d = tempfile.mkdtemp(prefix="strom_dsir_stream_")
    try:
        score_rows.unionByName(extra).coalesce(2).write.mode(
            "overwrite"
        ).parquet(d)

        def weights(df):
            return DSIRWeights(
                "docs", "tgt", "w", n_buckets=512, raw="rawc"
            )(Flow({"docs": df, "tgt": target, "rawc": raw}))["w"]

        out = weights(_read_stream(spark, d))
        assert out.isStreaming
        run_available(out, query_name="t_stream_dsir")
        got = sorted(
            (r.doc_id, r.n_feats, r.dsir_weight)
            for r in spark.sql("SELECT * FROM t_stream_dsir").collect()
        )
        want = sorted(
            (r.doc_id, r.n_feats, r.dsir_weight)
            for r in weights(spark.read.parquet(d)).collect()
        )
        assert got == want and len(want) == 51
        # without a raw corpus a stream must fail loudly
        with pytest.raises(TypeError, match="batch-only without a `raw`"):
            DSIRWeights("docs", "tgt", "w")(
                Flow({"docs": _read_stream(spark, d), "tgt": target})
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_transform_per_batch_scores_beyond_broadcast_bound(spark, sf_dir, tmp_path):
    """The documented escape hatch, as working code: when the train
    vocabulary exceeds max_broadcast_counts the direct streaming
    lowering refuses, and transform_per_batch runs the full BATCH
    join lowering per micro-batch instead — same rows as scoring the
    whole set in batch."""
    import shutil
    import tempfile

    from strom_spark import Flow, StupidBackoffLM
    from strom_spark.streaming.control import transform_per_batch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    train = docs.filter(F.col("doc_id") % 3 != 0)
    score_rows = docs.filter(F.col("doc_id") % 3 == 0).limit(30)
    d = tempfile.mkdtemp(prefix="strom_fb_stream_")
    out_dir = str(tmp_path / "scored")
    try:
        score_rows.coalesce(3).write.mode("overwrite").parquet(d)

        # the direct broadcast lowering refuses at this bound...
        with pytest.raises(ValueError, match="max_broadcast_counts"):
            StupidBackoffLM(
                "docs", "s", id_col="doc_id", text_col="text",
                train="corpus", max_broadcast_counts=10,
            )(Flow({"docs": _read_stream(spark, d), "corpus": train}))

        # ...and the per-batch fallback runs the batch join lowering
        def apply(batch_df):
            return StupidBackoffLM(
                "docs", "s", id_col="doc_id", text_col="text", train="corpus"
            )(Flow({"docs": batch_df, "corpus": train}))["s"]

        transform_per_batch(
            _read_stream(spark, d),
            apply,
            lambda df, bid: df.write.mode("append").parquet(out_dir),
            query_name="t_fb_score",
        )
        got = sorted(
            (r.doc_id, r.n_tok, r.sb_nll)
            for r in spark.read.parquet(out_dir).collect()
        )
        want = sorted(
            (r.doc_id, r.n_tok, r.sb_nll)
            for r in apply(spark.read.parquet(d)).collect()
        )
        assert got == want and len(want) == 30
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_image_phash_matches_batch(spark):
    """ImagePHash is a narrow mapInPandas like MediaFeatures — the same
    component must drain availableNow to EXACTLY the batch hashes
    (stream-legal fingerprinting; only the pair stage is batch-only
    and guards with a typed error)."""
    import shutil
    import tempfile

    from strom_spark import Flow, ImagePHash, bmp_synth

    d = tempfile.mkdtemp(prefix="strom_phash_stream_")
    try:
        assets = spark.createDataFrame(
            [{"asset_id": i, "content": bmp_synth(i)} for i in range(24)],
            schema="asset_id bigint, content binary",
        )
        assets.write.mode("overwrite").parquet(d)

        def hashes(df):
            return ImagePHash("a", "p", chunk=4)(Flow({"a": df}))["p"]

        out = hashes(_read_stream(spark, d))
        assert out.isStreaming
        run_available(out, query_name="t_stream_phash")
        got = sorted(
            (r.asset_id, r.phash, r.n_bits_set)
            for r in spark.sql("SELECT * FROM t_stream_phash").collect()
        )
        want = sorted(
            (r.asset_id, r.phash, r.n_bits_set)
            for r in hashes(spark.read.parquet(d)).collect()
        )
        assert got == want and len(want) == 24
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_sliding_count_window_matches_batch(spark, sf_dir):
    """SlidingCountWindow on a stream — the keyed stateful window
    assigner (rank counter + bounded buffer in GroupState) — drained
    availableNow must emit EXACTLY the batch lowering's complete-window
    (row, window_id) assignments.

    Determinism setup: count windows depend on arrival order, so the
    stream is staged as ts-ordered files drained one per micro-batch
    (maxFilesPerTrigger=1) and the kernel sorts by order_by within
    each batch — per-key arrival order then equals the batch
    lowering's (ts, event_id) total order."""
    from strom_spark import SlidingCountWindow, load_table

    base = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .filter(F.col("user_id") < 40)
    )
    d = tempfile.mkdtemp(prefix="strom_slide_stream_")
    try:
        # 6 contiguous ts-range files, each internally unsplit: batch
        # i holds strictly earlier events than batch i+1 for every key
        n = base.count()
        ordered = base.orderBy("ts", "event_id").coalesce(1)
        ranked = ordered.withColumn(
            "__f", (F.monotonically_increasing_id() * 6 / n).cast("int")
        )
        for i in range(6):
            ranked.filter(F.col("__f") == i).drop("__f").coalesce(1).write.mode(
                "append"
            ).parquet(d)

        def windows(df):
            return SlidingCountWindow(
                "ev",
                "w",
                size=7,
                step=3,
                order_by=["ts", "event_id"],
                partition_by=["user_id"],
            )(Flow({"ev": df}))["w"]

        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = windows(stream)
        assert out.isStreaming
        run_available(out, query_name="t_stream_sliding")
        got = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM t_stream_sliding").collect()
        )
        want = sorted(tuple(r) for r in windows(spark.read.parquet(d)).collect())
        assert got == want and len(want) > 500

        # streaming contract errors are loud and typed
        with pytest.raises(ValueError, match="aggs=None"):
            SlidingCountWindow(
                "ev", "w", size=7, step=3, order_by=["ts"],
                partition_by=["user_id"], aggs={"n": F.count("*")},
            )(Flow({"ev": stream}))
        with pytest.raises(ValueError, match="keep_partial"):
            SlidingCountWindow(
                "ev", "w", size=7, step=3, order_by=["ts"],
                partition_by=["user_id"], keep_partial=True,
            )(Flow({"ev": stream}))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_bloom_filter_matches_batch(spark, stream_dir):
    """BloomFilter is ONE keyed bit_or aggregation, so the SAME
    component runs unmodified over a stream (complete mode — the word
    table is the bounded n_words-long state Structured Streaming
    keeps anyway) and must drain availableNow to EXACTLY the batch
    word table.  Same mergeable-bounded-state story as the CMS grid:
    a 100 TB membership rollup carries n_words longs of state, never
    a key set."""
    from strom_spark import BloomFilter

    def bloom(df):
        return BloomFilter("s", "o", key_col="user_id", n_words=16, k=4)(
            Flow({"s": df})
        )["o"]

    out = bloom(_read_stream(spark, stream_dir))
    assert out.isStreaming
    run_available(out, query_name="t_stream_bloom", output_mode="complete")
    got = sorted(
        (r.word_idx, r.word)
        for r in spark.sql("SELECT * FROM t_stream_bloom").collect()
    )
    want = sorted(
        (r.word_idx, r.word) for r in bloom(spark.read.parquet(stream_dir)).collect()
    )
    assert got == want and len(want) > 0
