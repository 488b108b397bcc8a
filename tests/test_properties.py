"""Property-based tests (hypothesis) — the upgrade over the reference's
randomized tests (mixer_tree_test.exs:27-46 random stream counts,
splitter_tree_test.exs:51-94 random arities) plus fault-injection
parity (crash_test.exs)."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from strom_spark import (
    Flow,
    MixerTree,
    Pipeline,
    Source,
    SplitterTree,
    StatefulTransformer,
)

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    streams=st.lists(st.lists(st.integers(-1000, 1000), max_size=8), min_size=1, max_size=6),
    parts=st.integers(2, 4),
)
@SET
def test_mixer_tree_is_concat(spark, streams, parts):
    """Mixing N random streams (any tree arity) == multiset concat."""
    flow = {}
    comps = []
    for i, vals in enumerate(streams):
        comps.append(Source(f"s{i}", vals or [0], spark=spark))
    comps.append(MixerTree([f"s{i}" for i in range(len(streams))], "out", parts=parts))
    out = Pipeline(comps)()["out"]
    expected = sorted(v for vals in streams for v in (vals or [0]))
    assert sorted(r.value for r in out.collect()) == expected


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=30),
    n=st.integers(2, 5),
)
@SET
def test_splitter_tree_hash_partitions(spark, vals, n):
    """Hash fan-out is a disjoint cover for any input/arity."""
    names = [f"p{i}" for i in range(n)]
    flow = SplitterTree("s", names, mode="hash", partition_by=["value"])(
        Flow({"s": spark.createDataFrame([(v,) for v in vals], "value long")})
    )
    parts = [sorted(r.value for r in flow[p].collect()) for p in names]
    assert sorted(v for part in parts for v in part) == sorted(vals)


@given(events=st.lists(st.integers(-100, 100), min_size=1, max_size=25))
@SET
def test_stateful_transformer_equals_python_fold(spark, events):
    """The arity-2 kernel contract: engine output == a plain Python
    fold of the same kernel over the ordered events (running sum,
    emit-on-even filter)."""

    def fn(event, acc):
        acc = acc + event["value"]
        out = [{"i": event["i"], "running": acc}] if acc % 2 == 0 else []
        return out, acc

    rows = [(i, v) for i, v in enumerate(events)]
    flow = StatefulTransformer(
        "s", fn, acc=0, schema="i long, running long", order_by=["i"]
    )(Flow({"s": spark.createDataFrame(rows, "i long, value long")}))
    got = sorted((r.i, r.running) for r in flow["s"].collect())

    acc, expected = 0, []
    for i, v in enumerate(events):
        acc += v
        if acc % 2 == 0:
            expected.append((i, acc))
    assert got == sorted(expected)


def test_on_error_skip_drops_poisoned_event(spark):
    """crash_test.exs:34-45 parity: a kernel raising on value 3 (chunk
    size 1) yields the other events' outputs; acc survives."""

    def fn(event, acc):
        if event["value"] == 3:
            raise ValueError("boom")
        acc += 1
        return [{"value": event["value"] * 2, "seen": acc}], acc

    src = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5]], "value long")
    flow = StatefulTransformer(
        "s", fn, acc=0, schema="value long, seen long", order_by=["value"], on_error="skip"
    )(Flow({"s": src}))
    rows = sorted((r.value, r.seen) for r in flow["s"].collect())
    assert rows == [(2, 1), (4, 2), (8, 3), (10, 4)]

    # default semantics: the error surfaces (Spark task failure)
    flow2 = StatefulTransformer(
        "s", fn, acc=0, schema="value long, seen long", order_by=["value"]
    )(Flow({"s": src}))
    with pytest.raises(Exception):
        flow2["s"].collect()


@given(
    vals=st.lists(st.integers(-100, 100), min_size=1, max_size=40),
    size=st.integers(1, 7),
)
@SET
def test_count_window_equals_python_chunks(spark, vals, size):
    """CountWindow == chunking the ordered values in plain Python."""
    from pyspark.sql import functions as F

    from strom_spark import CountWindow, Flow

    rows = [(i, v) for i, v in enumerate(vals)]
    flow = CountWindow(
        "s", "w", size=size, order_by=["i"], aggs={"s": F.sum("value"), "n": F.count("*")}
    )(Flow({"s": spark.createDataFrame(rows, "i long, value long")}))
    got = sorted((r.window_id, r.n, r.s) for r in flow["w"].collect())
    expected = sorted(
        (w, len(chunk), sum(chunk))
        for w, chunk in enumerate(vals[i : i + size] for i in range(0, len(vals), size))
    )
    assert got == expected


@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=30))
@SET
def test_splitter_multi_match_duplicates(spark, vals):
    """Splitter predicates are independent: an event reaches every
    matching output (reference lib/splitter.ex:73-80) — union of
    branches == per-predicate filters of the input."""
    from strom_spark import Flow, Splitter

    df = spark.createDataFrame([(v,) for v in vals], "value long")
    preds = {
        "neg": "value < 0",
        "even": "value % 2 = 0",
        "all": "value IS NOT NULL",
    }
    flow = Splitter("s", preds)(Flow({"s": df}))
    for name, sql in preds.items():
        assert sorted(r.value for r in flow[name].collect()) == sorted(
            r.value for r in df.filter(sql).collect()
        )


@given(
    n_left=st.integers(1, 30),
    n_right=st.integers(0, 30),
    n_keys=st.integers(1, 4),
    tol=st.one_of(st.none(), st.integers(1, 50)),
    direction=st.sampled_from(["backward", "forward"]),
    data=st.data(),
)
@SET
def test_asof_join_matches_pandas_merge_asof(spark, n_left, n_right, n_keys, tol, direction, data):
    """Differential oracle: AsofJoin (union-marker window lowering)
    must agree with pandas merge_asof on random keyed time series,
    with and without a tolerance."""
    import pandas as pd

    from strom_spark import AsofJoin, Flow

    keys = [f"k{i}" for i in range(n_keys)]
    lrows = [
        {
            "pid": i,
            "k": data.draw(st.sampled_from(keys)),
            "t": data.draw(st.integers(0, 1000)),
        }
        for i in range(n_left)
    ]
    # right times unique per key (the operator's documented contract)
    rseen = set()
    rrows = []
    for j in range(n_right):
        k = data.draw(st.sampled_from(keys))
        t = data.draw(st.integers(0, 1000))
        if (k, t) in rseen:
            continue
        rseen.add((k, t))
        rrows.append({"k": k, "t": t, "cid": 1000 + j})
    lpdf = pd.DataFrame(lrows)
    lpdf["ts"] = pd.to_datetime(lpdf["t"], unit="s")
    rpdf = pd.DataFrame(rrows, columns=["k", "t", "cid"])
    rpdf["ts"] = pd.to_datetime(rpdf["t"], unit="s")

    expected = pd.merge_asof(
        lpdf.sort_values(["ts", "pid"]),
        rpdf.sort_values("ts"),
        on="ts",
        by="k",
        tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
        direction=direction,
    )
    exp = {
        int(r.pid): (None if pd.isna(r.cid) else int(r.cid))
        for r in expected.itertuples()
    }

    l = spark.createDataFrame(lpdf[["pid", "k", "ts"]])
    r = (
        spark.createDataFrame(rpdf[["k", "ts", "cid"]])
        if len(rpdf)
        else spark.createDataFrame([], "k string, ts timestamp, cid long")
    )
    out = AsofJoin(
        "l", "r", "o", key="k", value_cols=["cid"],
        tolerance_s=float(tol) if tol is not None else None,
        direction=direction,
    )(Flow({"l": l, "r": r}))["o"]
    got = {row.pid: row.cid for row in out.collect()}
    assert got == exp


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=40).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    w=st.integers(1, 6),
)
@SET
def test_winnow_matches_pure_python(spark, docs, w):
    """Differential oracle: the Column-expression winnowing equals a
    direct python implementation of Schleimer/Wilkerson/Aiken window
    minima over the same portable k-gram hashes."""
    import hashlib

    from strom_spark import Flow, WinnowFingerprints

    k = 3

    def py_winnow(text):
        toks = text.lower().split(" ") if text.strip() else []
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
        if not hs:
            return set()
        if len(hs) < w:
            return {min(hs)}
        return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, schema="doc_id bigint, text string")
    out = WinnowFingerprints("d", "f", k=k, window=w)(Flow({"d": df}))["f"]
    got = {}
    for r in out.collect():
        got.setdefault(r.id, set()).add(r.fp)
    for i, t in enumerate(docs):
        assert got.get(i, set()) == py_winnow(t), (i, t)


@given(
    pts=st.lists(st.integers(0, 500), min_size=1, max_size=25),
    ivs=st.lists(
        st.tuples(st.integers(0, 480), st.integers(0, 60)), min_size=1, max_size=15
    ),
    bucket=st.sampled_from([None, 1, 7, 50, 10_000]),
    end_inclusive=st.booleans(),
)
@SET
def test_range_join_matches_brute_force(spark, pts, ivs, bucket, end_inclusive):
    """RangeJoin point mode vs a python brute-force filter on random
    points/intervals: identical pair MULTISET for every bucket width —
    including the auto-sized default and degenerate tiny/huge widths —
    and for both end bounds.  Zero-width intervals match nothing
    (half-open) unless end_inclusive."""
    from strom_spark import RangeJoin

    P = [{"pid": i, "p": p} for i, p in enumerate(pts)]
    R = [{"iid": i, "s": s, "e": s + w} for i, (s, w) in enumerate(ivs)]
    want = sorted(
        (a["pid"], b["iid"])
        for a in P
        for b in R
        if b["s"] <= a["p"] and (a["p"] <= b["e"] if end_inclusive else a["p"] < b["e"])
    )
    # auto-sizing raises only when NO positive-width interval exists
    has_positive = any(w > 0 for _, w in ivs)
    flow = Flow({
        "L": spark.createDataFrame(P),
        "R": spark.createDataFrame(R),
    })
    rj = RangeJoin(
        "L", "R", "o", point="p", right_start="s", right_end="e",
        bucket=bucket, end_inclusive=end_inclusive,
    )
    if bucket is None and not has_positive:
        with pytest.raises(ValueError, match="auto-size"):
            rj(flow)
        return
    got = sorted((r.pid, r.iid) for r in rj(flow)["o"].collect())
    assert got == want


@given(
    lvs=st.lists(
        st.tuples(st.integers(0, 480), st.integers(-20, 60)), min_size=1, max_size=15
    ),
    rvs=st.lists(
        st.tuples(st.integers(0, 480), st.integers(-20, 60)), min_size=1, max_size=15
    ),
    bucket=st.sampled_from([None, 1, 7, 50, 10_000]),
)
@SET
def test_range_join_overlap_matches_brute_force(spark, lvs, rvs, bucket):
    """RangeJoin overlap mode vs a python brute force on random
    intervals (including zero-width and INVERTED ones, which must
    silently drop): identical pair MULTISET — so exactly-once canonical-
    bucket emission holds — for every bucket width including auto.
    Half-open semantics: a pair overlaps iff ls < re and rs < le with
    both intervals non-degenerate."""
    from strom_spark import RangeJoin

    L = [{"lid": i, "ls": s, "le": s + w} for i, (s, w) in enumerate(lvs)]
    R = [{"rid": i, "rs_": s, "re_": s + w} for i, (s, w) in enumerate(rvs)]
    want = sorted(
        (a["lid"], b["rid"])
        for a in L
        for b in R
        if a["ls"] < a["le"] and b["rs_"] < b["re_"]
        and a["ls"] < b["re_"] and b["rs_"] < a["le"]
    )
    has_positive = any(w > 0 for _, w in lvs) or any(w > 0 for _, w in rvs)
    flow = Flow({
        "L": spark.createDataFrame(L, "lid long, ls long, le long"),
        "R": spark.createDataFrame(R, "rid long, rs_ long, re_ long"),
    })
    rj = RangeJoin(
        "L", "R", "o", left_start="ls", left_end="le",
        right_start="rs_", right_end="re_", bucket=bucket,
    )
    if bucket is None and not has_positive:
        with pytest.raises(ValueError, match="auto-size"):
            rj(flow)
        return
    got = sorted((r.lid, r.rid) for r in rj(flow)["o"].collect())
    assert got == want


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    seed=st.integers(0, 10_000),
    dim=st.sampled_from([4, 8]),
)
@SET
def test_bmp_phash_matches_numpy_replay(w, h, seed, dim):
    """bmp_phash on RANDOM-pixel BMPs (not just the oracle's gradient
    images) must equal an independent numpy replay of the definition:
    decode pixels, scaled integer luma, (i·w)//dim nearest-neighbor
    sample, dim²·l > Σl threshold.  Exercises the bottom-up row flip
    and stride padding on arbitrary dimensions, including images
    smaller AND larger than the hash grid."""
    import struct

    import numpy as np

    from strom_spark import bmp_phash

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)  # RGB, logical top-down

    pad = b"\x00" * ((-(w * 3)) % 4)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            r, g, b = px[y, x]
            row += bytes((b, g, r))
        rows.append(bytes(row) + pad)
    raster = b"".join(rows)
    off = 54
    content = (
        struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
        + raster
    )

    luma = (
        299 * px[:, :, 0].astype(np.int64)
        + 587 * px[:, :, 1].astype(np.int64)
        + 114 * px[:, :, 2].astype(np.int64)
    )
    ii, jj = np.meshgrid(np.arange(dim), np.arange(dim))  # ii: col, jj: row
    samples = luma[(jj * h) // dim, (ii * w) // dim]
    want = "".join(
        "1" if dim * dim * v > samples.sum() else "0" for v in samples.flatten()
    )
    assert bmp_phash(content, dim=dim) == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12),
        min_size=2,
        max_size=6,
    ),
)
@SET
def test_stupid_backoff_matches_python_replay(spark, docs):
    """StupidBackoffLM over random tiny corpora == a direct python
    replay of the Brants et al. definition with the same round-6
    decimal-contribution convention."""
    import math
    from collections import Counter

    from strom_spark import StupidBackoffLM

    rows = [
        {"doc_id": i, "text": " ".join(toks)} for i, toks in enumerate(docs)
    ]
    out = (
        StupidBackoffLM("d", "o", id_col="doc_id", text_col="text")(
            Flow({"d": spark.createDataFrame(rows, "doc_id bigint, text string")})
        )["o"]
        .toPandas()
        .set_index("doc_id")
    )
    uc = Counter(t for toks in docs for t in toks)
    bc = Counter((a, b) for toks in docs for a, b in zip(toks, toks[1:]))
    N = sum(uc.values())
    for i, toks in enumerate(docs):
        # the component groups (prev, cur) per doc and rounds
        # cnt · (−ln S) AFTER the multiply (same as the SQL oracle)
        grp = Counter(
            (toks[p - 1] if p else None, t) for p, t in enumerate(toks)
        )
        total = 0.0
        for (prev, t), cnt in grp.items():
            if prev is None:
                s = uc[t] / N
            elif (prev, t) in bc:
                s = bc[(prev, t)] / uc[prev]
            else:
                s = 0.4 * uc[t] / N
            total += round(cnt * -math.log(s), 6)
        assert abs(out.loc[i, "sb_nll"] - total / len(toks)) < 1e-9
        assert out.loc[i, "n_tok"] == len(toks)


@given(
    docs=st.lists(
        st.lists(  # a doc = list of lines
            st.lists(
                st.sampled_from(
                    ["alpha", "beta", "gamma.", "delta!", "eps?", 'quo"',
                     "JavaScript", "lorem", "ipsum", "{x}", "a.b", "..."]
                ),
                min_size=0,
                max_size=9,
            ),
            min_size=0,
            max_size=5,
        ),
        min_size=1,
        max_size=5,
    ),
)
@SET
def test_c4_rules_match_python_replay(spark, docs):
    """c4_rules over random multi-line docs == a direct python replay
    of the Raffel et al. definition — the benchmark corpus is
    single-line with no terminal punctuation (every count 0 there),
    so this is where the line filter, sentence gate, and page drops
    are exercised on non-degenerate shapes, including lines that
    combine drop reasons and pages mixing kept/dropped lines."""
    import re as _re

    from strom_spark.functions.text import c4_rules

    rows = [
        {"doc_id": i, "text": "\n".join(" ".join(l) for l in lines)}
        for i, lines in enumerate(docs)
    ]
    c4 = c4_rules("text")
    out = (
        spark.createDataFrame(rows, "doc_id bigint, text string")
        .select("doc_id", *[c4[k].alias(k) for k in c4])
        .toPandas()
        .set_index("doc_id")
    )
    for i, lines in enumerate(docs):
        text = "\n".join(" ".join(l) for l in lines)
        split_lines = text.split("\n")  # Spark split on '\n'

        def keep(l: str) -> bool:
            t = l.strip()
            words = [w for w in _re.sub(r"\s+", " ", l).strip().split(" ") if w]
            return (
                t.endswith((".", "!", "?", '"'))
                and len(words) >= 5
                and "javascript" not in l.lower()
            )

        kept = [l for l in split_lines if keep(l)]
        kept_text = "\n".join(kept)
        n_sent = len(_re.findall(r"[.!?]", kept_text))
        has_lorem = "lorem ipsum" in text.lower()
        has_brace = "{" in text
        assert out.loc[i, "n_lines"] == len(split_lines)
        assert out.loc[i, "n_kept_lines"] == len(kept)
        assert out.loc[i, "n_sentences"] == n_sent
        assert out.loc[i, "kept_chars"] == len(kept_text)
        assert out.loc[i, "has_lorem_ipsum"] == int(has_lorem)
        assert out.loc[i, "has_curly_brace"] == int(has_brace)
        assert out.loc[i, "c4_keep"] == int(
            n_sent >= 3 and not has_lorem and not has_brace
        )
        assert out.loc[i, "kept_text"] == kept_text


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["home", "about us", "contact", "body text one",
                             "body text two", "", "  spaced  "]),
            min_size=0,
            max_size=10,
        ),
        min_size=1,
        max_size=5,
    ),
)
@SET
def test_collapse_repeated_lines_matches_python_replay(spark, docs):
    """collapse_repeated_lines over random multi-line docs == the
    order-preserving first-occurrence dedup (dict.fromkeys) — the
    benchmark corpus is single-line (all no-ops), so this is where
    repeated nav/footer lines, empty lines, and whitespace-distinct
    lines are exercised."""
    from strom_spark.functions.text import collapse_repeated_lines

    rows = [
        {"doc_id": i, "text": "\n".join(lines)} for i, lines in enumerate(docs)
    ]
    r = collapse_repeated_lines("text")
    out = (
        spark.createDataFrame(rows, "doc_id bigint, text string")
        .select("doc_id", *[r[k].alias(k) for k in r])
        .toPandas()
        .set_index("doc_id")
    )
    for i, lines in enumerate(docs):
        split_lines = "\n".join(lines).split("\n")  # Spark split semantics
        kept = list(dict.fromkeys(split_lines))
        cleaned = "\n".join(kept)
        assert out.loc[i, "n_lines"] == len(split_lines)
        assert out.loc[i, "n_distinct_lines"] == len(kept)
        assert out.loc[i, "cleaned_chars"] == len(cleaned)
        assert out.loc[i, "cleaned_text"] == cleaned


@given(
    lists=st.lists(
        st.lists(
            st.tuples(st.integers(0, 30), st.floats(-1, 1, allow_nan=False, width=32)),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=3,
    ),
    k0=st.sampled_from([1, 10, 60]),
    cut=st.integers(1, 8),
)
@SET
def test_rrf_fusion_matches_python_replay(spark, lists, k0, cut):
    """Differential oracle: RRFFusion equals a direct python replay of
    the same pipeline — 6dp-round scores, (score desc, id asc) rank,
    per_list_k cut, round(1/(k0+rank), 6) contributions summed as
    exact Decimal — on random (id, score) lists with duplicate ids
    across lists and ties within a list."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from strom_spark import RRFFusion

    def r6(x):
        return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    want = defaultdict(lambda: [Decimal(0), 0, None])  # score, n, best
    for lst in lists:
        # de-dup ids within one list the way a ranker would (keep max
        # score per id; ties on the rounded score break on id)
        per_id = {}
        for i, s in lst:
            sc = float(r6(s))
            if i not in per_id or sc > per_id[i]:
                per_id[i] = sc
        ranked = sorted(per_id.items(), key=lambda kv: (-kv[1], kv[0]))[:cut]
        for rank, (i, _) in enumerate(ranked, start=1):
            c = r6(1.0 / (k0 + rank))
            want[i][0] += c
            want[i][1] += 1
            want[i][2] = rank if want[i][2] is None else min(want[i][2], rank)

    flows = {}
    names = []
    for j, lst in enumerate(lists):
        per_id = {}
        for i, s in lst:
            sc = float(r6(s))
            if i not in per_id or sc > per_id[i]:
                per_id[i] = sc
        rows = [{"doc_id": i, "score": s} for i, s in per_id.items()]
        name = f"l{j}"
        flows[name] = spark.createDataFrame(rows, "doc_id bigint, score double")
        names.append(name)
    out = RRFFusion(names, "fused", id_col="doc_id", k0=k0, per_list_k=cut)(
        Flow(flows)
    )["fused"]
    got = {
        r.doc_id: (r.rrf_score, r.n_lists, r.best_rank) for r in out.collect()
    }
    assert set(got) == set(want)
    for i, (sc, n, best) in want.items():
        assert got[i] == (float(sc), n, best), (i, got[i], (float(sc), n, best))


@given(
    vals=st.lists(st.integers(0, 40), min_size=1, max_size=200),
    depth=st.integers(1, 4),
    width=st.sampled_from([8, 64, 512]),
)
@SET
def test_cms_overestimates_and_totals(spark, vals, depth, width):
    """CMS invariants on random multisets: every point estimate >= the
    true count (one-sided error, narrow widths force collisions), the
    grid mass is exactly depth * N, and the grid never exceeds
    depth * width rows."""
    from collections import Counter

    from strom_spark import CountMinSketch, Flow, cms_estimate

    truth = Counter(vals)
    df = spark.createDataFrame([{"k": v} for v in vals], "k bigint")
    grid = CountMinSketch("s", "o", key_col="k", depth=depth, width=width)(
        Flow({"s": df})
    )["o"]
    rows = grid.collect()
    assert len(rows) <= depth * width
    assert sum(r.cnt for r in rows) == depth * len(vals)
    keys = spark.createDataFrame([{"k": k} for k in truth], "k bigint")
    est = {
        r.k: r.est_count
        for r in cms_estimate(grid, keys, key_col="k", depth=depth, width=width).collect()
    }
    for k, c in truth.items():
        assert est[k] >= c, (k, est[k], c)
