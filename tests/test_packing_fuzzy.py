"""Round-5 operators: PackSequences, SliceDivergence, EditDistanceJoin.

Each is tested against an independent plain-Python reference on small
in-memory frames (the reference's per-operator unit layer, SURVEY §5),
plus a randomized brute-force property test for the fuzzy join —
the prefix filter must return EXACTLY the brute-force pair set.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from strom_spark import EditDistanceJoin, Flow, PackSequences, SliceDivergence


# ---------------------------------------------------------------- packing


def _md5_bucket(key, salt, mod):
    import hashlib

    h = int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:8], 16)
    return (h % 10_000) % mod


def test_pack_sequences_semantics(spark):
    rows = [(i, 100 + (i * 37) % 400) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")
    out = PackSequences(
        "d", "o", id_col="doc_id", tokens_col="n_tok", budget=512, n_buckets=4
    )(Flow({"d": df}))["o"]
    got = {r.doc_id: (r.pack_bucket, r.seq_id, r.tok_offset) for r in out.collect()}

    # reference: per-lane greedy concat-then-cut
    lanes = {}
    for doc_id, n in rows:
        lanes.setdefault(_md5_bucket(doc_id, "pack", 4), []).append((doc_id, n))
    expect = {}
    for lane, docs in lanes.items():
        cum = 0
        for doc_id, n in sorted(docs):
            expect[doc_id] = (lane, cum // 512, cum % 512)
            cum += n
    assert got == expect


def test_pack_sequences_partition_by_isolates_groups(spark):
    """partition_by packs WITHIN each group: a (group, lane) window
    never mixes groups — packing one group alone yields the identical
    assignment, so sequences cannot straddle a split boundary."""
    rows = [
        (i, 100 + (i * 37) % 400, "train" if i % 3 else "val")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint, split string")

    def assignments(frame, partition_by):
        out = PackSequences(
            "d", "o", id_col="doc_id", tokens_col="n_tok",
            budget=512, n_buckets=4, partition_by=partition_by,
        )(Flow({"d": frame}))["o"]
        return {r.doc_id: (r.pack_bucket, r.seq_id, r.tok_offset) for r in out.collect()}

    both = assignments(df, ["split"])
    for grp in ("train", "val"):
        alone = assignments(df.filter(F.col("split") == grp), [])
        assert {d: v for d, v in both.items() if d in alone} == alone
    # without partition_by the groups share lanes: assignments differ
    assert assignments(df, []) != both


def test_pack_sequences_doc_longer_than_budget_spans(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 3000), (3, 10)], "doc_id bigint, n_tok bigint"
    )
    out = PackSequences(
        "d", "o", id_col="doc_id", tokens_col="n_tok", budget=512, n_buckets=1
    )(Flow({"d": df}))["o"].orderBy("doc_id").collect()
    # doc 2 starts in window 0 (offset 50); doc 3 starts where doc 2's
    # 3000 tokens left off: cum 3050 -> window 5, offset 3050-5*512
    assert (out[0].seq_id, out[0].tok_offset) == (0, 0)
    assert (out[1].seq_id, out[1].tok_offset) == (0, 50)
    assert (out[2].seq_id, out[2].tok_offset) == (5, 3050 - 5 * 512)


def test_pack_sequences_streaming_rejected(spark, tmp_path):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value as doc_id", "value as n_tok")
    )
    with pytest.raises(TypeError, match="batch-only"):
        PackSequences("d", "o", id_col="doc_id", tokens_col="n_tok", budget=8)(
            Flow({"d": stream})
        )


# ---------------------------------------------------------- divergence


def test_slice_divergence_matches_reference(spark):
    data = [
        ("a", "x x y z"),
        ("a", "x y"),
        ("b", "z z z w"),
        ("b", "w z"),
    ]
    df = spark.createDataFrame(data, "src string, text string")
    out = SliceDivergence("d", "o", group_col="src", text_col="text")(
        Flow({"d": df})
    )["o"].collect()
    got = {r.src: (r.n_tok, r.kl) for r in out}

    # plain-python reference with the same per-term 6-dp rounding
    from collections import Counter

    cst = Counter()
    for src, text in data:
        for t in text.split():
            cst[(src, t)] += 1
    ct = Counter()
    for (src, t), c in cst.items():
        ct[t] += c
    ns = Counter()
    for (src, t), c in cst.items():
        ns[src] += c
    n = sum(ns.values())
    for src in ns:
        kl = sum(
            round((c / ns[src]) * math.log((c * n) / (ns[src] * ct[t])), 6)
            for (s, t), c in cst.items()
            if s == src
        )
        assert got[src][0] == ns[src]
        assert abs(got[src][1] - kl) < 1e-9
    # KL >= 0, and a slice with the corpus distribution would be 0
    assert all(v[1] >= 0 for v in got.values())


def test_slice_divergence_identical_slices_zero(spark):
    df = spark.createDataFrame(
        [("a", "p q r"), ("b", "p q r")], "src string, text string"
    )
    out = SliceDivergence("d", "o", group_col="src", text_col="text")(
        Flow({"d": df})
    )["o"].collect()
    assert all(r.kl == 0.0 for r in out)


# --------------------------------------------------------------- fuzzy


def _brute_pairs(rows, d):
    def lev(a, b):
        if abs(len(a) - len(b)) > d:
            return d + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (id1, s1), (id2, s2) = rows[i], rows[j]
            dist = lev(s1, s2)
            if dist <= d:
                a, b = sorted((id1, id2))
                out.add((a, b, dist))
    return out


@pytest.mark.parametrize("max_dist", [1, 2])
@pytest.mark.parametrize("strategy", ["deletion", "qgram"])
def test_edit_distance_join_equals_brute_force(spark, max_dist, strategy):
    rng = random.Random(42 + max_dist)
    alphabet = "abc"
    rows = []
    for i in range(120):
        n = rng.randint(1, 12)
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    df = spark.createDataFrame(rows, "id bigint, s string")
    out = EditDistanceJoin(
        "d", "o", id_col="id", str_col="s", max_dist=max_dist, q=3,
        strategy=strategy,
    )(Flow({"d": df}))["o"]
    got = {(r.id1, r.id2, r.dist) for r in out.collect()}
    assert got == _brute_pairs(rows, max_dist)


def test_edit_distance_strategy_validation():
    with pytest.raises(ValueError, match="strategy"):
        EditDistanceJoin("d", "o", id_col="i", str_col="s", strategy="nope")
    with pytest.raises(ValueError, match="deletion"):
        EditDistanceJoin(
            "d", "o", id_col="i", str_col="s", max_dist=3, strategy="deletion"
        )


def test_edit_distance_join_is_not_all_pairs(spark):
    # structured names: candidate count must stay far below n^2/2
    rows = [(i, f"item-{i:06d}") for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, s string")
    comp = EditDistanceJoin("d", "o", id_col="id", str_col="s", max_dist=1, q=3)
    out = comp(Flow({"d": df}))["o"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # every pair differs only in digits; distance-1 pairs are those
    # whose zero-padded ids differ in exactly one digit position
    got = {(r.id1, r.id2) for r in out.collect()}
    expect = set()
    for i in range(500):
        for j in range(i + 1, 500):
            a, b = f"{i:06d}", f"{j:06d}"
            if sum(x != y for x, y in zip(a, b)) == 1:
                expect.add((i, j))
    assert got == expect


# ------------------------------------------------------------- k-means


def test_lloyd_kmeans_matches_reference(spark):
    """Distributed Lloyd vs a plain-python implementation with the
    same deterministic init (first-k by id) on well-separated data."""
    from strom_spark import LloydKMeans

    rng = random.Random(7)
    centers = [[0.0, 0.0, 0.0], [10.0, 10.0, 0.0], [0.0, 10.0, 10.0]]
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [x + rng.uniform(-1, 1) for x in c]))
    df = spark.createDataFrame(rows, "vid bigint, v array<double>")
    out = LloydKMeans("e", "o", id_col="vid", vec_col="v", dim=3, k=3, iters=3)(
        Flow({"e": df})
    )["o"]
    got = {r.vid: r.cluster for r in out.collect()}

    # reference
    cents = [list(v) for _, v in sorted(rows)[:3]]

    def assign(v, cents):
        best, bd = 0, sum((a - b) ** 2 for a, b in zip(v, cents[0]))
        for j in range(1, len(cents)):
            d = sum((a - b) ** 2 for a, b in zip(v, cents[j]))
            if d < bd:
                best, bd = j, d
        return best

    for _ in range(3):
        groups = {}
        for vid, v in rows:
            groups.setdefault(assign(v, cents), []).append(v)
        for j, vs in groups.items():
            n = len(vs)
            cents[j] = [sum(col) / n for col in zip(*vs)]
    expect = {vid: assign(v, cents) for vid, v in rows}
    assert got == expect
    # the three planted blobs are recovered exactly
    assert len({tuple(sorted(vid for vid in got if got[vid] == j)) for j in range(3)}) == 3
    for vid in got:
        assert got[vid] == got[vid % 3]  # same blob -> same cluster


def test_lloyd_kmeans_empty_cluster_keeps_centroid(spark):
    from strom_spark import LloydKMeans

    # two seed points far apart; all later points near seed 0 -> cluster
    # 1 may go empty after round 1 but must not crash or renumber
    rows = [(0, [0.0, 0.0]), (1, [100.0, 100.0])] + [
        (i, [0.1 * i, 0.0]) for i in range(2, 12)
    ]
    df = spark.createDataFrame(rows, "vid bigint, v array<double>")
    out = LloydKMeans("e", "o", id_col="vid", vec_col="v", dim=2, k=2, iters=2)(
        Flow({"e": df})
    )["o"].collect()
    got = {r.vid: r.cluster for r in out}
    assert got[1] == 1 and got[0] == 0 and all(got[i] == 0 for i in range(2, 12))


def test_lloyd_kmeans_nan_vector_assigns_cluster_zero(spark):
    """A NaN input vector makes every centroid distance NaN, so
    array_position finds no min-equal element (returns 0); the
    greatest(...,0) guard must pin such rows to cluster 0 (the old
    chained-when behavior) instead of the silent -1 (r10 advice)."""
    from strom_spark import LloydKMeans

    rows = [
        (0, [0.0, 0.0]),
        (1, [100.0, 100.0]),
        (2, [float("nan"), 1.0]),
        (3, [99.0, 99.0]),
    ]
    df = spark.createDataFrame(rows, "vid bigint, v array<double>")
    out = LloydKMeans("e", "o", id_col="vid", vec_col="v", dim=2, k=2, iters=1)(
        Flow({"e": df})
    )["o"].collect()
    got = {r.vid: r.cluster for r in out}
    assert got[2] == 0
    assert got[0] == 0 and got[1] == 1 and got[3] == 1


def test_chunk_documents_sliding_window(spark):
    """ChunkDocuments: stride = size-overlap starts, truncated tail,
    offsets map back into the doc; stream-legal (stateless)."""
    from strom_spark import ChunkDocuments, Flow

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(1, 11))), (2, "a b"), (3, "x")],
        "doc_id bigint, text string",
    )
    out = ChunkDocuments("d", size=4, overlap=2)(Flow({"d": df}))["d"]
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.token_start, r.n_chunk_tokens, r.chunk_text)
         for r in out.collect())
    )
    # doc 1: 10 tokens, stride 2 -> starts 1,3,5,7,9
    doc1 = [r for r in rows if r[0] == 1]
    assert [r[2] for r in doc1] == [1, 3, 5, 7, 9]
    assert doc1[0][4] == "t1 t2 t3 t4"
    assert doc1[-1] == (1, 4, 9, 2, "t9 t10")  # truncated tail
    assert rows[-2][4] == "a b" and rows[-1][4] == "x"  # short docs: 1 chunk
    # adjacent chunks share exactly `overlap` tokens
    assert doc1[0][4].split()[-2:] == doc1[1][4].split()[:2]
    with pytest.raises(ValueError, match="overlap"):
        ChunkDocuments("d", size=4, overlap=4)
