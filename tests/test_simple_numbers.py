"""Golden workload 1: SimpleNumbers (reference
``test/examples/simple_numbers_test.exs:6-48``).

Two number streams -> mix -> +1 -> split odd/even; assert exact sorted
outputs.  The reference asserts sorted results because mixer order is
nondeterministic — same here.
"""

from pyspark.sql import functions as F

from strom_spark import Filter, Flow, Memory, Mixer, Pipeline, Sink, Source, Splitter, Transformer


def test_simple_numbers(spark):
    pipeline = Pipeline(
        [
            Source("numbers1", [1, 2, 3, 4, 5], spark=spark),
            Source("numbers2", [6, 7, 8, 9, 10], spark=spark),
            Mixer(["numbers1", "numbers2"], "mixed"),
            Transformer("mixed", value=F.col("value") + 1),
            Splitter(
                "mixed",
                {
                    "odd": F.col("value") % 2 == 1,
                    "even": F.col("value") % 2 == 0,
                },
            ),
        ]
    )
    flow = pipeline(Flow())
    assert set(flow.names()) == {"odd", "even"}
    odd = sorted(r.value for r in flow["odd"].collect())
    even = sorted(r.value for r in flow["even"].collect())
    assert odd == [3, 5, 7, 9, 11]
    assert even == [2, 4, 6, 8, 10]


def test_sink_and_same_name_concat(spark):
    """Two sources on one name concatenate (reference lib/source.ex:19-25);
    sink removes the stream from the flow."""
    mem = Memory()
    pipeline = Pipeline(
        [
            Source("s", [1, 2], spark=spark),
            Source("s", [3, 4], spark=spark),
            Sink("s", mem, sync=True),
        ]
    )
    flow = pipeline()
    assert flow.names() == []
    assert sorted(r.value for r in mem.rows) == [1, 2, 3, 4]


def test_splitter_multi_match_and_copy(spark):
    """An event may reach 0, 1, or all outputs (independent predicates,
    reference lib/splitter.ex:73-80); list form duplicates."""
    flow = Source("n", [1, 2, 3, 4, 5, 6], spark=spark)()
    out = Splitter(
        "n",
        {
            "big": F.col("value") > 3,
            "even": F.col("value") % 2 == 0,
            "none": F.col("value") > 100,
        },
    )(out_flow := flow)
    assert sorted(r.value for r in out["big"].collect()) == [4, 5, 6]
    assert sorted(r.value for r in out["even"].collect()) == [2, 4, 6]
    assert out["none"].count() == 0

    copies = Splitter("n", ["a", "b"])(flow)
    assert sorted(r.value for r in copies["a"].collect()) == [1, 2, 3, 4, 5, 6]
    assert sorted(r.value for r in copies["b"].collect()) == [1, 2, 3, 4, 5, 6]


def test_renamer_and_pipeline_flatten(spark):
    from strom_spark import Renamer

    inner = Pipeline([Source("x", [1], spark=spark), Renamer({"x": "y"})])
    outer = Pipeline([inner, Transformer("y", value=F.col("value") * 10)])
    assert len(outer.components) == 3  # nested pipeline flattened
    flow = outer()
    assert [r.value for r in flow["y"].collect()] == [10]


def test_mixer_tag_and_tree(spark):
    from strom_spark import MixerTree

    flow = Pipeline(
        [
            Source("a", [1], spark=spark),
            Source("b", [2], spark=spark),
            MixerTree(["a", "b"], "out", parts=2, tag="origin"),
        ]
    )()
    rows = {(r.origin, r.value) for r in flow["out"].collect()}
    assert rows == {("a", 1), ("b", 2)}


def test_pipeline_manipulations(spark):
    """insert/replace/delete rebuild the pipeline (reference live edits,
    lib/composite/manipulations.ex — here: plan rebuild)."""
    base = Pipeline([Source("n", [1, 2, 3], spark=spark)])
    p2 = base.insert(1, Transformer("n", value=F.col("value") + 1))
    assert [r.value for r in sorted(p2()["n"].collect())] == [2, 3, 4]
    p3 = p2.replace(1, Transformer("n", value=F.col("value") * 2))
    assert sorted(r.value for r in p3()["n"].collect()) == [2, 4, 6]
    p4 = p3.delete(1)
    assert sorted(r.value for r in p4()["n"].collect()) == [1, 2, 3]
