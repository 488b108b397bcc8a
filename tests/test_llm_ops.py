"""LLM-data-pipeline operators: dedup family, similarity search, text
analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from strom_spark import (
    CosineLSHJoin,
    CosineTopK,
    EmbeddingNearDupPairs,
    ExactDedup,
    Flow,
    MediaFeatures,
    MinHashLSHPairs,
    NgramJaccardPairs,
    SimHash,
    SimHashPairs,
    Transformer,
    synthetic_assets,
)
from strom_spark.functions import text as TXT


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup(spark):
    rows = [
        {"doc_id": 1, "text": "Hello  World"},
        {"doc_id": 2, "text": "hello world"},  # same after normalization
        {"doc_id": 3, "text": "different"},
    ]
    flow = Flow({"docs": spark.createDataFrame(rows)})
    out = ExactDedup("docs", "dedup")(flow)
    got = {(r.keep_id, r.n_copies) for r in out["dedup"].collect()}
    assert got == {(1, 2), (3, 1)}
    out2 = ExactDedup("docs", "kept", keep="rows")(flow)
    assert sorted(r.doc_id for r in out2["kept"].collect()) == [1, 3]


def test_ngram_jaccard_finds_planted_pairs(docs):
    out = NgramJaccardPairs("docs", "pairs", threshold=0.8)(Flow({"docs": docs}))
    pairs = out["pairs"].collect()
    assert len(pairs) > 0  # testdata has planted near-dups
    assert all(r.d1 < r.d2 and 0.8 <= r.jaccard <= 1.0 for r in pairs)


def test_minhash_lsh_matches_exact(docs):
    """LSH candidates + exact verification must equal the exact
    jaccard pairs at this threshold (high-recall band config)."""
    flow = Flow({"docs": docs})
    exact = NgramJaccardPairs("docs", "p", threshold=0.8)(flow)["p"]
    lsh = MinHashLSHPairs("docs", "p", threshold=0.8)(flow)["p"]
    e = {(r.d1, r.d2, r.jaccard) for r in exact.collect()}
    l = {(r.d1, r.d2, r.jaccard) for r in lsh.collect()}
    assert e == l
    assert len(e) > 0


def test_simhash_and_pairs(docs):
    flow = Flow({"docs": docs})
    sig = SimHash("docs", "sig")(flow)["sig"]
    row = sig.first()
    assert len(row.simhash) == 32 and set(row.simhash) <= {"0", "1"}
    pairs = SimHashPairs("docs", "pairs", max_distance=3)(flow)["pairs"]
    for r in pairs.limit(5).collect():
        assert r.hamming <= 3 and r.d1 < r.d2


def test_embedding_near_dup_and_lsh(emb):
    flow = Flow({"emb": emb})
    exact = EmbeddingNearDupPairs("emb", "p", threshold=0.3)(flow)["p"]
    e = {(r.d1, r.d2) for r in exact.collect()}
    lsh = CosineLSHJoin("emb", "p", threshold=0.3, n_tables=16, bits_per_table=6)(flow)["p"]
    l = {(r.d1, r.d2) for r in lsh.collect()}
    # LSH is a subset (no false positives after verification)
    assert l <= e


def test_cosine_topk(spark, emb):
    flow = Flow({"corpus": emb, "queries": emb.filter(F.col("vec_id") < 3)})
    out = CosineTopK("corpus", "queries", "knn", k=5)(flow)["knn"]
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
        sims = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rs)


def test_text_functions(spark, docs):
    flow = Flow({"docs": docs})
    out = Transformer(
        "docs",
        select={
            "doc_id": "doc_id",
            "n_tokens": TXT.token_count("text"),
            "n_bpe": TXT.bpe_token_count("text"),
            "lang": TXT.lang_id("text"),
            "fp": TXT.fingerprint("text"),
            **{k: v for k, v in TXT.quality_features("text").items() if k == "quality_score"},
        },
    )(flow)["docs"]
    rows = out.limit(20).collect()
    for r in rows:
        assert r.n_tokens > 0 and r.n_bpe >= r.n_tokens - 1
        assert r.lang in ("en", "de", "fr", "es", "und")
        assert len(r.fp) == 32
        assert 0.0 <= r.quality_score <= 1.0


def test_media_features(spark):
    assets = synthetic_assets(spark, n=30)
    flow = Flow({"assets": assets})
    out = MediaFeatures("assets", "features")(flow)["features"]
    rows = out.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.feat) == 8
        assert len(r.content_hash) == 32
        assert r.n_bytes >= 16
    # strict mode surfaces the stub explicitly
    with pytest.raises(NotImplementedError):
        MediaFeatures("assets", "f", strict=True)(flow)


def test_short_doc_shingles_are_empty(spark):
    """Docs shorter than k tokens/chars yield EMPTY shingle arrays and
    must not crash shingling or the dedup operators built on it (the
    unguarded form threw INVALID_PARAMETER_VALUE.START on sub-k docs
    because sequence(1, 0) is a descending [1, 0] in Spark)."""
    rows = [
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "one"},
        {"doc_id": 3, "text": "two words"},
        {"doc_id": 4, "text": "now three tokens"},
        {"doc_id": 5, "text": "four whole tokens here"},
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id: (r.ws, r.cs)
        for r in df.select(
            "doc_id",
            F.size(TXT.word_shingles("text", k=3)).alias("ws"),
            F.size(TXT.char_shingles("text", k=5)).alias("cs"),
        ).collect()
    }
    assert got[1] == (0, 0)  # empty text: no shingles of either kind
    assert got[2][0] == 0 and got[2][1] == 0  # "one" < 3 tokens, < 5 chars
    assert got[3][0] == 0 and got[3][1] > 0
    assert got[4] == (1, len("now three tokens") - 4)
    assert got[5][0] == 2
    # dedup operators run end-to-end over the short-doc corpus
    flow = Flow({"docs": df})
    NgramJaccardPairs("docs", "p", threshold=0.5)(flow)["p"].collect()
    MinHashLSHPairs("docs", "p2", threshold=0.5)(flow)["p2"].collect()


def test_simhash_block_config_validated():
    with pytest.raises(ValueError, match="max_distance"):
        SimHashPairs("d", "p", max_distance=16)
    with pytest.raises(ValueError, match="bits"):
        SimHashPairs("d", "p", max_distance=3, bits=3)
    from strom_spark import SimHashDedup
    with pytest.raises(ValueError, match="max_distance"):
        SimHashDedup("d", "p", max_distance=-1)
