"""Property tests for the corpus-curation operators (queries/curation.py).

Exactness vs DuckDB is covered by tests/test_oracle.py (q85-q89, q91);
these tests pin the operator-level invariants the oracle can't express:
chunk coverage, quantization error bounds, n-gram construction, and
contamination side-conditions.
"""

import pytest
from pyspark.sql import functions as F

from pandas_td_spark.queries import curation
from pandas_td_spark.sources.io import register_views

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _views(spark):
    register_views(spark, SF)


def test_ngrams_positional_with_multiplicity(spark):
    df = spark.createDataFrame(
        [("a b c b c",), ("x",)], ["text"]
    ).select(curation._ngrams(F.split("text", " "), 2).alias("g"))
    got = [r.g for r in df.collect()]
    assert got[0] == ["a b", "b c", "c b", "b c"]  # repeats preserved
    assert got[1] == []  # shorter than n -> empty, not a whole-doc gram


def test_chunks_cover_every_token_once_per_stride(spark):
    chunks = curation.q87_doc_chunks(spark, SF)
    docs = spark.table("documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    stat = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("tok_sum"),
            F.max("chunk_idx").alias("max_idx"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    W, S = curation._CHUNK_W, curation._CHUNK_S
    for r in stat:
        expect_chunks = (r.n - 1) // S + 1
        assert r.n_chunks == expect_chunks
        assert r.max_idx == expect_chunks - 1
        # overlap accounting: full chunks carry W tokens, the tail carries
        # the remainder; total = n + overlap*(n_chunks reaching overlap)
        assert r.tok_sum == sum(
            min(W, r.n - i * S) for i in range(expect_chunks)
        )


def test_quantize_roundtrip_error_bound(spark):
    q = curation.q89_embedding_quantize(spark, SF)
    joined = (
        spark.table("embeddings")
        .join(q, "vec_id")
        .select("embedding", "scale_r", F.split("q_int8", ",").alias("qs"))
        .limit(50)
        .collect()
    )
    for r in joined:
        scale = r.scale_r
        assert scale > 0
        codes = [int(x) for x in r.qs]
        assert len(codes) == len(r.embedding)
        assert all(-127 <= c <= 127 for c in codes)
        # |x - q/scale| <= 0.5/scale + rounding slack from scale_r's 6dp
        for x, c in zip(r.embedding, codes):
            assert abs(x - c / scale) <= 0.5 / scale + 1e-4


def test_contamination_excludes_benchmark_and_counts_positively(spark):
    out = curation.q91_contamination(spark, SF).collect()
    assert all(r.doc_id >= 25 for r in out)
    assert all(r.n_shared_ngrams >= 1 for r in out)


def test_repetition_fracs_bounded(spark):
    rows = curation.q85_repetition_stats(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.top_bigram_frac <= 1.0
        assert 0.0 <= r.dup_trigram_frac < 1.0
        assert r.n_bigrams >= 1


def test_pii_redaction_masks_everything(spark):
    out = curation.q88_pii_redact(spark, SF)
    leaked = out.where(
        F.col("redacted").rlike("@example[.]com")
        | F.col("redacted").rlike("[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}")
    ).count()
    assert leaked == 0
    counts = out.agg(
        F.min("n_emails").alias("e"), F.min("n_phones").alias("p")
    ).first()
    assert counts.e >= 1 and counts.p >= 1


def test_dsir_enriches_target_and_is_deterministic(spark):
    """DSIR contract: (a) target-domain docs score higher on average,
    (b) the resampled set is enriched in the target domain vs base rate,
    (c) selection is identical across partitionings (hash-derived noise)."""
    from pandas_td_spark.operators.dsir import dsir_select, dsir_weights

    register_views(spark, SF)
    d = spark.table("documents")
    target = d.where((F.col("lang") == "en") & (F.col("doc_id") % 5 == 0))
    w = dsir_weights(d, target).join(d.select("doc_id", "lang"), "doc_id")
    avg = {
        r.lang: r.avg_w
        for r in w.groupBy("lang").agg(F.avg("log_weight").alias("avg_w")).collect()
    }
    assert avg["en"] == max(avg.values())
    n = d.count()
    base_en = d.where(F.col("lang") == "en").count() / n
    k = max(50, n // 7)
    sel = dsir_select(d, target, k=k).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    sel_en = sel.where(F.col("lang") == "en").count() / k
    assert sel_en > base_en + 0.05, (sel_en, base_en)
    ids1 = sorted(r.doc_id for r in sel.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in dsir_select(d.repartition(7), target, k=k)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2


def test_q269_funnel_is_monotone_and_grounded(spark):
    """Cumulative funnel invariants at sf0.001: stage counts and token
    sums never increase, stage 0 equals the corpus, and every stage
    stays non-negative."""
    from pandas_td_spark.queries.registry import spark_queries
    from pandas_td_spark.sources.io import register_views

    register_views(spark, "/root/testdata/sf0.001")
    rows = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in spark_queries()["q269_curation_funnel"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {"0_all", "1_lang", "2_quality", "3_dedup",
                         "4_decontam"}
    n_docs = spark.table("documents").count()
    assert rows["0_all"][0] == n_docs
    order = ["0_all", "1_lang", "2_quality", "3_dedup", "4_decontam"]
    for a, b in zip(order, order[1:]):
        assert rows[a][0] >= rows[b][0] >= 0
        assert rows[a][1] >= rows[b][1] >= 0
    # every stage actually filters something on this fixture
    assert rows["4_decontam"][0] < rows["0_all"][0]


def test_q264_split_leakage_invariants(spark):
    """The component-grain split can never leak: every near-dup
    component lands in exactly one safe split, and every doc flagged
    leaked belongs to a component whose naive splits really differ."""
    from pandas_td_spark.queries.registry import spark_queries
    from pandas_td_spark.sources.io import register_views

    register_views(spark, "/root/testdata/sf0.001")
    rows = spark_queries()["q264_split_leakage"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    n_leaked_docs = 0
    for comp, members in by_comp.items():
        safe = {m["safe_split"] for m in members}
        assert len(safe) == 1, f"component {comp} leaked under safe split"
        naive = {m["naive_split"] for m in members}
        for m in members:
            assert m["leaked"] == (len(naive) > 1)
        if len(naive) > 1:
            n_leaked_docs += len(members)
    # the fixture's near-dup clusters make the naive split actually leak
    assert n_leaked_docs > 0
