"""Text-analysis operators over the ``documents`` table (SURVEY.md §2.10 L4
+ north-star "text analysis": token counting, quality scoring, language id,
document fingerprinting).

No reference locus (pandas-td had no text ops — /root/reference empty);
semantics defined here, following the LLM-data-pipeline literature
(PAPERS.md). Everything is built-in expression work — higher-order array
functions (`transform`/`filter`/`aggregate`), no Python UDFs — so the whole
stage is JVM-side codegen and scales linearly with one parquet scan, no
shuffle except the final aggregation where present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_td_spark.engine.session import spread
from pandas_td_spark.queries.registry import query

#: tiny embedded stopword list (shared by Spark + oracle SQL)
STOPWORDS = ("the", "a", "of", "and", "to", "in")
_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


# ---------------------------------------------------------------------------
# token counting + type-token ratio
# ---------------------------------------------------------------------------
@query(
    "q40_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS ttr,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def q40_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + type-token ratio per document."""
    d = spark.table("documents")
    w = _words()
    return d.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_unique"),
        (
            F.size(F.array_distinct(w)).cast("double") / F.size(w)
        ).alias("ttr"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# corpus profile per language
# ---------------------------------------------------------------------------
@query(
    "q41_lang_profile",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q41_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.table("documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


# ---------------------------------------------------------------------------
# word frequency (explode/unnest + top-k)
# ---------------------------------------------------------------------------
@query(
    "q42_word_freq",
    oracle="""
    SELECT word, COUNT(*) AS freq FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ) GROUP BY word
    ORDER BY freq DESC, word LIMIT 20
    """,
)
def q42_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST lateral-join analogue (SURVEY §2.3 J11): explode → count →
    top-k via TakeOrderedAndProject."""
    d = spark.table("documents")
    return (
        d.select(F.explode(_words()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# quality scoring (stopword ratio + mean token length)
# ---------------------------------------------------------------------------
@query(
    "q43_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text,' '),
                                w -> w IN ({_SW_SQL}))) AS DOUBLE)
             / len(string_split(text,' ')) AS stopword_ratio,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text,' ')) AS mean_token_len,
           CASE WHEN len(string_split(text,' ')) >= 20 THEN 1 ELSE 0 END AS len_ok
    FROM documents
    """,
)
def q43_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals used by pretraining-data filters
    (C4/Gopher-style): stopword density, mean token length, length gate."""
    d = spark.table("documents")
    w = _words()
    sw = F.array([F.lit(s) for s in STOPWORDS])
    return d.select(
        "doc_id",
        (
            F.size(F.filter(w, lambda x: F.array_contains(sw, x))).cast("double")
            / F.size(w)
        ).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace("text", " ", "")).cast("double") / F.size(w)
        ).alias("mean_token_len"),
        F.when(F.size(w) >= 20, F.lit(1)).otherwise(F.lit(0)).alias("len_ok"),
    )


# ---------------------------------------------------------------------------
# language id (marker-word voting heuristic)
# ---------------------------------------------------------------------------
@query(
    "q44_language_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN len(list_filter(string_split(text,' '),
                                     w -> w IN ({_SW_SQL}))) > 0
                THEN 'en' ELSE 'und' END AS guessed_lang
    FROM documents
    """,
)
def q44_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language id. The fixture corpus is synthetic English-ish
    word soup, so the heuristic reduces to en/und — the operator shape
    (per-language marker sets voted per doc, one scan, no shuffle) is the
    real deliverable; production would plug fastText-style n-gram tables
    into the same plan."""
    d = spark.table("documents")
    w = _words()
    sw = F.array([F.lit(s) for s in STOPWORDS])
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(
            F.size(F.filter(w, lambda x: F.array_contains(sw, x))) > 0, "en"
        )
        .otherwise("und")
        .alias("guessed_lang"),
    )


# ---------------------------------------------------------------------------
# document fingerprint (order-insensitive bag-of-words digest)
# ---------------------------------------------------------------------------
@query(
    "q45_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),
                               ' ')) AS fp
    FROM documents
    """,
)
def q45_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary fingerprint: md5 over the sorted distinct token set —
    invariant to word order/repetition; the cheap first-pass near-dup key."""
    d = spark.table("documents")
    return d.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(_words())))
        ).alias("fp"),
    )


# ---------------------------------------------------------------------------
# TF-IDF: top terms per document (L4 completion)
# ---------------------------------------------------------------------------
@query(
    "q46_tfidf_top_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM tokens GROUP BY doc_id, word
    ), df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY word
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.word,
             tf.tf * ROUND(ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0, 6) AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tfidf, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, word) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def q46_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with sklearn-style smoothing (ln((N+1)/(df+1))+1), top-3
    terms per doc. Plan: one explode scan feeding both TF (groupBy doc,
    word) and DF (groupBy word); DF and the corpus count broadcast back —
    the document side never re-shuffles on anything wider than doc_id.
    (spark.ml HashingTF/IDF cover the feature-vector variant; this is the
    analytic form, oracle-checkable term by term.)"""
    d = spark.table("documents")
    tokens = d.select("doc_id", F.explode(_words()).alias("word"))
    tf = tokens.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = tokens.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size rides as a lazy broadcast 1-row aggregate — a
    # driver-side d.count() was an extra action + full scan per call;
    # the exact integer count converts to the same double either way
    nd = d.agg(F.count("*").cast("double").alias("__n"))
    scored = (
        tf.join(F.broadcast(df_), "word")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "word",
            (
                F.col("tf")
                # idf rounded to 6dp: JVM ln and DuckDB ln differ in the
                # last ulp; rounding on a coarse grid (tie risk ~2e-9 per
                # distinct df) makes the factor — and hence ranking —
                # engine-identical
                * F.round(
                    F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0,
                    6,
                )
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "word", "tfidf", "rnk")
    )


# ---------------------------------------------------------------------------
# End-to-end corpus curation: quality gate → exact dedup → deterministic
# sample — the composed shape of a pretraining-data pipeline, fully
# oracle-checked (every stage is engine-neutral by construction).
# ---------------------------------------------------------------------------
@query(
    "q79_corpus_curation",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w IN ({_SW_SQL}))) AS DOUBLE)
               / len(string_split(text, ' ')) AS swr
      FROM documents
      WHERE len(string_split(text, ' ')) >= 20
    ), gated AS (
      SELECT * FROM q WHERE swr >= 0.05
    ), keep AS (
      SELECT MIN(doc_id) AS doc_id
      FROM gated
      GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
    )
    SELECT g.doc_id, g.n_tokens, g.swr
    FROM gated g JOIN keep USING (doc_id)
    WHERE substr(md5(cast(g.doc_id AS VARCHAR)), 1, 1) <= '7'
    """,
)
def q79_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline over ``documents``:

    1. quality gate (≥20 tokens, stopword ratio ≥ 0.05 — C4/Gopher-style);
    2. exact dedup, keep lowest doc_id per normalized-text md5
       (``operators/dedup.py::exact_dedup`` — digest groupBy, map-side
       partials);
    3. deterministic 50 % hash sample (q77's hash-cut — reproducible on
       any engine/partitioning).

    Every stage is a narrow shuffle or a predicate; the composition is one
    digest aggregation + one semi-join + scan-time filters — the whole
    pipeline stays linear in corpus size at 100 TB.
    """
    from pandas_td_spark.operators.dedup import exact_dedup

    d = spark.table("documents")
    w = _words()
    sw = F.array([F.lit(s) for s in STOPWORDS])
    gated = (
        d.select(
            "doc_id",
            "text",
            F.size(w).cast("bigint").alias("n_tokens"),
            (
                F.size(F.filter(w, lambda x: F.array_contains(sw, x))).cast(
                    "double"
                )
                / F.size(w)
            ).alias("swr"),
        )
        .where(F.col("n_tokens") >= 20)
        .where(F.col("swr") >= 0.05)
    )
    deduped = exact_dedup(gated, text_col="text", id_col="doc_id")
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        deduped.where(F.substring(h, 1, 1) <= "7")
        .select("doc_id", "n_tokens", "swr")
    )


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization (north-star "token counting: whitespace + a
# BPE-ish regex"): a GPT-2-style pretokenizer pattern restricted to syntax
# Java regex and RE2 interpret identically (no lookarounds, ASCII classes).
# One regexp_extract_all scan per row, zero shuffle.
# ---------------------------------------------------------------------------
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+"
_BPE_SQL = _BPE_PAT.replace("'", "''")  # escaped for the SQL string literal


@query(
    "q90_bpe_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(text, '{_BPE_SQL}') AS toks,
             string_split(text, ' ') AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_bpe,
           CAST(len(ws) AS BIGINT) AS n_whitespace,
           CAST(len(list_filter(toks, x -> regexp_matches(x, '^ ?[A-Za-z]+$')))
                AS BIGINT) AS n_alpha,
           CAST(len(list_filter(toks, x -> regexp_matches(x, '^ ?[0-9]+$')))
                AS BIGINT) AS n_numeric,
           CAST(len(toks) AS DOUBLE) / len(ws) AS bpe_per_word
    FROM t
    """,
)
def q90_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts under a BPE-style pretokenizer regex vs whitespace
    split — the sequence-length estimator used when budgeting training
    corpora in tokens rather than bytes."""
    d = spark.table("documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0))
    ws = _words()
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_bpe"),
        F.size(ws).cast("bigint").alias("n_whitespace"),
        F.size(F.filter(toks, lambda x: x.rlike("^ ?[A-Za-z]+$")))
        .cast("bigint")
        .alias("n_alpha"),
        F.size(F.filter(toks, lambda x: x.rlike("^ ?[0-9]+$")))
        .cast("bigint")
        .alias("n_numeric"),
        (F.size(toks).cast("double") / F.size(ws)).alias("bpe_per_word"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS algorithm):
# positional k-gram hashes → min over each sliding window of w hashes →
# distinct minima are the document's fingerprints. Guarantees every match
# of length ≥ w+k-1 shares a fingerprint. Hashes are md5-prefix STRINGS —
# identical in Spark and DuckDB, so the whole op is oracle-checkable
# (xxhash64 has no DuckDB twin). Plan: the whole op is row-local, so it
# runs as ONE zero-shuffle projection — k-gram hash array, sliding minima
# via slice/array_min (O(L*w) per row), array_distinct. No explode, no
# doc-partitioned window, no re-agg shuffle.
# ---------------------------------------------------------------------------
_WIN_K, _WIN_W = 3, 4


def _winnow_fps(ws):
    """Per-row winnowing fingerprint array (distinct, unsorted): k-gram
    md5-prefix hashes, min over each w-wide sliding window. Row-local —
    callers get the whole selection step with zero shuffles."""
    n_grams = F.greatest(F.size(ws) - (_WIN_K - 1), F.lit(1))
    hs = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.substring(
            F.md5(F.array_join(F.slice(ws, i, _WIN_K), " ")), 1, 8
        ),
    )
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("__hs"))),
            lambda j: F.array_min(F.slice(F.col("__hs"), j, _WIN_W)),
        )
    ), hs


@query(
    "q92_winnowing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), g AS (
      SELECT doc_id, i AS pos,
             substr(md5(array_to_string(ws[i:i + {_WIN_K - 1}], ' ')), 1, 8)
               AS h
      FROM t, unnest(range(1, greatest(len(ws) - {_WIN_K - 2}, 2))) AS u(i)
    ), wmin AS (
      SELECT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND {_WIN_W - 1} FOLLOWING) AS fp
      FROM g
    )
    SELECT doc_id,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints,
           string_agg(DISTINCT fp, ',' ORDER BY fp) AS fingerprints
    FROM wmin GROUP BY doc_id
    """,
)
def q92_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (k=3-gram md5 hashes, window w=4),
    emitted as a sorted comma-joined string per doc.

    Fingerprint selection is row-local, so the plan is one zero-shuffle
    projection: hash array -> per-position window minima (slice clamps
    at the tail exactly like the ROWS frame) -> distinct/sort/join."""
    d = spread(spark.table("documents"), by="doc_id")
    fps, hs = _winnow_fps(_words())
    return (
        d.select("doc_id", hs.alias("__hs"))
        .select("doc_id", F.array_sort(fps).alias("__fps"))
        .select(
            "doc_id",
            F.size(F.col("__fps")).cast("bigint").alias("n_fingerprints"),
            F.array_join(F.col("__fps"), ",").alias("fingerprints"),
        )
    )


# ---------------------------------------------------------------------------
# Substring-overlap near-dup via shared winnowing fingerprints (the
# scalable stand-in for suffix-array substring dedup, Lee et al. 2022 /
# MOSS): two documents sharing >= 3 selected fingerprints share real
# k-gram substrings with winnowing's positional guarantee. Plan: the q92
# fingerprint set explodes to (fp, doc) postings; the self-join is on the
# fingerprint key (uniform md5 space — no skew), group-counted, filtered.
# Shuffle volume is O(postings); per-fingerprint posting lists are short
# for natural text, so the join stays candidate-bounded — the same
# inverted-index shape as q52, one level up (selected substrings instead
# of all shingles).
# ---------------------------------------------------------------------------
@query(
    "q110_substring_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), g AS (
      SELECT doc_id, i AS pos,
             substr(md5(array_to_string(ws[i:i + {_WIN_K - 1}], ' ')), 1, 8)
               AS h
      FROM t, unnest(range(1, greatest(len(ws) - {_WIN_K - 2}, 2))) AS u(i)
    ), wmin AS (
      SELECT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND {_WIN_W - 1} FOLLOWING) AS fp
      FROM g
    ), fps AS (
      SELECT DISTINCT doc_id, fp FROM wmin
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def q110_substring_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= 3 winnowing fingerprints, with the
    shared-fingerprint count. Fingerprint selection rides the row-local
    q92 helper, so postings reach the self-join with zero pre-join
    shuffles (the exploded array is distinct per doc by construction).

    Stage decomposition at sf0.1 (r15, interleaved medians): one
    winnowing pass (doc-keyed spread + k-gram md5 + window minima +
    explode) = 0.62 s; full query = ~1.0-1.6 s = winnow + fp-shuffle
    self-join + pair aggregate. The r14 letter (3.9-5.5x) was paying a
    SECOND full winnowing pass: round-robin spread() made the two join
    sides non-canonicalizable, so the exchange was never reused and the
    md5 stack ran once per side (2.07 s med). spread(by="doc_id")
    restores subtree equality and the join sides share one shuffle
    stage. Remaining gap vs DuckDB (~0.37 s) is the two-stage shuffle
    machinery itself — candidate-bounded postings, no skew (md5 space),
    posting-list pair generation was A/B'd (collect_list + row-local
    pair explode) and LOST (2.47 s med): the sorted-list build costs
    more than the joint shuffle it saves at every tested size."""
    d = spread(spark.table("documents"), by="doc_id")
    fp_arr, hs = _winnow_fps(_words())
    fps = (
        d.select("doc_id", hs.alias("__hs"))
        .select("doc_id", F.explode(fp_arr).alias("fp"))
    )
    a = fps.select(F.col("doc_id").alias("id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= 3)
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy string matching — edit-distance pairs over the DISTINCT
# name vocabulary. The entity-resolution pattern: dedupe to the
# vocabulary first (names repeat across rows), block on the head noun +
# a length band, verify with exact levenshtein. The blocking predicate
# is part of the query's CONTRACT (both engines apply it), so the result
# is exact-by-definition; recall beyond the block is the documented
# trade (public pattern: Christen, "Data Matching", blocking ch. 4).
# ---------------------------------------------------------------------------
@query(
    "q124_edit_distance_pairs",
    oracle="""
    WITH names AS (
      SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
             string_split(p_name, ' ')[-1] AS noun
      FROM part GROUP BY 1
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
      AND abs(length(a.p_name) - length(b.p_name)) <= 2
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    scale_note=(
        "quadratic only within a (noun, length-band) block over the "
        "DISTINCT vocabulary — row count never enters the pair space"
    ),
)
def q124_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names (typo candidates): distinct-vocabulary
    reduction, token-blocked self-join, JVM-side levenshtein verify."""
    names = (
        spark.table("part")
        .groupBy("p_name")
        .agg(F.count("*").alias("n_parts"))
        .withColumn(
            "noun", F.element_at(F.split("p_name", " "), -1)
        )
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name"))
            & (
                F.abs(
                    F.length(F.col("a.p_name"))
                    - F.length(F.col("b.p_name"))
                )
                <= 2
            ),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("int")
            .alias("dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )


#: "w1 w2" positional bigram array as ONE SQL expression — the exact
#: tree q186/q204 built through the Column API (lookahead-regex fast
#: path, positional transform+slice arm behind the empty-token guard,
#: empty array under 2 tokens). Composed as a string so construction
#: costs one JVM parse instead of the ~27 ms py4j lambda plus ~100
#: round-trips per query per run (the q108 construction discipline).
_BIGRAMS2_SQL = (
    "CASE WHEN size(split(text, ' ')) >= 2 THEN "
    "CASE WHEN text RLIKE '(^| )( |$)' THEN "
    "transform(sequence(1, size(split(text, ' ')) - 1), "
    "i -> concat_ws(' ', slice(split(text, ' '), i, 2))) "
    "ELSE regexp_extract_all(text, '(?<=^| )(?=([^ ]+ [^ ]+))', 1) END "
    "ELSE CAST(array() AS array<string>) END"
)


# ---------------------------------------------------------------------------
# Bigram language-model quality score (L4l) — per-doc average negative
# log-likelihood under an add-one-smoothed corpus bigram LM, the
# next-step-up from q95's unigram KenLM proxy. One bigram explode
# feeds the count model AND the scoring pass; context counts and V are
# corpus aggregates joined back. ln() rounds 6dp, per-bigram terms are
# decimal-summed (q181 discipline) so the per-doc mean is exact.
# ---------------------------------------------------------------------------
@query(
    "q186_bigram_nll",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), pos AS (
      SELECT doc_id, w, unnest(range(1, array_length(w))) AS i FROM t
    ), bg AS (
      SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM pos
    ), c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c12
      FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c1 FROM bg GROUP BY 1
    ), v AS (
      SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    )
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           -(CAST(SUM(CAST(FLOOR(
                 ln((c12.c12 + 1.0) / (c1.c1 + v.v)) * 1000000
                 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0) / COUNT(*)
             AS nll
    FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY bg.doc_id
    """,
)
def q186_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram NLL under the corpus LM with add-one
    smoothing — low = fluent/templated text, high = novel or noisy.
    The per-doc mean ships UNROUNDED: both engines divide the same
    exact decimal sum by the same count, so the doubles are
    bit-identical — while rounding an arbitrary quotient double is
    where engine ROUND semantics diverge (observed once at sf0.1)."""
    d = spread(spark.table("documents"), by="doc_id")
    # Bigrams as "w1 w2" STRINGS via the shingle_array-style lookahead
    # regex (one text pass; the positional arm keeps exact semantics for
    # texts with empty tokens — the q204 rewrite, A/B 0.50 -> 0.40 s for
    # the count stage). w1/w2 never contain a space, so g <-> (w1, w2)
    # is a bijection: counts keyed on g equal counts keyed on the pair,
    # and the scoring join collapses to ONE string key; w1 is recovered
    # by split() at bigram-VOCAB grain only.
    bg = d.selectExpr("doc_id", f"explode({_BIGRAMS2_SQL}) AS g")
    # The bigram LM is a model artifact at bigram-VOCAB grain (bounded
    # by vocabulary², practically far smaller than the corpus) —
    # checkpoint it UNCONDITIONALLY: its two consumers (the c1 fold and
    # the scoring join) would otherwise each re-run the full corpus
    # explode + count shuffle, the wrong trade at every scale. History,
    # because this flip-flopped: r12's first pass size-gated the
    # checkpoint at 20k docs on an A/B that measured under ambient load
    # (eager 2.24/2.35 vs none 2.12/2.17 — a wash), and the driver
    # bench then showed the un-checkpointed plan at 2.5-3.1 s vs r11's
    # 1.19. A clean interleaved A/B at sf0.1 (5k docs, 931 distinct
    # bigrams, alternating same-session runs) measured none
    # 2.18/2.34/1.98 vs eager 1.83/1.44/1.10 s — the checkpoint wins
    # decisively even below the old gate, because two extra
    # explode+shuffle corpus passes always cost more than blocking on a
    # 931-row materialization.
    c12 = (
        bg.groupBy("g")
        .agg(F.count("*").cast("double").alias("c12"))
        .select("g", F.split("g", " ").getItem(0).alias("w1"),
                F.split("g", " ").getItem(1).alias("w2"), "c12")
        .localCheckpoint()
    )
    # c1 folds from the materialized bigram counts — bigram-vocab
    # grain, not another corpus pass (integer counts in double: exact
    # in any order). A localCheckpoint of the raw bigram STREAM was
    # A/B-tested here and rejected: warm wash at sf0.1, and token-grain
    # materialization is the wrong default at 100 TB.
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # vocabulary size rides as a lazy broadcast 1-row aggregate. r15
    # (guide §1.2): it no longer re-explodes the corpus (a third full
    # tokenize pass, ~6 CPU-s at sf0.1) — every corpus word appears as
    # some bigram's w1/w2 EXCEPT the single word of a space-free doc
    # (in a doc with >=2 words, words[0..n-2] are w1s and words[n-1] is
    # a w2; a 1-word doc is exactly a doc whose text has no space, and
    # its word IS the text), so distinct-word count folds from the
    # 931-row checkpointed LM plus a no-explode filtered scan. Set
    # equality holds for any input, so the oracle's corpus-explode
    # formulation is unchanged and the value identical.
    one_word = (
        spark.table("documents")
        .where(F.col("text").isNotNull() & ~F.col("text").contains(" "))
        .select(F.col("text").alias("w"))
    )
    vocab = (
        c12.select(F.col("w1").alias("w"))
        .unionAll(c12.select(F.col("w2").alias("w")))
        .unionAll(one_word)
        .agg(F.count_distinct("w").cast("double").alias("__v"))
    )
    # r15: the per-bigram 6-dp term used Spark round() (BigDecimal per
    # row) feeding a decimal(28,6) sum (BigDecimal buffers) — the
    # scoring stage burned 17.5 CPU-s. Same 6-dp quantization via
    # FLOOR(ln*1e6 + 0.5) micros, pure FP per row, summed as exact
    # int64 (bit-equal nll in-envelope: |Σmicros| < 2^53 ≈ 6e8
    # bigrams/doc at |ln|<=15). Cross-engine tolerance is unchanged:
    # round-to-6dp and floor-micros both flip only when the engines'
    # ln() ulps straddle a 1e-6-grain boundary — the identical lockstep
    # formula on identical exact inputs keeps the hash stable exactly
    # as the old round(,6) did (verified vs the old decimal oracle at
    # sf0.1).
    term = F.floor(
        F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("__v")))
        * F.lit(1000000.0)
        + F.lit(0.5)
    )
    return (
        bg.join(c12.select("g", "w1", "c12"), "g")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (
                -(F.sum(term).cast("double") / F.lit(1000000.0))
                / F.count("*")
            ).alias("nll"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (L4m) — top-3 highest-scoring terms per
# document, the classic summarize/tag primitive. One explode feeds BOTH
# the tf aggregate and (via a second tiny rollup) the document
# frequencies; the df side is broadcast back. idf uses the
# round(ln, 6) engine-reconciliation; tf x idf is then a deterministic
# bigint x double product, and the per-doc top-3 is a bounded window.
# At 100 TB the word explode is the dominant cost and is spread()
# across cores pre-shuffle; df is |vocab| rows — always broadcastable.
# ---------------------------------------------------------------------------
@query(
    "q199_tfidf_topk",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM w WHERE word <> '' GROUP BY 1, 2
    ), df AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word, tf.tf,
             tf.tf * round(ln(n.n_docs / df.df), 6) AS score
      FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tf, score, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY score DESC, word) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def q199_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (ties broken lexically).

    r15 plan: hash-spread the COMPACT document rows by doc_id BEFORE the
    explode. hashpartitioning(doc_id) satisfies the (doc_id, word)
    aggregate clustering AND the per-doc top-3 window, so after the one
    doc-grain exchange (whole text strings — 3-5x fewer bytes than the
    exploded tokens the r14 plan shuffled) the token explode, tf
    aggregate, broadcast-df join, and window all run exchange-free.
    Stage decomposition at sf0.1 (interleaved medians): doc exchange +
    explode 0.47 s; + tf aggregate 0.45 s (clustering inherited, zero
    cost); full 0.95 s — the residual is the df broadcast-build branch
    replaying the explode (AQE materializes broadcast stages eagerly,
    before the main stage exists to reuse). r14 shape measured 2.04 s
    same-window: its token-grain tf exchange + a second WindowGroupLimit
    exchange + the same build replay. Rejected A/B: df via a word-
    partitioned window (1.14 s, no broadcast build) — Zipf skew puts
    every tf row of a hot word in one task at scale; pair-grain
    repartition after partial agg (2.01 s)."""
    from pyspark.sql import Window

    d = spread(spark.table("documents"), by="doc_id")
    tf = (
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    # corpus size as a lazy broadcast 1-row aggregate (no driver action;
    # unspread scan — a count needs no repartition)
    nd = spark.table("documents").agg(
        F.count("*").cast("double").alias("__n")
    )
    scored = (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "word",
            "tf",
            (
                F.col("tf")
                * F.round(F.log(F.col("__n") / F.col("df")), 6)
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "word")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "word", "tf", "score", "rnk")
    )


# ---------------------------------------------------------------------------
# PMI collocation extraction (L4n) — the top-20 most-associated
# adjacent word pairs in the corpus (min count 5), the phrase-mining
# primitive behind tokenizer/vocab induction. All probabilities come
# from one bigram explode: PMI = ln(c12*N / (c1*c2)) with the argument
# formed as exact-bigint products cast to double (all < 2^53), and
# ln round(,6)-reconciled. Lexical tiebreak makes the top-20 stable.
# ---------------------------------------------------------------------------
@query(
    "q204_pmi_collocations",
    oracle="""
    WITH t AS (
      SELECT string_split(text, ' ') AS w FROM documents
    ), pos AS (
      SELECT w, unnest(range(1, array_length(w))) AS i FROM t
    ), bg AS (
      SELECT w[i] AS w1, w[i + 1] AS w2 FROM pos
    ), c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY 1
    ), c2 AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bg),
    scored AS (
      SELECT c12.w1, c12.w2, c12.c12,
             round(ln(CAST(c12.c12 * n.nb AS DOUBLE)
                      / CAST(c1.c1 * c2.c2 AS DOUBLE)), 6) AS pmi
      FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
      WHERE c12.c12 >= 5
    )
    SELECT w1, w2, c12 AS n_pair, pmi, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS rnk
      FROM scored
    ) WHERE rnk <= 20
    """,
)
def q204_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-word collocations by PMI (count >= 5)."""
    from pyspark.sql import Window

    d = spread(spark.table("documents"), by="doc_id")
    # Bigrams as "w1 w2" STRINGS via the shingle_array-style lookahead
    # regex (one pass over the text) instead of per-position struct
    # building (transform+element_at allocates a struct per bigram —
    # A/B 0.50 -> 0.40 s for the count stage at sf0.1). The positional
    # arm keeps exact semantics for texts with empty tokens, where
    # `[^ ]+` and split() disagree; the gram splits back into (w1, w2)
    # AFTER the count, at bigram-VOCAB grain (w1/w2 never contain a
    # space, so concat_ws+split round-trips losslessly, empties
    # included). Verified count-identical to the struct form at sf0.1.
    bg = d.selectExpr(f"explode({_BIGRAMS2_SQL}) AS g")
    # ONE corpus pass: the unfiltered pair-count table is a model
    # artifact at bigram-VOCAB grain (bounded, far smaller than the
    # corpus); materialize it once and fold EVERY marginal from it —
    # c1/c2 as SUM over the opposite word, the bigram total as the
    # grand SUM. Without the cut each of the four consumers re-ran the
    # split+transform+explode pipeline (plan showed Generate×4, zero
    # exchange reuse). All values are exact bigints, so the folds are
    # count-identical to re-aggregating the raw stream.
    c12u = (
        bg.groupBy("g")
        .agg(F.count("*").alias("c12"))
        .select(
            F.split("g", " ").getItem(0).alias("w1"),
            F.split("g", " ").getItem(1).alias("w2"),
            "c12",
        )
        .localCheckpoint()
    )
    c12 = c12u.where(F.col("c12") >= 5)
    c1 = c12u.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12u.groupBy("w2").agg(F.sum("c12").alias("c2"))
    # total bigram count rides as a broadcast 1-row aggregate (lazy —
    # no driver count action)
    nbf = c12u.agg(F.sum("c12").alias("__nb"))
    scored = (
        c12.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nbf))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (F.col("c12") * F.col("__nb")).cast("double")
                    / (F.col("c1") * F.col("c2")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )
    # distributed top-k (TakeOrderedAndProject) bounds the frame to 20
    # rows BEFORE any rank window — the remaining global window sorts a
    # ≤20-row frame, never the bigram vocabulary
    top = scored.orderBy(F.desc("pmi"), "w1", "w2").limit(20)
    return (
        top.withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("pmi"), "w1", "w2"))
            .cast("bigint"),
        )
        .select("w1", "w2", F.col("c12").alias("n_pair"), "pmi", "rnk")
    )


# ---------------------------------------------------------------------------
# Zipf-law fit (L4p) — OLS slope of ln(freq) on ln(rank) over the top
# 1000 corpus words: the corpus-health diagnostic (natural text ≈ -1;
# boilerplate/spam bends the curve). ln values are carried as exact
# MICRO-unit integers (round(ln*1e6) — nearbyint and HALF_UP agree off
# ties), so the OLS moments are exact decimal(38,0)/HUGEINT sums and
# the slope is an unrounded quotient of identical doubles. Word counts
# collapse in one partial-agg shuffle; the fit runs on 1000 rows.
# ---------------------------------------------------------------------------
@query(
    "q207_zipf_fit",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ), cnt AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS c
      FROM w WHERE word <> '' GROUP BY 1
    ), ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, word) AS r
      FROM cnt
    ), pts AS (
      SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS HUGEINT) AS x,
             CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS HUGEINT) AS y
      FROM ranked WHERE r <= 1000
    ), m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope,
           (CAST(sy AS DOUBLE)
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / 1e6 AS intercept_ln
    FROM m
    """,
)
def q207_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope/intercept from the top-1000 word rank-frequency curve
    (micro-unit integer OLS moments)."""
    from pyspark.sql import Window

    d = spread(spark.table("documents"), by="doc_id")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    # distributed top-k (TakeOrderedAndProject) bounds the frame to
    # 1000 rows BEFORE the rank window — the remaining global window
    # sorts a ≤1000-row frame, never the corpus vocabulary
    top = cnt.orderBy(F.desc("c"), "word").limit(1000)
    ranked = top.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), "word"))
        .alias("r"),
    )
    pts = ranked.select(
        F.round(F.log(F.col("r").cast("double")) * 1e6)
        .cast("decimal(20,0)")
        .alias("x"),
        F.round(F.log(F.col("c").cast("double")) * 1e6)
        .cast("decimal(20,0)")
        .alias("y"),
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope = num / den
    return m.select(
        F.col("n").cast("bigint").alias("n_points"),
        slope.alias("zipf_slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
            / F.lit(1e6)
        ).alias("intercept_ln"),
    )


# ---------------------------------------------------------------------------
# Cross-source contamination matrix (L4r) — pairwise overlap of
# winnowing fingerprints between sources: the audit that catches one
# corpus slice leaking into another (or into an eval set) BEFORE
# training. Reuses q92's fingerprint construction, collapsed to
# distinct (source, fp) grain, so the self-join is |sources|-bounded
# per fingerprint; Jaccard is an exact integer ratio.
# ---------------------------------------------------------------------------
@query(
    "q211_source_overlap",
    oracle=f"""
    WITH t AS (
      SELECT source, string_split(text, ' ') AS ws FROM documents
    ), g AS (
      SELECT source, i AS pos,
             substr(md5(array_to_string(ws[i:i + {_WIN_K - 1}], ' ')), 1, 8)
               AS h
      FROM t, unnest(range(1, greatest(len(ws) - {_WIN_K - 2}, 2))) AS u(i)
    ), sf AS (
      SELECT DISTINCT source, h AS fp FROM g
    ), tot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fp FROM sf GROUP BY 1
    ), ov AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sf a JOIN sf b ON a.fp = b.fp AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT o.src_a, o.src_b, o.n_shared, ta.n_fp AS n_fp_a,
           tb.n_fp AS n_fp_b,
           CAST(o.n_shared AS DOUBLE)
             / (ta.n_fp + tb.n_fp - o.n_shared) AS jaccard
    FROM ov o
    JOIN tot ta ON ta.source = o.src_a
    JOIN tot tb ON tb.source = o.src_b
    """,
)
def q211_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source contamination: shared winnowing k-gram
    fingerprints and fingerprint-set Jaccard per source pair.

    The oracle's per-gram hashing is position-insensitive here (no
    window minimum — full k-gram sets, the stricter audit)."""
    from pandas_td_spark.operators.dedup import _shingle_array_sql

    d = spread(spark.table("documents"), by="doc_id")
    # Gram strings via shingle_array's single-regex extraction instead of
    # the positional explode+slice+array_join form (slice copies O(k·len)
    # subarrays per doc — the shingle_array docstring's measured 5x). The
    # branches emit the same gram STRINGS (positions 1..len-k+1; whole
    # text for short docs; positional fallback on empty tokens), and the
    # (source, fp) distinct below absorbs shingle_array's array_distinct,
    # so the checkpointed fingerprint set is value-identical. (SQL-string
    # shingle tree — one parse instead of per-call lambda chatter.)
    # explode_outer: shingle_array is never empty — keeps the inferred
    # size()>0 filter out of the one-split scan stage.
    sf = (
        d.selectExpr(
            "source",
            f"explode_outer({_shingle_array_sql('text', _WIN_K)}) AS __g",
        )
        .selectExpr(
            "source",
            "substring(md5(__g), 1, 8) AS fp",
        )
        .distinct()
        # One materialization of the fingerprint set: three consumers
        # (totals + both self-join sides) otherwise re-run the
        # explode+md5 pipeline each (plan showed Generate×4, zero
        # exchange reuse — 1.6 s → 0.6 s at sf0.1). Deterministic
        # values (md5), so the lineage cut is purely a perf boundary;
        # the checkpointed frame is (source, fp) distinct grain —
        # fingerprint-inventory-sized, never corpus-sized.
        .localCheckpoint()
    )
    tot = sf.groupBy("source").agg(F.count("*").alias("n_fp"))
    a, b = sf.alias("a"), sf.alias("b")
    ov = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    ta = F.broadcast(
        tot.select(F.col("source").alias("src_a"), F.col("n_fp").alias("n_fp_a"))
    )
    tb = F.broadcast(
        tot.select(F.col("source").alias("src_b"), F.col("n_fp").alias("n_fp_b"))
    )
    return (
        ov.join(ta, "src_a")
        .join(tb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_fp_a") + F.col("n_fp_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Readability scoring (L4s) — Flesch-style reading ease per document
# from words-per-sentence and characters-per-word (the syllable proxy
# that needs no dictionary): the curation feature separating prose from
# listings/code. All counts are exact integers from one expression pass
# (no explode); the score is arithmetic on exact-integer ratios —
# identical doubles both engines.
# ---------------------------------------------------------------------------
@query(
    "q228_readability",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(GREATEST(len(string_split(text, '.')) - 1, 1) AS BIGINT)
               AS n_sents,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars2
      FROM documents
    )
    SELECT doc_id, n_words, n_sents,
           CAST(n_words AS DOUBLE) / n_sents AS words_per_sent,
           CAST(n_chars2 AS DOUBLE) / n_words AS chars_per_word,
           206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
             - 84.6 * ((CAST(n_chars2 AS DOUBLE) / n_words) / 3.0)
             AS flesch_proxy
    FROM t
    """,
)
def q228_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability proxy per document (chars-per-word / 3
    standing in for syllables-per-word)."""
    n_words = F.size(F.split("text", " ")).cast("bigint")
    n_sents = F.greatest(
        F.size(F.split("text", "\\.")) - 1, F.lit(1)
    ).cast("bigint")
    n_chars2 = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "bigint"
    )
    t = spark.table("documents").select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_chars2.alias("n_chars2"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sents")
    cpw = F.col("n_chars2").cast("double") / F.col("n_words")
    return t.select(
        "doc_id",
        "n_words",
        "n_sents",
        wps.alias("words_per_sent"),
        cpw.alias("chars_per_word"),
        (
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * (cpw / 3.0)
        ).alias("flesch_proxy"),
    )
