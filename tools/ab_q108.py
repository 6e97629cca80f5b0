"""A/B harness for q108 gopher-verdict variants (round-10 item 2).

Variants:
  A  current in-tree row-local string _gram_stats
  B  fraction-direct finish (struct -> scalar inside the aggregate)
  D  hashed-gram row-local: xxhash64 over token windows, long sort
  C  single-explode tagged partial-agg (q85 family)

Run: python tools/ab_q108.py  (sf0.1, warm = min of runs 2-3, cold = run 1)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandas_td_spark.engine.session import get_spark, spread
from pandas_td_spark.queries.curation import (
    _gram_stats,
    _ngrams,
    _words,
    q108_gopher_verdict,
)
from pandas_td_spark.sources.io import register_views

STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]


def base_cols(w):
    return [
        "doc_id",
        F.size(w).cast("bigint").alias("n_words"),
        (F.length(F.array_join(w, "")).cast("double") / F.size(w)).alias(
            "mean_word_len"
        ),
        (
            F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]"))).cast("double")
            / F.size(w)
        ).alias("alpha_word_frac"),
        F.size(F.filter(w, lambda x: F.lower(x).isin(STOP)))
        .cast("bigint")
        .alias("n_stopwords"),
    ]


def rules_select(j):
    rules = {
        "ok_word_count": F.col("n_words").between(50, 100000),
        "ok_mean_word_len": F.col("mean_word_len").between(3, 10),
        "ok_top_bigram": F.col("f2") <= 0.20,
        "ok_top_trigram": F.col("f3") <= 0.18,
        "ok_top_fourgram": F.col("f4") <= 0.16,
        "ok_dup_fivegram": F.col("f5") <= 0.15,
        "ok_alpha_words": F.col("alpha_word_frac") >= 0.80,
        "ok_stopwords": F.col("n_stopwords") >= 2,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return j.select(
        "doc_id", *[c.alias(n) for n, c in rules.items()], keep.alias("keep")
    )


# --- variant B: fraction-direct finish over string grams ----------------
def frac_direct(grams, dup: bool):
    zero = F.lit(0).cast("bigint")
    return F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            zero.alias("run"),
            zero.alias("mx"),
            zero.alias("nd"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
            .alias("run"),
            F.greatest(
                acc["mx"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("bigint")
                ),
            ).alias("mx"),
            F.when(x == acc["prev"], acc["nd"])
            .otherwise(acc["nd"] + 1)
            .alias("nd"),
        ),
        lambda acc: F.when(
            F.size(grams) > 0,
            (
                F.lit(1.0)
                - acc["nd"].cast("double") / F.size(grams).cast("double")
            )
            if dup
            else acc["mx"].cast("double") / F.size(grams).cast("double"),
        ).otherwise(F.lit(0.0)),
    )


def variant_B(spark, sf_dir):
    d = spread(spark.table("documents"))
    w = _words()
    j = d.select(
        *base_cols(w),
        *[
            frac_direct(_ngrams(w, n), dup=(n == 5)).alias(f"f{n}")
            for n in (2, 3, 4, 5)
        ],
    )
    return rules_select(j)


# --- variant D: hashed grams (long sort, no concat) ----------------------
def _hgrams(words, n: int):
    sz = F.size(words)
    return F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.xxhash64(
                *[F.element_at(words, i + k) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def frac_direct_long(grams, dup: bool):
    zero = F.lit(0).cast("bigint")
    return F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit(None).cast("bigint").alias("prev"),
            zero.alias("run"),
            zero.alias("mx"),
            zero.alias("nd"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
            .alias("run"),
            F.greatest(
                acc["mx"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("bigint")
                ),
            ).alias("mx"),
            F.when(x == acc["prev"], acc["nd"])
            .otherwise(acc["nd"] + 1)
            .alias("nd"),
        ),
        lambda acc: F.when(
            F.size(grams) > 0,
            (
                F.lit(1.0)
                - acc["nd"].cast("double") / F.size(grams).cast("double")
            )
            if dup
            else acc["mx"].cast("double") / F.size(grams).cast("double"),
        ).otherwise(F.lit(0.0)),
    )


def variant_D(spark, sf_dir):
    d = spread(spark.table("documents"))
    w = _words()
    j = d.select(
        *base_cols(w),
        *[
            frac_direct_long(_hgrams(w, n), dup=(n == 5)).alias(f"f{n}")
            for n in (2, 3, 4, 5)
        ],
    )
    return rules_select(j)


# --- variant C: single-explode tagged partial-agg ------------------------
def variant_C(spark, sf_dir):
    d = spread(spark.table("documents"))
    w = _words()
    base = d.select(*base_cols(w))
    def _tag(n):
        # single-param lambda: a 2-param transform lambda receives the
        # element INDEX as its second argument, shadowing a default-arg n
        return F.transform(
            _ngrams(w, n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
        )

    tagged = F.flatten(F.array(*[_tag(n) for n in (2, 3, 4, 5)]))
    ex = d.select("doc_id", F.explode(tagged).alias("t")).select(
        "doc_id", F.col("t.n").alias("n"), F.col("t.g").alias("g")
    )
    per_gram = ex.groupBy("doc_id", "n", "g").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("doc_id", "n").agg(
        F.max("c").alias("mx"),
        F.sum("c").alias("tot"),
        F.count("*").alias("nd"),
    )
    fr = per_doc.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(
                    F.col("n") == n,
                    (
                        F.lit(1.0)
                        - F.col("nd").cast("double")
                        / F.col("tot").cast("double")
                    )
                    if n == 5
                    else F.col("mx").cast("double")
                    / F.col("tot").cast("double"),
                )
            ).alias(f"f{n}")
            for n in (2, 3, 4, 5)
        ]
    )
    j = base.join(fr, "doc_id", "left").na.fill(
        {f"f{n}": 0.0 for n in (2, 3, 4, 5)}
    )
    return rules_select(j)


# --- variant E: single-explode partial-agg over HASHED grams -------------
def variant_E(spark, sf_dir):
    d = spread(spark.table("documents"))
    w = _words()
    base = d.select(*base_cols(w))

    def _tag(n):
        return F.transform(
            _hgrams(w, n),
            lambda h: F.struct(F.lit(n).alias("n"), h.alias("h")),
        )

    tagged = F.flatten(F.array(*[_tag(n) for n in (2, 3, 4, 5)]))
    ex = d.select("doc_id", F.explode(tagged).alias("t")).select(
        "doc_id", F.col("t.n").alias("n"), F.col("t.h").alias("h")
    )
    per_gram = ex.groupBy("doc_id", "n", "h").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("doc_id", "n").agg(
        F.max("c").alias("mx"),
        F.sum("c").alias("tot"),
        F.count("*").alias("nd"),
    )
    fr = per_doc.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(
                    F.col("n") == n,
                    (
                        F.lit(1.0)
                        - F.col("nd").cast("double")
                        / F.col("tot").cast("double")
                    )
                    if n == 5
                    else F.col("mx").cast("double")
                    / F.col("tot").cast("double"),
                )
            ).alias(f"f{n}")
            for n in (2, 3, 4, 5)
        ]
    )
    j = base.join(fr, "doc_id", "left").na.fill(
        {f"f{n}": 0.0 for n in (2, 3, 4, 5)}
    )
    return rules_select(j)


def main():
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_q108")
    register_views(spark, sf)
    spark.sql("select count(*) from lineitem").collect()
    variants = {
        "A_current": q108_gopher_verdict,
        "B_frac_direct": variant_B,
        "D_hashed": variant_D,
        "C_exploded": variant_C,
        "E_hashed_exploded": variant_E,
    }
    for name, fn in variants.items():
        times = []
        for i in range(3):
            t = time.time()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t, 3))
        print(name, "cold", times[0], "warm", min(times[1:]))
    # cross-check values agree (A vs D vs C) at this sf
    a = q108_gopher_verdict(spark, sf).orderBy("doc_id").toPandas()
    for name in (
        "B_frac_direct", "D_hashed", "C_exploded", "E_hashed_exploded"
    ):
        b = variants[name](spark, sf).orderBy("doc_id").toPandas()
        same = a.equals(b)
        print(name, "values_match:", same)


if __name__ == "__main__":
    main()
