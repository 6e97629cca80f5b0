"""Distributed BPE tokenizer training (round 9) — the byte-pair-encoding
merge loop of Sennrich, Haddow & Birch (2016, "Neural Machine Translation
of Rare Words with Subword Units"), re-expressed Spark-first.

Reference parity: the upstream client (``pandas_td``) has no tokenizer
surface — this is north-star §2.10 territory (SURVEY.md: training-data
pipeline operators). The algorithm is the public word-frequency BPE:

1. collapse the corpus to a (word, count) table — at 100 TB the distinct
   vocabulary is orders of magnitude smaller than the token stream, and
   every later round runs at WORD grain, not corpus grain;
2. per merge round: count adjacent symbol pairs weighted by word count
   (explode → map-side partial agg), take the argmax pair, and rewrite
   every word by merging that pair greedily left-to-right.

Spark-first mechanics (the part that matters at scale):

- **Symbol strings, not arrays.** A word's segmentation rides as a
  marker-delimited string (``"~d ~a ~t ~a"``): applying a merge is then
  ONE JVM ``replace`` (left-to-right, non-overlapping — exactly greedy
  BPE application) instead of a per-row Python loop. The ``~`` marker
  makes symbol boundaries unambiguous, so a pattern can never match
  inside a longer symbol.
- **Model-grain driver fetches only** (the kmeans-centroid precedent):
  each round fetches exactly ONE (pair, count) row — the argmax — and
  folds it back as a literal into the next round's ``replace``. A
  fully-lazy 8-round chain was A/B-rejected: each round references the
  previous frame twice (pair aggregate + rewrite), so Catalyst's TREE
  plan grows ~3^rounds and the analyzed plan alone OOMs the driver at 8
  rounds. Per-round ``persist`` keeps round r+1's job incremental over
  round r's cache; everything is unpersisted before returning (the
  merge table is model state, already on the driver).
- **Determinism.** Ties break on (count DESC, pair ASC); both engines
  compare the identical marked-pair strings, so a DuckDB oracle can
  unroll the same rounds as CTEs and hash-match the merge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["words_with_counts", "bpe_train"]

#: symbol-boundary marker: prefixed to every symbol, AND every word
#: string carries one trailing space, so a merge pattern searched as
#: "~a ~b " is anchored at BOTH ends — "~" stops a match starting
#: mid-symbol, the trailing space stops the rhs matching a strict
#: PREFIX of a longer symbol ("~c ~a " must not rewrite "~c ~ab ").
#: Corpus words are filtered to [a-z]+, which can never contain the
#: marker or a space.
MARK = "~"


def words_with_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus → (word, n) frequency table with each word pre-segmented
    into marked single-character symbols plus the trailing-space
    anchor (``"~d ~a ~t ~a "``). One explode + one word-grain
    aggregate; everything downstream runs at vocabulary grain."""
    w = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    marked = F.concat(
        F.lit(MARK), F.concat_ws(" " + MARK, F.split("w", "")), F.lit(" ")
    )
    return w.select(marked.alias("word"), "n")


def bpe_train(words: DataFrame, n_merges: int) -> DataFrame:
    """Run ``n_merges`` BPE rounds over a marked (word, n) table; returns
    the merge table ``(rank, lhs, rhs, merged, n_pair)`` ordered by rank
    (fewer rows if the vocabulary merges out early). One vocabulary-grain
    aggregation job per round; the only driver traffic is the 1-row
    argmax per round."""
    spark = words.sparkSession
    cached: list[DataFrame] = []
    cur = words.persist()
    cached.append(cur)
    rows: list[tuple] = []
    for r in range(1, n_merges + 1):
        syms = F.split(F.trim("word"), " ")
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(syms, i), F.element_at(syms, i + 1)
            ),
        )
        top = (
            # fully-merged single-symbol words have no pairs (and Spark's
            # sequence(1, 0) would run DESCENDING) — they stay in `cur`
            # but contribute nothing to the count
            cur.where(F.size(syms) >= 2)
            .select(F.explode(pairs).alias("pair"), "n")
            .groupBy("pair")
            .agg(F.sum("n").alias("n_pair"))
            .orderBy(F.desc("n_pair"), F.asc("pair"))
            .limit(1)
            .first()
        )
        if top is None:
            break
        pair = top["pair"]
        merged = pair.replace(" " + MARK, "")
        lhs, rhs = (s.replace(MARK, "") for s in pair.split(" "))
        rows.append((r, lhs, rhs, merged.replace(MARK, ""), int(top["n_pair"])))
        if r < n_merges:
            # greedy left-to-right merge application = one JVM string
            # replace of the literal argmax pair; the trailing space in
            # BOTH pattern and replacement anchors the rhs symbol's end
            # (every symbol, including the word's last, is followed by
            # " " or the trailing anchor — never end-of-string)
            nxt = cur.select(
                F.replace(
                    "word", F.lit(pair + " "), F.lit(merged + " ")
                ).alias("word"),
                "n",
            ).persist()
            cached.append(nxt)
            cur = nxt
    for df in cached:
        df.unpersist(False)
    return spark.createDataFrame(
        rows, "rank bigint, lhs string, rhs string, merged string, n_pair bigint"
    )
