"""Paragraph/segment-level exact dedup with document reassembly.

[extension] The CCNet / RefinedWeb pre-training step that exact-dedups
the corpus *below* document granularity: boilerplate paragraphs
(headers, license blocks, navigation chrome) repeat across millions of
pages while the documents containing them are unique, so document-level
dedup never removes them. The recipe: segment every document, hash each
segment, keep only the globally-first occurrence of each hash, then
reassemble documents from their surviving segments.

Spark-first shape, two keyed shuffles total:

1. segment via ``chunk_text`` (explode+substring — map-only, fused with
   the scan);
2. first-occurrence election: ``row_number() over (partition by
   segment-hash order by doc_id, chunk_id) = 1`` — ONE hash-partitioned
   shuffle. (No map-side window-group-limit here, deliberately: every
   segment row survives to the reassembly with its ``is_first`` verdict
   — the window trims nothing, it only elects.)
3. reassembly: group by document, sort surviving segments by offset,
   concatenate — the second shuffle, keyed on doc id.

Dropped-to-empty documents survive with ``kept_chunks = 0`` (the
survivor flag is carried into the aggregate instead of filtering rows
out beforehand), so the output is always one row per input document —
an invariant downstream curation joins rely on.

At 100 TB the segment-hash shuffle carries ``(hash, doc_id, chunk_id,
segment)``; hashes are uniformly distributed so there is no skew
beyond genuinely hot boilerplate segments, whose window sort is a
cheap per-key scan (one comparison per duplicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mydatalake_spark.functions.text import chunk_text


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 256,
) -> DataFrame:
    """Global first-occurrence dedup of non-overlapping ``size``-char
    segments, reassembled per document. Returns one row per input
    document: ``(id_col, total_chunks, kept_chunks, dedup_md5)`` where
    ``dedup_md5`` hashes the concatenation of surviving segments in
    offset order (md5 so the result is engine-portable and compact —
    callers that need the text itself use the same plan minus the
    hash)."""
    # NULL text would make chunk_text's sequence() null and the
    # explode would silently drop the document — breaking the
    # one-row-per-input-doc invariant. Treat null as empty.
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    chunks = chunk_text(df, text_col, size=size, stride=size)
    w = Window.partitionBy(F.md5("chunk")).orderBy(id_col, "chunk_id")
    flagged = chunks.withColumn(
        "is_first", F.row_number().over(w) == 1
    )
    kept_struct = F.when(
        F.col("is_first"), F.struct(F.col("chunk_id"), F.col("chunk"))
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("total_chunks"),
            F.sum(F.col("is_first").cast("long")).alias("kept_chunks"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x.getField("chunk"),
                    ),
                    "",
                )
            ).alias("dedup_md5"),
        )
    )


def boilerplate_strip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 256,
    max_df: int = 5,
) -> DataFrame:
    """Corpus-frequency boilerplate removal — the CCNet "common lines"
    pass, complementary to :func:`paragraph_dedup`: a segment occurring
    in MORE than ``max_df`` distinct documents is chrome/license/nav
    boilerplate and is stripped from EVERY document (first occurrence
    included — unlike dedup, where the first survives). Repeated-within
    -one-doc segments stay (df counts documents, not occurrences).

    Returns one row per input document:
    ``(id_col, total_chunks, kept_chunks, removed_chunks, clean_md5)``
    with ``clean_md5`` hashing the surviving segments in offset order.

    Plan shape: segment map-only (``chunk_text``), ONE groupBy on the
    segment hash producing the df table, ONE hash equi-join back (both
    sides keyed on the segment hash — co-partitioned, no extra
    shuffle), then the per-document reassembly groupBy. Boilerplate by
    definition has high df, so the df-table groupBy sees the heavy
    keys, but its combiner reduces them map-side to one row per
    (partition, hash) — the aggregation is skew-immune.
    """
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    chunks = chunk_text(df, text_col, size=size, stride=size).select(
        id_col, "chunk_id", "chunk", F.md5("chunk").alias("__h__")
    )
    freq = chunks.groupBy("__h__").agg(
        F.count_distinct(F.col(id_col)).alias("__df__")
    )
    flagged = chunks.join(freq, "__h__").withColumn(
        "__keep__", F.col("__df__") <= max_df
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("total_chunks"),
        F.sum(F.when(F.col("__keep__"), 1).otherwise(0))
        .cast("long")
        .alias("kept_chunks"),
        F.sum(F.when(~F.col("__keep__"), 1).otherwise(0))
        .cast("long")
        .alias("removed_chunks"),
        F.md5(
            F.coalesce(
                F.concat_ws(
                    "",
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep__"),
                                F.struct(
                                    F.col("chunk_id").alias("i"),
                                    F.col("chunk").alias("c"),
                                ),
                            )
                        )
                    ).getField("c"),
                ),
                F.lit(""),
            )
        ).alias("clean_md5"),
    )
