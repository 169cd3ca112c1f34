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
