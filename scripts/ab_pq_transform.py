"""Interleaved A/B: HOF-transform codebook scoring vs the unrolled
per-code expression arrays (VERDICT r14 ask #3 — pq_recall's ~1.7 s of
driver-side plan build is dominated by the 256-entry ADC expression
tree; guide §7.2 duplicated/huge expression trees, §1.2 per-task work).

Variant under test: each subspace/centroid score array is ONE
``transform`` over a literal array of codebook entries (the fold lambda
appears once), instead of ``n_codes``/``n_centroids`` unrolled
aggregate-fold expressions. Arithmetic is bit-identical: same zip_with
fold, same element order, same literals, same start value.

Procedure per query: assert baseline and variant results are IDENTICAL
(sorted collect), then interleaved off/on/off/on timing, min-of-N per
side, noop sink.

Usage: python scripts/ab_pq_transform.py [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mydatalake_spark.caching import release, release_all  # noqa: E402
from mydatalake_spark.session import get_spark  # noqa: E402
from mydatalake_spark.similarity import pq as pq_mod  # noqa: E402
from mydatalake_spark.similarity import search as search_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))

QUERIES = [
    # the two headline queries whose plans embed the unrolled
    # codebook/centroid score arrays (semantic_dedup builds its own
    # Column-based score array — separate experiment if this wins)
    "pq_recall_embeddings",
    "similarity_ivf",
]

# ---- transform-based variants (candidate implementations) ----------


def _centroid_scores_expr_tf(centroids):
    def scores(vec_name: str) -> "F.Column":
        if not isinstance(vec_name, str):
            raise TypeError(
                "_centroid_scores_expr needs a plain column name "
                f"(str), got {type(vec_name).__name__}"
            )
        books = ", ".join(
            "array({})".format(", ".join(f"{float(x)!r}D" for x in c))
            for c in centroids
        )
        return F.expr(
            f"transform(array({books}), c -> "
            f"aggregate(zip_with(`{vec_name}`, c, "
            "(x, y) -> cast(x as double) * y), "
            "cast(0.0 as double), (acc, x) -> acc + x))"
        )

    return scores


def _pq_subspace_scores_tf(codebooks, vec_expr: str, with_bias: bool):
    """Per-subspace score arrays over ``vec_expr`` (an already-unit
    column name like __u__/__qu__): one transform per subspace."""
    subdim = len(codebooks[0][0])
    out = []
    for j, book in enumerate(codebooks):
        start = j * subdim + 1
        if with_bias:
            entries = ", ".join(
                "named_struct('c', array({arr}), 'b', "
                "cast({bias!r} as double))".format(
                    arr=", ".join(f"{float(x)!r}D" for x in c),
                    bias=-float((c * c).sum()) / 2.0,
                )
                for c in book
            )
            sa = F.expr(
                f"transform(array({entries}), e -> "
                f"aggregate(zip_with(slice({vec_expr}, {start}, "
                f"{subdim}), e.c, (x, y) -> x * y), e.b, "
                "(acc, x) -> acc + x))"
            )
        else:
            entries = ", ".join(
                "array({})".format(", ".join(f"{float(x)!r}D" for x in c))
                for c in book
            )
            sa = F.expr(
                f"transform(array({entries}), c -> "
                f"aggregate(zip_with(slice({vec_expr}, {start}, "
                f"{subdim}), c, (x, y) -> x * y), "
                "cast(0.0 as double), (acc, x) -> acc + x))"
            )
        out.append(sa)
    return out


def pq_encode_tf(
    df, codebooks, id_col="vec_id", vec_col="embedding",
    codes_col="codes", keep_cols=None,
):
    unit = pq_mod._unit_expr(vec_col)
    sub_cols = []
    for sa in _pq_subspace_scores_tf(codebooks, "__u__", with_bias=True):
        sub_cols.append(
            (F.array_position(sa, F.array_max(sa)) - 1).cast("int")
        )
    return (
        df.withColumn("__u__", F.expr(unit))
        .select(
            F.col(id_col),
            *[F.col(c) for c in (keep_cols or [])],
            F.array(*sub_cols).alias(codes_col),
        )
    )


def _query_adc_tables_tf(queries, codebooks, id_col, vec_col, extra=()):
    unit = pq_mod._unit_expr(vec_col)
    tables = _pq_subspace_scores_tf(codebooks, "__qu__", with_bias=False)
    table_cols = [sa.alias(f"__t{j}__") for j, sa in enumerate(tables)]
    return queries.withColumn("__qu__", F.expr(unit)).select(
        F.col(id_col).alias("query_id"), *extra, *table_cols
    )


# ---- harness -------------------------------------------------------

ORIG = {
    "pq_encode": pq_mod.pq_encode,
    "_query_adc_tables": pq_mod._query_adc_tables,
    "_centroid_scores_expr": search_mod._centroid_scores_expr,
}


def set_variant(on: bool) -> None:
    if on:
        pq_mod.pq_encode = pq_encode_tf
        pq_mod._query_adc_tables = _query_adc_tables_tf
        search_mod._centroid_scores_expr = _centroid_scores_expr_tf
    else:
        pq_mod.pq_encode = ORIG["pq_encode"]
        pq_mod._query_adc_tables = ORIG["_query_adc_tables"]
        search_mod._centroid_scores_expr = ORIG["_centroid_scores_expr"]


def main():
    names = sys.argv[1:] or QUERIES
    spark = get_spark(
        app_name="ab-pq-transform",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = {}
    for name in names:
        fn = qs[name]

        def rows(on):
            set_variant(on)
            try:
                df = fn(spark, SF_DIR)
                got = sorted(map(tuple, df.collect()))
                release(df)
                release_all()
                return got
            finally:
                set_variant(False)

        base, var = rows(False), rows(True)
        assert base == var, f"{name}: variant rows DIVERGED"
        print(f"{name}: rows identical ({len(base)})", flush=True)

        def timed(on):
            set_variant(on)
            try:
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                release(df)
                release_all()
                return t1 - t0, t2 - t0
            finally:
                set_variant(False)

        timed(False)
        timed(True)  # warm both variants
        b_build = b_tot = v_build = v_tot = None
        for _ in range(REPS):
            bb, bt = timed(False)
            vb, vt = timed(True)
            b_build = bb if b_build is None else min(b_build, bb)
            b_tot = bt if b_tot is None else min(b_tot, bt)
            v_build = vb if v_build is None else min(v_build, vb)
            v_tot = vt if v_tot is None else min(v_tot, vt)
        out[name] = {
            "base_build": round(b_build, 3),
            "base_total": round(b_tot, 3),
            "tf_build": round(v_build, 3),
            "tf_total": round(v_tot, 3),
            "ratio_total": round(v_tot / max(b_tot, 1e-9), 3),
            "ratio_build": round(v_build / max(b_build, 1e-9), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out}), flush=True)


if __name__ == "__main__":
    main()
