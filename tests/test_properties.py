"""Property-based checks (hypothesis) of merge/dedup semantics against
straight-Python reference models. Few examples, tiny frames — each
example round-trips through Spark."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mydatalake_spark.operators.dedup import dedup_latest
from mydatalake_spark.operators.merge import merge_upsert

KEYS = st.integers(min_value=0, max_value=5)
TS = st.integers(min_value=0, max_value=9)
VAL = st.integers(min_value=0, max_value=99)

ROWS = st.lists(st.tuples(KEYS, TS, VAL), min_size=0, max_size=12)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, ts long, v long") if rows else \
        spark.createDataFrame([], "k long, ts long, v long")


def _model_merge(target, source):
    """Python model: dedup source latest-wins (ties → min v), then
    per key source wins iff s.ts >= t.ts."""
    src = {}
    for k, ts, v in source:
        cur = src.get(k)
        if cur is None or ts > cur[0] or (ts == cur[0] and v < cur[1]):
            src[k] = (ts, v)
    tgt = {}
    for k, ts, v in target:
        tgt[k] = (ts, v)
    out = dict(tgt)
    for k, (ts, v) in src.items():
        if k not in tgt or ts >= tgt[k][0]:
            out[k] = (ts, v)
    return {(k, ts, v) for k, (ts, v) in out.items()}


@given(target=ROWS, source=ROWS)
@settings(**_SETTINGS)
def test_merge_matches_model(spark, target, source):
    # make target keys unique (tables have unique PKs): keep latest
    tgt = list({k: (k, ts, v) for k, ts, v in sorted(target)}.values())
    out = merge_upsert(
        _df(spark, tgt), _df(spark, source), ["k"], "ts", tiebreakers=["v"]
    )
    got = {(r.k, r.ts, r.v) for r in out.collect()}
    assert got == _model_merge(tgt, source)


@given(target=ROWS, source=ROWS)
@settings(**_SETTINGS)
def test_merge_is_idempotent(spark, target, source):
    tgt = list({k: (k, ts, v) for k, ts, v in sorted(target)}.values())
    once = merge_upsert(
        _df(spark, tgt), _df(spark, source), ["k"], "ts", tiebreakers=["v"]
    )
    twice = merge_upsert(once, _df(spark, source), ["k"], "ts", tiebreakers=["v"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_dedup_latest_keeps_max_ts_min_tiebreak(spark, rows):
    out = dedup_latest(_df(spark, rows), ["k"], ["ts"], tiebreakers=["v"])
    got = {(r.k, r.ts, r.v) for r in out.collect()}
    model = {}
    for k, ts, v in rows:
        cur = model.get(k)
        if cur is None or ts > cur[0] or (ts == cur[0] and v < cur[1]):
            model[k] = (ts, v)
    assert got == {(k, ts, v) for k, (ts, v) in model.items()}


# -------------------------------------------------- round-4 operator models

def _items_df(spark, items):
    if items:
        return spark.createDataFrame([(i,) for i in items], "item string")
    return spark.createDataFrame([], "item string")


@given(
    items=st.lists(
        st.sampled_from([f"w{i}" for i in range(8)]), min_size=1, max_size=60
    ),
    frac=st.sampled_from([0.05, 0.1, 0.25, 0.5]),
)
@settings(**_SETTINGS)
def test_heavy_hitters_matches_naive_model(spark, items, frac):
    import math

    from mydatalake_spark.operators.heavyhitters import heavy_hitters

    df = _items_df(spark, items).repartition(3)
    got = {
        (r.token, r.cnt)
        for r in heavy_hitters(df, "item", threshold_frac=frac).collect()
    }
    n = len(items)
    thr = math.ceil(n * frac)
    from collections import Counter

    want = {(t, c) for t, c in Counter(items).items() if c >= thr}
    assert got == want


@given(
    changes=st.lists(
        st.tuples(
            st.integers(0, 2),          # key
            st.integers(0, 9),          # ts
            st.sampled_from(["a", "b"]),  # state
        ),
        min_size=1, max_size=12,
    )
)
@settings(**_SETTINGS)
def test_scd2_matches_run_length_model(spark, changes):
    from mydatalake_spark.operators.scd2 import scd2_build

    # unique change ids as the tiebreak
    rows = [(k, ts, v, i) for i, (k, ts, v) in enumerate(changes)]
    df = spark.createDataFrame(rows, "k long, ts long, v string, cid long")
    out = scd2_build(df, key="k", ts="ts", attrs=["v"], tiebreak="cid")
    got = {
        (r.k, r.v, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in out.collect()
    }

    want = set()
    bykey: dict = {}
    for k, ts, v, cid in sorted(rows, key=lambda r: (r[0], r[1], r[3])):
        bykey.setdefault(k, []).append((ts, v))
    for k, seq in bykey.items():
        runs = [seq[0]]
        for ts, v in seq[1:]:
            if v != runs[-1][1]:
                runs.append((ts, v))
        for i, (ts, v) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            want.add((k, v, ts, nxt, i + 1, nxt is None))
    assert got == want


# -------------------------------------------------- snapshot diff/apply

from mydatalake_spark.operators.diff import apply_snapshot_diff, snapshot_diff

SNAP = st.dictionaries(
    KEYS, st.tuples(st.one_of(st.none(), VAL), st.one_of(st.none(), VAL)),
    max_size=8,
)


def _snap_df(spark, snap):
    rows = [(k, a, b) for k, (a, b) in snap.items()]
    return spark.createDataFrame(rows, "k long, a long, b long") if rows else \
        spark.createDataFrame([], "k long, a long, b long")


@given(old=SNAP, new=SNAP)
@settings(**_SETTINGS)
def test_diff_matches_set_model(spark, old, new):
    got = {
        r.k: (r.op, tuple(r.changed_cols))
        for r in snapshot_diff(
            _snap_df(spark, old), _snap_df(spark, new), ["k"]
        ).collect()
    }
    expect = {}
    for k in set(old) | set(new):
        if k not in new:
            expect[k] = ("delete", ())
        elif k not in old:
            expect[k] = ("insert", ())
        else:
            chg = tuple(
                c for c, i in (("a", 0), ("b", 1)) if old[k][i] != new[k][i]
            )
            if chg:
                expect[k] = ("update", chg)
    assert got == expect


@given(old=SNAP, new=SNAP)
@settings(**_SETTINGS)
def test_diff_apply_roundtrip_reproduces_new(spark, old, new):
    old_df, new_df = _snap_df(spark, old), _snap_df(spark, new)
    diff = snapshot_diff(old_df, new_df, ["k"], include_new_values=True)
    rebuilt = {
        (r.k, r.a, r.b)
        for r in apply_snapshot_diff(old_df, diff, ["k"]).collect()
    }
    assert rebuilt == {(k, a, b) for k, (a, b) in new.items()}


# ------------------------------------------------ triangles vs naive

from itertools import combinations

from mydatalake_spark.operators.graphs import triangle_counts

EDGE = st.tuples(
    st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)
)


@given(edges=st.lists(EDGE, min_size=0, max_size=20))
@settings(**_SETTINGS)
def test_triangle_counts_match_naive_model(spark, edges):
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    nodes = {n for e in canon for n in e}
    expect = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if {(a, b), (a, c), (b, c)} <= canon:
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    df = (
        spark.createDataFrame(list(canon), "src long, dst long")
        if canon
        else spark.createDataFrame([], "src long, dst long")
    )
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == expect


# --------------------------------------------- transition matrix model

from mydatalake_spark.operators.sequences import transition_matrix

SEQS = st.dictionaries(
    st.integers(min_value=0, max_value=3),
    st.lists(st.sampled_from("AB"), min_size=0, max_size=6),
    max_size=4,
)


@given(seqs=SEQS)
@settings(**_SETTINGS)
def test_transition_matrix_matches_model_and_rows_sum_to_one(spark, seqs):
    rows = [
        (u, i, s) for u, states in seqs.items() for i, s in enumerate(states)
    ]
    df = (
        spark.createDataFrame(rows, "u long, seq long, s string")
        if rows
        else spark.createDataFrame([], "u long, seq long, s string")
    )
    got = {
        (r.prev_state, r.next_state): r.n
        for r in transition_matrix(df, "u", ["seq"], "s").collect()
    }
    expect = {}
    for states in seqs.values():
        for p, n in zip(states, states[1:]):
            expect[(p, n)] = expect.get((p, n), 0) + 1
    assert got == expect
    # probabilities row-normalize exactly
    out = transition_matrix(df, "u", ["seq"], "s").collect()
    by_prev = {}
    for r in out:
        by_prev.setdefault(r.prev_state, []).append((r.n, r.p))
    for rows_p in by_prev.values():
        tot = sum(n for n, _ in rows_p)
        for n, p in rows_p:
            assert abs(p - round(n / tot, 6)) < 1e-12


# ------------------------------------------------- codec round-trips

import numpy as np

from mydatalake_spark.functions.audiocodec import decode_wav, encode_wav
from mydatalake_spark.functions.imagecodec import (
    decode_image,
    encode_bmp,
    encode_ppm,
)

DIMS = st.tuples(
    st.integers(min_value=1, max_value=9), st.integers(min_value=1, max_value=9)
)


@given(dims=DIMS, seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(**_SETTINGS)
def test_image_codecs_round_trip_bit_exact(dims, seed):
    h, w = dims
    arr = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    assert np.array_equal(decode_image(encode_ppm(arr)), arr)
    assert np.array_equal(decode_image(encode_bmp(arr)), arr)


@given(
    n=st.integers(min_value=1, max_value=500),
    ch=st.integers(min_value=1, max_value=2),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_wav_round_trip_within_quantization(n, ch, seed):
    rng = np.random.RandomState(seed)
    arr = (rng.rand(n, ch) * 2 - 1).astype(np.float32)
    out, sr = decode_wav(encode_wav(arr, 8000))
    assert sr == 8000 and out.shape == (n, ch)
    assert float(np.max(np.abs(out - arr))) <= 1.0 / 32768 + 1e-6


@given(
    items=st.lists(
        st.sampled_from([f"w{i}" for i in range(6)]), min_size=1,
        max_size=50,
    ),
    min_count=st.sampled_from([1, 2, 4]),
)
@settings(**_SETTINGS)
def test_heavy_hitters_min_count_matches_naive_model(
    spark, items, min_count
):
    from collections import Counter

    from mydatalake_spark.operators.heavyhitters import heavy_hitters

    df = _items_df(spark, items).repartition(3)
    got = {
        (r.token, r.cnt)
        for r in heavy_hitters(
            df, "item", min_count=min_count, capacity=64
        ).collect()
    }
    want = {
        (t, c) for t, c in Counter(items).items() if c >= min_count
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 6), st.sampled_from(list("abcd"))),
        min_size=1, max_size=30,
    ),
)
@settings(**_SETTINGS)
def test_association_rules_matches_naive_model(spark, rows):
    from itertools import combinations

    from mydatalake_spark.caching import release
    from mydatalake_spark.operators.market import association_rules

    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(df, "basket", "item", min_pair_count=1)
    got = {
        (r.item_a, r.item_b): (r.n_pair, r.support, r.lift)
        for r in out.collect()
    }
    release(out)

    baskets: dict = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    n_baskets = len(baskets)
    item_counts: dict = {}
    pair_counts: dict = {}
    for items in baskets.values():
        for i in items:
            item_counts[i] = item_counts.get(i, 0) + 1
        for a, b in combinations(sorted(items), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    want = {
        p: (
            c,
            c / n_baskets,
            (c * n_baskets) / (item_counts[p[0]] * item_counts[p[1]]),
        )
        for p, c in pair_counts.items()
    }
    assert got == want


def test_rank_tests_invariant_under_monotone_transform(spark):
    """Mann-Whitney and KS depend only on ranks: applying a strictly
    increasing transform (exp) to every value must leave U, z, and D
    unchanged — a property OLS-style tests do NOT have."""
    import math

    from pyspark.sql import functions as F

    from mydatalake_spark.functions.stats import ks_2samp, mann_whitney_u

    rows = [(i % 2, float(v)) for i, v in enumerate(
        [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3])]
    df = spark.createDataFrame(rows, "variant int, v double")
    tdf = df.select("variant", F.exp("v").alias("v"))

    mw1 = mann_whitney_u(df, F.col("variant"), "v").collect()[0]
    mw2 = mann_whitney_u(tdf, F.col("variant"), "v").collect()[0]
    assert (mw1.u_stat, mw1.z_stat, mw1.rank_biserial) == (
        mw2.u_stat, mw2.z_stat, mw2.rank_biserial)

    ks1 = ks_2samp(df, F.col("variant"), "v").collect()[0]
    ks2 = ks_2samp(tdf, F.col("variant"), "v").collect()[0]
    assert ks1.d_stat == ks2.d_stat


def test_emd_scales_linearly_and_triangle(spark):
    """W1 is a metric: scaling values by c scales W1 by c; swapping
    sides leaves it unchanged (symmetry)."""
    from pyspark.sql import functions as F

    from mydatalake_spark.functions.stats import emd_1d

    rows = [(i % 2, float(v)) for i, v in enumerate(
        [2, 7, 1, 8, 2, 8, 1, 8, 2, 8, 4, 5, 9, 0, 4, 5])]
    df = spark.createDataFrame(rows, "variant int, v double")
    base = emd_1d(df, F.col("variant"), "v").collect()[0].emd
    scaled = emd_1d(
        df.select("variant", (F.col("v") * 3).alias("v")),
        F.col("variant"), "v",
    ).collect()[0].emd
    assert abs(scaled - 3 * base) < 1e-9
    swapped = emd_1d(df, 1 - F.col("variant"), "v").collect()[0].emd
    assert swapped == base


def test_psi_symmetry_and_zero_on_identical(spark):
    """PSI(p, q) == PSI(q, p) (the formula is antisymmetric in sign of
    each factor, so the product is symmetric) and 0 when p == q."""
    from pyspark.sql import functions as F

    from mydatalake_spark.functions.stats import (
        population_stability_index,
    )

    rows = [(i % 2, float(i // 2)) for i in range(200)]
    df = spark.createDataFrame(rows, "g int, v double")
    a = population_stability_index(df, F.col("g"), "v").collect()[0]
    assert a.psi == 0.0
    rows2 = [(0, float(v)) for v in range(50)] + [
        (1, float(v) * 2) for v in range(50)]
    df2 = spark.createDataFrame(rows2, "g int, v double")
    p1 = population_stability_index(df2, F.col("g"), "v").collect()[0]
    p2 = population_stability_index(
        df2, 1 - F.col("g"), "v").collect()[0]
    assert p1.psi == p2.psi and p1.psi > 0


@given(target=ROWS, source=ROWS)
@settings(**_SETTINGS)
def test_merge_bloomed_matches_plain_merge(spark, target, source):
    """merge_upsert_bloomed is an EXECUTION strategy, not a semantics
    change: for any (target, source) it must equal merge_upsert — the
    bloom-miss bypass loses no row, false positives change nothing.
    A deliberately tiny 64-bit filter keeps the fp rate high so the
    property actually exercises the hit-branch keep path."""
    from mydatalake_spark.operators.merge import merge_upsert_bloomed

    tgt = list({k: (k, ts, v) for k, ts, v in sorted(target)}.values())
    plain = merge_upsert(
        _df(spark, tgt), _df(spark, source), ["k"], "ts", tiebreakers=["v"]
    )
    bloomed = merge_upsert_bloomed(
        _df(spark, tgt), _df(spark, source), ["k"], "ts",
        tiebreakers=["v"], m_bits=64, k=2,
    )
    got_p = {(r.k, r.ts, r.v) for r in plain.collect()}
    got_b = {(r.k, r.ts, r.v) for r in bloomed.collect()}
    assert got_b == got_p


# --- row-level DML semantics (r10, operators/dml.py) -----------------
# Property: against a Python model over random tiny frames,
#   DELETE keeps exactly rows where cond is not TRUE (NULL keeps), and
#   UPDATE applies every SET to exactly the cond-TRUE rows, computed
#   from the PRE-update row.
# Conditions exercise the ternary: v-threshold predicates over a
# nullable column. Both the whole-table and the partitioned path must
# agree with the model (and with each other).

DMLV = st.one_of(st.none(), st.integers(min_value=0, max_value=9))
DML_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.sampled_from(["a", "b"]), DMLV),
    min_size=1,
    max_size=10,
)


def _dml_df(spark, rows):
    return spark.createDataFrame(rows, "id long, part string, v long")


@given(rows=DML_ROWS, thresh=st.integers(0, 9))
@settings(**_SETTINGS)
def test_delete_where_matches_python_model(spark, tmp_path_factory, rows, thresh):
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.operators.dml import delete_where

    kept = [(i, p, v) for (i, p, v) in rows if not (v is not None and v > thresh)]
    if not kept:
        return  # delete-everything is refused by contract, tested elsewhere
    for pcols in (None, ["part"]):
        wh = tmp_path_factory.mktemp("dmlprop")
        cat = Catalog(spark, str(wh))
        cat.overwrite(
            _dml_df(spark, rows), "t.t.t",
            partition_by=pcols,
        )
        n = delete_where(cat, "t.t.t", f"v > {thresh}", partition_cols=pcols)
        assert n == len(rows) - len(kept)
        from collections import Counter

        got = Counter((r.id, r.part, r.v) for r in cat.read("t.t.t").collect())
        assert got == Counter(kept)


@given(rows=DML_ROWS, thresh=st.integers(0, 9))
@settings(**_SETTINGS)
def test_update_where_matches_python_model(spark, tmp_path_factory, rows, thresh):
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.operators.dml import update_where

    model = [
        (i, p, (v or 0) + 100 if (v is not None and v > thresh) else v)
        for (i, p, v) in rows
    ]
    for pcols in (None, ["part"]):
        wh = tmp_path_factory.mktemp("dmlprop")
        cat = Catalog(spark, str(wh))
        cat.overwrite(_dml_df(spark, rows), "t.t.t", partition_by=pcols)
        n = update_where(
            cat, "t.t.t", {"v": "v + 100"}, f"v > {thresh}",
            partition_cols=pcols,
        )
        assert n == sum(1 for (_, _, v) in rows if v is not None and v > thresh)
        from collections import Counter

        got = Counter((r.id, r.part, r.v) for r in cat.read("t.t.t").collect())
        assert got == Counter(model)


# ---------------------------------------------- round-11 merge_apply model

# target rows keyed uniquely; source rows keyed uniquely (merge_apply
# refuses duplicate source keys by contract, so the generator enforces
# it rather than wasting examples on the refusal path)
_UNIQ_ROWS = st.lists(
    st.tuples(KEYS, VAL), min_size=0, max_size=8,
    unique_by=lambda r: r[0],
)


def _model_merge_apply(target, source, delete_above, insert_below):
    """Python model of the general clause set used below:
    WHEN MATCHED AND s.v > delete_above THEN DELETE
    WHEN MATCHED THEN UPDATE SET v = s.v + 1
    WHEN NOT MATCHED AND s.v < insert_below THEN INSERT (k, v) VALUES (s.k, s.v)
    WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1
    (first matching clause wins; unmatched source rows NOT inserted
    unless their condition holds; target-only rows take the by-source
    update)."""
    src = {k: v for k, v in source}
    out = {}
    for k, v in target:
        if k in src:
            sv = src[k]
            if sv > delete_above:
                continue  # DELETE
            out[k] = sv + 1  # UPDATE
        else:
            out[k] = -1  # NOT MATCHED BY SOURCE
    for k, v in src.items():
        if k not in dict(target) and v < insert_below:
            out[k] = v  # conditional INSERT
    return out


@given(target=_UNIQ_ROWS, source=_UNIQ_ROWS,
       delete_above=VAL, insert_below=VAL)
@settings(**_SETTINGS)
def test_merge_apply_matches_model(
    spark, target, source, delete_above, insert_below
):
    from mydatalake_spark.operators.merge_clauses import (
        MatchedClause,
        NotMatchedBySourceClause,
        NotMatchedClause,
        merge_apply,
    )

    def df(rows):
        return (
            spark.createDataFrame(rows, "k long, v long")
            if rows
            else spark.createDataFrame([], "k long, v long")
        )

    got_rows = merge_apply(
        df(target),
        df(source),
        on=["k"],
        matched=[
            MatchedClause(
                condition=f"__s_v > {delete_above}", sets=None
            ),
            MatchedClause(sets={"v": "__s_v + 1"}),
        ],
        not_matched=[
            NotMatchedClause(
                condition=f"__s_v < {insert_below}",
                values={"k": "__s_k", "v": "__s_v"},
            )
        ],
        not_matched_by_source=[
            NotMatchedBySourceClause(sets={"v": "-1"})
        ],
    ).collect()
    got = {r.k: r.v for r in got_rows}
    assert len(got) == len(got_rows)  # keys stay unique
    assert got == _model_merge_apply(
        target, source, delete_above, insert_below
    )


@given(
    target=st.lists(
        st.tuples(KEYS, st.integers(min_value=0, max_value=2), VAL),
        min_size=1, max_size=10,
    ),
    source=st.lists(
        st.tuples(KEYS, st.integers(min_value=0, max_value=2), VAL),
        min_size=1, max_size=8,
    ),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_merge_partitioned_hint_equals_probe(
    spark, tmp_path_factory, target, source
):
    """touched_hint (layout-derived) path ≡ distinct-probe path for
    arbitrary partitioned changesets — including hints that
    OVERESTIMATE (all buckets), the soundness contract."""
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.operators.merge_clauses import (
        MatchedClause,
        NotMatchedClause,
        merge_apply_partitioned,
    )

    # unique target keys (latest wins like the other models)
    tgt = {}
    for k, b, v in target:
        tgt[k] = (k, b, v)
    target = list(tgt.values())
    src = {}
    for k, b, v in source:
        src[k] = (k, b, v)
    source = list(src.values())

    def build(cat_dir):
        cat = Catalog(spark, str(cat_dir))
        cat.overwrite(
            spark.createDataFrame(target, "k long, bucket long, v long"),
            "s.t.t",
            partition_by=["bucket"],
        )
        return cat

    clauses = dict(
        matched=[MatchedClause(sets={"v": "__s_v"})],
        not_matched=[NotMatchedClause(insert_all=True)],
    )
    base = tmp_path_factory.mktemp("hintprop")
    cat_a = build(base / "a")
    cat_b = build(base / "b")
    sdf = spark.createDataFrame(source, "k long, bucket long, v long")
    merge_apply_partitioned(
        cat_a, "s.t.t", sdf, [("k", "k"), ("bucket", "bucket")], **clauses
    )
    # overestimating hint: every bucket value 0..2 (superset is sound)
    merge_apply_partitioned(
        cat_b, "s.t.t", sdf, [("k", "k"), ("bucket", "bucket")],
        touched_hint=[(0,), (1,), (2,)], **clauses
    )
    rows_a = sorted(map(tuple, cat_a.read("s.t.t").collect()))
    rows_b = sorted(map(tuple, cat_b.read("s.t.t").collect()))
    assert rows_a == rows_b
