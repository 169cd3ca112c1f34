"""Keyed, time-ordered MERGE upsert (CDC) without Delta Lake.

Reference parity: ``IngestorCDC.upsert`` runs a Delta MERGE
``old.{key} = new.{key} AND new.{ts} >= old.{ts}`` with
whenMatchedUpdateAll / whenNotMatchedInsertAll
(reference lib/ingestors.py:122-126); the checker history uses a
6-column equi MERGE (reference lib/checker_handler.py:179-191).

Two deliberate corrections (SURVEY.md §7.4(2)):
1. The reference puts the timestamp guard in the ON clause, so a
   source row whose key matches but whose ts is stale counts as NOT
   MATCHED and is *inserted* — a duplicate-key hazard. Here the join
   is on keys only; the ts guard decides update-vs-keep.
2. Delta MERGE requires a unique source match per target row; we
   pre-dedup the source on the keys (latest-wins) so the merge is
   deterministic for any input.

Implementation is a pure DataFrame rewrite (delta-spark is not
installed — SURVEY.md §7.4(3)):

    result = (target ⟕ source-latest on keys, keep newer)
             ∪ (source-latest ▷ target on keys)   -- new keys

expressed as one full-outer join. Scale notes (100 TB): the join
shuffles both sides by key — exactly what Delta MERGE does internally
(its find-touched-files join). With AQE on, a small changeset side is
broadcast automatically, which is the common CDC case (daily delta ≪
accumulated table). For partitioned tables, pass
``partition_pruning_col`` so unchanged partitions are never rewritten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_latest


def _dedup_source(
    source: DataFrame,
    keys: list[str],
    ts_col: str | None,
    tiebreakers: list[str] | None,
) -> DataFrame:
    """Latest-wins pre-dedup of a changeset on its merge keys. With no
    explicit tiebreakers, a stable one is synthesized (xxhash64 of the
    null-safe composite string of the non-key columns) so equal-
    (key, ts) duplicates pick the same survivor under any run/
    partition layout (dedup.py's determinism rule). The composite
    string, not ``xxhash64(*cols)``: xxhash64 SKIPS null arguments, so
    rows differing only by a null shift ((null,'x') vs ('x',null))
    would share a tiebreaker and the tie would fall back to partition
    order — exactly the nondeterminism the tiebreaker exists to
    remove."""
    if ts_col is None:
        return source.dropDuplicates(keys)
    if tiebreakers:
        return dedup_latest(source, keys, [ts_col], tiebreakers)
    non_key = [c for c in source.columns if c not in keys]
    return (
        source.withColumn(
            "__tb__", F.xxhash64(_composite_key(non_key))
        )
        .transform(lambda d: dedup_latest(d, keys, [ts_col], ["__tb__"]))
        .drop("__tb__")
    )


def _evolve_and_check(
    target: DataFrame, source: DataFrame, evolve_schema: bool
) -> DataFrame:
    """Shared merge preamble: apply additive schema evolution (source
    columns the target lacks are appended as typed nulls — the Delta
    ``mergeSchema`` analogue), then enforce identical column sets.
    Both merge entry points use this so their evolution semantics and
    error contract cannot drift apart."""
    if evolve_schema:
        extra = [
            f for f in source.schema.fields if f.name not in target.columns
        ]
        for f in extra:
            target = target.withColumn(
                f.name, F.lit(None).cast(f.dataType)
            )
    if set(target.columns) != set(source.columns):
        raise ValueError(
            "merge requires identical columns; "
            f"target={target.columns} source={source.columns}"
        )
    return target


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    tiebreakers: list[str] | None = None,
    evolve_schema: bool = False,
    delete_missing: bool = False,
) -> DataFrame:
    """Latest-wins keyed upsert of ``source`` into ``target``.

    - key in both: source row wins iff ``source.ts >= target.ts``
      (reference semantics, reference lib/ingestors.py:123), else the
      target row is kept;
    - key only in source: inserted;
    - key only in target: kept — unless ``delete_missing=True``
      (full-sync semantics, Delta's ``whenNotMatchedBySourceDelete``
      analogue: the source is the complete desired state and
      target-only keys are dropped).
    With ``ts_col=None`` (pure equi MERGE, reference
    lib/checker_handler.py:179-191 shape) the source always wins.

    Null-ts semantics (explicit): a null ``ts_col`` compares as
    **-infinity on both sides**, so a null-ts source row loses to any
    non-null target ts, a null-ts target row loses to any source row,
    and null-vs-null is a tie that the source wins (``>=``). This keeps
    "source wins iff source.ts >= target.ts" total over nulls.

    Determinism: when the source has several rows with the same key AND
    the same ``ts_col`` value, the survivor is picked by ``tiebreakers``;
    if none are given, a stable tiebreaker is synthesized (xxhash64 of
    all non-key columns) so re-runs and different partition layouts
    produce the same merge result.

    Columns must match between target and source (updateAll/insertAll
    semantics). With ``evolve_schema=True``, ADDITIVE drift is allowed
    (Delta ``mergeSchema`` analogue): columns the source adds are
    appended to the target with typed nulls for all pre-existing rows.
    Source MISSING a target column is still an error either way — an
    upstream silently dropping fields must surface, not quietly null
    updated rows. Returns the merged DataFrame; callers persist it via
    Catalog.overwrite (or partition-scoped overwrite at scale).
    """
    target = _evolve_and_check(target, source, evolve_schema)
    cols = target.columns
    # Reserved staging names: presence markers, the synthesized
    # tiebreaker, and the "__s_" rename prefix (a real target column
    # "__s_x" would collide with the renamed source "x" in the joined
    # frame). A real column by any of these names would be silently
    # overwritten — fail fast instead (same contract as
    # merge_upsert_bloomed's __mk__/__bf__ guard).
    reserved = {"__t_present__", "__s_present__", "__tb__"}
    clash = sorted(
        c for c in cols if c in reserved or c.startswith("__s_")
    )
    if clash:
        raise ValueError(
            f"merge_upsert: column(s) {clash} collide with reserved "
            "staging names (__t_present__/__s_present__/__tb__/"
            "'__s_' prefix); rename them before merging."
        )
    source = _dedup_source(source, keys, ts_col, tiebreakers)

    # Source columns are renamed (prefixed) before the join so every
    # reference below is by unique name — immune to the ambiguous-
    # column trap when target and source share lineage (e.g. both
    # derived from the same table). Presence is tracked with marker
    # columns: after the full-outer join the marker is null on the
    # side that had no matching key (null-safe join keys make key-null
    # checks unreliable for presence).
    t = target.withColumn("__t_present__", F.lit(True))
    s = source.select(
        *[F.col(c).alias(f"__s_{c}") for c in cols]
    ).withColumn("__s_present__", F.lit(True))

    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__s_{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")

    t_here = F.col("__t_present__").isNotNull()
    s_here = F.col("__s_present__").isNotNull()
    if ts_col is not None:
        # Null ts ≡ -infinity on BOTH sides (see docstring): expressed
        # with when/otherwise so three-valued null comparisons can't
        # leak through.
        s_ts, t_ts = F.col(f"__s_{ts_col}"), F.col(ts_col)
        ts_ge = (
            F.when(s_ts.isNull() & t_ts.isNull(), F.lit(True))
            .when(s_ts.isNull(), F.lit(False))
            .when(t_ts.isNull(), F.lit(True))
            .otherwise(s_ts >= t_ts)
        )
        source_wins = s_here & (~t_here | ts_ge)
    else:
        source_wins = s_here

    if delete_missing:
        # full-sync: a target row whose key the source no longer has
        # is deleted (filter before the projection — the source-side
        # marker is the presence signal)
        joined = joined.filter(s_here)
    picked = [
        F.when(source_wins, F.col(f"__s_{c}")).otherwise(F.col(c)).alias(c)
        for c in cols
    ]
    return joined.select(*picked)


def _composite_key(keys: list[str]) -> Column:
    """Canonical string form of a (possibly multi-column) merge key,
    total over nulls: each part is cast to string with a NULL sentinel,
    joined with a unit separator. Null-safe-equal keys (the merge's
    ``eqNullSafe`` rule) always map to the SAME string, so a bloom
    built over these strings has NO false negatives for the merge
    join. A value that happens to contain the sentinel bytes can at
    worst COLLIDE two different keys — a bloom false positive, which
    the exact join discards anyway."""
    parts = [
        F.coalesce(F.col(k).cast("string"), F.lit("\x00NULL\x00"))
        for k in keys
    ]
    return F.concat_ws("\x1f", *parts)


def merge_upsert_bloomed(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    tiebreakers: list[str] | None = None,
    evolve_schema: bool = False,
    delete_missing: bool = False,
    m_bits: int | str = "auto",
    k: int = 3,
    family: str = "native",
) -> DataFrame:
    """:func:`merge_upsert` with bloom-pruned shuffle — identical
    results, but only the target rows that MIGHT match the changeset
    pay the merge join's shuffle.

    The 100 TB shape of a CDC merge is a tiny changeset against a huge
    accumulated table; the plain full-outer join still shuffles the
    ENTIRE target by key. Here the changeset's keys are folded into a
    driver-held bloom word list (:func:`~.bloomjoin.bloom_mask_array`,
    sized by ``m_bits="auto"`` from the changeset's distinct key count
    at ~12 bits/key, capped at ~1 MB — and when even the capped filter
    cannot discriminate, the changeset is no longer small and this
    falls back to the plain :func:`merge_upsert`) and the target is
    split map-only (:func:`~.bloomjoin.bloom_split`):

    - bloom-MISS rows are *guaranteed* keyless in the source (no false
      negatives), so they bypass the join and union straight into the
      output unchanged — no shuffle, no sort, no join state;
    - bloom-HIT rows (true matches + the measured false-positive
      fraction) go through the ordinary :func:`merge_upsert`, whose
      exact ``eqNullSafe`` join discards the false positives by
      keeping those rows unchanged.

    So the merge join shuffles ~(|changeset keys| + fp·|target|) rows
    instead of |target| — the same find-touched-rows idea Delta's
    MERGE applies at file granularity, applied at row granularity and
    engine-portable. The target is READ TWICE (hit + miss branch),
    both map-only; at scale two scans that shuffle 0.1% beat one scan
    that shuffles 100%. That trade assumes the target is a (cheap,
    prunable) table scan — the CDC shape, and what ``IngestorCDC``
    passes; a target that is itself an expensive derived frame should
    be persisted first or merged with plain :func:`merge_upsert`. With ``delete_missing=True`` the miss branch
    is DROPPED instead of unioned (those keys are provably absent from
    the source — exactly the rows full-sync deletes).

    Eager by design: building the filter runs one Spark job over the
    (small) changeset before the returned plan exists — the same
    probe-then-plan shape as ``merge_upsert_partitioned``. A DERIVED
    changeset (plan contains a join/agg/window/explode) is cached once
    via ``materialize_if_derived`` so the sizing probe, mask collect
    and final merge join don't re-run it; the cache is adopted onto
    the returned frame (callers release after acting — IngestorCDC and
    merge_upsert_partitioned do). Multi-col
    and null keys are handled via a null-safe composite key string
    (:func:`_composite_key`). Plan property (tests/test_plans.py): the
    merge join's target-side Exchange sits ABOVE the constant-folded
    bloom Filter, and the miss branch reaches the Union with no
    Exchange at all.
    """
    from .. import caching
    from .bloomjoin import (
        bloom_build,
        bloom_mask_array,
        bloom_split,
        materialize_if_derived,
        resolve_auto_m_bits,
    )

    # evolve BEFORE the split so the bypass branch carries the new
    # columns too (same additive-only rule as merge_upsert)
    target = _evolve_and_check(target, source, evolve_schema)
    # a derived changeset (the build side here) is referenced by the
    # sizing probe, the mask collect, AND the final merge join —
    # materialize it once; scan-shaped changesets stay uncached
    # (VERDICT r8 ask #6, same policy as bloom_filtered_join)
    source, src_cache = materialize_if_derived(source)

    def _owned(df: DataFrame) -> DataFrame:
        return caching.adopt(df, src_cache) if src_cache else df
    # the split stages the composite key as __mk__ and _folded_filter
    # stages the word list as __bf__; a real column by either name
    # would be silently clobbered and dropped from the merged output —
    # fail fast instead (merge_upsert guards its own staging names —
    # __t_present__/__s_present__/__tb__/the "__s_" prefix — the same
    # way).
    reserved = {"__mk__", "__bf__"}
    clash = reserved & (set(target.columns) | set(source.columns))
    if clash:
        raise ValueError(
            f"merge_upsert_bloomed: column(s) {sorted(clash)} collide "
            "with reserved staging names; rename them or use "
            "merge_upsert."
        )
    key_expr = _composite_key(keys)
    src_keys = source.select(key_expr.alias("__mk__"))
    if m_bits == "auto":
        # size the filter to the changeset's actual key count — a
        # fixed size saturates (fp -> 1) the day the changeset grows,
        # turning the "pruned" merge into two probe scans that shuffle
        # everything anyway. When even the largest foldable filter
        # can't discriminate, the changeset is no longer small relative
        # to the target and the PLAIN merge is the right plan.
        m_bits = resolve_auto_m_bits(
            src_keys, "__mk__", k, "merge_upsert_bloomed"
        )
        if m_bits is None:
            return _owned(merge_upsert(
                target, source, keys, ts_col, tiebreakers,
                evolve_schema=False, delete_missing=delete_missing,
            ))
    bloom = bloom_build(
        src_keys, "__mk__", m_bits=m_bits, k=k, family=family,
    )
    words = bloom_mask_array(bloom, m_bits=m_bits)
    staged = target.withColumn("__mk__", key_expr)
    hit, miss = bloom_split(staged, "__mk__", words, k=k, family=family)
    hit, miss = hit.drop("__mk__"), miss.drop("__mk__")
    merged = merge_upsert(
        hit, source, keys, ts_col, tiebreakers,
        evolve_schema=False, delete_missing=delete_missing,
    )
    if delete_missing:
        return _owned(merged)
    return _owned(merged.unionByName(miss.select(*merged.columns)))


def merge_upsert_delta(
    spark,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    tiebreakers: list[str] | None = None,
    delta_table=None,
    delete_missing: bool = False,
    evolve_schema: bool = False,
) -> None:
    """ACID MERGE into a Delta table — the capability path the
    reference runs on Databricks (``DeltaTable.merge`` with
    whenMatchedUpdateAll/whenNotMatchedInsertAll, reference
    lib/ingestors.py:113-126). Semantics match :func:`merge_upsert`
    exactly, including the two corrections:

    1. the join is on KEYS ONLY; the ts guard lives in the
       whenMatched condition (the reference's ts-in-ON treats stale
       rows as NOT MATCHED and re-inserts duplicate keys);
    2. the source is pre-deduped latest-wins with a stable tiebreaker
       (Delta requires a unique source match per target row);
    3. null ts ≡ -infinity on both sides (merge_upsert's documented
       rule): ``t.ts IS NULL OR (s.ts IS NOT NULL AND s.ts >= t.ts)``.

    ``delete_missing=True`` adds ``whenNotMatchedBySourceDelete()``
    (full-sync: target keys absent from the source are deleted) —
    parity with ``merge_upsert(delete_missing=True)``.

    ``evolve_schema=True`` calls ``withSchemaEvolution()`` on the
    merge builder (Delta ≥3.1's per-statement schema evolution):
    ADDITIVE source columns are appended to the target schema during
    the MERGE, existing rows reading NULL for them — exactly the
    contract of ``merge_upsert(evolve_schema=True)`` on the
    join-emulation path. Column REMOVALS still update the missing
    column to NULL via update-all semantics rather than dropping it,
    matching the emulated path's keep-and-null rule.

    Requires delta-spark; fails fast with ImportError otherwise
    (capability flag, SURVEY.md §7.4(3)). In-place and transactional —
    no staging swap, unchanged files are skipped via Delta's
    find-touched-files join.

    ``delta_table`` injects a DeltaTable-like object (same
    alias/merge/whenMatched*/execute builder surface) so the MERGE
    condition/clause construction is contract-testable in
    environments without delta-spark; production callers leave it
    None and get ``DeltaTable.forPath``.
    """
    if delta_table is None:
        from ..catalog import delta_available

        if not delta_available():
            raise ImportError(
                "merge_upsert_delta requires the delta-spark package; "
                "use merge_upsert (join-emulation) + Catalog.overwrite_"
                "via_staging on parquet-only clusters."
            )
        from delta.tables import DeltaTable  # type: ignore

        delta_table = DeltaTable.forPath(spark, target_path)

    if "__tb__" in source.columns:
        # same staging-name contract as merge_upsert: _dedup_source
        # synthesizes (and then drops) __tb__, which would silently
        # consume a real column by that name
        raise ValueError(
            "merge_upsert_delta: column '__tb__' collides with the "
            "reserved tiebreaker staging name; rename it before "
            "merging."
        )
    src = _dedup_source(source, keys, ts_col, tiebreakers)
    dt = delta_table
    on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    m = dt.alias("t").merge(src.alias("s"), on)
    if evolve_schema:
        m = m.withSchemaEvolution()
    if ts_col is not None:
        m = m.whenMatchedUpdateAll(
            condition=(
                f"t.{ts_col} IS NULL OR "
                f"(s.{ts_col} IS NOT NULL AND s.{ts_col} >= t.{ts_col})"
            )
        )
    else:
        m = m.whenMatchedUpdateAll()
    m = m.whenNotMatchedInsertAll()
    if delete_missing:
        m = m.whenNotMatchedBySourceDelete()
    m.execute()


def merge_upsert_partitioned(
    catalog,
    table: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str | list[str],
    ts_col: str | None = None,
    tiebreakers: list[str] | None = None,
    max_partitions: int = 10_000,
    bloom: bool = False,
    bloom_m_bits: int | str = "auto",
    bloom_k: int = 3,
    bloom_family: str = "native",
) -> list:
    """Partition-scoped CDC merge — the 100 TB upgrade over a
    whole-table rewrite (SURVEY.md §7.4(8); Delta's ``replaceWhere``
    analogue).

    ``bloom=True`` composes BOTH pruning levels of the 100 TB CDC
    story (each existed separately before): partition pruning keeps
    untouched partitions' FILES out of the merge entirely (never read,
    never rewritten — byte-identical on disk), and within the touched
    partitions :func:`merge_upsert_bloomed` keeps guaranteed-miss ROWS
    out of the merge join's shuffle (they still rewrite — a partition
    rewrite replaces the whole directory — but via the map-only bloom
    bypass branch, never sorted/shuffled/joined). A changeset touching
    3 of 3,000 date partitions and 1% of the rows inside them merges
    with ~0.1% of the table's rows ever crossing an Exchange. The
    filter is sized from the changeset (``bloom_m_bits="auto"``) and
    degrades to the plain slice merge when it cannot discriminate —
    same contract as :func:`merge_upsert_bloomed`.

    Requires the merge keys to determine the partition (true for
    date-partitioned CDC feeds where the partition column is part of
    the key, e.g. (symbol, date) keyed prices partitioned by date —
    reference silver/prices/prices.yml:6,17). ``partition_col`` may be
    a LIST for hierarchically partitioned tables (date, region — the
    realistic 100 TB CDC layout); every member must be a merge key
    (same reason: a key's row must not move between partitions), the
    touched set is the distinct TUPLES, and pruning applies at every
    directory level — an untouched (date, region) leaf under a touched
    date is never read or rewritten. Steps:

    1. collect the DISTINCT partition values/tuples present in the
       source — a tiny driver-side list (one shuffle over source only);
    2. read ONLY those partitions of the target (partition pruning —
       the unchanged 99% of the table is never scanned);
    3. join-merge within that slice;
    4. rewrite only those leaf partition directories.

    ``max_partitions`` bounds step 1: the distinct-partition list is
    collected to the driver, which is only safe for genuinely coarse
    partition columns (dates, regions). A mistaken high-cardinality
    column (an id, a timestamp) would otherwise OOM the driver —
    instead we count first (cheap partial-agg count-distinct) and fail
    fast with a clear error.

    NULL partition values in the source fail fast (ADVICE r8): the
    membership predicates (`IN`, `=`) never match NULL, so those
    changeset rows would otherwise silently vanish from the merge.

    Returns the list of touched partition values (tuples when
    ``partition_col`` is a list).
    """
    from ..catalog import (
        _check_no_null_partition_values,
        partition_predicate,
    )

    pcols = (
        [partition_col]
        if isinstance(partition_col, str)
        else list(partition_col)
    )
    missing = [c for c in pcols if c not in keys]
    if missing:
        raise ValueError(
            "partition-scoped merge requires every partition column to "
            f"be part of the merge keys; got partition_col={pcols!r} "
            f"keys={keys} (not keys: {missing})"
        )
    distinct_parts = source.select(*pcols).distinct()
    # LIMIT max+1 bounds BOTH the count and the driver transfer: if the
    # column is high-cardinality we learn "too many" after shipping at
    # most max_partitions+1 values, never the full list.
    probe = distinct_parts.limit(max_partitions + 1).collect()
    if len(probe) > max_partitions:
        raise ValueError(
            f"merge_upsert_partitioned: source has more than "
            f"{max_partitions} distinct values of {pcols!r}; "
            "this looks like a non-partition (high-cardinality) column. "
            "Pick a coarse partition column or raise max_partitions."
        )
    touched = [r[0] if len(pcols) == 1 else tuple(r) for r in probe]
    _check_no_null_partition_values(pcols, touched)
    if not touched:
        return []
    if not catalog.exists(table):
        catalog.overwrite(source, table, partition_by=pcols)
        return touched
    target_slice = catalog.read(table).filter(
        partition_predicate(pcols, touched)
    )
    src = source.select(*target_slice.columns)
    if bloom:
        merged = merge_upsert_bloomed(
            target_slice, src, keys, ts_col, tiebreakers,
            m_bits=bloom_m_bits, k=bloom_k, family=bloom_family,
        )
    else:
        merged = merge_upsert(target_slice, src, keys, ts_col, tiebreakers)
    catalog.overwrite_partitions(merged, table, pcols, touched)
    # the write consumed the plan; free any derived-changeset cache
    # merge_upsert_bloomed adopted onto it
    from .. import caching

    caching.release(merged)
    return touched
