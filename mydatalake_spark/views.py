"""Materialized views: declared SQL, recomputed into a stored table.

Reference parity: the gold layer is a DLT materialized view
(``CREATE MATERIALIZED VIEW gold.brapi.prices AS SELECT …``,
reference Pipelines/Test/transformations/test.sql:3-14). OSS Spark has
no MV object, so the equivalent is a declared query + a refresh job
that recomputes it into a table (SURVEY.md §4.2) — which is exactly
what DLT does under the hood on a schedule.

``refresh`` is a full recompute; at 100 TB the win is partition-scoped
refresh: pass ``partition_by`` + ``refresh_predicate`` so only changed
partitions rewrite (dynamic partition overwrite semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog
from .plans.qualify import run_sql


@dataclass
class MaterializedView:
    """A named SQL definition materialized into a warehouse table."""

    spark: SparkSession
    catalog: Catalog
    name: str                      # catalog.schema.table to materialize
    sql: str                       # reference-dialect SELECT (QUALIFY ok)
    partition_by: list[str] = field(default_factory=list)

    def dataframe(self) -> DataFrame:
        """The view's current definition as a (lazy) DataFrame —
        dotted table references resolve against the warehouse."""
        return run_sql(
            self.spark, self.sql,
            table_mapping=self.catalog.register_referenced(self.sql),
        )

    def refresh(self) -> None:
        """Recompute and persist (the scheduled-job equivalent of the
        DLT refresh)."""
        self.catalog.overwrite(
            self.dataframe(), self.name,
            partition_by=self.partition_by or None,
        )

    def read(self) -> DataFrame:
        return self.catalog.read(self.name)


@dataclass
class IncrementalAggView:
    """A grouped-aggregate materialization maintained by DELTA MERGES
    instead of full recomputes.

    [extension] The incremental-view-maintenance half of the gold
    layer: for self-mergeable aggregates (SUM/COUNT — and anything
    derivable from them at read time, e.g. AVG = sum/cnt), applying a
    new batch costs ``agg(batch) ⊕ stored_partials``, not a re-scan of
    all history. At 100 TB that is the difference between touching the
    day's partition and touching three years of them.

    Contract: ``keys`` group the view; ``measures`` maps output column
    → input expression summed per group; an ``n_rows`` count per
    group is always maintained (``n_rows`` is therefore a reserved
    output name). ``apply`` takes append-only batches;
    updates/deletes arrive as a change feed through ``apply_changes``
    (retraction folding — the Delta-CDF consumer path), which keeps
    the view consistent without re-baselining.

    The merge is one groupBy over (stored partials ∪ batch partials),
    written back with a staged swap (the scan reads the pre-commit
    files; catalog.py:overwrite_via_staging) so a crash mid-write
    never corrupts the view.
    """

    spark: SparkSession
    catalog: Catalog
    name: str                       # catalog.schema.table of the view
    keys: list[str]
    measures: dict[str, str]        # out-col -> input SQL expression

    def _partials(self, batch: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        if "n_rows" in self.measures:
            raise ValueError(
                "'n_rows' is reserved for the maintained group count"
            )
        aggs = [
            F.sum(F.expr(expr)).alias(out)
            for out, expr in self.measures.items()
        ]
        aggs.append(F.count(F.lit(1)).alias("n_rows"))
        return batch.groupBy(*self.keys).agg(*aggs)

    _TOKEN_FILE = ".applied_batch"

    def applied_token(self) -> int | None:
        """The ``batch_token`` committed with the view's current
        state, or None if the view was never token-folded."""
        if not self.catalog.exists(self.name):
            return None
        raw = self.catalog.read_marker(self.name, self._TOKEN_FILE)
        return None if raw is None else int(raw)

    def _token_seen(self, batch_token) -> bool:
        """True (skip the fold) when ``batch_token`` was already
        committed. Tokens are monotonically increasing integers —
        streaming batch_ids — so ≤ means 'replayed'."""
        if batch_token is None:
            return False
        seen = self.applied_token()
        return seen is not None and int(batch_token) <= seen

    def apply(self, batch: DataFrame, batch_token: int | None = None) -> None:
        """Fold one append-only batch into the stored aggregates.

        ``batch_token``: a monotonically increasing integer (a
        streaming batch_id). When given, the token commits ATOMICALLY
        with the fold (a marker file riding the staged directory
        swap — catalog.py:overwrite_via_staging commit_marker) and a
        replayed token is skipped — making the non-idempotent fold
        idempotent per batch under foreachBatch's at-least-once
        retries (ADVICE r9)."""
        if self._token_seen(batch_token):
            return
        fresh = self._partials(batch)
        self._fold(fresh, batch_token)

    def apply_changes(
        self, feed: DataFrame, batch_token: int | None = None
    ) -> None:
        """Fold a change feed (operators/diff.py:change_feed /
        catalog.py:Catalog.table_changes row shape) into the stored
        aggregates — the retraction-aware sibling of :meth:`apply`.

        Each feed row carries a sign: insert/update_postimage add
        (+measure, +1 row), delete/update_preimage retract
        (−measure, −1 row) — so an update nets to (post − pre) and a
        fully-retracted group's ``n_rows`` reaches 0 and the group
        leaves the view. Cost = agg(feed) ⊕ stored partials: the gold
        refresh scales with the CHANGESET, never the base table —
        which is the entire point of consuming the feed at 100 TB
        (recompute touches three years of partitions; this touches
        today's changes).

        An unknown ``_change_type`` fails the job deterministically
        (raise_error) rather than silently mis-signing rows.

        ``batch_token``: same idempotency contract as :meth:`apply` —
        and it matters MORE here: a replayed change batch
        double-applies retractions, which corrupts (groups wrongly
        vanishing, n_rows drift) rather than merely inflates.
        """
        from pyspark.sql import functions as F

        if self._token_seen(batch_token):
            return
        if "_change_type" not in feed.columns:
            raise ValueError(
                "feed must carry _change_type — build it with "
                "change_feed()/Catalog.table_changes()"
            )
        if "n_rows" in self.measures:
            raise ValueError(
                "'n_rows' is reserved for the maintained group count"
            )
        sign = (
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit(1),
            )
            .when(
                F.col("_change_type").isin("delete", "update_preimage"),
                F.lit(-1),
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("apply_changes: unknown _change_type "),
                        F.col("_change_type"),
                    )
                )
            )
        )
        signed = feed.withColumn("__sign__", sign)
        aggs = [
            F.sum(F.expr(expr) * F.col("__sign__")).alias(out)
            for out, expr in self.measures.items()
        ]
        aggs.append(F.sum("__sign__").alias("n_rows"))
        fresh = signed.groupBy(*self.keys).agg(*aggs)
        self._fold(fresh, batch_token)

    def _fold(self, fresh: DataFrame, batch_token: int | None = None) -> None:
        """Merge partials into the stored view (⊕ = grouped sum);
        groups whose maintained row count reaches zero are dropped —
        they no longer exist in the source.

        A count going NEGATIVE is not a legit retraction — it means
        the feed retracted rows that were never added (a replayed,
        truncated, or out-of-order feed) and fails deterministically
        naming the group (ADVICE r9) instead of masking feed misuse
        as a clean empty group."""
        from pyspark.sql import functions as F

        guard = (
            F.when(
                F.col("n_rows") < 0,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "incremental view fold: group n_rows went "
                            "negative (feed retracted rows never added "
                            "— replayed/truncated/out-of-order feed?) "
                            "at key "
                        ),
                        F.concat_ws(
                            "|", *[F.col(k).cast("string") for k in self.keys]
                        ),
                    )
                ),
            )
            .otherwise(F.col("n_rows"))
            .alias("n_rows")
        )
        marker = (
            None
            if batch_token is None
            else (self._TOKEN_FILE, str(int(batch_token)))
        )
        if self.catalog.exists(self.name):
            merged = (
                self.catalog.read(self.name)
                .unionByName(fresh)
                .groupBy(*self.keys)
                .agg(
                    *[
                        F.sum(out).alias(out)
                        for out in (*self.measures, "n_rows")
                    ]
                )
                .withColumn("n_rows", guard)
                .where(F.col("n_rows") > 0)
            )
            self.catalog.overwrite_via_staging(
                merged, self.name, commit_marker=marker
            )
        elif marker is not None:
            # token folds always go through the staged swap so the
            # marker commits atomically with the data, even on create
            self.catalog.overwrite_via_staging(
                fresh.withColumn("n_rows", guard).where(F.col("n_rows") > 0),
                self.name,
                commit_marker=marker,
            )
        else:
            self.catalog.overwrite(
                fresh.withColumn("n_rows", guard).where(F.col("n_rows") > 0),
                self.name,
            )

    def read(self) -> DataFrame:
        return self.catalog.read(self.name)


@dataclass
class SketchDistinctView:
    """Incrementally maintained per-key DISTINCT-count sketches — the
    sketch sibling of :class:`IncrementalAggView` for the one aggregate
    SUM/COUNT partials cannot express.

    [extension] Stores one Datasketches HLL sketch (binary, ≤2^lg_k
    bytes) per key group; applying a batch costs
    ``sketch(batch) ⊕ stored sketches`` — one union-merge over
    key-count rows — never a re-scan of history, and the stored table
    answers "distinct per key" (``estimates``) and, with a date key,
    "rolling N-day distinct" (``rolling_estimates``) without touching
    raw data again. Append-only contract as IncrementalAggView;
    staged-swap write for crash safety.
    """

    spark: SparkSession
    catalog: Catalog
    name: str                       # catalog.schema.table of the view
    keys: list[str]
    col: str                        # the column whose distincts we track
    lg_k: int = 14

    def _partials(self, batch: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        return batch.groupBy(*self.keys).agg(
            F.hll_sketch_agg(self.col, F.lit(self.lg_k)).alias("__sk__")
        )

    _TOKEN_FILE = ".applied_batch"
    applied_token = IncrementalAggView.applied_token
    _token_seen = IncrementalAggView._token_seen

    def apply(self, batch: DataFrame, batch_token: int | None = None) -> None:
        """Fold one append-only batch into the stored sketches.
        ``batch_token``: same per-batch idempotency contract as
        :meth:`IncrementalAggView.apply`. HLL union is set-semantic,
        so replaying the SAME batch is already value-idempotent —
        the token here skips the wasted re-union and keeps the two
        view kinds interchangeable under stream_into_view."""
        from pyspark.sql import functions as F

        if self._token_seen(batch_token):
            return
        marker = (
            None
            if batch_token is None
            else (self._TOKEN_FILE, str(int(batch_token)))
        )
        fresh = self._partials(batch)
        if self.catalog.exists(self.name):
            merged = (
                self.catalog.read(self.name)
                .unionByName(fresh)
                .groupBy(*self.keys)
                .agg(F.hll_union_agg("__sk__").alias("__sk__"))
            )
            self.catalog.overwrite_via_staging(
                merged, self.name, commit_marker=marker
            )
        elif marker is not None:
            self.catalog.overwrite_via_staging(
                fresh, self.name, commit_marker=marker
            )
        else:
            self.catalog.overwrite(fresh, self.name)

    def estimates(self) -> DataFrame:
        """(keys..., distinct_estimate) from the stored sketches."""
        from pyspark.sql import functions as F

        return self.catalog.read(self.name).select(
            *self.keys,
            F.hll_sketch_estimate("__sk__").alias("distinct_estimate"),
        )

    def rolling_estimates(
        self, date_key: str, window_days: int = 7
    ) -> DataFrame:
        """Rolling N-day distinct per ``date_key`` (must be one of
        ``keys``, date-typed): a window union over the STORED daily
        sketches — kilobytes — on a RANGE days frame so calendar gaps
        never widen the window (cf. sketches.rolling_distinct_check,
        which verifies the same plan shape against exact counts).

        With multi-column ``keys`` the window is PARTITIONED by the
        non-date keys, so each key group rolls over its own daily
        sketches only — unioning across groups would silently inflate
        the estimate (distinct users of *any* country, not *this*
        one)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        if date_key not in self.keys:
            raise ValueError(
                f"date_key {date_key!r} must be one of keys={self.keys}"
            )
        dayn = F.datediff(
            F.col(date_key), F.lit("1970-01-01").cast("date")
        )
        other_keys = [k for k in self.keys if k != date_key]
        w = (
            Window.partitionBy(*other_keys).orderBy(dayn)
            if other_keys
            else Window.orderBy(dayn)
        ).rangeBetween(-(window_days - 1), 0)
        return self.catalog.read(self.name).select(
            *self.keys,
            F.hll_sketch_estimate(
                F.hll_union_agg("__sk__").over(w)
            ).alias("rolling_distinct"),
        )


def sync_view_from_table_changes(
    view: IncrementalAggView,
    src_catalog: Catalog,
    src_table: str,
    keys: list[str],
    *,
    partition_cols: list[str] | None = None,
) -> list[int]:
    """Maintain an incremental gold view from a versioned table's own
    change history — the batch twin of
    ``streaming.events.stream_changes_into_view`` where the "stream"
    is the catalog's retained versions (the DLT "CDC table feeds a
    materialized view" shape, driven by
    ``Catalog.table_changes(granularity='commit')``).

    Replays every retained commit the view has not applied yet, one
    hop at a time, each fold tokened with its COMMIT VERSION — so a
    crash mid-sync resumes exactly where it stopped and a re-run of an
    already-applied hop is a no-op (the same atomic marker-file
    contract as the streaming fold). A never-initialized view is
    baselined from the OLDEST retained version first.

    Syncs to the latest RETAINED version, never the live state: the
    live state has no version number, so a live fold could not be
    tokened — ``snapshot()`` (or any overwrite) the source first.

    At 100 TB each hop costs agg(hop changeset) ⊕ stored partials —
    never a base-table re-scan — and ``partition_cols`` prunes
    provably-unchanged leaves out of each hop's snapshot scans.

    Hops run between ADJACENT RETAINED versions: a vacuumed
    intermediate version is bridged by one net diff between its
    retained neighbors — exact for an aggregate view (the signed fold
    of a net endpoint diff equals the composition of the per-commit
    folds; intermediate churn retracts itself), it only coarsens the
    resume granularity. What cannot be bridged is the view's own
    applied version leaving retention (nothing to diff FROM) — that
    raises; re-baseline by dropping the view.

    Returns the commit versions applied this call (empty when already
    current).
    """
    vs = [int(lbl[1:]) for lbl in src_catalog.versions(src_table)]
    if not vs:
        raise ValueError(
            f"{src_table} has no retained versions — snapshot() or "
            "overwrite the source before syncing"
        )
    applied = view.applied_token()
    done: list[int] = []
    if applied is None:
        view.apply(
            src_catalog.read_version(src_table, version=vs[0]),
            batch_token=vs[0],
        )
        applied = vs[0]
        done.append(vs[0])
    if applied < vs[-1] and applied not in vs:
        raise ValueError(
            f"view last applied version {applied} of {src_table}, which "
            f"is no longer retained (have {vs}) — per-commit replay "
            "cannot bridge a vacuumed gap; re-baseline the view"
        )
    chain = [applied] + [v for v in vs if v > applied]
    for lo, hi in zip(chain, chain[1:]):
        hop = src_catalog.table_changes(
            src_table, keys, from_version=lo, to_version=hi,
            partition_cols=partition_cols,
        )
        view.apply_changes(hop.drop("_commit_version"), batch_token=hi)
        done.append(hi)
    return done


def sync_replica_from_table_changes(
    src_catalog: Catalog,
    src_table: str,
    dst_catalog: Catalog,
    dst_table: str,
    keys: list[str],
) -> int | None:
    """Maintain a ROW-LEVEL replica of a versioned table from its own
    change history — the table twin of
    :func:`sync_view_from_table_changes` (which maintains aggregates),
    and the CDF-consumer pattern Delta documents: downstream tables
    subscribe to ``table_changes`` instead of re-copying the source.

    First call baselines the replica from the source's latest RETAINED
    version (one copy). Every later call reads the replica's committed
    sync token, takes ONE net change feed from that version to the
    latest retained one (intermediate commits collapse — a replica
    only needs the end state), replays it with
    :func:`operators.diff.apply_change_feed`, and commits the new
    state WITH the new token in one atomic staging swap
    (``commit_marker``) — so a crashed sync re-runs the same
    deterministic hop and a replayed sync is a no-op. Syncs to the
    latest retained version, never the live state (the live state has
    no number to token).

    At 100 TB a sync costs one anti-join of the replica against the
    CHANGESET's keys plus the changeset union — never a source
    re-scan; the feed itself is partition-pruned and one join
    (operators/diff.py). The replica's applied version leaving the
    source's retention cannot be bridged (nothing to diff FROM) and
    raises — re-baseline by dropping the replica.

    Returns the version synced to, or None when already current.
    """
    from .operators.diff import apply_change_feed

    token_file = ".replica_synced"
    vs = [int(lbl[1:]) for lbl in src_catalog.versions(src_table)]
    if not vs:
        raise ValueError(
            f"{src_table} has no retained versions — snapshot() or "
            "overwrite the source before syncing a replica"
        )
    latest = vs[-1]
    applied = None
    if dst_catalog.exists(dst_table):
        raw = dst_catalog.read_marker(dst_table, token_file)
        if raw is None:
            # an existing destination WITHOUT a sync token was not
            # created by this sync — baselining would silently clobber
            # unrelated data (the CREATE-refuses-existing discipline)
            raise ValueError(
                f"replica sync: {dst_table} exists but carries no "
                f"sync token — it is not a replica of {src_table}; "
                "drop it or pick another destination name"
            )
        applied = int(raw)
    if applied is None:
        dst_catalog.overwrite_via_staging(
            src_catalog.read_version(src_table, version=latest),
            dst_table,
            commit_marker=(token_file, str(latest)),
        )
        return latest
    if applied >= latest:
        return None
    if applied not in vs:
        raise ValueError(
            f"replica {dst_table} last synced version {applied} of "
            f"{src_table}, which is no longer retained (have {vs}) — "
            "nothing to diff from; re-baseline by dropping the replica"
        )
    feed = src_catalog.table_changes(
        src_table, keys, from_version=applied, to_version=latest
    )
    new_state = apply_change_feed(
        dst_catalog.read(dst_table), feed, keys
    )
    dst_catalog.overwrite_via_staging(
        new_state, dst_table, commit_marker=(token_file, str(latest))
    )
    return latest
