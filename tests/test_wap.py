"""Write-Audit-Publish: checks as a publish gate."""

import pytest

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.quality.wap import AuditFailed, write_audit_publish

CHECKS = [
    {"column": "px", "test_type": "outside_of_rules",
     "test_name": "px_positive", "kwargs": {"expression": "px > 0"}},
    {"column": "sym", "test_type": "missing", "test_name": "sym_present"},
]


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, sym string, px double")


def test_publish_splits_clean_and_quarantine(spark, cat):
    batch = _batch(spark, [
        (1, "A", 10.0),
        (2, "B", -5.0),          # fails px_positive
        (3, None, 7.0),          # fails sym_present
        (4, "D", 1.0),
    ])
    rep = write_audit_publish(
        cat, "silver.mkt.px", batch, CHECKS, ["id"],
        min_clean_fraction=0.5,
    )
    assert (rep.rows_total, rep.rows_clean, rep.rows_quarantined) == (4, 2, 2)
    assert rep.published

    got = {r.id for r in cat.read("silver.mkt.px").collect()}
    assert got == {1, 4}
    quarantined = {
        r.id: list(r.failed_tests)
        for r in cat.read("silver.mkt.px_quarantine").collect()
    }
    assert quarantined == {2: ["px_positive"], 3: ["sym_present"]}


def test_audit_failure_publishes_nothing(spark, cat):
    batch = _batch(spark, [(1, "A", -1.0), (2, "B", 2.0)])
    with pytest.raises(AuditFailed, match="below the"):
        write_audit_publish(
            cat, "silver.mkt.px2", batch, CHECKS, ["id"],
            min_clean_fraction=0.9,
        )
    assert not cat.exists("silver.mkt.px2")
    assert not cat.exists("silver.mkt.px2_quarantine")   # nothing half-recorded


def test_append_accumulates_and_quarantine_grows(spark, cat):
    write_audit_publish(
        cat, "silver.mkt.px3", _batch(spark, [(1, "A", 1.0)]),
        CHECKS, ["id"], min_clean_fraction=0.0,
    )
    rep = write_audit_publish(
        cat, "silver.mkt.px3", _batch(spark, [(2, "B", 2.0), (3, "C", -3.0)]),
        CHECKS, ["id"], min_clean_fraction=0.0,
    )
    assert rep.rows_quarantined == 1
    assert {r.id for r in cat.read("silver.mkt.px3").collect()} == {1, 2}
    assert {r.id for r in cat.read("silver.mkt.px3_quarantine").collect()} \
        == {3}


def test_all_clean_batch_creates_no_quarantine(spark, cat):
    rep = write_audit_publish(
        cat, "silver.mkt.px4", _batch(spark, [(1, "A", 1.0)]),
        CHECKS, ["id"],
    )
    assert rep.clean_fraction == 1.0
    assert not cat.exists("silver.mkt.px4_quarantine")


def test_retry_with_batch_id_is_idempotent_in_quarantine(spark, cat):
    """A caller-level retry of the same batch (same batch_id) must not
    double-record quarantine rows: prior rows tagged with that id are
    replaced, not appended to."""
    batch = _batch(spark, [(1, "A", 1.0), (2, "B", -2.0)])
    for _attempt in range(2):
        write_audit_publish(
            cat, "silver.mkt.px5", batch, CHECKS, ["id"],
            min_clean_fraction=0.0, mode="overwrite",
            batch_id="2024-06-01",
        )
    q = cat.read("silver.mkt.px5_quarantine").collect()
    assert [r.id for r in q] == [2]
    assert q[0]["__wap_batch__"] == "2024-06-01"

    # a DIFFERENT batch id appends normally
    write_audit_publish(
        cat, "silver.mkt.px5",
        _batch(spark, [(3, "C", -3.0)]),
        CHECKS, ["id"], min_clean_fraction=0.0, batch_id="2024-06-02",
    )
    q2 = {r.id: r["__wap_batch__"]
          for r in cat.read("silver.mkt.px5_quarantine").collect()}
    assert q2 == {2: "2024-06-01", 3: "2024-06-02"}


def test_production_publishes_before_quarantine(spark, cat, monkeypatch):
    """Failure-ordering contract: if the quarantine write dies, the
    production table is ALREADY published (the reverse — quarantine
    mutated, production missing — is the unrecoverable state)."""
    batch = _batch(spark, [(1, "A", 1.0), (2, "B", -2.0)])

    real_overwrite = cat.overwrite

    def exploding_overwrite(df, full_name, partition_by=None):
        if full_name.endswith("_quarantine"):
            raise RuntimeError("quarantine write failed")
        return real_overwrite(df, full_name, partition_by)

    monkeypatch.setattr(cat, "overwrite", exploding_overwrite)
    with pytest.raises(RuntimeError, match="quarantine write failed"):
        write_audit_publish(
            cat, "silver.mkt.px6", batch, CHECKS, ["id"],
            min_clean_fraction=0.0,
        )
    # production is correct and complete; only quarantine is missing
    assert {r.id for r in cat.read("silver.mkt.px6").collect()} == {1}
    assert not cat.exists("silver.mkt.px6_quarantine")


def test_routing_immune_to_display_key_collisions(spark, cat):
    """The reference's '_'-joined df_key is a DISPLAY key, not an
    identity: it skips nulls and admits separator injection — the
    composite keys ('a_b','c') and ('a','b_c') render identically, as
    do (null,'x') and ('x',null). Routing joins on the raw key columns
    null-safely, so a clean row must never be quarantined because its
    display key collides with a failed row's."""
    batch = spark.createDataFrame(
        [
            # separator injection: same df_key 'a_b_c', one fails
            ("a_b", "c", "A", 10.0),
            ("a", "b_c", "B", -5.0),    # fails px_positive
            # null shift: same df_key 'x', one fails
            (None, "x", "C", 3.0),
            ("x", None, "D", -1.0),     # fails px_positive
        ],
        "k1 string, k2 string, sym string, px double",
    )
    rep = write_audit_publish(
        cat, "silver.mkt.coll", batch,
        [{"column": "px", "test_type": "outside_of_rules",
          "test_name": "px_positive", "kwargs": {"expression": "px > 0"}}],
        ["k1", "k2"], min_clean_fraction=0.25,
    )
    assert (rep.rows_clean, rep.rows_quarantined) == (2, 2)
    clean = {(r.k1, r.k2) for r in cat.read("silver.mkt.coll").collect()}
    assert clean == {("a_b", "c"), (None, "x")}
    dirty = {
        (r.k1, r.k2)
        for r in cat.read("silver.mkt.coll_quarantine").collect()
    }
    assert dirty == {("a", "b_c"), ("x", None)}
