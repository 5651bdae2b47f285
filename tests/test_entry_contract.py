"""Contract checks for __spark_entry__ (driver interface)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "pedido_id" in df.columns


def test_oracle_keys_cover_all_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    # every oracle-checked entry has a value-check oracle — no rows-only
    # exceptions; the xxhash64 dedup twins live on the bench surface
    assert o == q
    extra = set(entrymod.bench_queries()) - q
    assert extra == {"minhash_near_dup_xxhash64", "simhash_groups_xxhash64"}


def test_queries_run_and_have_stable_schema(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
