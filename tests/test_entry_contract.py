"""Contract checks for __spark_entry__ (driver interface)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "pedido_id" in df.columns


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q
    # the rows-only exceptions are intentional and enumerated
    assert q - o == {
        "minhash_near_dup",  # xxhash64 family; portable twin is value-checked
        "simhash_groups",  # xxhash64 bit-majority
        "approx_profile",  # sketch estimates are engine-specific
    }


def test_queries_run_and_have_stable_schema(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
