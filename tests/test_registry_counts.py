"""Registry bookkeeping invariants — the doc-count drift guard the
round-4 advice asked for: every tally PARITY.md cites is derived here
from registry.specs() so the docs can't silently diverge again."""

from myserver_datawarehouse_spark import registry
from myserver_datawarehouse_spark.plans import streaming_plans


def test_every_spec_has_an_oracle():
    specs = registry.specs()
    assert all(s.oracle is not None for s in specs), [
        s.name for s in specs if s.oracle is None
    ]
    assert len(registry.oracle_sql()) == len(specs)


def test_registry_size_matches_docs():
    # PARITY.md / SURVEY.md cite this total; bump it deliberately when
    # adding queries, never let prose drift from the registry.
    assert len(registry.specs()) == 158


def test_streaming_variant_count_matches_docs():
    variants = [
        n for n in dir(streaming_plans) if n.startswith("streaming_")
    ]
    assert len(variants) == 10  # PARITY.md §2.12 streaming variant count
    registered = {s.name for s in registry.specs()}
    assert set(variants) <= registered


def test_names_unique_and_sorted_by_staleness():
    specs = registry.specs()
    names = [s.name for s in specs]
    assert len(names) == len(set(names))
    # Staleness tiers are non-decreasing (never-adjudicated first).
    tiers = [registry._staleness(n) for n in names]
    assert tiers == sorted(tiers)
