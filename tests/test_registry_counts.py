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
    assert len(registry.specs()) == 180


def test_streaming_variant_count_matches_docs():
    variants = [
        n for n in dir(streaming_plans) if n.startswith("streaming_")
    ]
    assert len(variants) == 11  # PARITY.md §2.12 streaming variant count
    registered = {s.name for s in registry.specs()}
    assert set(variants) <= registered


def test_staleness_debt_bounded():
    """No standing verdict may be more than 3 rounds older than the
    newest folded CORRECTNESS record (round-6 verdict ask #8): with a
    ~50-query/round budget over a 158-query registry, the rotation only
    converges if each fold retires the oldest tier. If this fails,
    the round's adjudication budget was not spent on the stalest tier."""
    import glob
    import re

    rounds = [
        int(re.search(r"_r(\d+)\.json$", p).group(1))
        for p in glob.glob("/root/repo/CORRECTNESS_r*.json")
    ]
    if not rounds:  # fresh clone without driver artifacts
        return
    newest = max(rounds)
    for r in range(2, newest - 3):
        tier = getattr(registry, f"_ADJUDICATED_R{r}", frozenset())
        assert not tier, (
            f"_ADJUDICATED_R{r} still holds {len(tier)} queries but the "
            f"newest folded record is round {newest}; the fold must "
            f"retire tiers older than round {newest - 3}"
        )


def test_names_unique_and_sorted_by_staleness():
    specs = registry.specs()
    names = [s.name for s in specs]
    assert len(names) == len(set(names))
    # Staleness tiers are non-decreasing (never-adjudicated first).
    tiers = [registry._staleness(n) for n in names]
    assert tiers == sorted(tiers)
