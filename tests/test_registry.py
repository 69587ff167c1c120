"""Registry integrity: the gate-ordering machinery must not silently
drop or misplace queries."""

from __future__ import annotations

from convert_parquet_to_csv_spark.plans import registry


def test_first_tier_names_all_exist():
    """A typo'd FIRST_TIER name would silently lose its priority slot
    (ordered_names ignores unknown names) — fail loudly instead."""
    registry.load_all()
    unknown = [n for n in registry.FIRST_TIER if n not in registry.QUERIES]
    assert unknown == [], f"FIRST_TIER names not in QUERIES: {unknown}"


def test_first_tier_has_no_duplicates():
    seen, dups = set(), []
    for n in registry.FIRST_TIER:
        if n in seen:
            dups.append(n)
        seen.add(n)
    assert dups == []


def test_ordered_names_cover_all_queries_exactly_once():
    registry.load_all()
    names = registry.ordered_names()
    assert sorted(names) == sorted(registry.QUERIES)
    assert len(names) == len(set(names))


def test_every_oracle_has_a_query():
    registry.load_all()
    orphans = [n for n in registry.ORACLES if n not in registry.QUERIES]
    assert orphans == []


def test_every_query_has_an_oracle():
    """r6 closed the rows-only class: the last four hash-family-
    dependent queries (similarity_topk_lsh/ivf, dedup_simhash,
    multimodal_features) were converted to property-gated oracles
    (VERDICT r5 items 2/4/5), so EVERY registered query now carries a
    DuckDB oracle and the driver's weaker rows-only path is dead code
    for this registry. A new unoracled query is a regression of that
    invariant — either give it a full value-hash oracle or a property
    gate (the sample_exact_n_rand device), not a bare registration."""
    registry.load_all()
    unoracled = [n for n in registry.QUERIES if n not in registry.ORACLES]
    assert unoracled == [], unoracled
