"""Pin natural suite ordering of the public query registry.

Round-2 VERDICT flagged a driver-aware CHECK_PRIORITY reordering as gaming;
round 3 removed it. This regression test keeps it out: the order of
``all_queries()`` must be exactly the concatenation of the suite modules'
dict orders (the ``_ALL_SUITES`` tuple). Round 10 led with suite_llm and
round 11 leads with streaming/maintenance/llm-tail (both rotations
requested by the preceding round's VERDICT so the driver's fixed window
cycles through never-checked queries) — no verification-aware shuffling,
no priority lists.
"""

from __future__ import annotations

from demo_bigdata_spark.suites import _ALL_SUITES, all_oracles, all_queries


def test_all_queries_is_natural_concatenation():
    natural = [name for mod in _ALL_SUITES for name in mod.QUERIES]
    assert list(all_queries().keys()) == natural


def test_oracles_subset_in_natural_order():
    natural = [
        name
        for mod in _ALL_SUITES
        for name, (_fn, sql) in mod.QUERIES.items()
        if sql is not None
    ]
    assert list(all_oracles().keys()) == natural


def test_no_priority_constant_reintroduced():
    import demo_bigdata_spark.suites as suites_pkg

    for mod in (suites_pkg, *_ALL_SUITES):
        offenders = [
            a
            for a in vars(mod)
            if a.upper() in ("CHECK_PRIORITY", "QUERY_PRIORITY", "PRIORITY")
        ]
        assert not offenders, f"{mod.__name__}: {offenders}"
