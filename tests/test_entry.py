"""Driver-contract smoke: entry() runs, returns rows with a stable schema;
queries()/oracle_sql() keys are consistent."""

from __future__ import annotations

import importlib.util
import os


def _load_entry_module():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "event_category" in df.columns


def test_contract_consistency(spark):
    mod = _load_entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "queries() must not be empty"
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys not in queries(): {missing}"
