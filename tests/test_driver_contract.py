"""The driver contract surface (__spark_entry__.py): entry() runs on
the session and returns the flagship result; queries()/oracle_sql()
stay structurally consistent."""

from __future__ import annotations

import importlib.util


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_flagship_result(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]
    assert len(rows) >= 1


def test_contract_shape():
    mod = _entry_module()
    qs, oracles = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 200
    assert set(oracles) <= set(qs), "oracle without a query"
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
    # names are stable identifiers (the driver uses them as keys)
    assert all(n.replace("_", "").isalnum() and n == n.lower() for n in qs)
