"""Wire-level predicate pushdown for the es_http source: Spark filters
become ES query-DSL clauses inside the ``_search`` body (the cluster
prunes the scan server-side), gated on the index MAPPING so analyzed
text fields never receive a silently-wrong ``term``; untranslatable
predicates stay Spark-side, and answers are identical either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.sinks import es_wire
from s3_elasticsearch_data_pipeline_spark.sources import es_http
from tests.es_stub import ESStub

FAST = dict(backoff_base_s=0.0, timeout_s=10.0)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(f"id-{i:04d}", f"m{i % 5}", float(i), i % 3 == 0)
            for i in range(400)]
    return spark.createDataFrame(
        rows, "id string, month string, value double, flagged boolean")


def _load_keyword_index(stub, df, index):
    """Explicitly create the index from the Spark schema (strings →
    keyword — the exact-comparison mapping) and bulk-load it."""
    assert es_wire.create_index(stub.url, index, df.schema)
    es_wire.write_df(df, stub.url, index, id_col="id", **FAST)


def _clauses_seen(stub):
    """Every bool.filter clause list the stub's _search received."""
    out = []
    for _, body in stub.server.search_bodies:
        q = body.get("query") or {}
        if "bool" in q:
            out.append(q["bool"].get("filter", []))
    return out


def test_pushdown_prunes_server_side_and_answers_match(spark, docs_df):
    """Equality + range + IN predicates on a keyword-mapped index reach
    the ``_search`` body; the answer equals the source frame filtered
    in Spark."""
    expected = {(r.id, r.month, r.value)
                for r in docs_df.where(
                    (F.col("month") == "m2") & (F.col("value") < 100.0))
                .select("id", "month", "value").collect()}
    assert expected  # non-trivial selection
    with ESStub() as stub:
        _load_keyword_index(stub, docs_df, "serving")
        df = es_http.read_es_index(spark, stub.url, "serving", nslices=4)
        got = {(r.id, r.month, r.value)
               for r in df.where((F.col("month") == "m2")
                                 & (F.col("value") < 100.0))
               .select("id", "month", "value").collect()}
        assert got == expected
        # the wire carried the translated clauses
        clause_lists = _clauses_seen(stub)
        assert clause_lists, "no bool.filter query reached the server"
        flat = [c for cl in clause_lists for c in cl]
        assert {"term": {"month": "m2"}} in flat
        assert {"range": {"value": {"lt": 100.0}}} in flat
        assert len(stub.server.store["serving"]) == 400  # full corpus
        # IN-list → terms clause
        got_in = {r.id for r in df.where(
            F.col("month").isin("m0", "m1")).select("id").collect()}
        want_in = {r.id for r in docs_df.where(
            F.col("month").isin("m0", "m1")).collect()}
        assert got_in == want_in
        assert any("terms" in c for cl in _clauses_seen(stub) for c in cl)


def test_pushdown_untranslatable_predicates_stay_spark_side(spark,
                                                            docs_df):
    """A predicate the translator can't express (arithmetic on a
    column) must still be answered correctly — Spark applies it
    post-scan; the translatable conjunct is still pushed."""
    with ESStub() as stub:
        _load_keyword_index(stub, docs_df, "serving")
        df = es_http.read_es_index(spark, stub.url, "serving", nslices=3)
        got = {r.id for r in df.where(
            (F.col("month") == "m1")
            & (F.col("value") % 2 == 1.0)).select("id").collect()}
        want = {r.id for r in docs_df.where(
            (F.col("month") == "m1")
            & (F.col("value") % 2 == 1.0)).collect()}
        assert got == want
        flat = [c for cl in _clauses_seen(stub) for c in cl]
        assert {"term": {"month": "m1"}} in flat
        # the modulo never appears in any wire query
        assert not any("script" in c for c in flat)


def test_pushdown_refuses_analyzed_text_fields(spark, docs_df):
    """THE exactness gate: on a dynamic-mapped index (no create_index —
    real ES maps strings to analyzed TEXT), string equality must NOT be
    pushed (a term on text silently matches nothing) — answers stay
    correct via Spark-side evaluation — while numeric predicates still
    push (dynamic numeric mappings compare exactly)."""
    with ESStub() as stub:
        es_wire.write_df(docs_df, stub.url, "dyn", id_col="id", **FAST)
        df = es_http.read_es_index(spark, stub.url, "dyn", nslices=3)
        got = {r.id for r in df.where(
            (F.col("month") == "m2")
            & (F.col("value") >= 100.0)).select("id").collect()}
        want = {r.id for r in docs_df.where(
            (F.col("month") == "m2")
            & (F.col("value") >= 100.0)).collect()}
        assert got == want
        flat = [c for cl in _clauses_seen(stub) for c in cl]
        assert not any("term" in c or "terms" in c or "prefix" in c
                       for c in flat), \
            "string comparisons must not be pushed onto text fields"
        assert {"range": {"value": {"gte": 100.0}}} in flat


def test_pushdown_null_prefix_and_negation(spark):
    """exists / must_not(exists) / prefix / Not(term) translations —
    filter-context semantics on nullable keyword fields, including the
    null-rejecting exists guard inside negations."""
    rows = [("a1", "alpha"), ("a2", None), ("b1", "beta"), ("b2", None)]
    frame = None
    with ESStub() as stub:
        frame = spark.createDataFrame(rows, "id string, tag string")
        _load_keyword_index(stub, frame, "t")
        df = es_http.read_es_index(spark, stub.url, "t", nslices=2,
                                   schema="id string, tag string")
        assert {r.id for r in df.where(F.col("tag").isNull())
                .collect()} == {"a2", "b2"}
        assert {r.id for r in df.where(F.col("tag").isNotNull())
                .collect()} == {"a1", "b1"}
        assert {r.id for r in df.where(F.col("tag").startswith("al"))
                .collect()} == {"a1"}
        assert {r.id for r in df.where(F.col("tag") != "alpha")
                .collect()} == {"b1"}  # SQL != is null-rejecting
        flat = [c for cl in _clauses_seen(stub) for c in cl]
        assert any("exists" in c for c in flat)
        assert any("prefix" in c for c in flat)


def test_pushdown_clause_translation_table():
    """Unit-level mapping checks with the type gate, including the
    refused edges (nested path, exotic value, text/unknown fields,
    unreadable mapping)."""
    from pyspark.sql.datasource import (EqualTo, GreaterThanOrEqual, In,
                                        IsNull, Not, StringStartsWith)
    types = {"month": "keyword", "v": "long", "t": "keyword",
             "body": "text", "ok": "boolean"}
    c = es_http._es_clause
    assert c(EqualTo(("month",), "m1"), types) == {"term": {"month": "m1"}}
    assert c(In(("month",), ("a", "b")), types) == {
        "terms": {"month": ["a", "b"]}}
    assert c(GreaterThanOrEqual(("v",), 3), types) == {
        "range": {"v": {"gte": 3}}}
    assert c(IsNull(("t",)), types) == {
        "bool": {"must_not": [{"exists": {"field": "t"}}]}}
    # negation of a value comparison carries the exists guard
    assert c(Not(EqualTo(("month",), "x")), types) == {
        "bool": {"must_not": [{"term": {"month": "x"}}],
                 "filter": [{"exists": {"field": "month"}}]}}
    assert c(StringStartsWith(("month",), "ab"), types) == {
        "prefix": {"month": {"value": "ab"}}}
    # refusals
    assert c(EqualTo(("a", "b"), 1), types) is None       # nested path
    assert c(EqualTo(("month",), bytearray(b"x")), types) is None
    assert c(EqualTo(("body",), "x"), types) is None      # analyzed text
    assert c(EqualTo(("ghost",), "x"), types) is None     # unmapped field
    assert c(EqualTo(("v",), "3"), types) is None         # str vs numeric
    assert c(EqualTo(("ok",), 1), types) is None          # int vs boolean
    assert c(EqualTo(("month",), "m"), None) is None      # no mapping
    # null checks stay pushable even with the mapping unreachable
    assert c(IsNull(("t",)), None) is not None
