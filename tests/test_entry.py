"""Driver-contract smoke tests: entry(), queries(), oracle keys align."""

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs and callable(next(iter(qs.values())))
    # every oracle key must correspond to a query
    assert set(oracles) <= set(qs)
    # the majority of queries carry an oracle
    assert len(oracles) >= len(qs) - 5


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "_from" in df.columns and "_uri" in df.columns


def test_kg_doc_triples_shape(spark):
    df = entrymod.queries()["kg_doc_triples"](spark, SF)
    assert df.columns == ["subj", "pred", "obj"]
    rows = df.collect()
    assert rows
    preds = {r["pred"] for r in rows}
    assert "http://kg.example.org/prop/mentions" in preds


def test_dedup_exact_query(spark):
    df = entrymod.queries()["dedup_exact"](spark, SF)
    assert {"fp", "n_dups", "keep_id"} == set(df.columns)
    # testdata has no exact duplicates; the operator itself is exercised in
    # test_dataops with planted clones
    assert df.count() == 0
