"""Table-expectations suite: N rules, one aggregation pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fairtracks_validator_spark.operators import expectations as X


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", "en", 10),
            (2, "beta", "en", 20),
            (3, None, "de", 30),
            (4, "delta", "xx", 40),
        ],
        "id long, text string, lang string, n int",
    )


def _report(spark, rules):
    return {r["rule_id"]: r.asDict() for r in X.run_expectations(_df(spark), rules).collect()}


def test_all_metric_kinds(spark):
    rep = _report(
        spark,
        [
            X.row_count(lo=4, hi=4),
            X.null_rate("text", 0.25),
            X.min_value("n", lo=10),
            X.max_value("n", hi=40),
            X.mean_value("n", lo=25, hi=25),
            X.quantile_value("n", 0.5, lo=25, hi=25),
            X.accepted_values("lang", ["en", "de"], min_rate=0.75),
            X.match_rate("lang", "[a-z]{2}", min_rate=1.0),
            X.distinct_count("lang", lo=3, hi=3, approx=False),
        ],
    )
    assert all(r["passed"] for r in rep.values()), rep
    assert rep["row_count"]["metric"] == 4.0
    assert rep["null_rate:text"]["metric"] == 0.25
    assert rep["mean:n"]["metric"] == 25.0
    assert rep["q0.5:n"]["metric"] == 25.0
    assert rep["accepted:lang"]["metric"] == 0.75
    assert rep["match:lang"]["metric"] == 1.0
    assert rep["distinct:lang"]["metric"] == 3.0


def test_failing_bounds_and_nulls(spark):
    df = _df(spark).withColumn("never", F.lit(None).cast("double"))
    rep = {
        r["rule_id"]: r.asDict()
        for r in X.run_expectations(
            df,
            [
                X.row_count(lo=100),
                X.null_rate("text", 0.1),
                X.accepted_values("lang", ["en"], min_rate=0.9),
                # all-null column: metric NULL -> failed, never silently passed
                X.mean_value("never", lo=0),
            ],
        ).collect()
    }
    assert not any(r["passed"] for r in rep.values())
    assert rep["mean:never"]["metric"] is None


def test_accepted_and_match_ignore_nulls(spark):
    df = _df(spark).withColumn("lang", F.when(F.col("id") == 1, None).otherwise(F.col("lang")))
    rep = {
        r["rule_id"]: r.asDict()
        for r in X.run_expectations(
            df, [X.accepted_values("lang", ["en", "de", "xx"], 1.0)]
        ).collect()
    }
    # 3 non-null values, all accepted: rate 1.0 over the non-null base
    assert rep["accepted:lang"]["metric"] == 1.0 and rep["accepted:lang"]["passed"]


def test_single_scan_plan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _df(spark).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    rules = [
        X.row_count(lo=1),
        X.null_rate("text", 1.0),
        X.mean_value("n", lo=0),
        X.quantile_value("n", 0.9),
        X.match_rate("lang", ".*"),
        X.distinct_count("lang", approx=True),
    ]
    plan = X.run_expectations(df, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_single_scan_even_with_exact_distinct(spark, tmp_path):
    p = str(tmp_path / "t2.parquet")
    _df(spark).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    rules = [X.mean_value("n", lo=0), X.distinct_count("lang", approx=False)]
    plan = X.run_expectations(df, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_violations_bridge_schema(spark):
    rep = X.run_expectations(_df(spark), [X.row_count(lo=100), X.mean_value("n", lo=0)])
    v = X.violations(rep)
    assert v.columns == [
        "source", "ord", "schema_id", "check_id", "key_str", "reason", "description",
    ]
    rows = v.collect()
    assert len(rows) == 1 and rows[0]["check_id"] == "row_count"
    assert "not in [100.0, +inf]" in rows[0]["description"]


def test_duplicate_and_empty_rules_raise(spark):
    with pytest.raises(ValueError):
        X.run_expectations(_df(spark), [])
    with pytest.raises(ValueError):
        X.run_expectations(_df(spark), [X.row_count(), X.row_count()])
    with pytest.raises(ValueError):
        X.run_expectations(_df(spark), [X.Rule("bogus", "nope", "n")])


def test_rules_from_json_roundtrip():
    spec = [
        {"kind": "row_count", "lo": 1},
        {"kind": "null_rate", "column": "text", "hi": 0.05},
        {"kind": "quantile", "column": "n", "q": 0.5, "lo": 1, "hi": 100},
        {"kind": "accepted_values", "column": "lang", "values": ["en"], "lo": 0.9},
        {"kind": "match_rate", "column": "lang", "pattern": "[a-z]{2}", "lo": 1.0},
        {"kind": "distinct", "column": "lang", "lo": 1, "hi": 9},
        {"kind": "mean", "column": "n", "hi": 10, "rule_id": "mean_low:n"},
    ]
    rules = X.rules_from_json(spec)
    assert [r.rule_id for r in rules] == [
        "row_count", "null_rate:text", "q0.5:n", "accepted:lang",
        "match:lang", "distinct:lang", "mean_low:n",
    ]
    assert rules[5].params == {"approx": True}


def test_rules_from_json_rejects_typos():
    with pytest.raises(ValueError, match="unknown keys"):
        X.rules_from_json([{"kind": "mean", "column": "n", "high": 10}])
    with pytest.raises(ValueError, match="missing 'column'"):
        X.rules_from_json([{"kind": "mean", "lo": 0}])
    with pytest.raises(ValueError, match="unknown kind"):
        X.rules_from_json([{"kind": "median", "column": "n"}])
    with pytest.raises(ValueError, match="missing 'q'"):
        X.rules_from_json([{"kind": "quantile", "column": "n"}])


def test_cli_expect_subcommand(spark, tmp_path, capsys):
    import json

    from fairtracks_validator_spark.cli import main

    rules_file = tmp_path / "rules.json"
    rules_file.write_text(json.dumps([
        {"kind": "row_count", "lo": 1},
        {"kind": "null_rate", "column": "text", "hi": 0.05},
        {"kind": "mean", "column": "n_chars", "lo": 1, "hi": 10000},
    ]))
    out = str(tmp_path / "report")
    rc = main(["expect", "--input", "/root/testdata/sf0.001/documents.parquet",
               "--rules", str(rules_file), "--out", out])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload == {"rules": 3, "failed": 0, "failures": []}
    rep = spark.read.parquet(out)
    assert rep.count() == 3 and set(rep.columns) == {
        "rule_id", "column", "metric", "lo", "hi", "passed",
    }

    # failing bound -> exit code 1 + failure detail
    rules_file.write_text(json.dumps([
        {"kind": "mean", "column": "n_chars", "hi": 10},
    ]))
    rc = main(["expect", "--input", "/root/testdata/sf0.001/documents.parquet",
               "--rules", str(rules_file)])
    assert rc == 1
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["failed"] == 1
    assert payload["failures"][0]["rule_id"] == "mean:n_chars"


def test_suggest_rules_shapes(spark):
    df = _df(spark)
    rules = X.suggest_rules(df, columns=["text", "lang", "n"])
    by_id = {r.rule_id: r for r in rules}
    # row-count band around the observed 4
    assert by_id["row_count"].lo == 2 and by_id["row_count"].hi == 6
    # text: 1/4 nulls observed -> ceiling 0.27
    assert abs(by_id["null_rate:text"].hi - 0.27) < 1e-9
    # numeric n: [10, 40] widened by 25% of span
    assert by_id["min:n"].lo == 2.5 and by_id["max:n"].hi == 47.5
    # lang: low-cardinality string -> pinned value set at rate 1.0
    assert by_id["accepted:lang"].params["values"] == ["de", "en", "xx"]
    assert by_id["accepted:lang"].lo == 1.0
    # suggested rules PASS on the table they were suggested from
    rep = X.run_expectations(df, rules)
    assert all(r["passed"] for r in rep.collect())


def test_suggest_rules_json_roundtrip(spark):
    df = _df(spark)
    rules = X.suggest_rules(df, columns=["lang", "n"])
    spec = X.rules_to_json(rules)
    again = X.rules_from_json(spec)
    assert again == rules


def test_suggest_rules_skips_high_cardinality(spark):
    df = _df(spark).withColumn("uid", F.concat(F.lit("u"), F.col("id")))
    rules = X.suggest_rules(df, columns=["uid"], max_categories=2)
    assert not any(r.kind == "accepted_values" for r in rules)


def test_suggest_rules_unknown_column(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown columns"):
        X.suggest_rules(_df(spark), columns=["nope"])


def test_cli_expect_suggest_roundtrip(spark, tmp_path, capsys):
    import json

    from fairtracks_validator_spark.cli import main

    rules_file = tmp_path / "suggested.json"
    rc = main(["expect", "--input", "/root/testdata/sf0.001/documents.parquet",
               "--rules", str(rules_file), "--suggest",
               "--columns", "lang,n_chars,text"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["rules_file"] == str(rules_file) and payload["suggested"] >= 4
    # the suggested set passes against the table it came from
    rc = main(["expect", "--input", "/root/testdata/sf0.001/documents.parquet",
               "--rules", str(rules_file)])
    assert rc == 0
