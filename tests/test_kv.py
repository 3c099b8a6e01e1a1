"""KV column semantics unit tests, modeled on the reference's
DoubleTests.cs (TryPut duplicate rejection, PutOrAppend ordered
append, GetMany count)."""

from __future__ import annotations

from resin_spark.operators import kv


def _column(spark, rows):
    return spark.createDataFrame(rows, "key long, seq long, value string")


def test_try_put_first_wins(spark):
    col = _column(spark, [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")])
    out = {r["key"]: r["value"] for r in kv.try_put(col).collect()}
    assert out == {1: "a", 2: "c"}


def test_get_many_preserves_insertion_order(spark):
    col = _column(spark, [(1, 2, "second"), (1, 1, "first"), (1, 3, "third"), (2, 1, "only")])
    out = {r["key"]: r for r in kv.get_many(col).collect()}
    assert out[1]["values"] == ["first", "second", "third"]
    assert out[1]["concat_values"] == "first|second|third"
    assert out[1]["value_count"] == 3
    assert out[2]["value_count"] == 1


def test_set_ops(spark):
    a = _column(spark, [(1, 1, "x"), (2, 1, "x"), (2, 2, "y")])
    b = _column(spark, [(2, 1, "x"), (3, 1, "x")])
    assert sorted(r["key"] for r in kv.set_union(a, b).collect()) == [1, 2, 3]
    assert sorted(r["key"] for r in kv.set_intersect(a, b).collect()) == [2]
    assert sorted(r["key"] for r in kv.set_except(a, b).collect()) == [1]


def test_key_join(spark):
    col = _column(spark, [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")])
    probe = _column(spark, [(2, 1, "_"), (3, 1, "_"), (9, 1, "_")])
    got = sorted(r["key"] for r in kv.key_join(col, probe).collect())
    assert got == [2, 3]
