"""Schema enforcement (SURVEY S1/§1.2): vector dims, string caps."""

import pytest

from gamma_spark.schema import TableSchema, VectorField


def test_binary_dim_divisible_by_8():
    with pytest.raises(ValueError):
        VectorField("b", 63, data_type="BINARY")
    VectorField("b", 64, data_type="BINARY")


def test_conform_rejects_bad_dims_and_truncates(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], "x" * 50),
            (2, [1.0, 2.0, 3.0], "ok"),
            (3, [0.5, 0.5], "y" * 5),
        ],
        "id long, vec array<float>, s string",
    )
    schema = TableSchema(
        vector_fields=(VectorField("vec", 2),),
        indexed_strings=("s",),
        max_index_string_len=10,
    )
    valid, rejected = schema.conform(df)
    v = {r.id: r for r in valid.collect()}
    assert set(v) == {1, 3}
    assert len(v[1].s) == 10  # truncated to the index cap
    rej = rejected.collect()
    assert len(rej) == 1 and rej[0].id == 2
    assert "dim 3 != 2" in rej[0]._reject_reason
