"""Source-layer unit tests: ET validation, readers, pushdown, indexing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.sources.source import (
    ExtractTransformError,
    LOCATION_READERS,
    SourceConfig,
    register_location_reader,
    validate_extract_transform,
)


@pytest.fixture()
def customer_path(sf_dir):
    return f"{sf_dir}/customer.parquet"


def test_et_validation():
    validate_extract_transform("SELECT * FROM t")
    validate_extract_transform("with x as (select 1) select * from x")
    for bad in [
        "DROP TABLE t",
        "SELECT 1; SELECT 2",
        "INSERT INTO t VALUES (1)",
        "UPDATE t SET a = 1",
    ]:
        with pytest.raises(ExtractTransformError):
            validate_extract_transform(bad)


def test_invalid_source_name():
    with pytest.raises(ValueError):
        SourceConfig(name="bad-name!", location="x", key_field="k", index_fields=["a"])


def test_unknown_format(spark, customer_path):
    src = SourceConfig(
        name="s", location=customer_path, key_field="c_custkey",
        index_fields=["c_name"], format="nope",
    )
    with pytest.raises(ValueError, match="unknown location format"):
        src.read(spark)


def test_extract_transform_applies(spark, customer_path):
    src = SourceConfig(
        name="s",
        location=customer_path,
        key_field="c_custkey",
        index_fields=["c_name"],
        extract_transform=(
            "SELECT c_custkey, upper(c_name) AS c_name FROM $THIS WHERE c_nationkey < 5"
        ),
    )
    df = src.read(spark)
    assert df.columns == ["c_custkey", "c_name"]
    assert df.schema["c_custkey"].dataType.simpleString() == "string"  # key cast
    row = df.first()
    assert row["c_name"] == row["c_name"].upper()


def test_key_filter_and_sample(spark, customer_path):
    src = SourceConfig(
        name="s", location=customer_path, key_field="c_custkey",
        index_fields=["c_name"],
    )
    out = src.read(spark, keys=["1", "2", "3"])
    assert out.count() == 3
    assert src.sample(spark, 5).count() == 5
    assert "c_name" in [f.name for f in src.probe_schema(spark).fields]


def test_custom_reader_registration(spark, tmp_path):
    @register_location_reader("rangegen")
    def _range_reader(spark_, location, options):
        return spark_.range(int(location)).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")
        )

    try:
        src = SourceConfig(
            name="gen", location="9", key_field="k", index_fields=["v"],
            format="rangegen",
        )
        idx = src.index(spark)
        # 9 rows, v in {0,1,2} → 3 content clusters of 3 keys each
        rows = idx.collect()
        assert len(rows) == 3
        assert all(len(r["keys"]) == 3 for r in rows)
    finally:
        LOCATION_READERS.pop("rangegen", None)


def test_cache_to_parquet_roundtrip(spark, customer_path, tmp_path):
    src = SourceConfig(
        name="s", location=customer_path, key_field="c_custkey",
        index_fields=["c_name"],
    )
    cache = str(tmp_path / "cache.parquet")
    src.cache_to_parquet(spark, cache)
    assert spark.read.parquet(cache).count() == src.read(spark).count()


def test_index_missing_column(spark, customer_path):
    src = SourceConfig(
        name="s", location=customer_path, key_field="c_custkey",
        index_fields=["not_there"],
    )
    with pytest.raises(ValueError, match="missing columns"):
        src.index(spark)


def test_probe_schema_deep_null_leading_csv(spark, tmp_path):
    """S4: a CSV column whose first rows are null still gets its real type —
    the per-column non-null probe (reference locations.py:296-320), not a
    first-row limit(1) guess."""
    from pyspark.sql import types as T

    p = str(tmp_path / "probe.csv")
    with open(p, "w") as f:
        # amount: null-leading; flag: null-leading boolean; note: all-null
        f.write("k,amount,flag,note\n")
        f.write("a,,,\n")
        f.write("b,,,\n")
        f.write("c,12.5,true,\n")
    src = SourceConfig(
        name="probe", location=p, key_field="k", index_fields=["amount"],
        format="csv", options={"inferSchema": "false"},
    )
    schema = {f.name: f.dataType for f in src.probe_schema(spark, deep=True)}
    assert schema["amount"] == T.DoubleType()
    assert schema["flag"] == T.BooleanType()
    assert schema["note"] == T.StringType()  # all-null degrades to string
    # shallow probe keeps the reader's schema untouched
    shallow = {f.name: f.dataType for f in src.probe_schema(spark)}
    assert shallow["amount"] == T.StringType()


def test_source_config_dict_roundtrip_with_field_types(spark, customer_path):
    src = SourceConfig(
        name="cust", location=customer_path, key_field="c_custkey",
        index_fields=["c_name", "c_acctbal"],
    )
    d = src.to_dict(spark)
    # typed index fields ride in the reference's DataTypes wire format
    assert d["field_types"]["c_name"] == "String"
    assert d["field_types"]["c_acctbal"] in ("Float64", "Decimal")
    back = SourceConfig.from_dict(d)
    assert back == src


def test_orc_source_roundtrip(spark, tmp_path):
    p = str(tmp_path / "cust_orc")
    spark.createDataFrame(
        [("k1", "alice", 10), ("k2", "bob", 20)], "key string, name string, v long"
    ).write.orc(p)
    src = SourceConfig(
        name="o", location=p, key_field="key", index_fields=["name"], format="orc"
    )
    assert src.read(spark).count() == 2
    assert src.index(spark).count() == 2


def test_text_location_reader(spark, tmp_path):
    """Line-oriented ingestion through the source registry, ET-conformed
    to the documents shape."""
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("first line\nsecond line\n")
    cfg = SourceConfig(
        name="txt",
        location=str(p),
        key_field="doc_id",
        index_fields=["text"],
        format="text",
        extract_transform=(
            "SELECT row_number() OVER (ORDER BY value) AS doc_id, "
            "value AS text FROM $THIS"
        ),
    )
    rows = {r["text"] for r in cfg.read(spark).collect()}
    assert rows == {"first line", "second line"}
    # wholetext: one row per file
    whole = SourceConfig(
        name="txtw",
        location=str(p),
        key_field="doc_id",
        index_fields=["text"],
        format="text",
        options={"wholetext": "true"},
        extract_transform=(
            "SELECT 1 AS doc_id, value AS text FROM $THIS"
        ),
    )
    out = whole.read(spark).collect()
    assert len(out) == 1 and "second line" in out[0]["text"]


def test_binaryfile_location_reader_feeds_codecs(spark, tmp_path):
    """binaryFile scan → real PNG/BMP decode: the object-storage on-ramp
    for the multimodal stages, with extension pruning via pathGlobFilter."""
    import numpy as np

    from matchbox_spark.operators.multimodal import (
        decode_image_stats,
        encode_bmp,
        encode_png,
    )

    p = tmp_path / "objects"
    p.mkdir()
    img = np.full((3, 5, 3), (9, 8, 7), dtype=np.uint8)
    (p / "one.png").write_bytes(encode_png(img, filter_type=2))
    (p / "two.bmp").write_bytes(encode_bmp(img))
    (p / "junk.txt").write_bytes(b"not an image")

    cfg = SourceConfig(
        name="objs",
        location=str(p),
        key_field="path",
        index_fields=["content"],
        format="binaryfile",
    )
    df = cfg.read(spark)
    assert {"path", "content", "length"} <= set(df.columns)
    assert df.count() == 3

    pngs = SourceConfig(
        name="pngs",
        location=str(p),
        key_field="path",
        index_fields=["content"],
        format="binaryfile",
        options={"pathGlobFilter": "*.png"},
    )
    assert pngs.read(spark).count() == 1  # pruned at listing time

    from pyspark.sql import functions as F

    media = df.where(F.col("path").rlike(r"\.(png|bmp)$")).select(
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("path")
        ).alias("doc_id"),
        F.col("content").alias("payload"),
        F.when(F.col("path").endswith(".png"), "image/png")
        .otherwise("image/bmp")
        .alias("media_type"),
    )
    stats = {
        (r["width"], r["height"], r["mean_r"])
        for r in decode_image_stats(media).collect()
    }
    assert stats == {(5, 3, 9.0)}
