from __future__ import annotations

from halvesting_geometric_spark.datagen import generate_transcripts
from halvesting_geometric_spark.sources.catalog import TableCatalog


def test_parquet_catalog_roundtrip(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    assert cat.iceberg is None  # no Iceberg jars in this image
    tr = generate_transcripts(spark, 15, seed=1)
    assert not cat.exists("transcripts")
    cat.write(tr, "transcripts")
    assert cat.exists("transcripts")
    assert cat.read("transcripts").count() == tr.count()
    cat.write(tr.limit(5), "transcripts", mode="append")
    assert cat.read("transcripts").count() == tr.count() + 5
