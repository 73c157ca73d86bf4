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


class _FakeConf:
    def __init__(self, items):
        self._items = items

    def getAll(self):
        return self._items


class _FakeSC:
    def __init__(self, items):
        self._conf = _FakeConf(items)

    def getConf(self):
        return self._conf


class _FakeSpark:
    def __init__(self, items):
        self.sparkContext = _FakeSC(items)


def test_iceberg_catalog_name_detection():
    """Catalog autodetection off SparkConf: exactly the spark.sql.catalog.<name>
    keys whose value mentions Iceberg select the Iceberg branch; sub-keys
    (catalog options) and non-Iceberg catalogs don't."""
    from halvesting_geometric_spark.sources.catalog import iceberg_catalog_name

    ice = ("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    assert iceberg_catalog_name(_FakeSpark([ice])) == "ice"
    # option sub-keys alone must not trigger (key has >3 dots)
    assert (
        iceberg_catalog_name(
            _FakeSpark([("spark.sql.catalog.ice.type", "hadoop")])
        )
        is None
    )
    # a non-Iceberg catalog plugin must not trigger
    assert (
        iceberg_catalog_name(
            _FakeSpark([("spark.sql.catalog.x", "com.example.JdbcCatalog")])
        )
        is None
    )
    assert iceberg_catalog_name(_FakeSpark([])) is None


def test_iceberg_branch_dispatch_without_jars(spark, tmp_path, monkeypatch):
    """Pin the writeTo/read.table/tableExists routing of the Iceberg branch
    by intercepting the DataFrame/session methods — the image ships no
    Iceberg jars, so this is the executable contract for that path."""
    import halvesting_geometric_spark.sources.catalog as catmod

    monkeypatch.setattr(catmod, "iceberg_catalog_name", lambda s: "ice")
    cat = catmod.TableCatalog(spark, str(tmp_path / "unused"), namespace="g")
    assert cat.iceberg == "ice"

    calls: list[tuple] = []

    class _Writer:
        def __init__(self, ident):
            self._ident = ident

        def createOrReplace(self):
            calls.append(("createOrReplace", self._ident))

        def append(self):
            calls.append(("append", self._ident))

    tr = generate_transcripts(spark, 3, seed=1)
    monkeypatch.setattr(
        type(tr), "writeTo", lambda self, ident: _Writer(ident)
    )
    cat.write(tr, "state")
    cat.write(tr, "state", mode="append")
    assert calls == [
        ("createOrReplace", "ice.g.state"),
        ("append", "ice.g.state"),
    ]

    reads: list[str] = []
    monkeypatch.setattr(
        type(spark.read),
        "table",
        lambda self, ident: reads.append(ident) or tr,
    )
    assert cat.read("state") is tr
    assert reads == ["ice.g.state"]

    exists_q: list[str] = []
    monkeypatch.setattr(
        type(spark.catalog),
        "tableExists",
        lambda self, ident: exists_q.append(ident) or True,
    )
    assert cat.exists("state") is True
    assert exists_q == ["ice.g.state"]
