"""DDL parse/apply tests — mirrors the reference's ``ddl_sql_parse``
corpus (/root/reference/src/delta/mod.rs:497-547) and goes further by
asserting the *applied* schema evolution the reference leaves as todo.
"""

from __future__ import annotations

from pyspark.sql import types as T

from rust_cdc_spark.operators.ddl import (
    DdlOp,
    apply_ddl,
    parse_ddl,
    spark_type_from_ddl,
    strip_comments,
)

BASE = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
    ]
)


class TestParse:
    def test_comment_strip(self):
        """Reference replace_note regex (event/mod.rs:18-23)."""
        assert (
            strip_comments("/* gh-ost */ ALTER TABLE t ADD c INT /* x */")
            == "ALTER TABLE t ADD c INT"
        )

    def test_add_column(self):
        op = parse_ddl("ALTER TABLE user ADD COLUMN age INT")
        assert op == DdlOp("add_column", "user", "age", None, "INT")

    def test_add_column_no_kw_with_type_args(self):
        op = parse_ddl("alter table t add price decimal(10, 4)")
        assert op.kind == "add_column" and op.col_type == "decimal(10, 4)"

    def test_drop_column(self):
        op = parse_ddl("ALTER TABLE `user` DROP COLUMN `age`")
        assert op == DdlOp("drop_column", "user", "age")

    def test_rename_column(self):
        op = parse_ddl("ALTER TABLE user RENAME COLUMN age TO years")
        assert op == DdlOp("rename_column", "user", "age", "years")

    def test_rename_table(self):
        op = parse_ddl("RENAME TABLE user TO customer")
        assert op.kind == "rename_table" and op.new_name == "customer"
        op2 = parse_ddl("ALTER TABLE user RENAME TO customer")
        assert op2.kind == "rename_table" and op2.new_name == "customer"

    def test_drop_truncate(self):
        assert parse_ddl("DROP TABLE IF EXISTS user").kind == "drop_table"
        assert parse_ddl("TRUNCATE TABLE user").kind == "truncate"

    def test_non_ddl_returns_none(self):
        assert parse_ddl("INSERT INTO t VALUES (1)") is None
        assert parse_ddl("SELECT 1") is None


class TestApply:
    def test_add_then_drop_roundtrip(self):
        s1 = apply_ddl(BASE, parse_ddl("ALTER TABLE t ADD COLUMN age INT"))
        assert s1.fieldNames() == ["id", "name", "age"]
        assert s1["age"].dataType == T.IntegerType()
        s2 = apply_ddl(s1, parse_ddl("ALTER TABLE t DROP COLUMN age"))
        assert s2 == BASE

    def test_rename_preserves_type(self):
        s = apply_ddl(BASE, parse_ddl("ALTER TABLE t RENAME COLUMN name TO title"))
        assert s.fieldNames() == ["id", "title"]
        assert s["title"].dataType == T.StringType()

    def test_add_existing_is_noop(self):
        s = apply_ddl(BASE, parse_ddl("ALTER TABLE t ADD COLUMN name TEXT"))
        assert s == BASE

    def test_type_mapping(self):
        assert spark_type_from_ddl("DECIMAL(10,4)") == T.DecimalType(10, 4)
        assert spark_type_from_ddl("varchar(40)") == T.StringType()
        assert spark_type_from_ddl("BIGINT") == T.LongType()
        assert spark_type_from_ddl("datetime") == T.TimestampNTZType()


class TestEvolutionEndToEnd:
    def test_stream_survives_add_column(self, spark, tmp_path):
        """DDL mid-stream: rows before the ALTER lack the new column;
        the map-fallback envelope + typed_images(null-fill) keep both
        decodable against the evolved schema."""
        from rust_cdc_spark.streaming.pipeline import ParquetUpsertTable

        table = ParquetUpsertTable(str(tmp_path / "t"), ["id"], image_schema=BASE)
        rows = [
            (1, 1, "I", None, {"id": "1", "name": "a"}),
            (2, 2, "I", None, {"id": "2", "name": "b"}),
        ]
        df = spark.createDataFrame(
            rows, "log_pos long, id long, op string, before map<string,string>, after map<string,string>"
        )
        table.merge(df, txn_version=0)

        evolved = apply_ddl(BASE, parse_ddl("ALTER TABLE t ADD COLUMN age INT"))
        table.image_schema = evolved
        rows2 = [
            (3, 1, "U", {"id": "1", "name": "a"}, {"id": "1", "name": "a", "age": "30"}),
        ]
        df2 = spark.createDataFrame(
            rows2, "log_pos long, id long, op string, before map<string,string>, after map<string,string>"
        )
        # pre-DDL target lacks 'age': evolve the snapshot by null-filling
        target = table.read(spark)
        from pyspark.sql import functions as F

        table.overwrite(target.withColumn("age", F.lit(None).cast("int")))
        table.merge(df2, txn_version=1)
        got = {r.id: (r.name, r.age) for r in table.read(spark).collect()}
        assert got == {1: ("a", 30), 2: ("b", None)}
