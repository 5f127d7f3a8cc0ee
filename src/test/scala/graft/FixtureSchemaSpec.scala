package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Guards the loaded-dtype contract between the driver-generated
  * fixtures and every query in SparkEntry. The driver regenerates
  * /root/testdata between rounds and has already silently changed
  * events.ts parquet precision once (NANOS → MICROS, round 7 — nine
  * queries failed analysis). This spec makes the next drift fail one
  * named test instead of a query family:
  *  - asserts the dtype of every column a query depends on, as seen
  *    through the Tables loaders (i.e. AFTER adaptation);
  *  - proves Tables.events adapts a micros-timestamp fixture to the
  *    nanos-long contract with exact integer arithmetic;
  *  - proves an unadaptable ts type fails loudly, not at analysis
  *    time nine queries later.
  */
class FixtureSchemaSpec extends SparkSpec {

  private def dtypes(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("events loads with ts as nanos long regardless of fixture precision") {
    val t = dtypes(Tables.events(spark, Sf))
    assert(t("ts") === LongType, "ts must be nanos-since-epoch long after adaptation")
    assert(t("event_id") === LongType)
    assert(t("user_id") === LongType)
    assert(t("event_type") === StringType)
    assert(t("value") === DoubleType)
    assert(t("props") === StringType)
  }

  test("embeddings loads with embedding as array<float>") {
    val t = dtypes(Tables.embeddings(spark, Sf))
    assert(t("vec_id") === LongType)
    assert(t("embedding") === ArrayType(FloatType, containsNull = true))
    assert(t("label") === IntegerType)
  }

  test("documents loads with the text-analysis dtypes") {
    val t = dtypes(Tables.documents(spark, Sf))
    assert(t("doc_id") === LongType)
    assert(t("text") === StringType)
    assert(t("lang") === StringType)
    assert(t("source") === StringType)
    assert(t("n_chars") === LongType)
  }

  test("relational tables load with the key/measure dtypes the queries assume") {
    val li = dtypes(Tables.lineitem(spark, Sf))
    assert(li("l_orderkey") === LongType)
    assert(li("l_quantity") === DoubleType)
    assert(li("l_extendedprice") === DoubleType)
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType).contains(li("l_shipdate")),
      s"l_shipdate must be a date/timestamp, got ${li("l_shipdate")}")
    val o = dtypes(Tables.orders(spark, Sf))
    assert(o("o_orderkey") === LongType)
    assert(o("o_custkey") === LongType)
    assert(o("o_totalprice") === DoubleType)
    val c = dtypes(Tables.customer(spark, Sf))
    assert(c("c_custkey") === LongType)
    assert(c("c_mktsegment") === StringType)
    assert(dtypes(Tables.nation(spark, Sf))("n_nationkey") === IntegerType)
    assert(dtypes(Tables.region(spark, Sf))("r_regionkey") === IntegerType)
    assert(dtypes(Tables.supplier(spark, Sf))("s_suppkey") === LongType)
    assert(dtypes(Tables.part(spark, Sf))("p_partkey") === LongType)
  }

  test("Tables.events adapts a micros-written fixture to exact nanos") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fixture-drift").toFile.getAbsolutePath
    // 2024-01-02T03:04:05.678901Z = 1704164645678901 µs since epoch.
    val micros = 1704164645678901L
    Seq((1L, new Timestamp(micros / 1000), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr(s"timestamp_micros(${micros}L)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType === LongType)
    val got = loaded.select("ts").head().getLong(0)
    assert(got === micros * 1000L, s"expected exact µs→ns integer math, got $got")
  }

  test("Tables.events fails loudly on an unadaptable ts type") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fixture-bad").toFile.getAbsolutePath
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[RuntimeException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }
}
