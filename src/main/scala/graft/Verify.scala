package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    OracleEnv.sfDir = sfDir // ANN replay oracles embed this sfDir's store paths
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", 1024) // point-read In lists prune row groups (Dedup.eqAnyPred)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      // mm_* decode plans end in sortWithinPartitions (range-disjoint
      // partitions, no final exchange), so coalesce(1) would collapse
      // the whole decode stage into one task; an eager localCheckpoint
      // materializes it at full parallelism first and the single
      // writer task reads cached blocks (ADVICE r11)
      try {
        val df = fn(spark, sfDir)
        val out = if (name.startsWith("mm_")) df.localCheckpoint(true) else df
        out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free blocks a query materialized (checkpointed intermediates):
      // queries are self-contained, and accumulated dead blocks poison
      // later queries with GC pressure
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // cool-down marker (VERDICT r15 #6): a Verify pass leaves GBs of
    // page-cache writeback that inflates an immediately-following
    // bench on the same fixture 3-5× while the CPU canary stays
    // clean — Bench reads this stamp and refuses to start within the
    // cool-down window.
    try Files.writeString(
      Paths.get(sys.props("java.io.tmpdir"), "graft_verify_marker.json"),
      s"""{"sf":"$sfDir"}""")
    catch { case _: Throwable => }
    spark.stop()
  }
}
