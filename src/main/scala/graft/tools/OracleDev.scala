package graft.tools

import graft.{OracleEnv, SparkEntry}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev-only: run a comma-separated subset of SparkEntry.queries and
  * dump their parquet + oracle_sql.json for tools/check.py — a fast
  * inner loop for oracle work (Verify runs all 157).
  *
  * Usage: runMain graft.tools.OracleDev q1,q2[,...] [sfDir] [outDir]
  */
object OracleDev {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 2) args(2) else "/tmp/verify_dev"
    OracleEnv.sfDir = sfDir
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val qs = SparkEntry.queries
    names.foreach { name =>
      qs(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sqls = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = sqls.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
