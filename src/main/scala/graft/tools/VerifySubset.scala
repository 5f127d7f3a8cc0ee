package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev harness: run a named subset of the inventory through the
  * Verify output contract (parquet + oracle_sql.json) so new oracled
  * queries can be checked against tools/check.py without replaying
  * all 100+ entries. Usage: runMain graft.tools.VerifySubset
  * <sfDir> <outDir> <name>[,<name>...] */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    // the Verify contract (r13 fix): the replay oracles embed
    // OracleEnv.sfDir-derived store paths — without this assignment a
    // subset run at any non-default sfDir writes oracle SQL pointing
    // at ANOTHER fixture's stores, and every store-backed entry
    // "fails" with scrambled (id, dist) pairs
    graft.OracleEnv.sfDir = sfDir
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val picked = names.split(",").toSeq
    picked.foreach { name =>
      // resume semantics (r16): a name whose output already landed
      // (prior partial run) is skipped, so a killed long sf10 pass
      // re-runs only its tail — oracle_sql.json is still dumped for
      // EVERY picked name below, completing the check.py contract
      if (new java.io.File(s"$outDir/$name/_SUCCESS").exists()) {
        println(s"[verify-subset] kept $name (resume)")
      } else {
        SparkEntry.queries(name)(spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        println(s"[verify-subset] wrote $name")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c    => c.toString
    } + "\""
    val json = picked.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (k, v) => q(k) + ": " + q(v) }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
