package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev harness: run a named subset of the inventory through the
  * Verify output contract (parquet + oracle_sql.json) so new oracled
  * queries can be checked against tools/check.py without replaying
  * all 100+ entries. Usage: runMain graft.tools.VerifySubset
  * <sfDir> <outDir> <name>[,<name>...] [--resume] */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    val resume = flags.contains("--resume")
    val Array(sfDir, outDir, names) = positional
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
    // resume stamp (r17, ADVICE r16): a bare _SUCCESS marker said
    // nothing about WHICH code or fixture produced the output, so a
    // re-run after a serve-path change silently reused the stale
    // artifact and check.py could pass on old-code results. The skip
    // is now (a) opt-in via --resume and (b) keyed on (sfDir, git sha)
    // recorded at write time; a stamp mismatch re-runs the entry.
    def gitSha(): String = try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD")
        .redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
      if (p.waitFor() == 0 && out.length >= 7) out else "unknown"
    } catch { case _: Throwable => "unknown" }
    val stampVal = s"$sfDir @ ${gitSha()}"
    val picked = names.split(",").toSeq
    picked.foreach { name =>
      val success = new java.io.File(s"$outDir/$name/_SUCCESS")
      val stampF = java.nio.file.Paths.get(s"$outDir/$name/_GRAFT_STAMP")
      val stampOk = java.nio.file.Files.exists(stampF) &&
        new String(java.nio.file.Files.readAllBytes(stampF), "UTF-8").trim == stampVal
      if (resume && success.exists() && stampOk) {
        println(s"[verify-subset] kept $name (resume, stamp matches)")
      } else {
        if (success.exists() && !stampOk)
          println(s"[verify-subset] stale $name (sfDir/sha changed) — re-running")
        SparkEntry.queries(name)(spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        java.nio.file.Files.write(stampF, (stampVal + "\n").getBytes("UTF-8"))
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
