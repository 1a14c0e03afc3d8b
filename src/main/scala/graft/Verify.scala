package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd arg: "skip=a,b,c" (exclude) or "only=a,b,c" (restrict) —
    // used by the off-driver large-SF sweeps to separate the tractable
    // entries from the Ω(n²)-candidate validation baselines
    val (skip, only) = args.lift(2) match {
      case Some(s) if s.startsWith("skip=") =>
        (s.stripPrefix("skip=").split(",").toSet, Set.empty[String])
      case Some(s) if s.startsWith("only=") =>
        (Set.empty[String], s.stripPrefix("only=").split(",").toSet)
      case _ => (Set.empty[String], Set.empty[String])
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!skip.contains(name) && (only.isEmpty || only.contains(name))) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name.parquet")
          println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)
    spark.stop()
  }

  /** The driver-facing oracle map as JSON. Two load-bearing properties
    * (spec-locked — round 1's correctness gate went dark over the first):
    *
    *  - every oracle is emitted under BOTH its bare entry name and
    *    "<name>.parquet", because the driver keys its report by output
    *    filename while entries key by bare name;
    *  - ALL control chars (<0x20), quotes, and backslashes are escaped — a
    *    tab or CR in builder-authored SQL would otherwise make the driver's
    *    json.load fail and silently zero the round.
    */
  def oracleJson: String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
  }
}
