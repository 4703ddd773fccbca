package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-6 optimization tooling, SEPARATE from the frozen [[Bench]] harness
  * (guide §1.4/§7.2): dumps `.explain("formatted")` for every declared query
  * and optionally times each with the noop sink (computes every column,
  * isolates the computation from the count()-pruned headline timing).
  *
  * Usage:
  *   runMain graft.BenchExtra explain <sfDir> <outDir> [suffix]
  *   runMain graft.BenchExtra noop <sfDir> [queryName ...]
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "explain" =>
        val outDir = args(2)
        val suffix = if (args.length > 3) args(3) else "after"
        new java.io.File(outDir).mkdirs()
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
            System.err.println(s"[explain] $name ok")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $name failed: ${e.getMessage}")
          }
        }
      case "noop" =>
        val wanted = args.drop(2).toSet
        SparkEntry.queries.toSeq.sortBy(_._1)
          .filter(q => wanted.isEmpty || wanted(q._1))
          .foreach { case (name, fn) =>
            System.gc()
            spark.sparkContext.setJobDescription(s"noop: $name")
            val t0 = System.nanoTime()
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              val sec = (System.nanoTime() - t0) / 1e9
              println(f"""{"query":"$name","noop_sec":$sec%.3f}""")
            } catch { case e: Throwable =>
              System.err.println(s"[noop] $name failed: ${e.getMessage}")
            }
            spark.sparkContext.setJobDescription(null)
          }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
