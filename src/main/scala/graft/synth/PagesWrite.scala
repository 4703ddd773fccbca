package graft.synth

import org.apache.spark.sql.SparkSession

/** Materialize the synthetic pages corpus as a parquet table — the engine's
  * real input shape (BASELINE.json input_hint: an Iceberg-style TABLE of
  * pages, not a generator). The scaling harness writes once and scans the
  * same bytes at every parallelism level.
  *
  * Usage: runMain graft.synth.PagesWrite <nPages> <outDir> [seed] [cpus]
  */
object PagesWrite {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val out = args(1)
    val seed = if (args.length > 2) args(2).toLong else 42L
    val cpus = if (args.length > 3) args(3) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val builder0 = SparkSession.builder().appName("graft-pages-write")
    val spark = (if (sys.props.contains("spark.master")) builder0
                 else builder0.master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    PagesGen.pages(spark, n, seed).write.mode("overwrite").parquet(out)
    println(s"""{"pages":$n,"out":"$out"}""")
    spark.stop()
  }
}
