package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 scratch probe: stage-wise timing of the remaining heavy queries
  * (d7 minhash, d10 sign-LSH, d18 incremental) with the noop sink, so the
  * optimization targets the measured stage, not a guess (guide §1.1).
  * Not part of the bench contract; numbers are cited in OPTIMIZATION_r06.md.
  */
object ProbeR06 {

  private def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()

    val what = if (args.isEmpty) Set("d7", "d10", "d18") else args.toSet

    def docsUnion(delta: Int): DataFrame = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val mutated = docs.select((col("doc_id") + 1000000).as("doc_id"),
        array_join(slice(split(col("text"), " "), lit(1),
          greatest(size(split(col("text"), " ")) - delta, lit(1))), " ").as("text"))
      docs.select("doc_id", "text").unionByName(mutated)
    }

    if (what("d7")) {
      val uni = docsUnion(3)
      val k = 32; val bands = 16
      graft.functions.MinhashBandSigs.ensureRegistered(spark)
      // stage 1: banded rows (native sigs + posexplode + checkpoint)
      val banded = time("d7 banded localCheckpoint") {
        graft.ops.Par.fanOut(uni.select(col("doc_id"), col("text")), col("doc_id"))
          .select(col("doc_id"),
            posexplode(call_function(graft.functions.MinhashBandSigs.functionName,
              col("text"), lit(k), lit(bands))).as(Seq("band", "band_sig")))
          .localCheckpoint()
      }
      System.err.println(s"[probe] d7 banded rows: ${banded.count()}")
      // stage 2: hot buckets
      val hot = time("d7 hot-bucket agg") {
        val h = banded.groupBy("band", "band_sig").agg(count(lit(1)).as("_n"))
          .filter(col("_n") > 1024).select("band", "band_sig").localCheckpoint()
        System.err.println(s"[probe] d7 hot buckets: ${h.count()}")
        h
      }
      val kept = banded.join(broadcast(hot), Seq("band", "band_sig"), "left_anti")
      val a = kept.select(col("band"), col("band_sig"), col("doc_id").as("doc_a"))
      val b = kept.select(col("band"), col("band_sig"), col("doc_id").as("doc_b"))
      val rawPairs = a.hint("shuffle_hash").join(b, Seq("band", "band_sig"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
      time("d7 raw candidate rows (count)") {
        System.err.println(s"[probe] d7 raw candidate rows: ${rawPairs.count()}")
      }
      val cands = rawPairs.dropDuplicates("doc_a", "doc_b").localCheckpoint()
      time("d7 dedup to distinct candidates") {
        System.err.println(s"[probe] d7 distinct candidates: ${cands.count()}")
      }
      // stage 3: verify join
      val toks = graft.ops.Par.fanOut(uni.select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tk"))
      val ta = toks.select(col("doc_id").as("doc_a"), col("tk").as("toks_a"))
      val tb = toks.select(col("doc_id").as("doc_b"), col("tk").as("toks_b"))
      val inter = size(array_intersect(col("toks_a"), col("toks_b")))
      val union = size(col("toks_a")) + size(col("toks_b")) - inter
      time("d7 verify (noop)") {
        noop(cands.join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
          .withColumn("jaccard", round(inter.cast("double") / union, 4))
          .filter(col("jaccard") >= 0.9)
          .select("doc_a", "doc_b", "jaccard"))
      }
      time("d7 full (noop)") {
        noop(graft.ops.TextOps.minhashLsh(docsUnion(3), k = 32, bands = 16,
          threshold = 0.9, maxBucketDocs = 1024))
      }
    }

    if (what("d10")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      // stage-wise reconstruction
      import graft.ops.VectorOps
      val tb0 = time("d10 tables checkpoint") {
        val t0 = VectorOps.lshTables(emb, 2, 32).localCheckpoint()
        System.err.println(s"[probe] d10 table rows: ${t0.count()}")
        t0
      }
      val a = tb0.select(col("table"), col("bucket"), col("vec_id").as("query_id"))
      val b = tb0.select(col("table"), col("bucket"), col("vec_id").as("neighbor_id"))
      val raw = a.hint("shuffle_hash").join(b, Seq("table", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
      time("d10 raw pair rows (count)") {
        System.err.println(s"[probe] d10 raw pair rows: ${raw.count()}")
      }
      val dd = raw.dropDuplicates("query_id", "neighbor_id").localCheckpoint()
      time("d10 dedup") {
        System.err.println(s"[probe] d10 distinct pairs: ${dd.count()}")
      }
      val va = emb.select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("va"))
        .withColumn("na", VectorOps.norm(col("va")))
      val vb = emb.select(col("vec_id").as("neighbor_id"),
        transform(col("embedding"), x => x.cast("double")).as("vb"))
        .withColumn("nb", VectorOps.norm(col("vb")))
      val pairs = dd.join(vb, Seq("neighbor_id")).join(va, Seq("query_id"))
        .withColumn("cos", round(VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      time("d10 cosine verify (noop)") { noop(pairs) }
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      time("d10 window+rank (noop)") {
        noop(pairs.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("query_id", "neighbor_id", "cos", "rank"))
      }
      time("d10 full (noop)") {
        noop(VectorOps.lshTopK(emb, 3, nPlanes = 2, nTables = 32))
      }
    }

    if (what("d7new")) {
      val uni = docsUnion(3).localCheckpoint()
      val k = 32; val bands = 16; val cap = 1024
      graft.functions.MinhashBandSigs.ensureRegistered(spark)
      val sigRows = time("d7new sigRows checkpoint") {
        graft.ops.Par.fanOut(uni.select(col("doc_id"), col("text")), col("doc_id"))
          .select(col("doc_id"),
            call_function(graft.functions.MinhashBandSigs.functionName,
              col("text"), lit(k), lit(bands)).as("sigs"))
          .localCheckpoint()
      }
      val exploded = sigRows.select(col("doc_id"), col("sigs"),
        posexplode(col("sigs")).as(Seq("band", "band_sig")))
      val sides = time("d7new sides (hot+mask) checkpoint") {
        val hot = exploded.groupBy("band", "band_sig")
          .agg(count(lit(1)).as("_bucket_docs"))
          .filter(col("_bucket_docs") > cap)
          .select("band", "band_sig")
        val surv = exploded.join(broadcast(hot), Seq("band", "band_sig"), "left_anti")
        val masks = surv.groupBy("doc_id").agg(sum(expr("shiftleft(1L, band)")).as("mask"))
        surv.join(masks, Seq("doc_id")).localCheckpoint()
      }
      val a = sides.select(col("band"), col("band_sig"), col("doc_id").as("doc_a"),
        col("sigs").as("sigs_a"), col("mask").as("mask_a"))
      val b = sides.select(col("band"), col("band_sig"), col("doc_id").as("doc_b"),
        col("sigs").as("sigs_b"))
      def sharedSurviving(t: Int) =
        (element_at(col("sigs_a"), t + 1) === element_at(col("sigs_b"), t + 1)) &&
          (call_function("shiftright", col("mask_a"), lit(t)).bitwiseAND(lit(1L)) === 1L)
      val firstShared = (0 until bands).map(t =>
        when(sharedSurviving(t), lit(t)).otherwise(lit(bands)))
        .reduce((x, y) => least(x, y))
      val cands = a.hint("shuffle_hash").join(b, Seq("band", "band_sig"))
        .filter(col("doc_a") < col("doc_b"))
        .filter(col("band") === firstShared)
        .select("doc_a", "doc_b")
      time("d7new canonical candidates (count)") {
        System.err.println(s"[probe] d7new canonical candidates: ${cands.count()}")
      }
      val cc = cands.localCheckpoint()
      val toks = graft.ops.Par.fanOut(uni.select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"),
          transform(array_distinct(split(col("text"), " ")), t => xxhash64(t)).as("tk"))
      val ta = toks.select(col("doc_id").as("doc_a"), col("tk").as("toks_a"))
      val tb = toks.select(col("doc_id").as("doc_b"), col("tk").as("toks_b"))
      val inter = size(array_intersect(col("toks_a"), col("toks_b")))
      val unionSz = size(col("toks_a")) + size(col("toks_b")) - inter
      time("d7new hashed verify (noop)") {
        noop(cc.join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
          .withColumn("jaccard", round(inter.cast("double") / unionSz, 4))
          .filter(col("jaccard") >= 0.9)
          .select("doc_a", "doc_b", "jaccard"))
      }
      time("d7new full (noop)") {
        noop(graft.ops.TextOps.minhashLsh(docsUnion(3), k = 32, bands = 16,
          threshold = 0.9, maxBucketDocs = 1024))
      }
    }

    if (what("d10new")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      import graft.ops.VectorOps
      val (nPlanes, nTables) = (2, 32)
      val tb0 = time("d10new tables checkpoint") {
        VectorOps.lshTables(emb, nPlanes, nTables).localCheckpoint()
      }
      val a = tb0.select(col("table"), col("bucket"), col("packed").as("pk_a"),
        col("vec_id").as("query_id"))
      val b = tb0.select(col("table"), col("bucket"), col("packed").as("pk_b"),
        col("vec_id").as("neighbor_id"))
      // the bit-trick canonical test, as the op builds it
      val xorP = col("pk_a").bitwiseXOR(col("pk_b"))
      val m = bitwise_not(xorP)
      val folded = (1 until nPlanes)
        .map(j => call_function("shiftrightunsigned", m, lit(j)))
        .foldLeft(m)((acc, s) => acc.bitwiseAND(s))
      val pattern = (0 until nTables).map(t => 1L << (t * nPlanes)).reduce(_ | _)
      val z = folded.bitwiseAND(lit(pattern))
      val low = z.bitwiseAND(-z)
      val firstEq = (bit_count(low - 1) / lit(nPlanes)).cast("int")
      val pairs0 = a.hint("shuffle_hash").join(b, Seq("table", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .filter(col("table") === firstEq)
        .select("query_id", "neighbor_id")
      time("d10new canonical pairs bit-trick (count)") {
        System.err.println(s"[probe] d10new canonical pairs: ${pairs0.count()}")
      }
      val dd = pairs0.localCheckpoint()
      val va = emb.select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("va"))
        .withColumn("na", VectorOps.norm(col("va")))
      val vb = emb.select(col("vec_id").as("neighbor_id"),
        transform(col("embedding"), x => x.cast("double")).as("vb"))
        .withColumn("nb", VectorOps.norm(col("vb")))
      val pairs = dd.join(vb, Seq("neighbor_id")).join(va, Seq("query_id"))
        .withColumn("cos", round(VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      time("d10new attach+cos (noop)") { noop(pairs) }
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      time("d10new window tail (noop)") {
        noop(pairs.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("query_id", "neighbor_id", "cos", "rank"))
      }
      time("d10new full (noop)") {
        noop(VectorOps.lshTopK(emb, 3, nPlanes = 2, nTables = 32))
      }
    }

    if (what("d7plan")) {
      val df = graft.ops.TextOps.minhashLsh(docsUnion(3), k = 32, bands = 16,
        threshold = 0.9, maxBucketDocs = 1024)
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/d7_composed_plan.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      System.err.println("[probe] d7 plan written")
    }

    if (what("d10plan")) {
      val df = graft.ops.VectorOps.lshTopK(
        spark.read.parquet(s"$sfDir/embeddings.parquet"), 3, nPlanes = 2, nTables = 32)
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/d10_composed_plan.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      System.err.println("[probe] d10 plan written")
    }

    if (what("crawl")) {
      (1 to 3).foreach { i =>
        System.gc()
        time(s"crawl_rounds#$i (count)") {
          System.err.println(s"[probe] rows=${SparkEntry.queries("crawl_rounds")(spark, sfDir).count()}")
        }
      }
    }

    if (what("more")) {
      for (q <- Seq("d9_ann_brute_topk", "d13_ann_lsh_prodparams",
        "d11_embed_neardup", "d16_ann_ivf", "d6_ngram_jaccard",
        "d12_edit_distance", "d8_simhash", "d17_simhash_mid", "d15_simhash_prod",
        "d14_winnow_fp", "m3_audio_decode", "q1_agg")) {
        System.gc()
        time(s"$q (count)") {
          System.err.println(s"[probe] $q rows=${SparkEntry.queries(q)(spark, sfDir).count()}")
        }
      }
    }

    if (what("d18")) {
      time("d18 full (noop)") {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val old = docs.select("doc_id", "text")
        val fresh = docs.select((col("doc_id") + 1000000).as("doc_id"),
          array_join(slice(split(col("text"), " "), lit(1),
            greatest(size(split(col("text"), " ")) - 3, lit(1))), " ").as("text"))
        val index = graft.ops.TextOps.minhashBandIndex(old, k = 32, bands = 16)
        noop(graft.ops.TextOps.minhashLshIncremental(fresh, index, old,
          k = 32, bands = 16, threshold = 0.9, maxBucketDocs = 1024))
      }
    }

    spark.stop()
  }
}
