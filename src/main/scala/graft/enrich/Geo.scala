package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X24/J7 — geocoding enrichment: the Taiwan-address cleaner
  * (geocoder.py:45-94) as a pure Catalyst Column pipeline, the street-level
  * fallback query (geocoder.py:131-138), and the geocode cache join
  * (the Redis `geocoding:v3:<addr>` cache re-expressed as a broadcast dim
  * table; geocoder.py:114-122, 192-200).
  *
  * The cleaner is whole-stage-codegen'd string work — no UDF. Byte parity
  * with the reference's CPython regex chain is asserted against
  * differential goldens (tools/gen_geo_goldens.py) and independently by the
  * g1_geo_clean DuckDB oracle.
  */
object Geo {

  /** The reference's duplicate-city fix list (geocoder.py:84-90). */
  val Cities: Seq[String] = Seq(
    "台北市", "新北市", "桃園市", "台中市", "台南市", "高雄市",
    "基隆市", "新竹市", "嘉義市", "新竹縣", "苗栗縣", "彰化縣",
    "南投縣", "雲林縣", "嘉義縣", "屏東縣", "宜蘭縣", "花蓮縣",
    "台東縣", "澎湖縣", "金門縣", "連江縣")

  val FullwidthFrom = "１２３４５６７８９０（）［］／、﹝﹞【】"
  val FullwidthTo = "1234567890()[]/,()[]"

  val FloorPatterns: Seq[String] = Seq(
    "\\d+[樓Ff].*",
    "B\\d+.*",
    "地下\\d+樓.*",
    "[第]?[A-Z0-9]+[室室].*",
    "\\d+棟.*",
    "(?<=號)\\s*[A-Z0-9].*")

  /** Python str.strip() on both ends (unicode whitespace). */
  private def pyStrip(c: Column): Column =
    regexp_replace(c, "^[\\s\\u3000]+|[\\s\\u3000]+$", "")

  /** geocoder.py:45-94 `_clean_address`, step for step (including the
    * ordered-alternation quirk where 臺灣省 loses only 臺灣, leaving 省).
    */
  def cleanAddress(addr0: Column): Column = {
    // 0. fullwidth -> halfwidth
    val t = translate(coalesce(addr0, lit("")), FullwidthFrom, FullwidthTo)
    // 1. multiple addresses -> first (strip only when a split happened)
    val first = when(t.rlike("[/,、]"), pyStrip(regexp_extract(t, "^([^/,、]*)", 1)))
      .otherwise(t)
    // 2. Taiwan prefixes, then lstrip of ',， '
    val noPrefix = pyStrip(regexp_replace(first,
      "^(台灣|中華民國|臺灣|Taiwan|R\\.O\\.C|台灣省|臺灣省)", ""))
    val lstripped = regexp_replace(noPrefix, "^[,， ]+", "")
    // 3. brackets and their content
    val noBrackets = pyStrip(regexp_replace(lstripped, "[\\(\\[].*?[\\)\\]]", ""))
    // 4. floor/suite noise, in the reference's order
    val afterFloors = FloorPatterns.foldLeft(noBrackets)(
      (c, p) => pyStrip(regexp_replace(c, p, "")))
    // 5. duplicated leading city. NOTE: a when(c.startsWith).otherwise(c)
    // fold would copy the whole upstream tree 3x per city (3^22 nodes — it
    // OOMs Catalyst); the anchored regexp_replace chain wraps linearly and
    // is semantically identical (anchored => replaces at most the prefix).
    val deduped = Cities.foldLeft(afterFloors)((c, city) =>
      regexp_replace(c, "^" + city + city, city))
    // 6. trailing '- ' then strip
    pyStrip(regexp_replace(deduped, "[- ]+$", ""))
  }

  /** Street-level fallback query (geocoder.py:131-138): drop the house
    * number, keep up to the road token.
    */
  def streetFallback(cleanAddr: Column): Column =
    pyStrip(regexp_extract(cleanAddr, "(.*?[路街巷大道段])", 1))

  /** J7: enrich rows having an `address` column from a geocode cache table
    * `(clean_addr, lat, lon, display_name)` — broadcast equi-join on the
    * cleaned address (the cache is small relative to the jobs side; misses
    * keep null coords and feed [[misses]]).
    */
  def enrich(rows: DataFrame, cache: DataFrame): DataFrame =
    rows.withColumn("geo_query", cleanAddress(col("address")))
      .join(broadcast(cache.select(col("clean_addr").as("geo_query"),
        col("lat").as("geo_lat"), col("lon").as("geo_lon"),
        col("display_name").as("geo_display_name"))),
        Seq("geo_query"), "left")

  /** Distinct cleaned addresses the cache does not cover — the work queue
    * for the external geocoder (1-QPS Nominatim in the reference).
    */
  def misses(enriched: DataFrame): DataFrame =
    enriched.filter(col("geo_lat").isNull && col("geo_query") =!= "")
      .select("geo_query").distinct()

  /** P8 — the reference's distributed 1-QPS Nominatim lock
    * (geocoder.py:166-171: a Redis `SET NX EX 1` gate before every API
    * call) re-expressed for batch: a round may resolve at most
    * `floor(qps × windowSeconds)` misses; the rest stay queued for the next
    * round. The due batch is the deterministic head of the queue
    * (ordered by address — a distributed TakeOrdered, no global sort), so
    * retries across rounds are stable.
    *
    * Returns (due, deferred).
    */
  def throttleMisses(missQueue: DataFrame, qps: Double,
                     windowSeconds: Double): (DataFrame, DataFrame) = {
    val maxCalls = math.max(1L, (qps * windowSeconds).toLong)
    val capped = math.min(maxCalls, Int.MaxValue.toLong).toInt
    val due = missQueue.orderBy("geo_query").limit(capped)
    val deferred = missQueue.join(due, Seq("geo_query"), "left_anti")
    (due, deferred)
  }

  /** Resolve a QPS-capped due batch through a real [[NominatimClient]] —
    * driver-side sequential calls, in sorted order, because the reference's
    * distributed 1-QPS lock (geocoder.py:166-171) makes external geocoding
    * inherently serial: the due set is already bounded by [[throttleMisses]]
    * (≤ qps × window rows), so this is never corpus-scale work. Unresolved
    * queries are simply absent from the result and stay queued for the next
    * round. Output schema matches [[stubResolve]] / the cache table, so the
    * merge → re-enrich round trip is identical whichever provider ran.
    */
  def resolveWith(due: DataFrame, client: NominatimClient): DataFrame = {
    val spark = due.sparkSession
    import spark.implicits._
    val resolved = due.select("geo_query").collect().map(_.getString(0)).sorted.toSeq
      .flatMap { q =>
        client.resolve(q).map { case (lat, lon, disp) => (q, lat, lon, disp) }
      }
    resolved.toDF("clean_addr", "lat", "lon", "display_name")
  }

  /** STUB provider (clearly marked, like Multimodal.StubDecoder): the
    * container has no network, so resolving misses against real Nominatim is
    * impossible — this produces deterministic fake coordinates in Taiwan's
    * bounding box so the cache-update round trip (miss -> resolve -> merge
    * -> re-enrich) is fully exercisable.
    */
  def stubResolve(missQueue: DataFrame): DataFrame =
    missQueue.select(col("geo_query").as("clean_addr"),
      (lit(21.9) + pmod(xxhash64(col("geo_query")), lit(400)) / lit(100.0)).as("lat"),
      (lit(120.0) + pmod(xxhash64(concat(col("geo_query"), lit(":lon"))), lit(200))
        / lit(100.0)).as("lon"),
      concat(col("geo_query"), lit(", Taiwan (STUB)")).as("display_name"))
}
