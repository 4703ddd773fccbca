package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F3 — URL discovery from fetched page content: the generator stage that
  * turns crawled listing/category pages into next-round frontier candidates,
  * mirroring the reference's per-platform strategies
  * (core/services/discovery_service.py):
  *
  *   - 104      API JSON `link.job` values, `https:` prefix for
  *              protocol-relative links           (discovery_service.py:63-105)
  *   - 1111     API JSON `jobId` hits → /job/<id> (discovery_service.py:107-141)
  *   - cake     html `<a href>` scrape: keep hrefs with /jobs/ or /j/ AND
  *              /companies/, drop /jobs/for-*     (discovery_service.py:143-178)
  *   - yourator API JSON `path` values → absolute (discovery_service.py:180-203)
  *   - yes123   regex `job\.asp\?p_id=[^"'\s>]+` over raw html
  *                                                (discovery_service.py:209-239)
  *
  * Everything is declarative `regexp_extract_all` + explode — candidate
  * generation runs map-side on the fetched partitions (html never shuffles;
  * only the extracted URL strings do).
  */
object Discovery {

  /** Synthetic listing-page URL (fixture shape; path-encoded category/page so
    * canonicalization keeps listings distinct — except yes123, whose identity
    * lives in its query string, as in the reference).
    */
  def listUrl(platform: String, cat: Int, page: Int): String = platform match {
    case "platform_104" => s"https://www.104.com.tw/jobs/search/list/cat$cat/$page"
    case "platform_1111" => s"https://www.1111.com.tw/search/jobs/cat$cat/$page"
    case "platform_cakeresume" => s"https://www.cake.me/jobs/cat$cat/page-$page"
    case "platform_yes123" =>
      s"https://www.yes123.com.tw/wk_index/joblist.asp?job_check=cat$cat&now_page=$page"
    case "platform_yourator" => s"https://www.yourator.co/api/v4/jobs/cat$cat/$page"
  }

  /** Listing-page predicate over canonical URLs. */
  def isListing(url: Column): Column =
    url.contains("/jobs/search/list/") || url.contains("/search/jobs/") ||
      url.contains("/jobs/cat") || url.contains("joblist.asp") ||
      url.contains("/api/v4/jobs/")

  /** S3 lineage: how a URL is fetched. The reference drives cake through a
    * real browser (Playwright, crawl_service.py) and 104/1111/yourator
    * listings through JSON APIs; everything else is plain http.
    */
  def fetchKind(url: Column): Column =
    when(isListing(url) &&
        (url.contains("104.com.tw") || url.contains("1111.com.tw") ||
         url.contains("yourator.co")), "api")
      .when(url.contains("cake.me"), "browser")
      .otherwise("http")

  /** Plain-string listing predicate (extract-stage twin of [[isListing]]). */
  def isListingUrl(url: String): Boolean =
    url.contains("/jobs/search/list/") || url.contains("/search/jobs/") ||
      url.contains("/jobs/cat") || url.contains("joblist.asp") ||
      url.contains("/api/v4/jobs/")

  private val Re104 = """"job":\s*"(//www\.104\.com\.tw/job/[^"]+)"""".r
  private val Re1111 = """"jobId":\s*(\d+)""".r
  private val ReCakeHref = """href="([^"]+)"""".r
  private val ReYourator = """"path":\s*"(/companies/[^"]+/jobs/\d+)"""".r
  private val ReYes123 = """job\.asp\?p_id=[^"'\s>]+""".r

  /** Candidate job URLs from ONE listing page's html, in the reference's
    * per-platform grammar. Runs inside the extract stage's typed map so the
    * round makes a SINGLE pass over the pages side (html read once, never
    * cached, never shuffled). Order-preserving dedup like the reference's
    * `if u not in urls` accumulation.
    */
  def extractLinks(platform: String, html: String): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    platform match {
      case "platform_104" =>
        Re104.findAllMatchIn(html).foreach(m => out += ("https:" + m.group(1)))
      case "platform_1111" =>
        Re1111.findAllMatchIn(html).foreach(m =>
          out += s"https://www.1111.com.tw/job/${m.group(1)}")
      case "platform_cakeresume" =>
        ReCakeHref.findAllMatchIn(html).foreach { m =>
          val h = m.group(1)
          if ((h.contains("/jobs/") || h.contains("/j/")) && h.contains("/companies/") &&
              !h.startsWith("/jobs/for-"))
            out += ("https://www.cake.me" + h)
        }
      case "platform_yourator" =>
        ReYourator.findAllMatchIn(html).foreach(m =>
          out += ("https://www.yourator.co" + m.group(1)))
      case "platform_yes123" =>
        ReYes123.findAllMatchIn(html).foreach(m =>
          out += s"https://www.yes123.com.tw/wk_index/${m.matched}")
      case _ =>
    }
    out.toVector
  }

  /** Seed-shaped frontier candidates from the (already cached) extract
    * output: explode the listing rows' `discovered_links`, dedup, and apply
    * the reference's per-(platform, category) `urls[:limit]` contract (F6 —
    * discovery_service.py:104,141,178,207,239) by deterministic URL order.
    */
  def fromExtracted(extracted: DataFrame, perCategoryLimit: Option[Int] = None): DataFrame = {
    val exploded = extracted
      .filter(col("is_listing"))
      .select(col("platform"), col("category_id"),
        explode(col("discovered_links")).as("url"))
      .dropDuplicates("platform", "category_id", "url")
      .withColumn("priority", lit(0.5))
    perCategoryLimit match {
      case None => exploded.select("url", "platform", "category_id", "priority")
      case Some(limit) =>
        val w = Window.partitionBy(col("platform"), col("category_id"))
          .orderBy(col("url"))
        exploded.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= limit)
          .select("url", "platform", "category_id", "priority")
    }
  }
}
