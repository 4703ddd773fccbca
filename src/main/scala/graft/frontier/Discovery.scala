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

  /** Candidate job URLs extracted from fetched listing pages.
    *
    * Input: fetched rows (canon_url, html, platform, category_id). Output:
    * seed-shaped rows (url, platform, category_id, priority) — discovered
    * URLs enter the next round's frontier below seed priority, ordered
    * deterministically by URL within their category.
    *
    * `perCategoryLimit` is the reference's `urls[:limit]` contract (F6 —
    * discovery_service.py:104,141,178,207,239): at most `limit` candidates
    * per (platform, category_id), chosen by the deterministic URL order.
    */
  def candidates(fetched: DataFrame, perCategoryLimit: Option[Int] = None): DataFrame = {
    val html = col("html").cast("string")

    val p104 = transform(
      array_distinct(regexp_extract_all(html,
        lit(""""job":\s*"(//www\.104\.com\.tw/job/[^"]+)""""), lit(1))),
      m => concat(lit("https:"), m))

    val p1111 = transform(
      array_distinct(regexp_extract_all(html, lit(""""jobId":\s*(\d+)"""), lit(1))),
      m => concat(lit("https://www.1111.com.tw/job/"), m))

    val cakeHrefs = array_distinct(regexp_extract_all(html,
      lit("""href="([^"]+)""""), lit(1)))
    val pCake = transform(
      filter(cakeHrefs, h =>
        (h.contains("/jobs/") || h.contains("/j/")) && h.contains("/companies/") &&
          !h.startsWith("/jobs/for-")),
      h => concat(lit("https://www.cake.me"), h))

    val pYourator = transform(
      array_distinct(regexp_extract_all(html,
        lit(""""path":\s*"(/companies/[^"]+/jobs/\d+)""""), lit(1))),
      m => concat(lit("https://www.yourator.co"), m))

    val pYes123 = transform(
      array_distinct(regexp_extract_all(html,
        lit("""job\.asp\?p_id=[^"'\s>]+"""), lit(0))),
      m => concat(lit("https://www.yes123.com.tw/wk_index/"), m))

    val links = when(col("platform") === "platform_104", p104)
      .when(col("platform") === "platform_1111", p1111)
      .when(col("platform") === "platform_cakeresume", pCake)
      .when(col("platform") === "platform_yourator", pYourator)
      .when(col("platform") === "platform_yes123", pYes123)
      .otherwise(array())

    val exploded = fetched
      .filter(isListing(col("canon_url")))
      .select(col("platform"), col("category_id"),
        explode(links).as("url"))
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
