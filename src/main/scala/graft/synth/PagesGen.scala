package graft.synth

import graft.extract.Json
import graft.extract.Json._
import graft.extract.Platforms
import graft.schema.Schemas._
import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-§4).
  *
  * Every page is a pure function of (seed, id): generation is distributed
  * via spark.range + map, so the same (seed, n) yields identical bytes at any
  * parallelism or partitioning — required for the local[8]-vs-local[32]
  * scaling-equivalence evidence.
  *
  * Host skew is intentional: platform_104 carries ~55% of pages (the
  * "mega-domain" of the north rule) to exercise salting + AQE.
  */
object PagesGen {

  val BaseTs = 1767225600000L // 2026-01-01T00:00:00Z, injected (no wall clock)

  private def rng(seed: Long, id: Long): java.util.Random =
    new java.util.Random(seed * 1000003L + id * 2654435761L)

  /** Skewed platform pick: 104 =~55%, others share the rest. */
  def platformOf(id: Long, r: java.util.Random): String = {
    val x = r.nextDouble()
    if (x < 0.55) Platforms.P104
    else if (x < 0.68) Platforms.P1111
    else if (x < 0.80) Platforms.CAKE
    else if (x < 0.90) Platforms.YES123
    else Platforms.YOURATOR
  }

  def hostOf(platform: String): String = platform match {
    case Platforms.P104 => "www.104.com.tw"
    case Platforms.P1111 => "www.1111.com.tw"
    case Platforms.CAKE => "www.cake.me"
    case Platforms.YES123 => "www.yes123.com.tw"
    case Platforms.YOURATOR => "www.yourator.co"
  }

  def jobUrl(platform: String, id: Long, companyId: Long): String = platform match {
    case Platforms.P104 => s"https://www.104.com.tw/job/${java.lang.Long.toString(id, 36)}x"
    case Platforms.P1111 => s"https://www.1111.com.tw/job/${70000000 + id}"
    case Platforms.CAKE => s"https://www.cake.me/companies/co$companyId/jobs/job-$id"
    case Platforms.YES123 =>
      s"https://www.yes123.com.tw/wk_index/job.asp?p_id=$companyId&job_id=${90000000 + id}"
    case Platforms.YOURATOR => s"https://www.yourator.co/companies/co$companyId/jobs/$id"
  }

  def companyUrl(platform: String, companyId: Long): String = platform match {
    case Platforms.P104 => s"https://www.104.com.tw/company/co$companyId"
    case Platforms.P1111 => s"https://www.1111.com.tw/corp/${1000 + companyId}"
    case Platforms.CAKE => s"https://www.cake.me/companies/co$companyId"
    case Platforms.YES123 => s"https://www.yes123.com.tw/wk_index/comp_info.asp?p_id=co$companyId"
    case Platforms.YOURATOR => s"https://www.yourator.co/companies/co$companyId"
  }

  private val cities = Vector(
    ("台北市", "信義區", "信義路五段7號"), ("台北市", "中山區", "南京東路一段12號"),
    ("新北市", "板橋區", "文化路二段100號"), ("高雄市", "前鎮區", "中山二路2號"),
    ("台中市", "西屯區", "台灣大道三段99號"), ("桃園市", "中壢區", "中大路300號"))

  private val skillsPool = Vector("Python", "Java", "React", "Docker", "Kubernetes",
    "MySQL", "Redis", "AWS", "Spring", "Vue", "Golang", "Kafka", "溝通", "專案管理")

  private val industries = Vector("軟體服務業", "電子商務業", "金融科技業", "半導體業", "遊戲產業")

  /** Build one page deterministically. Returns None for ids that synthesize
    * non-platform noise pages.
    */
  def buildPage(seed: Long, id: Long): Page = {
    val r = rng(seed, id)
    val isNoise = r.nextDouble() < 0.06
    if (isNoise) {
      val host = s"blog.example-${math.abs(r.nextInt(500))}.com"
      val url = s"https://$host/post/$id"
      val html = s"<html><head><title>Post $id</title></head><body><p>noise ${r.nextInt(1000)}</p></body></html>"
      return Page(url, new Timestamp(BaseTs + id * 37000L), html.getBytes("UTF-8"),
        s"noise post $id", if (r.nextDouble() < 0.5) "en" else "zh-TW")
    }
    val platform = platformOf(id, r)
    val companyId = math.abs(r.nextInt(200)).toLong
    val url = jobUrl(platform, id, companyId)
    val variant = r.nextDouble()
    val (city, district, street) = cities((id % cities.length).toInt)
    val industry = industries((id % industries.length).toInt)
    val nSkills = 2 + r.nextInt(4)
    val skills = (0 until nSkills).map(i => skillsPool((r.nextInt(skillsPool.length))))
    val salaryMin = 30000 + r.nextInt(60) * 1000
    val salaryMax = salaryMin + 10000 + r.nextInt(40) * 1000

    val title = s"資深工程師 ${java.lang.Long.toString(id, 36)}"
    val companyName = s"公司${companyId}股份有限公司"

    val desc = new StringBuilder
    desc.append(s"<p>負責${industry}系統開發&amp;維運</p><ul>")
    skills.foreach(sk => desc.append(s"<li>熟悉 $sk</li>"))
    desc.append("</ul><p>【工作內容】與跨部門協作，交付高品質服務。</p>")

    // JSON-LD object built through the ordered AST so bytes are reproducible
    val ld = JObj.empty
    ld.put("@context", JStr("https://schema.org"))
    ld.put("@type", JStr("JobPosting"))
    ld.put("title", JStr(title))
    ld.put("description", JStr(desc.toString))
    ld.put("datePosted", JStr(f"2026-01-${1 + (id % 28)}%02dT08:00:00+08:00"))
    ld.put("validThrough", JStr(f"2026-12-${1 + (id % 28)}%02d"))
    ld.put("employmentType", JStr(
      if (variant < 0.8) "FULL_TIME" else if (variant < 0.9) "PART_TIME" else "INTERNSHIP"))
    ld.put("industry", JStr(industry))
    ld.put("url", JStr(url))
    val org = JObj.empty
    org.put("@type", JStr("Organization"))
    org.put("name", JStr(companyName))
    org.put("sameAs", JStr(companyUrl(platform, companyId)))
    ld.put("hiringOrganization", org)
    // salary variants (FIXTURES.md §3.10)
    val salVariant = r.nextDouble()
    if (salVariant < 0.6) {
      val sal = JObj.empty
      sal.put("@type", JStr("MonetaryAmount"))
      sal.put("currency", JStr("TWD"))
      val v = JObj.empty
      v.put("@type", JStr("QuantitativeValue"))
      v.put("minValue", JInt(salaryMin))
      v.put("maxValue", JInt(salaryMax))
      v.put("unitText", JStr("MONTH"))
      sal.put("value", v)
      ld.put("baseSalary", sal)
    } else if (salVariant < 0.75) {
      ld.put("baseSalary", JStr(s"月薪 $salaryMin - $salaryMax 元"))
    } else if (salVariant < 0.85) {
      ld.put("baseSalary", JStr(s"年薪 ${40 + r.nextInt(200)}萬"))
    } else if (salVariant < 0.95) {
      ld.put("baseSalary", JStr("面議"))
    } // else absent
    val loc = JObj.empty
    loc.put("@type", JStr("Place"))
    val addr = JObj.empty
    addr.put("@type", JStr("PostalAddress"))
    addr.put("addressCountry", JStr("TW"))
    addr.put("addressRegion", JStr(if (variant < 0.1) s"台灣$city" else city))
    addr.put("addressLocality", JStr(district))
    addr.put("streetAddress", JStr(street))
    loc.put("address", addr)
    if (r.nextDouble() < 0.6) {
      val geo = JObj.empty
      geo.put("@type", JStr("GeoCoordinates"))
      geo.put("latitude", JFloat(24.0 + (id % 200) / 100.0))
      geo.put("longitude", JFloat(121.0 + (id % 150) / 100.0))
      loc.put("geo", geo)
    }
    ld.put("jobLocation", loc)
    ld.put("educationRequirements", JStr(
      if (r.nextDouble() < 0.5) "bachelor" else "不拘"))
    ld.put("experienceRequirements", JStr(
      if (r.nextDouble() < 0.4) s"${1 + r.nextInt(8)}年以上" else "不拘"))

    val ldJson = Json.dumps(ld)

    val scriptBlock = variant match {
      case v if v < 0.70 => // plain
        s"""<script type="application/ld+json">$ldJson</script>"""
      case v if v < 0.78 => // @graph wrapper
        s"""<script type="application/ld+json">{"@context": "https://schema.org", "@graph": [$ldJson]}</script>"""
      case v if v < 0.83 => // CDATA wrapper
        s"""<script type="application/ld+json"><![CDATA[$ldJson]]></script>"""
      case v if v < 0.87 => // malformed sibling + good block
        s"""<script type="application/ld+json">{broken json,]</script>
           |<script type="application/ld+json">$ldJson</script>""".stripMargin
      case v if v < 0.93 && platform == Platforms.CAKE => // NEXT_DATA page
        val nd = JObj.empty
        val props = JObj.empty
        val pageProps = JObj.empty
        val comp = JObj.empty
        comp.put("name", JStr(companyName))
        comp.put("slug", JStr(s"co$companyId"))
        comp.put("address", JStr(s"$city$district$street"))
        comp.put("capital", JStr(s"${100 + r.nextInt(900)}0萬"))
        comp.put("numberOfEmployees", JStr(s"${5 + r.nextInt(500)}人"))
        val jb = JObj.empty
        jb.put("min_work_exp_year", JInt(r.nextInt(6)))
        pageProps.put("company", comp)
        pageProps.put("job", jb)
        props.put("pageProps", pageProps)
        nd.put("props", props)
        s"""<script type="application/ld+json">$ldJson</script>
           |<script id="__NEXT_DATA__" type="application/json">${Json.dumps(nd)}</script>""".stripMargin
      case _ => // plain again (other platforms)
        s"""<script type="application/ld+json">$ldJson</script>"""
    }

    val companyInfoBlock =
      if (r.nextDouble() < 0.15)
        "<div>資本額：暫不公開 員工人數：暫不公開</div>" // privacy-protected (FIXTURES §3.7)
      else if (r.nextDouble() < 0.3)
        s"<div>資本額：${10 + r.nextInt(90)}00萬元 員工人數：${2 + r.nextInt(300)}人</div>"
      else ""

    val mapsBlock =
      if (platform == Platforms.YOURATOR)
        s"""<a href="https://www.google.com/maps?q=$city$district$street">$city$district$street</a>"""
      else ""

    val html =
      s"""<!DOCTYPE html><html><head>
         |<title>$title｜$companyName｜人力網</title>
         |$scriptBlock
         |</head><body>
         |<h1>$title</h1>
         |$companyInfoBlock
         |$mapsBlock
         |<footer>© 2026</footer>
         |</body></html>""".stripMargin

    val text = s"$title $companyName $industry"
    Page(url, new Timestamp(BaseTs + id * 37000L), html.getBytes("UTF-8"), text, "zh-TW")
  }

  // ==== listing pages (F3 discovery fixtures) ====
  // Jobs with id % DiscoverMod == 1 are NOT seeded directly — they are only
  // reachable through a listing page (discovery_service.py semantics: the
  // reference's frontier *grows* from fetched category pages).
  val DiscoverMod = 97L
  val ListPages = 2
  val ListedPerPage = 20

  /** The (id, companyId) slice each (platform, cat) listing chain lists:
    * the first ListPages×ListedPerPage discovery-only ids in id order.
    * Driver-side single pass — deterministic and parallelism-independent.
    */
  def listedJobs(seed: Long, n: Long): Map[(String, Int), Vector[(Long, Long)]] = {
    val cap = ListPages * ListedPerPage
    val m = scala.collection.mutable.Map.empty[(String, Int), Vector[(Long, Long)]]
    var id = 0L
    while (id < n) {
      if (id % DiscoverMod == 1) {
        val r = rng(seed, id)
        if (r.nextDouble() >= 0.06) { // not noise (same draw order as buildPage)
          val platform = platformOf(id, r)
          val companyId = math.abs(r.nextInt(200)).toLong
          val key = (platform, (id % 7).toInt)
          val v = m.getOrElse(key, Vector.empty)
          if (v.length < cap) m(key) = v :+ ((id, companyId))
        }
      }
      id += 1
    }
    m.toMap
  }

  /** Listing-page html in each platform's discovery grammar
    * (discovery_service.py:63-239): JSON API payloads for 104/1111/yourator,
    * href scrape for cake (with filter-bait links), raw regex-able anchors
    * for yes123.
    */
  def listingHtml(platform: String, urls: Seq[String]): String = platform match {
    case Platforms.P104 =>
      val items = urls.map(u => s"""{"link": {"job": "${u.stripPrefix("https:")}"}}""")
        .mkString(", ")
      s"""<html><head><title>104 職缺列表</title></head><body>
         |<script type="application/json">{"data": [$items],
         | "metadata": {"pagination": {"lastPage": $ListPages}}}</script>
         |</body></html>""".stripMargin
    case Platforms.P1111 =>
      val items = urls.map(u => s"""{"jobId": ${u.substring(u.lastIndexOf('/') + 1)}}""")
        .mkString(", ")
      s"""<html><head><title>1111 職缺列表</title></head><body>
         |<script type="application/json">{"result": {"hits": [$items],
         | "pagination": {"totalPage": $ListPages}}}</script>
         |</body></html>""".stripMargin
    case Platforms.CAKE =>
      val anchors = urls.map(u =>
        s"""<a href="${u.stripPrefix("https://www.cake.me")}">職缺</a>""").mkString("\n")
      s"""<html><head><title>Cake 職缺列表</title></head><body>
         |<a href="/jobs/for-students">學生專區</a>
         |<a href="/about">關於我們</a>
         |$anchors
         |</body></html>""".stripMargin
    case Platforms.YES123 =>
      val anchors = urls.map(u =>
        s"""<a href="${u.stripPrefix("https://www.yes123.com.tw/wk_index/")}">職缺</a>""")
        .mkString("\n")
      s"""<html><head><title>yes123 職缺列表</title></head><body>
         |$anchors
         |</body></html>""".stripMargin
    case Platforms.YOURATOR =>
      val items = urls.map(u =>
        s"""{"path": "${u.stripPrefix("https://www.yourator.co")}"}""").mkString(", ")
      s"""<html><head><title>Yourator 職缺列表</title></head><body>
         |<script type="application/json">{"payload": {"jobs": [$items],
         | "nextPage": null}}</script>
         |</body></html>""".stripMargin
  }

  /** The 5×7×ListPages listing pages (small, driver-built, deterministic). */
  def listingPages(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    import graft.frontier.Discovery
    val listed = listedJobs(seed, n)
    val rows = for {
      p <- Platforms.all
      c <- 0 until 7
      pg <- 1 to ListPages
    } yield {
      val urls = listed.getOrElse((p, c), Vector.empty)
        .slice((pg - 1) * ListedPerPage, pg * ListedPerPage)
        .map { case (id, cid) => jobUrl(p, id, cid) }
      val html = listingHtml(p, urls)
      Page(Discovery.listUrl(p, c, pg), new Timestamp(BaseTs + 1000L * (c * 10 + pg)),
        html.getBytes("UTF-8"), s"listing $p cat$c page$pg", "zh-TW")
    }
    spark.createDataset(rows)
  }

  /** Distributed deterministic pages table (job pages + listing pages). */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
            partitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(0, n)
    base.map(id => buildPage(seed, id)).union(listingPages(spark, n, seed))
  }

  /** Seed list: canonical job URLs plus query-string duplicates (exercises
    * canonicalization + seen-set), a slice of dead URLs (not in pages), and
    * the listing-page seeds. Discovery-only ids (id % DiscoverMod == 1) are
    * NOT seeded — they must arrive via F3 discovery from fetched listings.
    */
  def seedUrls(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[SeedUrl] = {
    import spark.implicits._
    import graft.frontier.Discovery
    val listingSeeds = spark.createDataset(
      for {
        p <- Platforms.all
        c <- 0 until 7
        pg <- 1 to ListPages
      } yield SeedUrl(Discovery.listUrl(p, c, pg), p, s"cat_${p}_$c", 5.0))
    val jobSeeds = spark.range(0, n).flatMap { id =>
      val r = rng(seed, id)
      if (r.nextDouble() < 0.06) Iterator.empty // noise ids are not seeded
      else if (id % DiscoverMod == 1) Iterator.empty // discovery-only ids
      else {
        val platform = platformOf(id, r)
        val companyId = math.abs(r.nextInt(200)).toLong
        val url = jobUrl(platform, id, companyId)
        val cat = s"cat_${platform}_${id % 7}"
        val priority = 1.0 + (id % 100) / 100.0
        val withQuery =
          if (platform != Platforms.YES123 && id % 5 == 0)
            Iterator(SeedUrl(url + "?jobsource=index_s&utm=x", platform, cat, priority - 0.5))
          else Iterator.empty
        val robotsTrap =
          if (id % 173 == 0)
            Iterator(SeedUrl(s"https://${hostOf(platform)}/admin/secret/$id", platform, cat, 9.0))
          else Iterator.empty
        Iterator(SeedUrl(url, platform, cat, priority)) ++ withQuery ++ robotsTrap ++
          (if (id % 211 == 0)
             Iterator(SeedUrl(jobUrl(platform, id + 1000000000L, companyId), platform, cat, 0.1))
           else Iterator.empty)
      }
    }
    jobSeeds.union(listingSeeds)
  }

  /** Per-host politeness policy (rates from config.py:62-69; robots rules are
    * the north-rule generalization).
    */
  def hostPolicy(spark: SparkSession): Dataset[HostPolicy] = {
    import spark.implicits._
    spark.createDataset(Seq(
      HostPolicy("www.104.com.tw", 5.0, 20, 0.2, Seq("/admin", "/api/private")),
      HostPolicy("www.1111.com.tw", 5.0, 20, 0.2, Seq("/admin")),
      HostPolicy("www.cake.me", 5.0, 20, 0.2, Seq.empty),
      HostPolicy("www.yes123.com.tw", 3.0, 15, 0.33, Seq("/wk_index/admin")),
      HostPolicy("www.yourator.co", 5.0, 20, 0.2, Seq.empty)))
  }

  def categories(spark: SparkSession): Dataset[Category] = {
    import spark.implicits._
    val cats = for {
      p <- Platforms.all
      i <- 0 until 7
    } yield Category(p, "L1", "資訊科技", s"L2_${i % 3}", "軟體開發",
      s"cat_${p}_$i", s"類別$i")
    spark.createDataset(cats)
  }
}
