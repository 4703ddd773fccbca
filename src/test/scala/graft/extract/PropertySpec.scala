package graft.extract

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties (SURVEY.md §5.2 item 2). */
object CanonProps extends Properties("graft") {

  private val urlGen: Gen[String] = for {
    host <- Gen.oneOf("www.104.com.tw", "www.1111.com.tw", "www.cake.me",
      "www.yes123.com.tw", "www.yourator.co", "blog.example.com")
    path <- Gen.listOfN(2, Gen.alphaNumStr.map(_.take(6))).map(_.mkString("/"))
    query <- Gen.oneOf("", "?a=1", "?p_id=9&job_id=7", "?utm=x&b=2")
  } yield s"https://$host/$path$query"

  // scala-side canon mirror of Canon.canonUrl for property testing
  private def canon(u: String): String =
    if (u.contains("yes123.com.tw")) u else u.split("\\?", 2)(0)

  property("canon is idempotent") = forAll(urlGen) { u =>
    canon(canon(u)) == canon(u)
  }

  property("canon preserves yes123 identity params") = forAll(urlGen) { u =>
    !u.contains("yes123.com.tw") || canon(u) == u
  }

  private val salaryTextGen: Gen[String] = for {
    a <- Gen.chooseNum(1, 500)
    b <- Gen.chooseNum(1, 500)
    unit <- Gen.oneOf("月薪", "年薪", "時薪", "")
    shape <- Gen.oneOf(s"$unit ${a}000 - ${b}000 元", s"$unit ${a}萬", s"${a}000元以上", "面議")
  } yield shape

  property("salary parse never yields non-positive values") =
    forAll(salaryTextGen) { s =>
      val r = Parsers.parseSalary(Json.JStr(s))
      r.min.forall(_ > 0) && r.max.forall(_ > 0)
    }

  property("salary text is never empty") = forAll(salaryTextGen) { s =>
    Parsers.parseSalary(Json.JStr(s)).text.nonEmpty
  }

  private val dateGen: Gen[String] = for {
    y <- Gen.chooseNum(1000, 9999)
    m <- Gen.chooseNum(1, 12)
    d <- Gen.chooseNum(1, 28)
    sep <- Gen.oneOf("-", "/")
    tail <- Gen.oneOf("", "T08:00:00", " 10:00")
  } yield s"$y$sep$m$sep$d$tail"

  property("parse_iso_date emits zero-padded ISO") = forAll(dateGen) { s =>
    Parsers.parseIsoDate(Json.JStr(s)).exists(_.matches("\\d{4}-\\d{2}-\\d{2}"))
  }

  property("dedupe_address is idempotent on its own output") =
    forAll(Gen.listOf(Gen.oneOf("台北市", "台北市信義區", "信義路五段7號",
      "ABC Tower", "新北市板橋區", "高雄市"))) { parts =>
      val once = TextClean.dedupeAddress(parts)
      TextClean.dedupeAddress(List(once)) == once
    }

  property("unescape leaves entity-free text unchanged") =
    forAll(Gen.asciiPrintableStr.map(_.replace("&", ""))) { s =>
      Entities.unescape(s) == s
    }
}
