package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization ([[TextAnalysis.canonicalUrl]], gate q255). The
  * gate pins cross-engine identity on a synthesized fixture; these specs
  * pin each rule — and what must NOT be touched — on crafted URLs.
  */
class UrlCanonicalSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(TextAnalysis.canonicalUrl($"url").as("c"))
      .as[String].collect().toSeq

  test("surface variants of one page collapse to one canonical form") {
    val got = canon(
      "HTTP://WWW.Example.COM/a",
      "http://example.com:80/a/",
      "http://example.com/a?utm_source=feed",
      "http://example.com/a#top",
      "http://example.com/a?gclid=abc123")
    got.distinct shouldBe Seq("http://example.com/a")
  }

  test("https default port 443 stripped; http's 443 kept (a real port)") {
    canon("https://x.com:443/p") shouldBe Seq("https://x.com/p")
    canon("http://x.com:443/p") shouldBe Seq("http://x.com:443/p")
    canon("http://x.com:8080/p") shouldBe Seq("http://x.com:8080/p")
  }

  test("path case is preserved (paths are case-sensitive)") {
    canon("https://X.com/CaseSensitive/Path") shouldBe
      Seq("https://x.com/CaseSensitive/Path")
  }

  test("tracking params removed from any position, real params kept") {
    canon("https://x.com/p?utm_source=a&id=7&utm_medium=b&q=z") shouldBe
      Seq("https://x.com/p?id=7&q=z")
    canon("https://x.com/p?fbclid=F") shouldBe Seq("https://x.com/p")
    // utm in the MIDDLE leaves && which must collapse
    canon("https://x.com/p?a=1&utm_term=t&b=2") shouldBe
      Seq("https://x.com/p?a=1&b=2")
  }

  test("params whose names merely CONTAIN a tracking token survive") {
    // unanchored, ?notgclid=5 canonicalized to ?not and distinct URLs
    // collapsed to one dedup key (round-9 advisor finding)
    canon("https://x.com/p?notgclid=5") shouldBe
      Seq("https://x.com/p?notgclid=5")
    canon("https://x.com/p?myutm_source=a&id=1") shouldBe
      Seq("https://x.com/p?myutm_source=a&id=1")
    canon("https://x.com/p?xfbclid=1&fbclid=2") shouldBe
      Seq("https://x.com/p?xfbclid=1")
  }

  test("www stripped only as a prefix label") {
    canon("https://www.x.com/") shouldBe Seq("https://x.com")
    canon("https://wwwx.com/") shouldBe Seq("https://wwwx.com")
    canon("https://a.www.com/") shouldBe Seq("https://a.www.com")
  }

  test("non-URLs canonicalize to null") {
    canon("not a url", "ftp_missing_scheme") shouldBe Seq(null, null)
  }

  test("report groups variants and keeps the min id") {
    val urls = Seq(
      (5L, "http://www.x.com/a"),
      (3L, "HTTP://X.COM/a/"),
      (9L, "http://x.com/a?utm_source=s"),
      (1L, "http://x.com/b"))
      .toDF("doc_id", "url")
    val got = TextAnalysis.canonicalUrlReport(urls, "doc_id", "url")
      .select($"canonical_url", $"n_urls", $"n_variants", $"first_id")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got("http://x.com/a") shouldBe ((3L, 3L, 3L))
    got("http://x.com/b") shouldBe ((1L, 1L, 1L))
  }

  test("UrlCanonicalReport runs through the params surface") {
    val base = tmp("url_params")
    Seq((1L, "http://www.x.com/a"), (2L, "http://x.com/a"))
      .toDF("doc_id", "url").write.parquet(s"$base/urls")
    val f = java.nio.file.Paths.get(base, "UrlCanonicalReport.json")
    java.nio.file.Files.writeString(f,
      s"""{"source_dir": "$base/urls", "target_dir": "$base/out",
         | "id_column": "doc_id", "url_column": "url"}""".stripMargin)
    graft.core.JobRunner.execute(spark, "UrlCanonicalReport", f.toString)
    val got = spark.read.parquet(s"$base/out")
    got.count() shouldBe 1
    got.select($"n_urls").head.getLong(0) shouldBe 2L
  }
}
