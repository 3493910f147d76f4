package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** One SparkSession per test JVM, shared by every suite (suite startup is
  * ~10s; suites run sequentially — see build.sbt).
  */
object TestSession {
  lazy val spark: SparkSession = {
    // Hive-backed catalog with a per-JVM Derby metastore under a temp dir —
    // the reference's test harness pattern (SparkSupport.scala:26-46), so
    // catalog specs exercise real Hive DDL (CREATE TABLE LIKE, SHOW
    // PARTITIONS formats) instead of the in-memory catalog
    val base = java.nio.file.Files.createTempDirectory("graft-test").toString
    System.setProperty("derby.system.home", s"$base/metastore")
    val s = graft.core.Session.builder("graft-test", hive = true)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = TestSession.spark
  def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
  /** multiset equality on full content, the reference's test oracle
    * (reference: src/test/scala/com/adidas/utils/TestUtils.scala:10-24).
    */
  def assertSameRows(got: org.apache.spark.sql.DataFrame,
      exp: org.apache.spark.sql.DataFrame): Unit = {
    val g = got.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val e = exp.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(g == e, s"multiset diff:\n got=${g.toSeq.diff(e.toSeq)}\n exp=${e.toSeq.diff(g.toSeq)}")
  }
}
