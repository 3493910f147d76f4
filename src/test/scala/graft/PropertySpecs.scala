package graft

import graft.expr.{DateComponents, PartitionCriteria}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests over driver-side semantics (SURVEY §5: property tests for
  * date derivation and partition-criteria algebra). Plain ScalaCheck Gens
  * sampled deterministically (scalatestplus isn't on the offline classpath).
  */
class DateDerivationProperties extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("yyyyMMdd components equal java.time for arbitrary valid dates") {
    val ds = samples(Gen.choose(0L, 20000L), 200)
      .map(java.time.LocalDate.ofEpochDay) // 1970..2024
    val strs = ds.map(_.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE))
    val out = DateComponents.withComponents(strs.toDF("d"), "d",
        "yyyyMMdd", Seq("year", "month", "day", "week"))
      .orderBy("d").collect()
    val expected = ds.sortBy(_.format(
      java.time.format.DateTimeFormatter.BASIC_ISO_DATE))
    out.zip(expected).foreach { case (row, ld) =>
      row.getShort(1) shouldBe ld.getYear.toShort
      row.getShort(2) shouldBe ld.getMonthValue.toShort
      row.getShort(3) shouldBe ld.getDayOfMonth.toShort
      row.getShort(4) shouldBe (((ld.getDayOfYear - 1) / 7) + 1).toShort
    }
  }

  test("non-dates always map to sentinels") {
    val junk = samples(Gen.alphaStr.map(_.take(7)), 50).distinct
    val out = DateComponents.withComponents(junk.toDF("d"), "d",
      "yyyyMMdd", Seq("year", "month")).collect()
    out.foreach { r =>
      r.getShort(1) shouldBe 9999.toShort
      r.getShort(2) shouldBe 99.toShort
    }
  }
}

class PartitionCriteriaProperties extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("compiled Column filter equals reference predicate semantics") {
    val rows = (for { y <- 2015 to 2017; m <- 1 to 4 } yield (y, m))
      .toDF("year", "month")
    val data = rows.as[(Int, Int)].collect()
    val conjGen: Gen[Seq[(String, Any)]] = for {
      y <- Gen.option(Gen.choose(2014, 2018))
      m <- Gen.option(Gen.choose(0, 5))
    } yield (y.map(v => ("year", v: Any)) ++ m.map(v => ("month", v: Any))).toSeq
    val criteriaGen = Gen.listOfN(4, conjGen)
    samples(criteriaGen, 30).foreach { criteria =>
      val got = rows.filter(PartitionCriteria.toColumn(criteria))
        .as[(Int, Int)].collect().toSet
      val exp = data.filter { case (y, m) =>
        criteria.exists(conj => conj.forall {
          case ("year", v) => v == y
          case ("month", v) => v == m
          case _ => false
        })
      }.toSet
      withClue(s"criteria=$criteria") { got shouldBe exp }
    }
  }
}
