package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JL random projection ([[Similarity.randomProjection]], gate q278):
  * hand-checked plane arithmetic, distance preservation, and table
  * independence.
  */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("projection is the exact plane dot product (hand-computed)") {
    val v = Array(1.0f, 2.0f, -1.0f, 0.5f)
    val df = Seq((1L, v)).toDF("id", "vec")
    val got = Similarity.randomProjection(df, "id", "vec", dOut = 2)
      .select($"proj").as[Seq[Double]].head()
    val expect = (0 until 2).map { b =>
      (0 until 4).map { d =>
        v(d).toDouble * graft.functions.PortableHash.planeComponent(0, b, d)
      }.sum
    }
    got.zip(expect).foreach { case (g, e) => g shouldBe e +- 1e-12 }
  }

  test("pairwise squared distances correlate strongly after 16 -> 8") {
    val rows = (0 until 60).map { i =>
      val c = i % 5
      (i.toLong, Array.tabulate(16)(d =>
        (math.sin(c * 11.0 + d * 2.1) * 2 +
          math.sin(i * 5.77 + d) * 0.2).toFloat))
    }.toDF("id", "vec")
    val proj = Similarity.randomProjection(rows, "id", "vec", 8)
      .select($"id", $"proj".cast("array<float>").as("vec"))
    def dists(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
      val a = df.select($"id".as("ia"), $"vec".as("va"))
      val b = df.select($"id".as("ib"), $"vec".as("vb"))
      a.crossJoin(b).filter($"ia" < $"ib")
        .select($"ia", $"ib", graft.functions.SquaredL2Expr
          .squaredL2($"va", $"vb").as("d"))
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    }
    val (d0, d1) = (dists(rows), dists(proj))
    val keys = d0.keys.toSeq
    val (x, y) = (keys.map(d0), keys.map(d1))
    val (mx, my) = (x.sum / x.size, y.sum / y.size)
    val corr = keys.indices.map(i => (x(i) - mx) * (y(i) - my)).sum /
      math.sqrt(keys.indices.map(i => math.pow(x(i) - mx, 2)).sum *
        keys.indices.map(i => math.pow(y(i) - my, 2)).sum)
    corr should be > 0.6
  }

  test("different tables project independently") {
    val rows = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i + d).toFloat))
    }.toDF("id", "vec")
    val p0 = Similarity.randomProjection(rows, "id", "vec", 4, table = 0)
      .select($"id", $"proj").as[(Long, Seq[Double])].collect().toMap
    val p1 = Similarity.randomProjection(rows, "id", "vec", 4, table = 1)
      .select($"id", $"proj").as[(Long, Seq[Double])].collect().toMap
    p0.keys.foreach { id => p0(id) should not be p1(id) }
  }
}
