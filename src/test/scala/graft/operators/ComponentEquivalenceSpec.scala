package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The small-graph union-find shortcut in [[Dedup.connectedComponents]]
  * must be row-identical to the distributed label-propagation loop — the
  * dispatch is a size trigger, never a semantics switch.
  */
class ComponentEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def assertSame(pairs: org.apache.spark.sql.DataFrame): Unit = {
    val fast = Dedup.connectedComponents(pairs)
    val loop = Dedup.connectedComponentsDistributed(pairs)
    val a = fast.collect().map(r => (r.get(0), r.get(1))).toSet
    val b = loop.collect().map(r => (r.get(0), r.get(1))).toSet
    a shouldBe b
    fast.unpersist(); loop.unpersist()
  }

  test("union-find path equals the loop on long ids: chains, " +
      "diamonds, singleton pairs, disjoint components") {
    assertSame(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),        // chain
      (10L, 11L), (10L, 12L), (11L, 12L),  // triangle
      (20L, 21L),                           // lone pair
      (30L, 31L), (31L, 32L), (30L, 32L), (32L, 33L) // diamond + tail
    ).toDF("id_a", "id_b"))
  }

  test("union-find path equals the loop on string ids (non-numeric " +
      "ordering), with reversed-order pairs") {
    assertSame(Seq(
      ("e", "d"), ("d", "c"), ("c", "b"),  // min must travel 3 hops
      ("x", "y"), ("zz", "z")              // lexicographic: "z" < "zz"
    ).toDF("id_a", "id_b"))
  }

  test("union-find path labels every node with the component min " +
      "and the result releases cleanly") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cc = Dedup.connectedComponents(
      Seq((5L, 3L), (3L, 9L), (9L, 1L)).toDF("id_a", "id_b"))
    cc.as[(Long, Long)].collect().foreach(_._2 shouldBe 1L)
    cc.count() shouldBe 4
    cc.unpersist(blocking = true)
    (spark.sparkContext.getPersistentRDDs.keySet -- before) shouldBe empty
  }
}
