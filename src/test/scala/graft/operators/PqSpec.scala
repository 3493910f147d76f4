package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization ([[Similarity.pqCodebooks]] / [[Similarity.pqEncode]]
  * / [[Similarity.pqTopK]], gates q271/q272): codeword self-encode, recall
  * against the exact L2 scan on clustered data, fixed-point error bound,
  * partitioning-independence, and the broadcast plan shape.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val ks = 16

  /** 200 deterministic vectors in 10 well-separated clusters. */
  private lazy val clustered = {
    val rows = (0 until 200).map { i =>
      val c = i % 10
      val v = Array.tabulate(dim) { d =>
        (math.sin(c * 17.0 + d * 3.0) * 2.0 +
          math.sin(i * 7.31 + d * 1.17) * 0.15).toFloat
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("a codeword vector encodes to its own code in every subspace") {
    val cb = Similarity.pqCodebooks(clustered, "vec_id", "embedding",
      dim, m, ks)
    val codes = Similarity.pqEncode(clustered, "vec_id", "embedding",
      dim, m, cb)
    // the selected centroids ARE corpus vectors: their subvectors sit at
    // exact distance 0 from their own codeword, so argmin must pick it
    // (ties to the smaller code can only matter for duplicate codewords,
    // which this corpus doesn't have)
    val sel = Similarity.selectCentroids(clustered, "vec_id", "embedding",
      ks).select($"cid").as[Long].collect().toSet
    val cbIds = codes.filter($"vec_id".isin(sel.toSeq: _*))
    // every (centroid, j) row's distance to its assigned codeword is 0
    val joined = cbIds
      .join(clustered, Seq("vec_id"))
      .join(broadcast(cb), Seq("j", "code"))
      .withColumn("subv", element_at(
        array((0 until m).map(j =>
          slice($"embedding", j * (dim / m) + 1, dim / m)): _*),
        $"j" + 1))
      .select(graft.functions.SquaredL2Expr.squaredL2($"subv", $"sub")
        .as("d"))
      .agg(max($"d")).as[Double].head()
    joined shouldBe 0.0
  }

  test("recall@5 against the exact squared-L2 scan on clustered data") {
    val queries = clustered.filter($"vec_id" % 20 === 0)
    val pq = Similarity.pqTopK(queries, clustered, "vec_id", "embedding",
        k = 5, dim, m, ks)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val q = queries.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = clustered.select($"vec_id".as("neighbor_id"),
      $"embedding".as("cv"))
    val W = org.apache.spark.sql.expressions.Window
    val exact = q.crossJoin(c).filter($"query_id" =!= $"neighbor_id")
      .withColumn("d",
        graft.functions.SquaredL2Expr.squaredL2($"qv", $"cv"))
      .withColumn("rk", row_number().over(W.partitionBy($"query_id")
        .orderBy($"d", $"neighbor_id")))
      .filter($"rk" <= 5).select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, truth) =>
      pq.getOrElse(qid, Set.empty).intersect(truth).size.toDouble /
        truth.size
    }
    (recalls.sum / recalls.size) should be >= 0.6
  }

  test("pq_dist is the quantized ADC sum: within m/2^20 of the " +
      "double-sum of per-subspace distances") {
    val queries = clustered.filter($"vec_id" % 50 === 0)
    val cb = Similarity.pqCodebooks(clustered, "vec_id", "embedding",
      dim, m, ks)
    val codes = Similarity.pqEncode(clustered, "vec_id", "embedding",
      dim, m, cb).withColumnRenamed("vec_id", "neighbor_id")
    val subs = array((0 until m).map(j =>
      slice($"embedding", j * (dim / m) + 1, dim / m)): _*)
    val qt = queries.select($"vec_id".as("query_id"),
        posexplode(subs).as(Seq("j", "subv")))
      .join(broadcast(cb), "j")
      .select($"query_id", $"j", $"code",
        graft.functions.SquaredL2Expr.squaredL2($"subv", $"sub").as("qd"))
    val naive = codes.join(qt, Seq("j", "code"))
      .filter($"query_id" =!= $"neighbor_id")
      .groupBy($"query_id", $"neighbor_id")
      .agg(sum($"qd").as("adist"))
    val got = Similarity.pqTopK(queries, clustered, "vec_id", "embedding",
      k = 200, dim, m, ks)
    val err = got.join(naive, Seq("query_id", "neighbor_id"))
      .select(abs($"pq_dist" - $"adist").as("e"))
      .agg(max($"e")).as[Double].head()
    err should be <= (m.toDouble / (1L << 20) + 1e-6)
  }

  test("codes are independent of input partitioning") {
    val cb = Similarity.pqCodebooks(clustered, "vec_id", "embedding",
      dim, m, ks)
    val a = Similarity.pqEncode(clustered, "vec_id", "embedding",
      dim, m, cb).as[(Long, Int, Int)].collect().toSet
    val b = Similarity.pqEncode(clustered.repartition(13), "vec_id",
      "embedding", dim, m, cb).as[(Long, Int, Int)].collect().toSet
    a shouldBe b
  }

  test("prepared IVF-PQ (encode-time cells, cid-partitioned round-trip) " +
      "is identical to the one-shot form") {
    val queries = clustered.filter($"vec_id" % 40 === 0)
    val oneShot = Similarity.ivfPqTopK(queries, clustered, "vec_id",
      "embedding", k = 5, dim, m, ks, centroids = 8, nprobe = 3)
      .as[(Long, Long, Double)].collect().toSet
    val cb = Similarity.pqCodebooks(clustered, "vec_id", "embedding",
      dim, m, ks)
    val cent = Similarity.selectCentroids(clustered, "vec_id",
      "embedding", 8)
    // round-trip the artifact through a cid-partitioned parquet, the
    // production layout (probe join = partition pruning)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_prepared").toString
    Similarity.ivfPqEncodeWith(clustered, "vec_id", "embedding", dim, m,
        cb, cent)
      .write.mode("overwrite").partitionBy("cid").parquet(dir)
    val prepared = Similarity.ivfPqTopKPrepared(queries,
      spark.read.parquet(dir), cb, cent, "vec_id", "embedding",
      k = 5, dim, m, nprobe = 3)
      .as[(Long, Long, Double)].collect().toSet
    prepared shouldBe oneShot
  }

  test("ivfPq with nprobe = centroids degenerates to the full PQ scan") {
    val queries = clustered.filter($"vec_id" % 20 === 0)
    val full = Similarity.pqTopK(queries, clustered, "vec_id",
      "embedding", k = 5, dim, m, ks)
      .as[(Long, Long, Double)].collect().toSet
    val ivf = Similarity.ivfPqTopK(queries, clustered, "vec_id",
      "embedding", k = 5, dim, m, ks, centroids = 8, nprobe = 8)
      .as[(Long, Long, Double)].collect().toSet
    ivf shouldBe full
  }

  test("ivfPq recall@5 vs the exact scan stays useful under pruning") {
    val queries = clustered.filter($"vec_id" % 20 === 0)
    val ivf = Similarity.ivfPqTopK(queries, clustered, "vec_id",
        "embedding", k = 5, dim, m, ks, centroids = 8, nprobe = 3)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val q = queries.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = clustered.select($"vec_id".as("neighbor_id"),
      $"embedding".as("cv"))
    val W = org.apache.spark.sql.expressions.Window
    val exact = q.crossJoin(c).filter($"query_id" =!= $"neighbor_id")
      .withColumn("d",
        graft.functions.SquaredL2Expr.squaredL2($"qv", $"cv"))
      .withColumn("rk", row_number().over(W.partitionBy($"query_id")
        .orderBy($"d", $"neighbor_id")))
      .filter($"rk" <= 5).select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, truth) =>
      ivf.getOrElse(qid, Set.empty).intersect(truth).size.toDouble /
        truth.size
    }
    (recalls.sum / recalls.size) should be >= 0.5
  }

  test("pqTopKRerank with a corpus-wide shortlist IS the brute-force " +
      "cosine ranking") {
    val queries = clustered.filter($"vec_id" % 20 === 0)
    val rr = Similarity.pqTopKRerank(queries, clustered, "vec_id",
      "embedding", k = 5, dim, m, ks, shortlist = 200)
      .select($"query_id", $"neighbor_id",
        round($"cosine", 6).as("cosine"))
    val bf = Similarity.bruteForceTopK(queries, clustered, "vec_id",
      "embedding", k = 5)
      .select($"query_id", $"neighbor_id",
        round($"cosine", 6).as("cosine"))
    assertSameRows(rr, bf)
  }

  test("plan shape: distance tables broadcast, no cartesian product") {
    val queries = clustered.filter($"vec_id" % 50 === 0)
    val plan = Similarity.pqTopK(queries, clustered, "vec_id",
      "embedding", k = 5, dim, m, ks)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    (plan should not).include("CartesianProduct")
    (plan should not).include("BroadcastNestedLoopJoin")
  }
}
