package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native graft expressions: `register(spark)` makes
  * every custom Catalyst expression callable from `spark.sql` — so the
  * SQL-driven product path ([[graft.algos.SQLRunner]]'s acon-style
  * queries, ad-hoc notebook SQL) gets the same one-loop-per-row
  * primitives as the Scala API, codegen included, instead of falling
  * back to lambda-soup built-ins or UDFs.
  *
  * Size/seed parameters must be LITERAL integers in the SQL text — they
  * parameterize the expression instance itself (loop bounds baked into
  * the generated code), so a column-valued argument is rejected at
  * analysis time with the function name in the message.
  */
object GraftFunctions {

  private def intLit(fn: String, name: String, e: Expression): Int =
    e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be a literal integer, got ${other.sql}")
    }

  private def arity(fn: String, n: Int,
      args: Seq[Expression]): Unit =
    require(args.length == n,
      s"$fn expects $n argument(s), got ${args.length}")

  /** (name, builder) for every graft SQL function — consumed by both
    * the per-session [[register]] and the `spark.sql.extensions` path
    * ([[graft.core.GraftExtensions]] injects the same list, so a plain
    * `spark-submit --conf spark.sql.extensions=graft.core.GraftExtensions`
    * session gets every function with no code-side registration call).
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "nfc_normalize" -> { args =>
      arity("nfc_normalize", 1, args)
      NfcNormalizeExpr(args.head)
    },
    "shingle_hashes" -> { args =>
      arity("shingle_hashes", 2, args)
      ShingleHashExpr(args.head, intLit("shingle_hashes", "n", args(1)))
    },
    "shingle_minhash" -> { args =>
      arity("shingle_minhash", 3, args)
      ShingleMinHashExpr(args.head,
        intLit("shingle_minhash", "n", args(1)),
        intLit("shingle_minhash", "k", args(2)))
    },
    "minhash_signature" -> { args =>
      arity("minhash_signature", 2, args)
      MinHashSignatureExpr(args.head,
        intLit("minhash_signature", "k", args(1)))
    },
    "simhash64" -> { args =>
      arity("simhash64", 1, args)
      SimHashExpr(args.head)
    },
    "deflated_size" -> { args =>
      arity("deflated_size", 1, args)
      DeflatedSizeExpr(args.head)
    },
    "heavy_hitters" -> { args =>
      arity("heavy_hitters", 2, args)
      MisraGriesAgg(args.head, intLit("heavy_hitters", "k", args(1)))
    },
    "lsh_signature" -> { args =>
      arity("lsh_signature", 3, args)
      LshSignatureExpr(args.head,
        intLit("lsh_signature", "bits", args(1)),
        intLit("lsh_signature", "table", args(2)))
    },
    "quantize_vector" -> { args =>
      arity("quantize_vector", 1, args)
      QuantizeVectorExpr(args.head)
    },
    "cosine_similarity" -> { args =>
      arity("cosine_similarity", 2, args)
      CosineSimilarityExpr(args.head, args(1))
    },
    "feature_hash" -> { args =>
      arity("feature_hash", 2, args)
      FeatureHashExpr(args.head, intLit("feature_hash", "dims", args(1)))
    },
    "vector_sum" -> { args =>
      arity("vector_sum", 1, args)
      VectorSumAgg(args.head)
    },
    "quantile_sketch" -> { args =>
      arity("quantile_sketch", 2, args)
      QuantileSketchAgg(args.head, intLit("quantile_sketch", "k", args(1)))
    },
    "hll_sketch" -> { args =>
      arity("hll_sketch", 2, args)
      HllAgg(args.head, intLit("hll_sketch", "p", args(1)))
    },
    "quantile_sketch_merge" -> { args =>
      arity("quantile_sketch_merge", 2, args)
      QuantileSketchMergeAgg(args.head,
        intLit("quantile_sketch_merge", "k", args(1)))
    },
    "heavy_hitters_merge" -> { args =>
      arity("heavy_hitters_merge", 2, args)
      MisraGriesMergeAgg(args.head,
        intLit("heavy_hitters_merge", "k", args(1)))
    },
    // Spark's internal bloom pair, surfaced for acon-style SQL: build a
    // serialized filter over longs, probe it from a binary column/value
    "bloom_agg" -> { args =>
      arity("bloom_agg", 2, args)
      // the estimated-items argument must be BIGINT; lift int literals
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(args.head,
          org.apache.spark.sql.catalyst.expressions.Cast(args(1),
            org.apache.spark.sql.types.LongType))
    },
    "bloom_might_contain" -> { args =>
      arity("bloom_might_contain", 2, args)
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(args.head, args(1))
    })

  /** Idempotent per-session registration of all graft SQL functions. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftBridge.registerFunction(spark, name, b)
    }
}
