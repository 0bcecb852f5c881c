package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.GraftShim
import graft.functions._

/** SQL surface for graft's custom Catalyst expressions.
  *
  * The DataFrame layer reaches these through `graft.functions.VectorOps`
  * etc.; this class closes the other half of the API: a pure-SQL user
  * (`spark.sql("SELECT vec_dot(a, b) ...")`) gets the same fused
  * whole-stage-codegen expressions, not a UDF shim. Two entry points:
  *
  *  - config path (standard Spark extension mechanism):
  *    `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *  - programmatic, for an already-built session:
  *    `GraftExtensions.register(spark)`
  *
  * Only expressions whose extra parameters are expressible as SQL
  * literals are registered. The matrix-parameterised family
  * (`LshBuckets`, `CosineScores`, `NearestCentroid`, the `Pq*`
  * quartet) is deliberately absent: their plane/centroid/codebook
  * matrices are plan-construction-time values (built by `Similarity`
  * from trained centroids), not something a SQL literal can carry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def litLong(e: Expression, fn: String, what: String): Long = e match {
    case Literal(v: Int, _)   => v.toLong
    case Literal(v: Long, _)  => v
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $e")
  }

  private def litString(e: Expression, fn: String, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be a string literal, got $e")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def entry(name: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      builder)

  /** (identifier, info, builder) triples consumed by both entry points. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    entry("vec_dot") { args =>
      arity("vec_dot", 2, args); VecDot(args(0), args(1))
    },
    entry("vec_dot_i8") { args =>
      arity("vec_dot_i8", 2, args); VecDotI8(args(0), args(1))
    },
    entry("sorted_intersect_size") { args =>
      arity("sorted_intersect_size", 2, args)
      SortedIntersectSize(args(0), args(1))
    },
    entry("first_band_match") { args =>
      arity("first_band_match", 2, args); FirstBandMatch(args(0), args(1))
    },
    entry("is_earliest_witness") { args =>
      arity("is_earliest_witness", 4, args)
      IsEarliestWitness(args(0), args(1), args(2), args(3))
    },
    entry("shingle_hash_set") { args =>
      arity("shingle_hash_set", 2, args)
      ShingleHashSet(args(0),
        litLong(args(1), "shingle_hash_set", "n").toInt)
    },
    entry("minhash_sig") { args =>
      arity("minhash_sig", 3, args)
      MinHashSig(args(0),
        litLong(args(1), "minhash_sig", "numHashes").toInt,
        litLong(args(2), "minhash_sig", "seed"))
    },
    entry("sorted_intersect_at_least") { args =>
      arity("sorted_intersect_at_least", 3, args)
      SortedIntersectAtLeast(args(0), args(1), args(2))
    },
    entry("cdc_chunks") { args =>
      arity("cdc_chunks", 2, args)
      CdcChunks(args(0), litLong(args(1), "cdc_chunks", "maskBits").toInt)
    },
    entry("char_histogram") { args =>
      arity("char_histogram", 2, args)
      CharHistogram(args(0), litString(args(1), "char_histogram", "alphabet"))
    },
    entry("bag_distance_lb") { args =>
      arity("bag_distance_lb", 2, args); BagDistanceLB(args(0), args(1))
    },
    entry("winnow_fps") { args =>
      arity("winnow_fps", 3, args)
      WinnowFps(args(0),
        litLong(args(1), "winnow_fps", "k").toInt,
        litLong(args(2), "winnow_fps", "w").toInt)
    },
    entry("bloom_contains") { args =>
      arity("bloom_contains", 2, args); BloomContains(args(0), args(1))
    },
  )

  /** Register every function on an existing session (idempotent —
    * re-registration overwrites with identical builders). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      GraftShim.registerFunction(spark, ident, info, builder)
    }
}
