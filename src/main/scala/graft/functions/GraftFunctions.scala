package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native expressions, so `spark.sql`
  * users get them as first-class functions:
  *
  *   SELECT graft_dot(a.emb, b.emb) FROM ...
  *   SELECT graft_fingerprint(split(text, ' ')) FROM docs
  *
  * Registered directly on a session's FunctionRegistry; a deployment that
  * owns session construction can do the same from a
  * `SparkSessionExtensions` (`injectFunction`) — both paths feed the same
  * registry, this one also works on an already-built session. */
object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args =>
      require(args.length == 2, "graft_dot(arrayA, arrayB)")
      DotProduct(args(0), args(1))
    },
    "graft_fingerprint" -> { args =>
      require(args.length == 1, "graft_fingerprint(tokenArray)")
      Fingerprint(args(0))
    })

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftFunctions].getName, name),
      builder)
  }
}

/** Class token for ExpressionInfo's className slot. */
class GraftFunctions
