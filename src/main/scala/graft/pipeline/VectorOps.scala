package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector arithmetic over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * the whole similarity pipeline stays inside WholeStageCodegen.
  *
  * All folds are sequential left-to-right in double precision; the DuckDB
  * oracle SQL mirrors the same fold (`list_reduce` over a 0-prepended list),
  * making cosine values bit-identical across engines.
  */
object VectorOps {

  /** Sequential left fold sum of a double array column. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(foldSum(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity: dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
