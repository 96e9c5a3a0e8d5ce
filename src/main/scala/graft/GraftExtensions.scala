package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft._

/** SparkSessionExtensions installer: registers graft's native expressions
  * in the SQL function registry, so `spark.sql("... dot_f32(a, b) ...")`
  * works anywhere DataFrame code does. Activate with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions()) // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def binary(name: String, usage: String, mk: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name), info(name, usage), (args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      mk(args(0), args(1))
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    val fns = Seq(
      binary("dot_f32", "dot_f32(a, b) - inner product of two float vectors", DotProductF32),
      binary("argmax_dot_f32", "argmax_dot_f32(v, cents) - index of max-IP centroid", ArgMaxDotF32),
      binary("hyperplane_signature", "hyperplane_signature(v, planes) - packed sign bits", HyperplaneSignature),
      binary("sorted_intersect_size", "sorted_intersect_size(a, b) - |a intersect b| of sorted bigint arrays", SortedIntersectSize),
      (FunctionIdentifier("l2_norm_f32"),
        info("l2_norm_f32", "l2_norm_f32(v) - L2 norm of a float vector"),
        (args: Seq[Expression]) => {
          require(args.length == 1, s"l2_norm_f32 expects 1 argument, got ${args.length}")
          L2NormF32(args.head)
        }))
    fns.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKPerKeyStrategy)
  }
}
