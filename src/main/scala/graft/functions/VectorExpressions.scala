package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The declarative formulation (`zip_with` + `aggregate`) runs as
  * CodegenFallback — per-row closure dispatch and one array pass per dot
  * product, three passes for a cosine. These expressions generate a single
  * fused Java loop inside whole-stage codegen: the scan→score→top-k
  * pipeline of [[graft.ext.Similarity]] stays in one codegen stage, which
  * is the difference between scanning 100 TB of vectors at memory bandwidth
  * and at interpreter speed.
  *
  * Both are registered as SQL functions (`graft_dot`, `graft_cosine`) via
  * [[GraftExtensions]] so `spark.sql.extensions=graft.functions.GraftExtensions`
  * exposes them to pure-SQL users too.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  // return type intentionally inferred: Seq[ArrayType] <: Seq[AbstractDataType]
  // (AbstractDataType itself is not nameable outside org.apache.spark.sql)
  override def inputTypes     = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
}

/** Deterministic left-to-right float-array dot product as double. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Single-pass cosine similarity: dot, |a|² and |b|² in one fused loop
  * (vs three passes when composed from dot products). NULL on zero-norm
  * inputs, matching `x / 0.0 = NaN`-avoidance expectations for embeddings.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na  = 0.0
    var nb  = 0.0
    var i   = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na  = ctx.freshName("na")
      val nb  = ctx.freshName("nb")
      val xv  = ctx.freshName("xv")
      val yv  = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

/** Single-pass Euclidean (L2) distance — completes the vector family for
  * distance-metric workloads (k-means assignment, radius search).
  */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_l2"
}

/** SparkSessionExtensions hook: `spark.sql.extensions=graft.functions.GraftExtensions`
  * registers the vector functions in every session's FunctionRegistry.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    def arity2(name: String)(children: Seq[Expression]): (Expression, Expression) = {
      require(
        children.length == 2,
        s"$name requires exactly 2 arguments (two array<float> vectors), got ${children.length}"
      )
      (children(0), children(1))
    }
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[Expression]) => {
          val (a, b) = arity2("graft_dot")(children); DotProduct(a, b)
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_cosine"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
        (children: Seq[Expression]) => {
          val (a, b) = arity2("graft_cosine")(children); CosineSimilarity(a, b)
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_l2"),
        new ExpressionInfo(classOf[L2Distance].getName, "graft_l2"),
        (children: Seq[Expression]) => {
          val (a, b) = arity2("graft_l2")(children); L2Distance(a, b)
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_bigram_tf"),
        new ExpressionInfo(classOf[BigramTf].getName, "graft_bigram_tf"),
        (children: Seq[Expression]) => {
          require(
            children.length == 1,
            s"graft_bigram_tf requires exactly 1 argument (a string), got ${children.length}"
          )
          BigramTf(children(0))
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_bloom_contains"),
        new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
        (children: Seq[Expression]) => {
          require(
            children.length == 2,
            s"graft_bloom_contains requires exactly 2 arguments (key, bits), got ${children.length}"
          )
          BloomContains(children(0), children(1))
        }
      )
    )
  }
}
