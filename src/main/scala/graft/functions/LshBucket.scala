package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: sign-LSH (random-hyperplane) bucket id of
  * a float vector.
  *
  * Bit `j` of the result is set iff the signed projection of the vector
  * onto deterministic ±1 hyperplane `j` is > 0. The projection is the
  * left-to-right sum Σ_i sign(j,i)·(double)e[i] — the exact IEEE
  * operation order of the composed-builtin chain form and of the DuckDB
  * oracle's generated `(±1.0 * CAST(e[i] AS DOUBLE)) + ...` chain, so
  * buckets are engine-portable bit-for-bit.
  *
  * Why native: the composed form is `planes × dim` chained Add nodes
  * (~1,200 Catalyst nodes for 6×64). Optimizer passes walk that tree
  * repeatedly and codegen emits one enormous method that the JIT
  * compiles slowly (measured: the LSH query ran 6-40× slower than the
  * identical-output brute-force query that uses the native cosine loop).
  * This is preference order (b): custom Expression where builtins
  * compose but are measurably worse.
  */
case class LshBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "lsh_bucket"

  @transient private lazy val signs: Array[Array[Int]] =
    LshBucket.signMatrix(planes, LshBucket.MaxDim)

  override def nullSafeEval(v: Any): Any = {
    val e = v.asInstanceOf[ArrayData]
    val n = math.min(e.numElements(), LshBucket.MaxDim)
    var bucket = 0
    var j = 0
    while (j < planes) {
      val row = signs(j)
      var p = 0.0
      var i = 0
      while (i < n) {
        val x = e.getFloat(i).toDouble
        p += (if (row(i) > 0) x else -x)
        i += 1
      }
      if (p > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("lshSigns", signs, "int[][]")
      val n = ctx.freshName("n")
      val b = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val row = ctx.freshName("row")
      val x = ctx.freshName("x")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), ${LshBucket.MaxDim});
         |int $b = 0;
         |for (int $j = 0; $j < $planes; $j++) {
         |  int[] $row = $signsRef[$j];
         |  double $p = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    $p += ($row[$i] > 0) ? $x : -$x;
         |  }
         |  if ($p > 0) $b |= (1 << $j);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucket {

  /** Hyperplanes cover vectors up to this many dims; extra dims of a
    * longer vector are ignored (projection truncates like the chain). */
  val MaxDim = 64

  /** Deterministic ±1 hyperplane matrix from md5("j:i") — reproducible
    * as inlined constants in any engine's SQL. */
  def signMatrix(planes: Int, dim: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dim) { (j, i) =>
      val h = md.digest(s"$j:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1 else -1
    }
  }
}
