package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for embedding math.
  *
  * The reference's distance math lives inside FAISS/Chroma C++ (flat L2 scan:
  * /root/reference/main/indexes/indexers/faiss_indexer.py:30-31, HNSW space=l2:
  * chroma_indexer.py:155). On Spark the composable alternative —
  * `aggregate(zip_with(a, b, ...))` — allocates per element and falls out of tight
  * loops, so these expressions run a primitive float loop and participate in
  * whole-stage codegen via `doGenCode` (SURVEY.md §4 names this the one genuinely
  * justified custom expression).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Java source computing the double result from two ArrayData locals. */
  protected def loopCode(a: String, b: String, result: String): String
  protected def compute(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => loopCode(a, b, ev.value.toString))
}

/** dot(a, b) accumulated in double. */
case class DotProductF(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_f"
  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
    s
  }
  override protected def loopCode(a: String, b: String, result: String): String =
    s"""int n = Math.min($a.numElements(), $b.numElements());
       |double s = 0.0;
       |for (int i = 0; i < n; i++) { s += ((double) $a.getFloat(i)) * $b.getFloat(i); }
       |$result = s;""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance (monotone in L2 — top-k safe without the sqrt). */
case class L2DistanceSqF(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_sq_f"
  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = a.getFloat(i).toDouble - b.getFloat(i); s += d * d; i += 1 }
    s
  }
  override protected def loopCode(a: String, b: String, result: String): String =
    s"""int n = Math.min($a.numElements(), $b.numElements());
       |double s = 0.0;
       |for (int i = 0; i < n; i++) { double d = ((double) $a.getFloat(i)) - $b.getFloat(i); s += d * d; }
       |$result = s;""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity; 0.0 when either vector has zero norm. */
case class CosineSimF(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_f"
  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def loopCode(a: String, b: String, result: String): String =
    s"""int n = Math.min($a.numElements(), $b.numElements());
       |double dot = 0.0, na = 0.0, nb = 0.0;
       |for (int i = 0; i < n; i++) {
       |  double x = (double) $a.getFloat(i); double y = (double) $b.getFloat(i);
       |  dot += x * y; na += x * x; nb += y * y;
       |}
       |$result = (na == 0.0 || nb == 0.0) ? 0.0 : dot / (Math.sqrt(na) * Math.sqrt(nb));""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  import ColumnBridge.{toCol, toExpr}

  /** Both inputs must be array<float> (cast upstream if needed). */
  def dotF(a: Column, b: Column): Column = toCol(DotProductF(toExpr(a), toExpr(b)))
  def l2SqF(a: Column, b: Column): Column = toCol(L2DistanceSqF(toExpr(a), toExpr(b)))
  def cosineF(a: Column, b: Column): Column = toCol(CosineSimF(toExpr(a), toExpr(b)))

  /** Register `dot_f`, `l2_sq_f`, `cosine_f` for SQL use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_f", es => DotProductF(es(0), es(1)), "builtin")
    reg.createOrReplaceTempFunction("l2_sq_f", es => L2DistanceSqF(es(0), es(1)), "builtin")
    reg.createOrReplaceTempFunction("cosine_f", es => CosineSimF(es(0), es(1)), "builtin")
  }
}
