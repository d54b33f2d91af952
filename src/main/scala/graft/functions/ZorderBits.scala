package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Order-preserving integer views of floating-point columns.
  *
  * Z-order clustering (operators/Zorder) interleaves integer key bits;
  * double columns have no cheap integer order — `percent_rank` gives one
  * but costs a global sort/window, which at 100 TB is a second shuffle
  * as large as the clustered write itself. The IEEE-754 bit pattern,
  * remapped so integer comparison agrees with double comparison, is a
  * rank-free order-preserving key: one codegen'd projection, no extra
  * pass over the data.
  */
object bits {

  /** Long whose SIGNED order equals the double order of `c` — see
    * [[BitsRuntime.sortableDoubleBits]].
    */
  def double_sortable_bits(c: Column): Column =
    GraftBridge.column(DoubleSortableBits(GraftBridge.expression(c)))
}

object BitsRuntime {

  /** IEEE-754 double bits remapped so signed-long order == double order:
    * non-negative doubles keep their bit pattern (already ascending in
    * [0, 2^63)), negative doubles (sign bit set, magnitude DESCENDS as
    * value ascends) flip to the negative-long range. Total and monotone:
    * -Inf < ... < -0.0 < +0.0 < ... < +Inf < NaN; no ranking pass.
    */
  def sortableDoubleBits(x: Double): Long = {
    val b = java.lang.Double.doubleToRawLongBits(x)
    if (b >= 0L) b else ~b ^ Long.MinValue
  }
}

case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BitsRuntime.sortableDoubleBits(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BitsRuntime.sortableDoubleBits($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
