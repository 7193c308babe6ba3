package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built Bloom filter.
  *
  * The filter is embedded in the plan as its serialized bytes (compact,
  * java-serializable) and deserialized ONCE per executor via a transient
  * lazy val — generated code then calls [[mightContain]] on the expression
  * reference, so the probe stays inside whole-stage codegen with no UDF
  * boundary and no per-row deserialization.
  *
  * Used by [[graft.dedup.Dedup.contaminatedBloom]]: a fixed-size filter over
  * the eval-set gram hashes replaces broadcasting the full exact gram set,
  * which at benchmark-suite scale (hundreds of millions of grams) outgrows
  * broadcast limits. False positives are screened by an exact verify join on
  * the survivors; false negatives are impossible, so results stay exact.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean  = child.nullable

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the expression itself (serializable: bytes + child); the
    // deserialized filter hides behind the transient lazy val
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContainExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomFunctions {
  /** `true` when the filter might contain the long-typed column value. */
  def mightContainLong(c: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContainExpr(ColumnBridge.expression(c), bloomBytes))

  /** Serialize a built filter for plan embedding. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }
}
