package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Porter-stem every element of a token array.
  *
  * Replaces r2's Scala UDF for `en_stem` (VERDICT r2 "wrong" #4 — the one
  * non-codegen tokenizer): as a real expression it stays inside the
  * whole-stage-codegen span (no UDF closure invocation, no Row
  * encode/decode at the boundary) and composes with CSE like any other
  * expression. The stemming itself is the same published Porter algorithm
  * ([[PorterStemmer]], pinned by PorterStemmerSpec) — tantivy's
  * Stemmer(Language::English) equivalent (tokenizers/mod.rs:55-60).
  */
case class StemTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "stem_tokens"

  override def nullSafeEval(input: Any): Any =
    StemTokens.stemAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.StemTokens$$.MODULE$$.stemAll($s);")

  override protected def withNewChildInternal(newChild: Expression): StemTokens =
    copy(child = newChild)
}

object StemTokens {

  /** Column form over an `array<string>` of tokens. */
  def stem(tokens: Column): Column =
    ColumnBridge.column(StemTokens(ColumnBridge.expression(tokens)))

  /** Called from generated code too — keep public. */
  def stemAll(a: ArrayData): GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) null
        else UTF8String.fromString(PorterStemmer.stem(a.getUTF8String(i).toString))
      i += 1
    }
    new GenericArrayData(out)
  }
}
