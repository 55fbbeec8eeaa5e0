package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: run a regex ONCE per row and return every
  * capture group as `array<string>`, or NULL when the pattern does not match.
  *
  * Motivation (measured on the scaling input): the grok parse needs several
  * groups of the SAME pattern per row, and `regexp_extract(t, re, g)` with
  * different `g` are *distinct* expressions — whole-stage codegen's
  * subexpression elimination cannot merge them, so the matcher re-scans the
  * row once per group. All uses of `RegexpGroups(t, re)` are the *identical*
  * expression, so CSE computes it once and the group reads are free slices.
  * This is the Spark-side analog of the reference's single-pass doc-mapper
  * field extraction (quickwit-doc-mapper/src/default_doc_mapper/
  * mapping_tree.rs:404-436 parses each document exactly once).
  *
  * Group semantics mirror `regexp_extract`: a group that did not participate
  * in the match yields "" (empty string), never null; only a whole-pattern
  * miss yields a NULL array. The pattern is compiled once per expression
  * instance and shipped as a reference object, not recompiled per row.
  */
case class RegexpGroups(child: Expression, pattern: String) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_groups"

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(input: Any): Any = {
    val m = compiled.matcher(input.asInstanceOf[UTF8String].toString)
    if (m.find()) RegexpGroups.groupsOf(m) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("pattern", compiled, classOf[java.util.regex.Pattern].getName)
    nullSafeCodeGen(ctx, ev, s => {
      val m = ctx.freshName("matcher")
      s"""
         |java.util.regex.Matcher $m = $p.matcher($s.toString());
         |if ($m.find()) {
         |  ${ev.value} = graft.functions.RegexpGroups$$.MODULE$$.groupsOf($m);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpGroups =
    copy(child = newChild)
}

object RegexpGroups {

  /** Column form: `groups(col("text"), re)` — element i-1 is capture group i. */
  def groups(c: Column, pattern: String): Column =
    ColumnBridge.column(RegexpGroups(ColumnBridge.expression(c), pattern))

  /** Called from generated code too — keep public. */
  def groupsOf(m: java.util.regex.Matcher): GenericArrayData = {
    val n = m.groupCount()
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) {
      val g = m.group(i + 1)
      arr(i) = UTF8String.fromString(if (g == null) "" else g)
      i += 1
    }
    new GenericArrayData(arr)
  }
}
