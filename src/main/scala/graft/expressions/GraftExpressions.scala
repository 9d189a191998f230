package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

import graft.extract.{ExtractConfig, Extractor, ExtractorState}

/** `graft_extract_text(html BINARY) -> STRING`: the whole extraction kernel as
  * a scalar Catalyst expression — the SQL surface of the engine (the graft of
  * the reference's registry-dispatched postprocess ops, SURVEY.md §2.11).
  *
  * CodegenFallback is deliberate: the kernel is a hand-written byte-loop that
  * would not benefit from Janino codegen; the per-thread arena keeps it
  * allocation-light across rows. The bulk path (`Extract.run`) remains
  * mapPartitions — this expression exists so `spark.sql("SELECT
  * graft_extract_text(html) ...")` works for ad-hoc relational use.
  */
case class ExtractTextExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY, got ${child.dataType}")
  override def prettyName: String = "graft_extract_text"

  @transient private lazy val state = new ThreadLocal[ExtractorState] {
    override def initialValue(): ExtractorState = new ExtractorState()
  }

  override def nullSafeEval(input: Any): Any = {
    val doc = Extractor.extract("", input.asInstanceOf[Array[Byte]],
      ExtractConfig(), state.get())
    UTF8String.fromString(doc.text)
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractTextExpr =
    copy(child = newChild)
}

/** `graft_token_count(s STRING) -> BIGINT`: whitespace-token counter with real
  * whole-stage codegen (doGenCode emits the loop inline — stays inside the
  * WholeStageCodegen span, no virtual call per row). The codegen'd
  * counterpart of the reference's word segmentation counting
  * (ppocr/postprocess/rec_postprocess.py:72-136).
  */
case class TokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var count = 0L
    var inTok = false
    var i = 0
    while (i < s.length) {
      val ws = s.charAt(i) == ' ' || s.charAt(i) == '\t' || s.charAt(i) == '\n'
      if (!ws && !inTok) { count += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    java.lang.Long.valueOf(count)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val inTok = ctx.freshName("inTok")
      val ch = ctx.freshName("ch")
      s"""
         |String $s = $c.toString();
         |long ${ev.value}Tmp = 0L;
         |boolean $inTok = false;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  char $ch = $s.charAt($i);
         |  boolean ws = $ch == ' ' || $ch == '\\t' || $ch == '\\n';
         |  if (!ws && !$inTok) { ${ev.value}Tmp++; $inTok = true; }
         |  else if (ws) { $inTok = false; }
         |}
         |${ev.value} = ${ev.value}Tmp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

/** Single-pass 64-bit SimHash kernel over a UTF8String: tokens are the
  * single-space splits (Spark `split(text, " ")` semantics incl. empty
  * tokens), each hashed with Spark's own XXH64 (seed 42 — bit-identical to
  * `xxhash64(tok)`), bits majority-voted by occurrence. Static so codegen
  * calls it directly without a virtual dispatch. */
object SimHash64Kernel {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.Platform

  def compute(s: UTF8String): Long = computeSeeded(s, 42L)

  /** The 128-bit signature's halves are this kernel at two independent
    * seeds: seed 42 (the canonical 64-bit signature — the low half of the
    * 128-bit form equals `graft_simhash64` bit-for-bit) and HI_SEED. */
  val HI_SEED = 0x9E3779B97F4A7C15L

  def computeSeeded(s: UTF8String, seed: Long): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      // 0x20 never occurs inside a multi-byte UTF-8 sequence, so byte-level
      // splitting is exact
      if (i == n || Platform.getByte(base, off + i) == ' '.toByte) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
    sim
  }
}

/** `graft_simhash64(s STRING) -> BIGINT`: the whole per-document SimHash in
  * ONE row-local expression — replaces the explode-every-token → groupBy
  * formulation whose shuffle re-keyed the entire corpus (at 10^12 rows, the
  * scale-killer). Codegen stays alive via a static kernel call. */
case class SimHash64Expr(child: Expression, seed: Long = 42L) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      SimHash64Kernel.computeSeeded(input.asInstanceOf[UTF8String], seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SimHash64Kernel.computeSeeded($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object GraftExpressions {
  import org.apache.spark.sql.graftshim.ColumnBridge

  def extract_text(c: Column): Column =
    ColumnBridge.column(ExtractTextExpr(ColumnBridge.expression(c)))
  def token_count(c: Column): Column =
    ColumnBridge.column(TokenCountExpr(ColumnBridge.expression(c)))
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(c)))
  /** High half of the 128-bit signature (independent seed, same kernel). */
  def simhash64Hi(c: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(c), SimHash64Kernel.HI_SEED))

  /** Register all as SQL functions on the session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_extract_text", exprs => ExtractTextExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_count", exprs => TokenCountExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
  }
}
