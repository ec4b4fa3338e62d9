package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis scalar expressions (training-data pipeline: SimHash,
  * winnowing fingerprints, n-gram language id, quality ratios, token
  * counting). All codegen'd calls into graft.core.text.TextOps. */

abstract class TextUnary extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  protected def fn: String // static method on TextOps taking String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.text.TextOps.$fn($c.toString())")
}

/** 64-bit SimHash over whitespace tokens (Charikar 2002). */
case class SimHash64(child: Expression) extends TextUnary {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def fn: String = "simhash64"
  override def nullSafeEval(v: Any): Any =
    graft.core.text.TextOps.simhash64(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Rabin-Karp rolling content hash (identity semantics: equal texts ->
  * equal fingerprints; distinct texts collide with ~2^-64 probability).
  * For NEAR-dup blocking use [[WinnowMin64]] instead. */
case class Fingerprint64(child: Expression) extends TextUnary {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"
  override protected def fn: String = "fingerprint64"
  override def nullSafeEval(v: Any): Any =
    graft.core.text.TextOps.fingerprint64(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(child = c)
}

/** Winnowing-style near-dup blocking key: min XXH3 over char 8-grams —
  * shared by most near-identical texts (Schleimer et al. 2003 simplified). */
case class WinnowMin64(child: Expression) extends TextUnary {
  override def dataType: DataType = LongType
  override def prettyName: String = "winnow_min64"
  override protected def fn: String = "winnowMin64"
  override def nullSafeEval(v: Any): Any =
    graft.core.text.TextOps.winnowMin64(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): WinnowMin64 = copy(child = c)
}

/** Trigram-profile language id over {en,de,sv,fr}, "und" if unsure. */
case class LangId(child: Expression) extends TextUnary {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override protected def fn: String = "" // custom codegen below
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.core.text.TextOps.langId(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
      s"graft.core.text.TextOps.langId($c.toString()))")
  override protected def withNewChildInternal(c: Expression): LangId = copy(child = c)
}

/** BPE-ish token-count heuristic (sub-word pieces). */
case class TokenCountBpeish(child: Expression) extends TextUnary {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count_bpeish"
  override protected def fn: String = "tokenCountBpeish"
  override def nullSafeEval(v: Any): Any =
    graft.core.text.TextOps.tokenCountBpeish(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): TokenCountBpeish = copy(child = c)
}

/** Fraction of alphabetic characters. */
case class AlphaRatio(child: Expression) extends TextUnary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "alpha_ratio"
  override protected def fn: String = "alphaRatio"
  override def nullSafeEval(v: Any): Any =
    graft.core.text.TextOps.alphaRatio(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): AlphaRatio = copy(child = c)
}

/** Fraction of punctuation characters. */
case class PunctRatio(child: Expression) extends TextUnary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "punct_ratio"
  override protected def fn: String = "punctRatio"
  override def nullSafeEval(v: Any): Any =
    graft.core.text.TextOps.punctRatio(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): PunctRatio = copy(child = c)
}
