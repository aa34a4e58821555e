package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Catalyst expressions over [[TextOps]] — the hashing primitives of the
 * dedup/similarity operators ([[graft.operators.Dedup]]). Kept as native
 * expressions (not UDFs) so they stay inside whole-stage codegen.
 */

/** word_shingles(text, n) → sorted distinct word n-grams (array<string>). */
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any, n: Any): Any =
    TextOps.wordShingles(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      n.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.TextOps.wordShingles($t, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordShingles =
    copy(left = l, right = r)
  override def prettyName: String = "word_shingles"
}

/** sorted_intersect_count(a, b) → |A ∩ B| of two sorted string arrays. */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    TextOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextOps.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

/** repetition_stats(text) → [n_tokens, distinct 2-grams, distinct 3-grams,
  * max token frequency] in one kernel pass (TextOps.repetitionStats). */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any): Any =
    TextOps.repetitionStats(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.repetitionStats($t)")
  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
  override def prettyName: String = "repetition_stats"
}

/** rolling_min_fp(text) → min polynomial hash over char 5-grams (the
  * winnowing fingerprint; formula documented at TextOps.rollingMinFp and
  * TextAnalysis.withFingerprints). */
case class RollingMinFp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any): Any =
    TextOps.rollingMinFp(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.rollingMinFp($t)")
  override protected def withNewChildInternal(c: Expression): RollingMinFp = copy(child = c)
  override def prettyName: String = "rolling_min_fp"
}

/** nfc_normalize(text) → Unicode NFC composition (TextOps.nfc; DuckDB's
  * function of the same name is the oracle twin). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any): Any =
    TextOps.nfc(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.nfc($t)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

/** minhash_sig(shingles, k) → array<long> signature. */
case class MinHashSig(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(sh: Any, k: Any): Any =
    TextOps.minhashSig(sh.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sh, k) => s"graft.functions.TextOps.minhashSig($sh, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSig =
    copy(left = l, right = r)
  override def prettyName: String = "minhash_sig"
}

/** band_buckets(sig, nBands) → array<long> LSH band buckets. */
case class BandBuckets(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(sig: Any, b: Any): Any =
    TextOps.bandBuckets(sig.asInstanceOf[ArrayData], b.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sig, b) => s"graft.functions.TextOps.bandBuckets($sig, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BandBuckets =
    copy(left = l, right = r)
  override def prettyName: String = "band_buckets"
}

/** simhash64(tokens) → 64-bit SimHash as long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(tokens: Any): Any =
    TextOps.simhash64(tokens.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.simhash64($t)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** hamming(a, b) → popcount(a XOR b). */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    TextOps.hamming(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextOps.hamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
  override def prettyName: String = "hamming"
}

/** hyperplane_buckets(vec float[], tables, planes) → array<long>. */
case class HyperplaneBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any, t: Any, p: Any): Any =
    TextOps.hyperplaneBuckets(v.asInstanceOf[ArrayData], t.asInstanceOf[Int], p.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, t, p) => s"graft.functions.TextOps.hyperplaneBuckets($v, $t, $p)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): HyperplaneBuckets =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "hyperplane_buckets"
}
