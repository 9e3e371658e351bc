package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled single-pass sketch kernels. The higher-order-function
  * formulations (`aggregate`/`filter`/`transform` lambdas) are interpreted
  * per element per bit/seed — a 60-bit SimHash walks each token array 60
  * times through the expression interpreter. These expressions compute the
  * identical values (same md5-derived 60-bit hash family as
  * [[Hashing.md5Long]], so every DuckDB oracle still matches bit-for-bit)
  * in one tight JVM loop per row, and stay inside whole-stage codegen via
  * static helper calls.
  */
object SketchOps {

  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def seedPrefix(seed: Int): Array[Byte] =
    (seed.toString + ":").getBytes(StandardCharsets.UTF_8)

  /** Top 60 bits of md5(prefix ++ token) — equals
    * `conv(substring(md5(concat(seed, ':', t)), 1, 15), 16, 10)`.
    */
  def md5Long60(prefix: Array[Byte], token: UTF8String): Long = {
    val d = mdTL.get(); d.reset()
    d.update(prefix)
    d.update(token.getBytes)
    val dig = d.digest()
    var h = 0L; var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** 60-bit SimHash: bit j set iff a strict majority of the (non-null)
    * token hashes have bit j set.
    */
  def simhash60(tokens: ArrayData, prefix: Array[Byte]): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    var i = 0; var m = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Long60(prefix, tokens.getUTF8String(i))
        var j = 0
        while (j < 60) { counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
        m += 1
      }
      i += 1
    }
    var res = 0L; var j = 0
    while (j < 60) { if (2 * counts(j) > m) res |= 1L << j; j += 1 }
    res
  }

  /** All K MinHash signature values in one pass over the shingles:
    * sig(k) = min over shingles of md5Long60("k:" ++ shingle). An
    * empty/all-null array yields Long.MaxValue sentinels (our shingling
    * always emits ≥ 1 shingle, so this is unreachable in the pipelines).
    */
  def minhashSigs(shingles: ArrayData, prefixes: Array[Array[Byte]]): GenericArrayData = {
    val k = prefixes.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val t = shingles.getUTF8String(i)
        var s = 0
        while (s < k) {
          val h = md5Long60(prefixes(s), t)
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `simhash60(array<string>, seed)` → long. */
case class SimHash60(child: Expression, seed: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash60"

  @transient private lazy val prefix: Array[Byte] = SketchOps.seedPrefix(seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash60 expects array<string>, got $t")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    SketchOps.simhash60(tokens.asInstanceOf[ArrayData], prefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefix", prefix, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.simhash60($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5long60(string, seed)` → long: the seeded portable hash as ONE
  * compiled kernel call. [[Hashing.md5LongSeeded]] composes
  * conv∘substring∘md5∘concat_ws — four interpreted expression nodes and
  * three intermediate strings per value when evaluated OUTSIDE codegen,
  * which is exactly where an aggregate's child expression lands
  * (`TypedImperativeAggregate.update` calls `child.eval`). Pre-projecting
  * this kernel keeps the hash inside whole-stage codegen and hands the
  * aggregate a plain long column. Values are identical to
  * `md5LongSeeded` (same digest-prefix parse), so oracles are unaffected.
  */
case class Md5Long60(child: Expression, seed: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5long60"

  @transient private lazy val prefix: Array[Byte] = SketchOps.seedPrefix(seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5long60 expects string, got $t")
  }

  override protected def nullSafeEval(token: Any): Any =
    SketchOps.md5Long60(prefix, token.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefix", prefix, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.md5Long60($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5long60_raw(string)` → long: the UNSEEDED portable hash as one
  * compiled kernel call — bit-identical to [[graft.functions.Hashing]]'s
  * `conv(substring(md5(c), 1, 15), 16, 10)` chain (same digest, same
  * top-60-bit parse) without the 32-char hex string, the substring copy,
  * and the base-16 parse per row (optimization r14; the seeded twin
  * [[Md5Long60]] predates it). Spec-locked against the builtin chain in
  * SketchExprsSpec.
  */
case class Md5Long60Raw(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5long60_raw"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5long60_raw expects string, got $t")
  }

  override protected def nullSafeEval(token: Any): Any =
    SketchOps.md5Long60(Array.emptyByteArray, token.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefix", Array.emptyByteArray, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.md5Long60($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sigs(array<string>, k)` → array<long> of length k. */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until k).map(SketchOps.seedPrefix).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sigs expects array<string>, got $t")
  }

  override protected def nullSafeEval(shingles: Any): Any =
    SketchOps.minhashSigs(shingles.asInstanceOf[ArrayData], prefixes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefixes", prefixes, "byte[][]")
    val code = defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchOps.minhashSigs($c, $ref)")
    code
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExprs {
  /** Column API. */
  def simhash60(tokens: Column, seed: Int): Column =
    Bridge.column(SimHash60(Bridge.expression(tokens), seed))

  def md5Long60Raw(token: Column): Column =
    Bridge.column(Md5Long60Raw(Bridge.expression(token)))

  def minhashSigs(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(shingles), k))

  def md5Long60(token: Column, seed: Int): Column =
    Bridge.column(Md5Long60(Bridge.expression(token), seed))
}
