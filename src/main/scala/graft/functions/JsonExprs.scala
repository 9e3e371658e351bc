package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled single-key JSON integer extraction for the event-stream
  * family: `json_int_key(props, "k")` ==
  * `get_json_object(props, "$.k").cast("int")` for top-level integer
  * (or integer-in-string) values. `get_json_object` runs a full Jackson
  * parse per row — ~2 µs on the events `props` column and the whole
  * cost of `ev_json`/`ev_json_agg` at sf1; this kernel is one byte
  * scan of the object (~50 ns), JSON-aware where it matters:
  *
  *  - only TOP-LEVEL keys match (nested objects/arrays are skipped with
  *    a depth- and string-aware bracket matcher — a `"k"` inside a
  *    nested object or inside a string VALUE never matches);
  *  - values accepted as ints: bare integer literals and quoted digit
  *    strings (`{"k": "42"}` — `get_json_object` unquotes, the cast
  *    parses); anything else (float, bool, object, array, null,
  *    overflow) yields NULL;
  *  - malformed JSON yields NULL, like `get_json_object`.
  *
  * JsonExprsSpec pins equivalence against the Jackson form on the real
  * events corpus and on targeted adversarial shapes (nested fake keys,
  * string values containing `"k":`, escapes, whitespace variants).
  */
object JsonOps {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** Index just past a JSON string starting at the opening quote `i`,
    * or -1 on malformed input. Escape-aware; no unescaping (keys are
    * compared raw between the quotes). */
  private def skipString(b: Array[Byte], i0: Int): Int = {
    var i = i0 + 1
    while (i < b.length) {
      b(i) match {
        case '\\' => i += 2
        case '"'  => return i + 1
        case _    => i += 1
      }
    }
    -1
  }

  /** Index just past the value starting at `i`, or -1 on malformed
    * input. Depth-counted for objects/arrays, string-aware throughout. */
  private def skipValue(b: Array[Byte], i0: Int): Int = {
    var i = i0
    if (i >= b.length) return -1
    b(i) match {
      case '"' => skipString(b, i)
      case '{' | '[' =>
        var depth = 0
        while (i < b.length) {
          b(i) match {
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' =>
              depth -= 1; i += 1
              if (depth == 0) return i
            case '"' =>
              i = skipString(b, i)
              if (i < 0) return -1
            case _ => i += 1
          }
        }
        -1
      case _ =>
        // number / true / false / null: run to a structural delimiter
        while (i < b.length && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
          !isWs(b(i))) i += 1
        i
    }
  }

  /** Parse the digits of b[from, until) (sign already consumed) into a
    * boxed Int, or null on any non-digit / overflow. `strictJson`
    * additionally rejects leading zeros ("007"), which Jackson refuses
    * in BARE number literals but Spark's string cast accepts in QUOTED
    * values. */
  private def parseDigits(b: Array[Byte], from: Int, until: Int,
                          neg: Boolean, strictJson: Boolean): Any = {
    if (from >= until) return null
    if (strictJson && b(from) == '0' && until - from > 1) return null
    var i = from
    var v = 0L
    while (i < until) {
      if (!isDigit(b(i))) return null
      v = v * 10 + (b(i) - '0')
      if (v > Int.MaxValue + 1L) return null
      i += 1
    }
    val signed = if (neg) -v else v
    if (signed < Int.MinValue || signed > Int.MaxValue) null
    else java.lang.Integer.valueOf(signed.toInt)
  }

  /** Bare JSON integer literal: -?(0|[1-9][0-9]*), Jackson's grammar. */
  private def parseBareInt(b: Array[Byte], from: Int, until: Int): Any = {
    var i = from
    var neg = false
    if (i < until && b(i) == '-') { neg = true; i += 1 }
    parseDigits(b, i, until, neg, strictJson = true)
  }

  /** Quoted value through Spark's string→int cast semantics: ASCII
    * whitespace trimmed, optional '+'/'-', leading zeros allowed. */
  private def parseQuotedInt(b: Array[Byte], from0: Int, until0: Int): Any = {
    var from = from0
    var until = until0
    // Spark's cast trims via UTF8String.trimAll: every ASCII control or
    // space (<= 0x20), wider than JSON's structural whitespace
    while (from < until && b(from) >= 0 && b(from) <= ' ') from += 1
    while (until > from && b(until - 1) >= 0 && b(until - 1) <= ' ') until -= 1
    var neg = false
    if (from < until && (b(from) == '-' || b(from) == '+')) {
      neg = b(from) == '-'
      from += 1
    }
    parseDigits(b, from, until, neg, strictJson = false)
  }

  /** The top-level value of `key` as an Int (boxed) or null. */
  def jsonIntKey(s: UTF8String, key: Array[Byte]): Any = {
    val b = s.getBytes
    var i = 0
    while (i < b.length && isWs(b(i))) i += 1
    if (i >= b.length || b(i) != '{') return null
    i += 1
    while (i < b.length) {
      while (i < b.length && isWs(b(i))) i += 1
      if (i >= b.length) return null
      if (b(i) == '}') return null // end of object, key absent
      if (b(i) != '"') return null // malformed
      val keyStart = i + 1
      val keyEnd0 = skipString(b, i)
      if (keyEnd0 < 0) return null
      val keyEnd = keyEnd0 - 1 // position of the closing quote
      i = keyEnd0
      while (i < b.length && isWs(b(i))) i += 1
      if (i >= b.length || b(i) != ':') return null
      i += 1
      while (i < b.length && isWs(b(i))) i += 1
      val isMatch = (keyEnd - keyStart) == key.length && {
        var j = 0
        var eq = true
        while (eq && j < key.length) { eq = b(keyStart + j) == key(j); j += 1 }
        eq
      }
      if (isMatch) {
        if (i < b.length && b(i) == '"') {
          val end = skipString(b, i)
          if (end < 0) return null
          return parseQuotedInt(b, i + 1, end - 1)
        }
        val end = skipValue(b, i)
        if (end < 0) return null
        return parseBareInt(b, i, end)
      }
      val end = skipValue(b, i)
      if (end < 0) return null
      i = end
      while (i < b.length && isWs(b(i))) i += 1
      if (i < b.length && b(i) == ',') i += 1
      else return null // '}' (key absent), EOF, or a missing comma — all NULL
    }
    null
  }
}

/** `json_int_key(string, key)` → int (nullable). */
case class JsonIntKey(child: Expression, key: String) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "json_int_key"

  @transient private lazy val keyBytes: Array[Byte] =
    key.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"json_int_key expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    JsonOps.jsonIntKey(s.asInstanceOf[UTF8String], keyBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("key", keyBytes, "byte[]")
    val v = ctx.freshName("jsonInt")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object $v = graft.functions.JsonOps.jsonIntKey($c, $ref);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Integer) $v).intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonExprs {
  def jsonIntKey(c: Column, key: String): Column =
    Bridge.column(JsonIntKey(Bridge.expression(c), key))
}
