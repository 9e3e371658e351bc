package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composable column functions reproducing the reference's scalar-function
  * semantics (SURVEY §2.7). All are built-in compositions — codegen'd by
  * Catalyst — except `replaceFirst`/`format12g`, which are custom
  * expressions (F1 / K1 gaps).
  */
object Fns {

  /** Column reference by LITERAL name. `col(name)` parses dots as struct
    * access, so any dynamic-schema code (`df.columns` loops) breaks on
    * names like the reference's `MHCflurry_2.1.1_affinity_nm`
    * (`validate.py:14-133`) — backtick-quote to keep the name literal.
    */
  def qcol(name: String): Column = col(s"`$name`")

  /** F1 — strip the first occurrence of the literal `"_" + columnName
    * .toLowerCase` from every value of the column (reference
    * `clinical.py:98-133`: `str.replace(suffix, "", n=1, regex=False)`).
    */
  def stripColumnSuffix(c: Column, columnName: String): Column = {
    val suffix = "_" + columnName.toLowerCase
    ReplaceFirst.replaceFirst(c, lit(suffix), lit(""))
  }

  /** F1 applied over all string columns of a frame, with the reference's
    * special case: column `AMADEUS_STUDY` strips `"_amadeus"`
    * (`clinical.py:109-115`).
    */
  def stripSuffixesFromStringColumns(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
    stringCols.foldLeft(df) { (acc, name) =>
      val suffix = if (name == "AMADEUS_STUDY") "_amadeus" else "_" + name.toLowerCase
      acc.withColumn(name, ReplaceFirst.replaceFirst(qcol(name), lit(suffix), lit("")))
    }
  }

  /** F2 — `str.replace("_"," ").str.upper()` (`clinical.py:136-167`). */
  def capsCase(c: Column): Column = upper(translate(c, "_", " "))

  /** F3 — `str.replace("_"," ").str.title()` (`clinical.py:160-163`),
    * with EXACT Python semantics via [[PyTitleCase]]: a cased letter
    * after any non-cased character (digit, apostrophe, punctuation)
    * starts a word — where `initcap` (whitespace-only word starts)
    * diverges.
    */
  def titleCase(c: Column): Column = PyTitleCase.pyTitle(translate(c, "_", " "))

  /** F4 — conditional id remap: paper id where present, else original
    * (`clinical.py:170-196`).
    */
  def remapId(paperId: Column, originalId: Column): Column =
    coalesce(paperId, originalId)

  /** F5 — dict recode with pass-through of unmapped values as strings
    * (`clinical.py:403-422`; unmapped / null values survive untouched).
    */
  def recode(c: Column, mapping: Map[String, String]): Column = {
    val base: Column = c.cast("string")
    mapping.foldLeft(base) { case (acc, (from, to)) =>
      when(c.cast("string") === from, lit(to)).otherwise(acc)
    }
  }

  /** F5 specialization — survival status recode (`clinical.py:408-413`). */
  def recodeSurvivalStatus(c: Column, living: String, deceased: String): Column =
    recode(c, Map("0" -> living, "1" -> deceased))

  /** F6 — days → months: `round(col / 30.44, 2)` (`clinical.py:515-535`).
    * pandas rounds HALF_EVEN on doubles → Spark `bround`.
    */
  def daysToMonths(c: Column): Column = bround(c / lit(30.44), 2)

  /** P1 — pandas `str.contains(pat, na=False)`: null input counts as
    * NON-matching (`clinical.py:74-95`). Plain `rlike` yields null for
    * null input; wrap in coalesce(false).
    */
  def rlikeNaFalse(c: Column, pattern: String): Column =
    coalesce(c.rlike(pattern), lit(false))

  /** P2 — pandas `col != value` keeps NaN rows (`maf.py:181-195`).
    * Null-safe-equal negated, not `=!=`.
    */
  def neqKeepNulls(c: Column, value: Column): Column = !(c <=> value)

  /** F8 — cancer-type sanitize for case-list file names
    * (`clinical.py:699-705`): spaces→`_`, drop `,`, `/`→`_`,
    * empty/`NA`→`no_oncotree_code`. Driver-side (runs on collected keys).
    */
  def sanitizeCancerType(raw: String): String = {
    val s = Option(raw).getOrElse("").replace(" ", "_").replace(",", "").replace("/", "_")
    if (s.isEmpty || s == "NA") "no_oncotree_code" else s
  }

  /** Register every custom expression for SQL use in THIS session (the
    * cluster-wide path is `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    def intLit(e: Expression): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"expected int literal, got $other")
    }
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "replace_first", exprs => ReplaceFirst(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "format_12g", exprs => Format12g(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash60", exprs => SimHash60(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sigs", exprs => MinHashSigs(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "ws_token_count", exprs => WsTokenCount(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "ascii_class_count", exprs => AsciiClassCount(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "winnow_fingerprints", exprs => WinnowFingerprints(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "py_title", exprs => PyTitleCase(exprs.head), "built-in")
  }
}
