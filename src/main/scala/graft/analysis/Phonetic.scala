package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** American Soundex as a pure codegen'd column chain — the re-expression of
  * the reference's phonetic analysis module
  * (`/root/reference/lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/PhoneticFilter.java`,
  * which delegates to commons-codec `Soundex`): terms are reduced to a
  * letter + 3-digit code so spelling variants that sound alike compare
  * equal.
  *
  * Algorithm (classic American Soundex):
  *   1. keep the first letter;
  *   2. drop H/W from the rest (same-coded letters separated only by H/W
  *      collapse — the ASHCRAFT→A261 rule);
  *   3. code the remaining letters (B F P V→1, C G J K Q S X Z→2, D T→3,
  *      L→4, M N→5, R→6, vowels→0);
  *   4. collapse adjacent equal non-zero codes (vowels break runs because
  *      the 0 between them survives until after the collapse);
  *   5. drop the first code (it belongs to the kept letter), drop zeros,
  *      right-pad with zeros to 3 digits.
  *
  * Everything is `translate`/`regexp_replace`/`substring` — whole-stage
  * codegen, no UDF — and the identical chain is replicated in DuckDB SQL by
  * [[graft.OracleSql.soundexSql]] (RE2-safe: the run collapse is one
  * replace per digit, no backreferences), so the oracle is independent of
  * this implementation.
  */
object Phonetic {

  /** Letter→code table for A..Z (step 3 above). */
  val CodeTable = "01230120022455012623010202"

  def soundex(c: Column): Column = {
    val up = upper(c)
    val first = substring(up, 1, 1)
    val restNoHW = translate(substring(up, 2, Int.MaxValue), "HW", "")
    val digits = translate(concat(first, restNoHW),
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", CodeTable)
    // collapse runs of each non-zero digit; one pass per digit keeps the
    // regex RE2-compatible (no backreferences) so the DuckDB oracle can
    // run the same chain verbatim
    val collapsed = (1 to 6).foldLeft(digits) { (d, k) =>
      regexp_replace(d, s"$k{2,}", k.toString)
    }
    val tail = translate(substring(collapsed, 2, Int.MaxValue), "0", "")
    concat(first, substring(concat(tail, lit("000")), 1, 3))
  }
}
