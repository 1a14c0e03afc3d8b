package graft.analysis

/** One index-time synonym rule: when the analyzed token stream contains
  * `variant` at consecutive positions, inject `output` as an overlap token
  * at the match's first position (position-increment 0 — the stacked-token
  * shape of the reference's
  * `/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/synonym/SynonymGraphFilter.java`
  * after `FlattenGraphFilter`). Injected tokens do NOT count toward the
  * document length / norm — the reference's `discountOverlaps` default
  * (`search/similarities/BM25Similarity.java` discountOverlaps = true).
  */
final case class SynonymRule(variant: List[String], output: String) {
  require(variant.nonEmpty && variant.forall(_.nonEmpty) && output.nonEmpty,
    s"bad synonym rule: $variant -> $output")
}

/** Applies [[SynonymRule]]s to an analyzed, position-sorted token stream.
  * Matching is over CONSECUTIVE positions, so a removed stopword's position
  * gap blocks a phrase match — same as running the reference's synonym
  * filter on a stream with position holes.
  */
final class SynonymInjector(rules: Seq[SynonymRule]) extends Serializable {

  private val byFirst: Map[String, Seq[SynonymRule]] = rules.groupBy(_.variant.head)

  val isEmpty: Boolean = rules.isEmpty

  /** The overlap tokens to stack onto `tokens` (analyzer output order).
    * Each carries the match's first position and spans the matched chars.
    */
  def injected(tokens: IndexedSeq[Token]): Vector[Token] = {
    if (byFirst.isEmpty) return Vector.empty
    val out = Vector.newBuilder[Token]
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      byFirst.get(t.term) match {
        case None => ()
        case Some(cands) =>
          cands.foreach { r =>
            var ok = true
            var j = 1
            while (ok && j < r.variant.length) {
              val k = i + j
              ok = k < tokens.length && tokens(k).term == r.variant(j) &&
                tokens(k).position == t.position + j
              j += 1
            }
            if (ok)
              out += Token(r.output, t.position, t.startOffset,
                tokens(i + r.variant.length - 1).endOffset)
          }
      }
      i += 1
    }
    out.result()
  }
}
