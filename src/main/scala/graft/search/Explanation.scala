package graft.search

/** Score explanation tree — the re-expression of the reference's
  * `search/Explanation.java` + `Weight#explain`: for one (query, doc) pair,
  * a human-readable breakdown whose root value equals the score the search
  * path produces (spec-asserted). `matched = false` nodes carry value 0.
  */
final case class Explanation(
    value: Double,
    description: String,
    matched: Boolean = true,
    details: Seq[Explanation] = Seq.empty
) {
  def format(indent: Int = 0): String = {
    val pad = "  " * indent
    val head = f"$pad$value%.6f = $description" +
      (if (matched) "" else " (no match)")
    (head +: details.map(_.format(indent + 1))).mkString("\n")
  }
}

object Explanation {
  def noMatch(description: String): Explanation =
    Explanation(0.0, description, matched = false)
}
