package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{AsciiFolding, EnglishMinimalStemmer, PorterStemmer, StandardAnalyzer, TermFilter}

/** Analysis-chain term filters: S-stemmer rule fixtures, Porter golden pairs
  * (full-pipeline outputs traced from the algorithm definition, including the
  * reference's two departures), accent folding, and the filter's placement in
  * the analyzer chain (after stop filtering, positions preserved).
  */
class FiltersSpec extends AnyFunSuite {

  // ------------------------------------------------------- minimal (Harman)

  test("minimal stemmer rule table") {
    val cases = Seq(
      "tables" -> "table", // plain -s
      "keys" -> "key",
      "queries" -> "query", // -ies -> -y
      "ponies" -> "pony",
      "dies" -> "dy", // len-4 -ies still rewrites
      "caress" -> "caress", // -ss kept
      "bus" -> "bus", // -us kept
      "does" -> "does", // -oes kept
      "dues" -> "dues", // -ues kept
      "aes" -> "aes", // -ies family at len 3 kept
      "tablees" -> "tablee", // -ees: drop s only
      "as" -> "as", // too short
      "a" -> "a",
      "table" -> "table" // no trailing s
    )
    cases.foreach { case (in, want) =>
      assert(EnglishMinimalStemmer(in) == want, s"minimal($in)")
    }
  }

  // ------------------------------------------------------- porter

  test("porter full-pipeline golden pairs") {
    val cases = Seq(
      // step 1
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
      "agreed" -> "agre", "plastered" -> "plaster", "motoring" -> "motor",
      "sing" -> "sing", "conflated" -> "conflat", "troubled" -> "troubl",
      "sized" -> "size", "hopping" -> "hop", "tanned" -> "tan",
      "falling" -> "fall", "hissing" -> "hiss", "fizzed" -> "fizz",
      "failing" -> "fail", "filing" -> "file", "happy" -> "happi",
      "sky" -> "sky",
      // step 2
      "relational" -> "relat", "conditional" -> "condit",
      "valenci" -> "valenc", "digitizer" -> "digit",
      "radicalli" -> "radic", "differentli" -> "differ",
      "vileli" -> "vile", "analogousli" -> "analog",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
      "angulariti" -> "angular",
      // step 3
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      // step 4
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
      "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "homologou" -> "homolog", "communism" -> "commun",
      "activate" -> "activ", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      // step 5
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll"
    )
    cases.foreach { case (in, want) =>
      assert(PorterStemmer(in) == want, s"porter($in) = ${PorterStemmer(in)}")
    }
  }

  test("porter: reference departures (bli->ble, logi->log)") {
    // paper rule is abli->able: 'forcibli' would pass step2 untouched; the
    // reference's bli->ble rewrites it (PorterStemFilter.java departure #1)
    assert(PorterStemmer("forcibli") == "forcibl")
    // added logi->log rule (departure #2); m("archaeo") > 0 so it fires
    assert(PorterStemmer("archaeologi") == "archaeolog")
    // m("geo") == 0: rule matches but condition fails -> unchanged
    assert(PorterStemmer("geologi") == "geologi")
  }

  test("porter passes through non-letter and short terms") {
    assert(PorterStemmer("mp3") == "mp3")
    assert(PorterStemmer("don't") == "don't")
    assert(PorterStemmer("ab") == "ab")
    assert(PorterStemmer("café") == "café")
  }

  // ------------------------------------------------------- folding

  test("ascii folding strips combining marks, keeps base letters") {
    assert(AsciiFolding("café") == "cafe")
    assert(AsciiFolding("über") == "uber")
    assert(AsciiFolding("naïve") == "naive")
    assert(AsciiFolding("ñoño") == "nono")
    assert(AsciiFolding("ascii") == "ascii") // no-allocation fast path
    // documented subset: non-decomposable ligatures pass through
    assert(AsciiFolding("straße") == "straße")
  }

  // ------------------------------------------------------- chain placement

  test("filter runs after stop filtering, positions preserved") {
    val an = new StandardAnalyzer(
      stopwords = Set("the"), filter = EnglishMinimalStemmer)
    val toks = an.tokens("the tables near the ponies")
    assert(toks.map(_.term) == Seq("table", "near", "pony"))
    // stopword gaps survive the filter (positions 1, 2, 4)
    assert(toks.map(_.position) == Seq(1, 2, 4))
  }

  test("foreachTerm and tokens agree under a filter") {
    val an = new StandardAnalyzer(filter = PorterStemmer)
    val text = "relational databases are failing the hopeful operators"
    val buf = Vector.newBuilder[String]
    an.foreachTerm(text)(buf += _)
    assert(buf.result() == an.tokens(text).map(_.term))
  }

  test("termFreqs merges conflated variants") {
    val an = new StandardAnalyzer(filter = EnglishMinimalStemmer)
    val (tf, len) = an.termFreqs("query queries querys table")
    assert(len == 4)
    assert(tf.get("query") == 3)
    assert(tf.get("table") == 1)
  }

  test("byName resolves filters; unknown names fail fast") {
    assert(TermFilter.byName("none") eq TermFilter.Identity)
    assert(TermFilter.byName("minimal") eq EnglishMinimalStemmer)
    assert(TermFilter.byName("porter") eq PorterStemmer)
    assert(TermFilter.byName("fold") eq AsciiFolding)
    intercept[IllegalArgumentException](TermFilter.byName("nope"))
  }
}
