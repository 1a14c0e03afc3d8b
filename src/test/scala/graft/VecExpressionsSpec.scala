package graft

import org.apache.spark.sql.functions._

import graft.functions.VecExpressions

/** Native VecDot expression: bit-identity with the interpreted
  * aggregate/zip_with fold it replaced, SQL registration, null semantics,
  * and whole-stage-codegen participation.
  */
class VecExpressionsSpec extends SparkTestBase {

  test("vec_dot == interpreted aggregate fold, bit-exact on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id",
        VecExpressions.vecDot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val interp = df.select($"id",
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0d), (acc, x) => acc + x).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == interp(id), s"row $id") // bit-exact, not approx
      var s = 0.0; var i = 0
      while (i < 64) { s += a(i) * b(i); i += 1 }
      assert(got(id) == s, s"row $id vs local loop")
    }
  }

  test("simhash64 == the 64-pass interpreted aggregate fold, bit-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val words = Seq("data", "query", "stream", "court", "law", "state", "web", "x1")
    val rows = (0 until 150).map(i =>
      (i.toLong, Seq.fill(rnd.nextInt(40) + 1)(words(rnd.nextInt(words.size))).mkString(" ")))
    val df = rows.toDF("id", "text")
    val hs = transform(split($"text", " "), t => xxhash64(t))
    val got = df.select($"id", VecExpressions.simHash64(hs).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the previous formulation: per-bit interpreted aggregate votes
    val bits = (0 until 64).map { bIdx =>
      val vote = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftrightunsigned(h, bIdx).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), bIdx)).otherwise(lit(0L))
    }
    val interp = df.select($"id", bits.reduce(_.bitwiseOR(_)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, _) => assert(got(id) == interp(id), s"row $id") }
    // codegen participation: the native expression stays inside a `*(n)`
    // stage (use a range source — a local relation would constant-fold)
    val plan = spark.range(50)
      .select(VecExpressions.simHash64(
        transform(split(concat(lit("data w"), $"id" % 7), " "), t => xxhash64(t))).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"simhash64 fell out of codegen:\n$plan")
  }

  test("vec_dot registers for SQL and handles nulls/length mismatch") {
    import spark.implicits._
    VecExpressions.register(spark)
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT vec_dot(a, b) FROM vecs").head().getDouble(0) == 32.0)
    // null input -> null out (BinaryExpression null semantics)
    assert(spark.sql(
      "SELECT vec_dot(a, CAST(NULL AS ARRAY<DOUBLE>)) FROM vecs").head().isNullAt(0))
    // length mismatch: min-length prefix (defensive; inputs are same-dim)
    assert(spark.sql("SELECT vec_dot(a, array(2.0d)) FROM vecs").head().getDouble(0) == 2.0)
  }

  test("vec_dot stays inside whole-stage codegen") {
    import spark.implicits._
    // non-literal input so constant folding can't collapse the projection
    val df = spark.range(100)
      .select($"id", transform(sequence(lit(1), lit(8)),
        i => (i + $"id").cast("double")).as("v"))
      .select($"id", VecExpressions.vecDot($"v", $"v").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; the vec_dot
    // projection must carry it (the interpreted higher-order `transform`
    // projection below it, by contrast, does not)
    val vecDotLine = plan.linesIterator.find(_.contains("vec_dot")).getOrElse("")
    assert(vecDotLine.trim.startsWith("*("), s"vec_dot not codegen'd:\n$plan")
    // id = 0 -> v = [1..8]; dot = 204
    assert(df.orderBy($"id").head().getDouble(1) == 204.0)
  }
}
