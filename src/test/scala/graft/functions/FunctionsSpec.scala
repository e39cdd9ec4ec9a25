package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("normText collapses whitespace, trims, lowercases") {
    val got = Seq("  A  b\t\nC ").toDF("t")
      .select(normText(col("t"))).head().getString(0)
    assert(got === "a b c")
  }

  test("tokens splits the normal form on non-whitespace runs") {
    val got = Seq("the  QUICK\nfox").toDF("t")
      .select(tokens(col("t"))).head().getSeq[String](0)
    assert(got === Seq("the", "quick", "fox"))
  }

  test("tokens: blank text yields the EMPTY list (no phantom token), " +
    "NULL stays NULL; wordRatio of 0 tokens is NULL") {
    // a blank doc's normal form is '', whose bare split would be ['']
    // — one phantom token that counted blank docs into token budgets
    // and scored them 1.0 on q21 quality; pinned to [] / NULL ratio,
    // in lockstep with the oracle's list_filter + NULLIF twins
    val df = Seq(Some(""), Some("  \t\n "), None, Some("a  b"))
      .toDF("t")
      .select(col("t"), tokens(col("t")).as("toks"))
      .select(size(col("toks")).as("n"),
        wordRatio(col("toks"), Seq("a")).as("r"))
      .collect()
    assert(df(0).getInt(0) === 0 && df(0).isNullAt(1))
    assert(df(1).getInt(0) === 0 && df(1).isNullAt(1))
    assert(df(2).isNullAt(0) && df(2).isNullAt(1))
    assert(df(3).getInt(0) === 2 && df(3).getDouble(1) === 0.5)
  }

  test("WordShingles matches the HOF formulation exactly") {
    val df = Seq(
      "a b c d e",
      "x y",                  // < 3 tokens → empty
      "a b c a b c a b c",    // repeats → distinct shingles
      "").toDF("t")
    val native = df.select(shingles3(col("t"))).collect()
      .map(_.getSeq[String](0))
    val hof = df.select(
      when(size(tokens(col("t"))) >= 3,
        array_distinct(transform(
          sequence(lit(1), size(tokens(col("t"))) - 2), i =>
            concat_ws(" ",
              element_at(tokens(col("t")), i),
              element_at(tokens(col("t")), i + 1),
              element_at(tokens(col("t")), i + 2)))))
        .otherwise(array().cast("array<string>"))).collect()
      .map(_.getSeq[String](0))
    native.zip(hof).foreach { case (n, h) => assert(n === h) }
    assert(native(0) === Seq("a b c", "b c d", "c d e"))
    assert(native(1) === Seq.empty)
    assert(native(2) === Seq("a b c", "b c a", "c a b"))
  }

  test("NgramTopCount == the explode/groupBy bigram max, plus edges") {
    // the per-row expression replaced q64's two-shuffle aggregate; it
    // must produce the identical integer on every document shape
    val df = Seq(
      Some("a b a b a c"),        // bigrams: ab,ba,ab,ba,ac → max 2
      Some("x x x x"),            // xx ×3 → 3
      Some("one"),                // < 2 tokens → 0
      Some(""), Some(" \t "),     // blank → 0
      None,                       // NULL → NULL
      Some("Q w E q W e q w")     // case-folds via normText: qw ×3
    ).toDF("t")
    val got = df.select(ngramTopCount(col("t"), 2)).collect()
    assert(got(0).getLong(0) === 2L)
    assert(got(1).getLong(0) === 3L)
    assert(got(2).getLong(0) === 0L)
    assert(got(3).getLong(0) === 0L && got(4).getLong(0) === 0L)
    assert(got(5).isNullAt(0))
    assert(got(6).getLong(0) === 3L)
    // cross-check against the aggregate formulation on real fixture text
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val agg = docs
      .select(col("doc_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.sequence(
            org.apache.spark.sql.functions.lit(1), size(col("t")) - 1)).as("i"),
        col("t"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.array_join(
          org.apache.spark.sql.functions.slice(col("t"), col("i"),
            org.apache.spark.sql.functions.lit(2)), " ").as("g"))
      .groupBy(col("doc_id"), col("g")).count()
      .groupBy(col("doc_id"))
      .agg(org.apache.spark.sql.functions.max(col("count")).as("m"))
      .as[(Long, Long)].collect().toMap
    val native = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), ngramTopCount(col("text"), 2).as("m"))
      .as[(Long, Long)].collect().toMap
    agg.foreach { case (id, m) => assert(native(id) === m, s"doc $id") }
  }

  test("NgramTopCount: 300-case randomized cross-check vs a reference " +
    "count, n in {1,2,3}") {
    // independent reference over the SAME normal form the column path
    // feeds the expression (lowercase + collapsed whitespace)
    def ref(raw: String, n: Int): Long = {
      val toks = raw.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) 0L
      else toks.sliding(n).map(_.mkString(" ")).toSeq
        .groupBy(identity).values.map(_.size).max.toLong
    }
    val rng = new scala.util.Random(7)
    // small vocab forces real collisions; mixed-case + ragged
    // whitespace + unicode letters exercise the normText contract
    val vocab = Vector("a", "B", "ab", "Ü", "xy", "ß", "q1", "-", "''")
    val cases = (1 to 100).map { _ =>
      val len = rng.nextInt(12)
      (0 until len).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(if (rng.nextBoolean()) " " else "  \t")
    } :+ "" :+ "   " :+ "a"
    for (n <- 1 to 3) {
      val got = cases.toDF("t")
        .select(ngramTopCount(col("t"), n)).as[Long].collect()
      cases.zip(got).foreach { case (s, g) =>
        assert(g === ref(s, n), s"n=$n text=<$s>")
      }
    }
  }

  test("dotD matches the interpreted fold bit-for-bit") {
    val df = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
    val both = df.select(
      dotD(col("v"), col("v")).as("native"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ===
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("native expressions propagate nulls like built-ins") {
    val df = Seq((null.asInstanceOf[String], null.asInstanceOf[Seq[Double]]))
      .toDF("t", "v")
    val shRow = df.select(shingles3(col("t"))).head()
    assert(shRow.isNullAt(0)) // null text → null shingles
    val dotRow = df.select(dotD(col("v"), col("v"))).head()
    assert(dotRow.isNullAt(0)) // null array → null dot
  }

  test("dotD null-propagates on length mismatch, like the HOF form") {
    // zip_with pads the shorter side with null → null element poisons
    // the fold → NULL. dotD must agree exactly, since DotProductRule
    // rewrites user HOF expressions into it session-wide.
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 10.0))).toDF("a", "b")
    assert(df.select(dotD(col("a"), col("b"))).head().isNullAt(0))
  }

  test("h60 parses the first 15 md5 hex chars") {
    val got = Seq("abc").toDF("t").select(h60(col("t"))).head().getLong(0)
    val want = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("abc".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    assert(got === want)
  }

  test("WordShingles fuzz: matches a reference implementation on " +
    "seeded random token streams") {
    val rng = new scala.util.Random(99)
    val vocab = Vector("aa", "b", "ccc", "dd", "e")
    val cases = (1 to 30).map { _ =>
      (0 until rng.nextInt(12)).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
    }
    def reference(s: String, n: Int): Seq[String] = {
      val t = s.split("\\s+").filter(_.nonEmpty)
      if (t.length < n) Seq.empty
      else t.sliding(n).map(_.mkString(" ")).toSeq.distinct
    }
    val got = cases.toDF("t")
      .select(wordShingles(col("t"), 3)).collect().map(_.getSeq[String](0))
    got.zip(cases).foreach { case (g, s) =>
      assert(g === reference(s, 3), s"input: '$s'")
    }
  }

  test("jaccard: identical, disjoint, and partial overlap") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val got = df.select(jaccard(col("x"), col("y"))).as[Double].collect()
    assert(got(0) === 1.0)
    assert(got(1) === 0.0)
    assert(got(2) === 0.5)
  }

  test("BloomMightContain: no false negatives, few false positives, " +
    "codegen filter") {
    import org.apache.spark.sql.graftbridge.Bridge
    val members = (0 until 500).map(i => s"member shingle $i")
    val bloom = members.toDF("sg").stat.bloomFilter("sg", 500L, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    def probed(df: org.apache.spark.sql.DataFrame) =
      df.filter(Bridge.column(
        BloomMightContain(Bridge.expression(col("sg")), bytes)))
    def survivors(rows: Seq[String]): Long = probed(rows.toDF("sg")).count()
    // the probe must sit INSIDE a WholeStageCodegen span (the whole
    // point over a UDF), and with fallback disabled a codegen compile
    // failure turns into a loud error instead of silent interpretation.
    // A Range source (unlike a local Seq) can't be constant-folded by
    // ConvertToLocalRelation, so the filter genuinely executes codegen.
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rangeMembers = probed(spark.range(members.size)
        .select(concat(lit("member shingle "),
          col("id").cast("string")).as("sg")))
      // membership is GUARANTEED for every inserted item — the
      // property the shared q53/q60 oracle rests on (a false negative
      // would drop a genuinely contaminated doc)
      assert(rangeMembers.collect().length === members.size)
      // "*(1) Filter ..." — the asterisk prefix is how toString marks
      // operators living inside a WholeStageCodegen span
      val planStr = rangeMembers.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Filter bloom_might_contain""".r
        .findFirstIn(planStr).isDefined, planStr)
    } finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
    // non-members pass only at ~the configured fpp; allow generous
    // slack (50× the nominal 1%) so the test can never flake
    val strangers = (0 until 1000).map(i => s"unrelated text $i")
    assert(survivors(strangers) <= 500)
    // null stays null → filtered out, matching SQL three-valued logic
    assert(survivors(Seq(null.asInstanceOf[String])) === 0L)
    // STRICT type check: a numeric probe column must be REJECTED at
    // analysis, not implicitly cast — the filter was built from string
    // bytes, and probing a long's decimal-string bytes against a
    // putLong-built filter would return false for every inserted value
    // (false negatives, silently dropped rows)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(5).select(Bridge.column(
        BloomMightContain(Bridge.expression(col("id")), bytes))).collect()
    }
    assert(e.getMessage.contains("STRING probe"))
  }
}
