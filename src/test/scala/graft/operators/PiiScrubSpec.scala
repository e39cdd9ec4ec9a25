package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q85 PII scrubbing: the redaction invariants the DuckDB oracle
  * hash-checks, pinned in-suite so a pattern or replacement-order
  * change fails here before the gate. */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  test("q85: every augmented doc detects exactly one of each PII " +
    "class, the scrub leaves ZERO residual matches, and redaction " +
    "tokens land in the text") {
    val out = TextAnalysis.q85PiiScrub(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_email") === 1,
        s"doc ${r.getLong(0)}: expected exactly the 1 injected email")
      assert(r.getAs[Int]("n_phone") === 1)
      assert(r.getAs[Int]("n_ip") === 1)
      assert(r.getAs[Int]("n_residual") === 0,
        s"doc ${r.getLong(0)}: scrub left a PII match behind")
    }
    // md5 is over text that actually carries the redaction tokens —
    // recompute one doc's scrub independently of the query's plan
    val doc = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") === 3L).select("text").as[String].head()
    val aug = doc + " Contact user3@example.com or +1-555-0003 " +
      "from 10.3.0.4"
    val scrubbed = aug
      .replaceAll(TextAnalysis.piiEmailPat, "<EMAIL>")
      .replaceAll(TextAnalysis.piiPhonePat, "<PHONE>")
      .replaceAll(TextAnalysis.piiIpPat, "<IP>")
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>")
      && scrubbed.contains("<IP>"))
    val got = rows.find(_.getLong(0) == 3L).get.getAs[String]("scrub_md5")
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest(scrubbed.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got === exp,
      "q85's scrub_md5 diverged from an independent JVM-side scrub")
  }
}
