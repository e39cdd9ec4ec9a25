package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Property-style checks of the upsert algebra (SURVEY.md §5): seeded
  * random frames, exhaustive assertions per case. */
class UpsertPropsSpec extends SparkSpec {

  import spark.implicits._

  private val rng = new Random(1234)

  private def randFrame(keys: Seq[Int], withNulls: Boolean) = {
    val rows = keys.map { k =>
      val v = if (withNulls && rng.nextInt(4) == 0) null
        else s"v${rng.nextInt(100)}"
      (k, v, rng.nextInt(1000))
    }
    rows.toDF("id", "s", "n")
  }

  test("idempotence: upsert(x, x) == x") {
    (1 to 5).foreach { _ =>
      val keys = rng.shuffle((0 until 50).toList).take(20)
      val x = randFrame(keys, withNulls = false)
      val got = Upsert.upsert(x, x, Seq("id"))
        .as[(Int, String, Int)].collect().sortBy(_._1)
      assert(got.toSeq === x.as[(Int, String, Int)].collect().sortBy(_._1).toSeq)
    }
  }

  test("key union: result keys == keys(new) ∪ keys(old)") {
    (1 to 5).foreach { _ =>
      val oldK = rng.shuffle((0 until 60).toList).take(25)
      val newK = rng.shuffle((0 until 60).toList).take(25)
      val old = randFrame(oldK, withNulls = false)
      val neu = randFrame(newK, withNulls = rng.nextBoolean())
      val got = Upsert.upsert(neu, old, Seq("id"))
        .select("id").as[Int].collect().toSet
      assert(got === (oldK.toSet ++ newK.toSet))
    }
  }

  test("last-writer-wins: for keys in new (no missing), new row survives") {
    (1 to 5).foreach { _ =>
      val oldK = rng.shuffle((0 until 40).toList).take(20)
      val newK = rng.shuffle((0 until 40).toList).take(20)
      val old = randFrame(oldK, withNulls = false)
      val neu = randFrame(newK, withNulls = false)
      val newRows = neu.as[(Int, String, Int)].collect().map(r => r._1 -> r).toMap
      val got = Upsert.upsert(neu, old, Seq("id"))
        .as[(Int, String, Int)].collect()
      got.filter(r => newRows.contains(r._1)).foreach { r =>
        assert(r === newRows(r._1))
      }
    }
  }

  test("row count == distinct key count (keys unique in both inputs)") {
    (1 to 5).foreach { _ =>
      val oldK = rng.shuffle((0 until 80).toList).take(30)
      val newK = rng.shuffle((0 until 80).toList).take(30)
      val old = randFrame(oldK, withNulls = false)
      val neu = randFrame(newK, withNulls = rng.nextBoolean())
      assert(Upsert.upsert(neu, old, Seq("id")).count() ===
        (oldK.toSet ++ newK.toSet).size.toLong)
    }
  }

  test("branch boundary: combineFirst == rowReplace iff new has no missing") {
    val old = Seq((1, "a", 1), (2, "b", 2)).toDF("id", "s", "n")
    val clean = Seq((1, "x", 9), (3, "c", 3)).toDF("id", "s", "n")
    val dirty = Seq((1, null.asInstanceOf[String], 9), (3, "c", 3))
      .toDF("id", "s", "n")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, String, Int)].collect().sortBy(_._1).toSeq
    assert(norm(Upsert.combineFirst(clean, old, Seq("id"))) ===
      norm(Upsert.rowReplace(clean, old, Seq("id"))))
    assert(norm(Upsert.combineFirst(dirty, old, Seq("id"))) !==
      norm(Upsert.rowReplace(dirty, old, Seq("id"))))
  }
}
