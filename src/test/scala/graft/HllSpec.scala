package graft

import graft.functions.{Hashing, HllRegsAgg}
import graft.operators.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** HyperLogLog register sketch: register parity against a scalar
  * replay, merge semantics across partitions, and estimate accuracy on
  * known-cardinality inputs.
  */
class HllSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark
  import org.apache.spark.sql.functions._

  private def scalarRegs(hashes: Seq[Long], m: Int): Array[Int] = {
    val regs = new Array[Int](m)
    for (h <- hashes) {
      val b = (h % m).toInt
      val w = h / m
      val rho = if (w == 0L) HllRegsAgg.RhoMax
                else java.lang.Long.numberOfTrailingZeros(w) + 1
      regs(b) = math.max(regs(b), rho)
    }
    regs
  }

  test("registers match a scalar replay, independent of partitioning") {
    import spark.implicits._
    val words = (1 to 5000).map(i => s"tok$i")
    val hashes = words.map(Hashing.md5i)
    val expected = scalarRegs(hashes, 256).map(_.toLong).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = hashes.toDF("hv").repartition(parts)
        .agg(HllRegsAgg.column(col("hv"), 256))
        .as[Seq[Long]].head()
      assert(got == expected, s"register mismatch at $parts partitions")
    }
  }

  test("duplicates do not move registers (cardinality, not frequency)") {
    import spark.implicits._
    val hashes = (1 to 100).map(i => Hashing.md5i(s"w$i"))
    val once = hashes.toDF("hv")
      .agg(HllRegsAgg.column(col("hv"), 256)).as[Seq[Long]].head()
    val tripled = (hashes ++ hashes ++ hashes).toDF("hv")
      .agg(HllRegsAgg.column(col("hv"), 256)).as[Seq[Long]].head()
    assert(once == tripled)
  }

  test("estimate lands within HLL error bounds on known cardinalities") {
    import spark.implicits._
    // 1.04/sqrt(256) = 6.5% standard error; assert 4 sigma
    for (n <- Seq(1000, 20000)) {
      val docs = (1 to n).map(i => (s"v$i", "s")).toDF("text", "source")
      val row = TextOps.vocabHll(docs).collect().head
      val est = row.getAs[Long]("est")
      assert(math.abs(est - n).toDouble / n < 0.26,
        s"estimate $est too far from true $n")
    }
  }

  test("vocabHll output is deterministic and integer-exact") {
    import spark.implicits._
    val docs = Seq(("a b c a", "s1"), ("c d", "s1"), ("x y", "s2"))
      .toDF("text", "source")
    val rows = TextOps.vocabHll(docs).orderBy("source").collect()
    assert(rows.length == 2)
    val s1 = rows(0)
    // s1 has 4 distinct words → 4 nonzero registers (unless bucket collision)
    assert(s1.getAs[Long]("nonzero") >= 3L && s1.getAs[Long]("nonzero") <= 4L)
    // re-run must be bit-identical
    val again = TextOps.vocabHll(docs).orderBy("source").collect()
    assert(rows.toSeq == again.toSeq)
  }
}
