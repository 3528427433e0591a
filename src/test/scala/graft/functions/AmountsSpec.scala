package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the u128/fee arithmetic invariants mined from the
  * reference's data migrations (FIXTURES §5; donations/migrations/0012).
  * ScalaCheck generators sampled with fixed seeds (the scalatest bridge
  * artifact isn't in the offline cache). */
class AmountsSpec extends SparkSpec {
  import spark.implicits._

  /** Amounts within DecimalType(38,0) range (see Amounts.U128 scaladoc:
    * full u128 needs 39 digits; practical yoctoNEAR amounts don't). */
  private val u128Gen: Gen[BigInt] =
    Gen.chooseNum(0L, Long.MaxValue).flatMap(a =>
      Gen.chooseNum(0L, 1000000000L).map(b => BigInt(a) * BigInt(b)))

  private def samples(g: Gen[BigInt], n: Int): Seq[BigInt] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("u128 strings round-trip through DecimalType(38,0) exactly; 39-digit overflow -> null") {
    val ns = samples(u128Gen, 40) :+ (BigInt(10).pow(38) - 1)
    val df = ns.map(_.toString).toDF("amount")
      .select(col("amount"), Amounts.u128(col("amount")).cast("string").as("rt"))
    assert(df.filter(col("amount") =!= col("rt")).count() == 0)
    // full u128 max exceeds 38 digits: degrades to null, never crashes
    val over = Seq((BigInt(2).pow(128) - 1).toString).toDF("amount")
      .select(Amounts.u128(col("amount"))).head()
    assert(over.isNullAt(0))
  }

  test("net = total - protocol - referrer - chef; null fees are zero; net <= total") {
    val cases = samples(u128Gen, 40).grouped(2).collect {
      case Seq(f1, f2) => (f1 + f2 + f1, f1, f2) // total >= fees
    }.toSeq
    val rows = cases.map { case (t, f1, f2) => (t.toString, f1.toString, f2.toString) }
      .toDF("total", "protocol", "referrer")
      .select(col("total"), Amounts.netAmount(col("total"), col("protocol"),
        col("referrer"), lit(null)).cast("string").as("net"),
        col("protocol"), col("referrer"))
      .collect()
    rows.foreach { r =>
      val (t, net, f1, f2) =
        (BigInt(r.getString(0)), BigInt(r.getString(1)),
          BigInt(r.getString(2)), BigInt(r.getString(3)))
      assert(net == t - f1 - f2)
      assert(net <= t)
    }
  }

  test("scaleByDecimals: amount / 10^decimals (F1)") {
    val out = Seq(("2500000000000000000000000", 24))
      .toDF("amount", "decimals")
      .select(Amounts.scaleByDecimals(col("amount"), col("decimals")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(out - 2.5) < 1e-12)
  }

  test("digit guard rejects non-numeric strings (F6)") {
    val rows = Seq("123", "12a", "", "999999999999999999999")
      .toDF("s").select(Amounts.digitGuardedLong(col("s"))).collect()
    assert(rows(0).getLong(0) == 123L)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
    assert(rows(3).isNullAt(0)) // overflows long -> null, not garbage
  }

  test("slugify and date key (F9/F5)") {
    val r = Seq((" NEAR  Protocol! ", java.sql.Timestamp.valueOf("2024-06-10 12:00:00")))
      .toDF("name", "ts")
      .select(Amounts.slugify(col("name")), Amounts.dateKey(col("ts"))).head()
    assert(r.getString(0) == "-near-protocol-")
    assert(r.getString(1) == "10-06-2024")
  }
}
