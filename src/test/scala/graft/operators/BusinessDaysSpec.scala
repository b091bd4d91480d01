package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Specs for the closed-form weekday-prefix function behind
  * x_business_days: the formula is proven against java.time day by
  * day over several years (including leap years), then the rollup is
  * replayed sequentially.
  */
class BusinessDaysSpec extends SparkSpec {

  private def wPrefix(e: Long): Long =
    5L * ((e + 3) / 7) + math.min((e + 3) % 7 + 1, 5L)

  test("W(e): the closed form counts weekdays exactly up to the " +
    "week-origin constant (which cancels in every difference), " +
    "every day of 1970-1999 (epoch alignment + leap years)") {
    val end = java.time.LocalDate.of(1999, 12, 31).toEpochDay
    var walking = 0L
    // ground truth: a literal day walk from the epoch. W counts from
    // the MONDAY of the epoch week (3 weekdays before 1970-01-01,
    // a Thursday), so the closed form sits exactly +3 above the
    // walk — a constant that cancels in bd = W(b) − W(a).
    (0L to end).foreach { e =>
      val dow = java.time.LocalDate.ofEpochDay(e).getDayOfWeek
      if (dow.getValue <= 5) walking += 1
      assert(wPrefix(e) == walking + 3, s"epoch day $e ($dow)")
    }
    // difference form: a known week (1998-06-01 is a Monday)
    val mon = java.time.LocalDate.of(1998, 6, 1).toEpochDay
    assert(wPrefix(mon + 4) - wPrefix(mon - 1) == 5) // Mon..Fri
    assert(wPrefix(mon + 6) - wPrefix(mon - 1) == 5) // Mon..Sun
  }

  test("businessDays: the per-priority rollup replays sequentially; " +
    "weekend compression is visible") {
    val out = ScalarSuite.businessDays(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    def eday(x: Any): Long = (x match {
      case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
      case t: java.time.LocalDateTime => t.toLocalDate
    }).toEpochDay
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority").collect()
      .map(r => r.getLong(0) -> ((eday(r.get(1)), r.getString(2))))
      .toMap
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate").collect()
      .map { r =>
        val (ea, pri) = orders(r.getLong(0))
        (pri, eday(r.get(1)) - ea,
          wPrefix(eday(r.get(1))) - wPrefix(ea))
      }
    val byPri = rows.groupBy(_._1)
    assert(out.length == byPri.size)
    out.foreach { case (pri, n, nSla, ppm, bdSum, bdMin, bdMax) =>
      val bds = byPri(pri).map(_._3)
      assert(n == bds.length)
      assert(nSla == bds.count(bd => bd >= 0 && bd <= 5))
      assert(ppm == nSla * 1000000L / n)
      assert((bdSum, bdMin, bdMax) == (bds.sum, bds.min, bds.max))
    }
    // weekend compression: business days never exceed calendar days
    // and are strictly fewer on some weekend-spanning line
    rows.foreach { case (_, cal, bd) =>
      assert(math.abs(bd) <= math.abs(cal) + 1)
    }
    assert(rows.exists { case (_, cal, bd) =>
      cal > 0 && bd < cal
    }, "no weekend-spanning shipment — formula vacuous")
  }
}
