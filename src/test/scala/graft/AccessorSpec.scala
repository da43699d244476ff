package graft

import org.apache.spark.sql.functions._
import graft.functions.{DtAccessor => D, StrAccessor => S}

/** Literal-frame tests for str/dt accessor methods whose semantics aren't
  * cleanly oracle-able (pattern-format or engine-divergent functions), so
  * the whole accessor surface has correctness cover between these and the
  * op_str_accessor / op_dt_accessor oracle queries.
  */
class AccessorSpec extends SparkSpecBase {
  import spark.implicits._

  test("str case / pad / slice semantics match pandas") {
    val df = Seq("hello world", "ABC", "x").toDF("s")
    val r = df.select(
      S.capitalize($"s").as("cap"), S.title($"s").as("title"),
      S.zfill($"s", 5).as("z"), S.center($"s", 7, "*").as("ctr"),
      S.get($"s", 1).as("g"), S.repeat($"s", 2).as("rep"),
      S.slice($"s", 1, 4).as("sl")).collect()
    assert(r(0).getString(0) == "Hello world")
    assert(r(0).getString(1) == "Hello World")
    assert(r(1).getString(2) == "00ABC")
    assert(r(2).getString(3) == "***x***")
    assert(r(0).getString(4) == "e")
    assert(r(1).getString(5) == "ABCABC")
    assert(r(0).getString(6) == "ell") // pandas s[1:4]
  }

  test("str predicates") {
    val df = Seq(("123", "abc", "a1 ", "low", "UP")).toDF("d", "a", "m", "lo", "up")
    val r = df.select(
      S.isdigit($"d"), S.isalpha($"a"), S.isalnum($"m"),
      S.islower($"lo"), S.isupper($"up"), S.isspace(lit("  "))).collect().head
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5))
  }

  test("str find returns -1 when absent, split quotes regex metachars") {
    val df = Seq("a.b.c").toDF("s")
    val r = df.select(
      S.find($"s", "z").as("nf"), S.find($"s", "b").as("f"),
      S.split($"s", ".").as("sp"), S.join(S.split($"s", "."), "-").as("j"))
      .collect().head
    assert(r.getLong(0) == -1L && r.getLong(1) == 2L)
    assert(r.getAs[scala.collection.Seq[String]]("sp").toSeq == Seq("a", "b", "c"))
    assert(r.getString(3) == "a-b-c")
  }

  test("dt strftime, period, quarter-start, offsets") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-04-01 13:45:30")).toDF("ts")
    val r = df.select(
      D.strftime($"ts", "yyyy/MM/dd HH").as("fmt"),
      D.toPeriodMonth($"ts").cast("string").as("per"),
      D.isQuarterStart($"ts").as("qs"),
      D.addDays(D.date($"ts"), 30).cast("string").as("plus30"),
      D.addMonths(D.date($"ts"), 2).cast("string").as("plusm"),
      D.isLeapYear($"ts").as("leap")).collect().head
    assert(r.getString(0) == "2024/04/01 13")
    assert(r.getString(1) == "2024-04-01")
    assert(r.getBoolean(2))
    assert(r.getString(3) == "2024-05-01")
    assert(r.getString(4) == "2024-06-01")
    assert(r.getBoolean(5))
  }

  test("dt dayofweek uses pandas Monday=0 convention") {
    // 2024-01-01 is a Monday
    val df = Seq(java.sql.Date.valueOf("2024-01-01")).toDF("d")
    assert(df.select(D.dayofweek($"d")).as[Long].collect().head == 0L)
  }
}
