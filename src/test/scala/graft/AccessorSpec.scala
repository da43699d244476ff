package graft

import org.apache.spark.sql.functions._
import graft.functions.{DtAccessor => D, StrAccessor => S}
import graft.api.GraftFrame

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

  test("dt ceil/round respect exact boundaries and midpoints") {
    val on = java.sql.Timestamp.valueOf("2024-03-05 13:00:00")
    val just = java.sql.Timestamp.valueOf("2024-03-05 13:00:00.000001")
    val mid = java.sql.Timestamp.valueOf("2024-03-05 13:30:00")
    val r = Seq((on, just, mid)).toDF("on", "just", "mid").select(
      D.ceilTo($"on", "hour").cast("string").as("c_on"),
      D.ceilTo($"just", "hour").cast("string").as("c_just"),
      D.roundTo($"mid", "hour").cast("string").as("r_mid"),
      D.roundTo($"on", "hour").cast("string").as("r_on")).collect().head
    assert(r.getString(0) == "2024-03-05 13:00:00") // on-boundary stays
    assert(r.getString(1) == "2024-03-05 14:00:00") // 1µs past → next hour
    assert(r.getString(2) == "2024-03-05 14:00:00") // midpoint rounds up
    assert(r.getString(3) == "2024-03-05 13:00:00")
  }

  test("str partition/rpartition match python semantics incl. absent sep") {
    val df = Seq("a-b-c", "nosep").toDF("s")
    val rows = df.select(
        S.partition($"s", "-").as("p"), S.rpartition($"s", "-").as("rp"))
      .collect()
    val p0 = rows(0).getStruct(0); val rp0 = rows(0).getStruct(1)
    assert((p0.getString(0), p0.getString(1), p0.getString(2)) == ("a", "-", "b-c"))
    assert((rp0.getString(0), rp0.getString(1), rp0.getString(2)) == ("a-b", "-", "c"))
    // python: 'nosep'.partition('-') == ('nosep','',''), rpartition == ('','','nosep')
    val p1 = rows(1).getStruct(0); val rp1 = rows(1).getStruct(1)
    assert((p1.getString(0), p1.getString(1), p1.getString(2)) == ("nosep", "", ""))
    assert((rp1.getString(0), rp1.getString(1), rp1.getString(2)) == ("", "", "nosep"))
  }

  test("str tail: slice_replace, swapcase, dummies, encode roundtrip, remove*") {
    val df = Seq("Hello World").toDF("s")
    val r = df.select(
      S.sliceReplace($"s", 0, 5, "Howdy").as("sr"),
      S.swapcase($"s").as("sw"),
      S.decodeCharset(S.encodeCharset($"s")).as("rt"),
      S.removeprefix($"s", "Hello ").as("np"),
      S.removesuffix($"s", " World").as("ns"),
      S.removeprefix($"s", "XYZ").as("np2")).collect().head
    assert(r.getString(0) == "Howdy World")
    assert(r.getString(1) == "hELLO wORLD")
    assert(r.getString(2) == "Hello World")
    assert(r.getString(3) == "World")
    assert(r.getString(4) == "Hello")
    assert(r.getString(5) == "Hello World")
    val dm = Seq("a|b", "b|c", "a").toDF("tags")
      .select(S.getDummies($"tags", "|", Seq("a", "b", "c")): _*)
      .as[(Long, Long, Long)].collect().toSeq
    assert(dm == Seq((1L, 1L, 0L), (0L, 1L, 1L), (1L, 0L, 0L)))
  }

  test("str last mile: extractall, rsplit maxsplit, rfind, index raise, normalize") {
    val df = Seq("a-b-c-d").toDF("s")
    val r = df.select(
      S.extractall($"s", "[a-z]", 0).as("ea"),
      S.rsplit($"s", "-", 1).as("rs1"),
      S.rsplit($"s", "-", 2).as("rs2"),
      S.rsplit($"s", "-").as("rsAll"),
      S.rsplit($"s", "x", 1).as("rsAbsent"),
      S.rfind($"s", "b").as("rfB"),
      S.rfind($"s", "z").as("rfZ"),
      S.indexOf($"s", "c").as("idxC"),
      S.rindexOf($"s", "-").as("ridx")).collect().head
    assert(r.getSeq[String](0) == Seq("a", "b", "c", "d"))
    assert(r.getSeq[String](1) == Seq("a-b-c", "d")) // python 'a-b-c-d'.rsplit('-',1)
    assert(r.getSeq[String](2) == Seq("a-b", "c", "d"))
    assert(r.getSeq[String](3) == Seq("a", "b", "c", "d"))
    assert(r.getSeq[String](4) == Seq("a-b-c-d"))
    assert(r.getLong(5) == 2L)
    assert(r.getLong(6) == -1L)
    assert(r.getLong(7) == 4L)
    assert(r.getLong(8) == 5L)
    // pandas str.index raises on absence; ours surfaces a Spark error
    intercept[Exception] {
      df.select(S.indexOf($"s", "zz")).collect()
    }
    // NFC recomposes e + U+0301 to é; NFD decomposes it back; NFKC folds
    // compatibility forms (ﬁ ligature → fi)
    val n = Seq("café ﬁn").toDF("s").select(
      S.normalizeUnicode($"s", "NFC").as("nfc"),
      S.normalizeUnicode(S.normalizeUnicode($"s", "NFC"), "NFD").as("nfd"),
      S.normalizeUnicode($"s", "NFKC").as("nfkc")).collect().head
    assert(n.getString(0) == "café ﬁn")
    assert(n.getString(1) == "café ﬁn")
    assert(n.getString(2) == "café fin")
  }

  test("frame mad and groupby mad match hand computation") {
    val df = Seq((1L, 2.0), (1L, 4.0), (1L, 9.0), (2L, 10.0), (2L, 20.0))
      .toDF("k", "v")
    // global mean 9, |dev| = 7,5,0,1,11 → mad = 24/5
    val global = GraftFrame(df).mad(Seq("v")).df.as[Double].collect().head
    assert(math.abs(global - 4.8) < 1e-12)
    // k=1: mean 5, mad = (3+1+4)/3; k=2: mean 15, mad = 5
    val grouped = GraftFrame(df).groupby("k").mad("v", "m")
      .sortValues(Seq("k")).df.as[(Long, Double)].collect().toSeq
    assert(math.abs(grouped(0)._2 - 8.0 / 3) < 1e-12)
    assert(math.abs(grouped(1)._2 - 5.0) < 1e-12)
  }

  test("redactPii scrubs emails, IPs, and phone runs; counts match") {
    import graft.functions.TextFunctions
    val df = Seq((1L,
      "mail a.b+c@x-corp.io or d@e.org, host 192.168.0.1, call +44 20 7946 0958 end"))
      .toDF("id", "t")
    val red = df.select(TextFunctions.redactPii($"t")).as[String].collect().head
    assert(red == "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE> end")
    val counts = TextFunctions.piiCounts($"t")
    val got = df.select(counts.map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((2L, 1L, 1L)))
  }

  test("digitize returns numpy-style right-open bin indices") {
    val df = Seq(0.0, 5.0, 14.9, 15.0, 44.9, 45.0, 99.0).map(Tuple1(_)).toDF("v")
    val got = graft.api.GraftFrame(df)
      .digitize("v", "bin", Seq(5.0, 15.0, 30.0, 45.0))
      .df.select($"bin").as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 1L, 2L, 3L, 4L, 4L))
  }
}
