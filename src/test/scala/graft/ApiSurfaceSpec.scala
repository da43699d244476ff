package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.api.GraftFrame

/** Remaining fluent-surface methods not exercised by oracle queries or the
  * main ApiSpec: multi-frame concat, prefix/suffix renames, explode,
  * dropna modes, duplicated flags, value counts, nunique, head/tail edges,
  * reindex without fill.
  */
class ApiSurfaceSpec extends SparkSpecBase {
  import spark.implicits._

  test("recommendedClusterConf carries the scale-critical keys") {
    val conf = graft.api.GraftSession.recommendedClusterConf
    Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.files.maxPartitionBytes",
      "spark.sql.extensions").foreach(k =>
      assert(conf.contains(k), s"missing $k"))
    assert(conf("spark.sql.shuffle.partitions").toInt >= 1000,
      "cluster default must target ~2-3 tasks/core at 1000 executors")
    // builder applies every key without throwing
    graft.api.GraftSession.clusterBuilder()
  }

  test("concatRows unions several frames with outer columns") {
    val a = GraftFrame(Seq((1L, "a")).toDF("k", "s"))
    val b = GraftFrame(Seq((2L, "b")).toDF("k", "s"))
    val c = GraftFrame(Seq((3L, 9.0)).toDF("k", "x"))
    val u = a.concatRows(b, c)
    assert(u.df.count() == 3 && u.columns.toSet == Set("k", "s", "x"))
  }

  test("addPrefix / addSuffix rename every column") {
    val f = GraftFrame(Seq((1L, 2L)).toDF("a", "b"))
    assert(f.addPrefix("p_").columns == Seq("p_a", "p_b"))
    assert(f.addSuffix("_s").columns == Seq("a_s", "b_s"))
  }

  test("rename chains multiple mappings") {
    val f = GraftFrame(Seq((1L, 2L)).toDF("a", "b")).rename("a" -> "x", "b" -> "y")
    assert(f.columns == Seq("x", "y"))
  }

  test("explodeCol emits one row per array element") {
    val f = GraftFrame(Seq((1L, Seq("u", "v"))).toDF("k", "arr"))
      .explodeCol("arr", "item")
    assert(f.df.select("item").as[String].collect().sorted.toSeq == Seq("u", "v"))
  }

  test("dropna honors how=any/all and subset") {
    val df = Seq(
      (Some(1.0), Some(2.0)), (None, Some(3.0)), (None, None)
    ).toDF("a", "b")
    assert(GraftFrame(df).dropna("any").df.count() == 1)
    assert(GraftFrame(df).dropna("all").df.count() == 2)
    assert(GraftFrame(df).dropna("any", Seq("b")).df.count() == 2)
  }

  test("duplicated flags rows beyond the first per key") {
    val f = GraftFrame(Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("k", "o"))
      .duplicated(Seq("k"), "o")
    val flags = f.df.orderBy("k", "o").select("duplicated").as[Boolean].collect().toSeq
    assert(flags == Seq(false, true, false))
  }

  test("valueCounts orders by count desc then value") {
    val f = GraftFrame(Seq("b", "a", "b", "c", "b", "a").toDF("v")).valueCounts("v")
    val got = f.df.as[(String, Long)].collect().toSeq
    assert(got == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }

  test("nunique across several columns") {
    val f = GraftFrame(Seq((1L, "x"), (2L, "x"), (2L, "y")).toDF("k", "s"))
      .nunique(Seq("k", "s"))
    assert(f.df.collect().head == Row(2L, 2L))
  }

  test("head and tail at the frame boundaries") {
    val f = GraftFrame((1L to 5L).toDF("v"))
    assert(f.head(10).df.count() == 5)
    assert(f.tail(2, Seq("v")).df.as[Long].collect().toSeq == Seq(4L, 5L))
  }

  test("reindex without fill leaves missing rows null") {
    val data = GraftFrame(Seq((1L, 1.5)).toDF("k", "v"))
    val keys = GraftFrame(Seq(1L, 2L).toDF("k"))
    val r = data.reindex(keys, Seq("k")).sortValues(Seq("k")).df.collect()
    assert(r(0) == Row(1L, 1.5) && r(1).isNullAt(1))
  }

  test("eval supports arbitrary SQL expression chains") {
    val f = GraftFrame(Seq((2L, 3L)).toDF("a", "b"))
      .eval("c", "a * b + 1")
      .eval("d", "CASE WHEN c > 5 THEN 'big' ELSE 'small' END")
    assert(f.df.select("c", "d").collect().head == Row(7L, "big"))
  }
}
