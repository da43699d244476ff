package graft

import org.apache.spark.sql.functions._
import graft.functions.Ufuncs

/** Pins the ufunc semantics the DuckDB oracle cannot reach: IEEE special
  * values (NaN/±inf), round-half-to-even ties, and the numpy edge
  * conventions (sinc(0), copysign, trunc toward zero, logical xor).
  */
class UfuncsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(Tuple1(1)).toDF("i").select(c).collect()(0).get(0)

  test("rint rounds ties half-to-EVEN like numpy, not half-away") {
    val got = Seq(0.5, 1.5, 2.5, 3.5, -0.5, -2.5).toDF("x")
      .select(Ufuncs("rint")($"x").as("r")).as[Double].collect().toList
    assert(got == List(0.0, 2.0, 2.0, 4.0, -0.0, -2.0))
  }

  test("special values: isnan/isinf/isfinite/nan_to_num") {
    val df = Seq(1.5, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity).toDF("x")
    val rows = df.select(
      Ufuncs("isnan")($"x"), Ufuncs("isinf")($"x"), Ufuncs("isfinite")($"x"),
      Ufuncs("nan_to_num")($"x"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
        r.getDouble(3)))
    assert(rows(0) === ((false, false, true, 1.5)))
    assert(rows(1)._1 && !rows(1)._2 && !rows(1)._3 && rows(1)._4 === 0.0)
    assert(!rows(2)._1 && rows(2)._2 && !rows(2)._3 &&
      rows(2)._4 === Double.MaxValue)
    assert(rows(3)._2 && rows(3)._4 === Double.MinValue)
  }

  test("numpy edge conventions: sinc(0), copysign, trunc, fix, signbit, square") {
    assert(one(Ufuncs("sinc")(lit(0.0))) == 1.0)
    assert(one(Ufuncs("copysign", lit(3.0), lit(-0.25))) == -3.0)
    assert(one(Ufuncs("copysign", lit(-3.0), lit(2.0))) == 3.0)
    assert(one(Ufuncs("trunc")(lit(-2.7))) == -2.0, "toward zero, not floor")
    assert(one(Ufuncs("fix")(lit(2.7))) == 2.0)
    assert(one(Ufuncs("signbit")(lit(-0.1))) == true)
    assert(one(Ufuncs("square")(lit(-4.0))) == 16.0)
    assert(one(Ufuncs("reciprocal")(lit(4.0))) == 0.25)
  }

  test("nan* reductions skip NaN; all-NaN groups return null") {
    import graft.functions.aggregates._
    val df = Seq(("a", 1.0), ("a", Double.NaN), ("a", 3.0),
      ("b", Double.NaN)).toDF("k", "x")
    val r = df.groupBy("k").agg(
      nanSum($"x").as("s"), nanCount($"x").as("n"),
      nanMax($"x").as("mx"), nanMin($"x").as("mn"),
      nanProd($"x").as("p"))
      .orderBy("k").collect()
    assert(r(0).getDouble(1) === 4.0 && r(0).getLong(2) === 2L)
    assert(r(0).getDouble(3) === 3.0 && r(0).getDouble(4) === 1.0)
    assert(r(0).getDouble(5) === 3.0, "nanprod skips the NaN")
    assert(r(1).isNullAt(1) && r(1).getLong(2) === 0L,
      "all-NaN group: null sum, zero count (numpy nansum of empty is 0; " +
        "the SQL-missing convention surfaces null — callers coalesce)")
    // nanargmax/min ignore NaN slots but index the ORIGINAL positions
    import graft.functions.VectorFunctions._
    val arr = Seq(
      Tuple1(Seq(Double.NaN, 5.0, 2.0)),
      Tuple1(Seq(Double.NaN, Double.NaN, Double.NaN))).toDF("a")
    val got = arr.select(nanArgmax($"a").as("x"), nanArgmin($"a").as("n"))
      .collect()
    assert(got(0).getLong(0) === 1L && got(0).getLong(1) === 2L)
    assert(got(1).isNullAt(0) && got(1).isNullAt(1), "all-NaN row → null")
  }

  test("logaddexp is a stable log-sum-exp; hypot matches the closed form") {
    val g = one(Ufuncs("logaddexp", lit(700.0), lit(700.0))).asInstanceOf[Double]
    assert(math.abs(g - (700.0 + math.log(2.0))) < 1e-12,
      "naive log(e^700+e^700) overflows; the stable form must not")
    val h = one(Ufuncs("hypot", lit(3.0), lit(4.0))).asInstanceOf[Double]
    assert(h === 5.0)
    assert(one(Ufuncs("logical_xor", lit(true), lit(false))) == true)
    assert(one(Ufuncs("logical_xor", lit(true), lit(true))) == false)
    assert(one(Ufuncs("isclose", lit(1.0), lit(1.0 + 1e-9))) == true)
    assert(one(Ufuncs("isclose", lit(1.0), lit(1.1))) == false)
    assert(one(Ufuncs("fmod", lit(-7.0), lit(3.0))) == -1.0,
      "C fmod keeps the dividend's sign")
    assert(one(Ufuncs("lshift", lit(5L), lit(3))) == 40L)
    assert(one(Ufuncs("rshift", lit(40L), lit(2))) == 10L)
    assert(one(Ufuncs("maximum", lit(2.0), lit(7.0))) == 7.0)
    assert(one(Ufuncs("fmin", lit(2.0), lit(7.0))) == 2.0)
  }
}
