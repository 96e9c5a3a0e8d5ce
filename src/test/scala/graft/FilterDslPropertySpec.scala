package graft

import graft.filters.FilterDsl
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based check: FilterDsl compiled through Catalyst must agree
  * with a direct in-memory evaluation of the reference semantics (AND of
  * predicates, inclusive ranges, null-fails, case-insensitive substring,
  * cast-failure → match nothing) on randomly generated specs and data.
  * Generators are driven with fixed seeds (deterministic CI).
  */
case class Row0(id: Long, s: Option[String], d: Option[Double], i: Option[Long])

class FilterDslPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val genRow: Gen[Row0] = for {
    id <- Gen.choose(0L, 1L << 40)
    s <- Gen.option(Gen.oneOf("FL", "TN", "fl", "CA", "x", ""))
    d <- Gen.option(Gen.chooseNum(-10.0, 10.0))
    i <- Gen.option(Gen.chooseNum(-100L, 100L))
  } yield Row0(id, s, d, i)

  sealed trait P { def json: String; def eval(r: Row0): Boolean }
  private def cmp[A](v: Option[A], f: A => Boolean): Boolean = v.exists(f)

  private case class SEq(v: String) extends P {
    def json = s""""s":{"eq":${q(v)}}"""
    def eval(r: Row0) = cmp[String](r.s, _ == v)
  }
  private case class SNe(v: String) extends P {
    def json = s""""s":{"ne":${q(v)}}"""
    def eval(r: Row0) = cmp[String](r.s, _ != v)
  }
  private case class SLike(v: String) extends P {
    def json = s""""s":{"like":${q(v)}}"""
    def eval(r: Row0) = cmp[String](r.s, _.toLowerCase.contains(v.toLowerCase))
  }
  private case class SIn(vs: Seq[String]) extends P {
    def json = s""""s":{"in":[${vs.map(q).mkString(",")}]}"""
    def eval(r: Row0) = cmp[String](r.s, vs.contains)
  }
  private case class DGe(v: Double) extends P {
    def json = s""""d":{"ge":$v}"""
    def eval(r: Row0) = cmp[Double](r.d, _ >= v)
  }
  private case class DLt(v: Double) extends P {
    def json = s""""d":{"lt":$v}"""
    def eval(r: Row0) = cmp[Double](r.d, _ < v)
  }
  private case class IBetween(lo: Long, hi: Long) extends P {
    def json = s""""i":{"between":[$lo,$hi]}"""
    def eval(r: Row0) = cmp[Long](r.i, x => x >= lo && x <= hi)
  }
  private case class IGt(v: Long) extends P {
    def json = s""""i":{"gt":$v}"""
    def eval(r: Row0) = cmp[Long](r.i, _ > v)
  }
  private case class IEqBadCast() extends P {
    def json = s""""i":{"eq":"notanint"}"""
    def eval(r: Row0) = false // cast failure matches nothing
  }

  private def q(s: String) = "\"" + s + "\""

  private val genPred: Gen[P] = Gen.oneOf(
    Gen.oneOf("FL", "TN", "zz", "").map(SEq.apply),
    Gen.oneOf("FL", "x").map(SNe.apply),
    Gen.oneOf("f", "L", "xyz").map(SLike.apply),
    Gen.someOf(Seq("FL", "TN", "CA")).map(vs => SIn(vs.toSeq)),
    Gen.chooseNum(-5.0, 5.0).map(DGe.apply),
    Gen.chooseNum(-5.0, 5.0).map(DLt.apply),
    for { a <- Gen.chooseNum(-50L, 50L); b <- Gen.chooseNum(-50L, 50L) }
      yield IBetween(math.min(a, b), math.max(a, b)),
    Gen.chooseNum(-50L, 50L).map(IGt.apply),
    Gen.const(IEqBadCast()))

  // one predicate per column max (the DSL maps column -> ops object)
  private val genSpec: Gen[Seq[P]] =
    Gen.listOf(genPred).map(_.groupBy(_.json.takeWhile(_ != ':')).values.map(_.head).toSeq)

  test("compiled Catalyst predicate == in-memory reference semantics (40 random specs)") {
    (1 to 40).foreach { i =>
      val rows = sample(Gen.listOfN(40, genRow), 1000L + i)
      val preds = sample(genSpec, 2000L + i)
      val json = preds.map(_.json).mkString("{", ",", "}")
      val df = rows.toDF()
      val got = FilterDsl.applyJson(df, json).select("id").as[Long].collect().sorted.toSeq
      val want = rows.filter(r => preds.forall(_.eval(r))).map(_.id).sorted
      assert(got == want, s"iter=$i spec=$json")
    }
  }

  test("selectivity equals passing fraction (15 random specs)") {
    (1 to 15).foreach { i =>
      val rows = sample(Gen.listOfN(30, genRow), 3000L + i)
      val preds = sample(genSpec, 4000L + i)
      val json = preds.map(_.json).mkString("{", ",", "}")
      val df = rows.toDF()
      val got = FilterDsl.selectivity(df, FilterDsl.parseJson(json)).as[Double].head()
      val frac = rows.count(r => preds.forall(_.eval(r))).toDouble / rows.size
      assert(math.abs(got - frac) < 1e-6, s"iter=$i spec=$json got=$got want=$frac")
    }
  }
}
