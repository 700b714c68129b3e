package graft.sources.arrow

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ArrowInterchange

/** Property coverage for the zone-map eliminator: `skippable` must be
  * SOUND — whenever it prunes a file, no row of that file can satisfy
  * the pushed conjunction under Spark's comparison semantics. (It need
  * not be complete; keeping a skippable file only costs work.) The
  * property drives random long/double row sets, stamps their true
  * min/max the way StatsTracker does, draws random filters, and
  * cross-checks the skip decision against brute-force row evaluation —
  * including Spark's NaN-above-everything ordering, which is why a
  * NaN-bearing column must stamp nothing. */
class ArrowFileSkipPropSpec extends AnyFunSuite {

  /** scalacheck without the scalatestplus bridge (offline cache): draw N
    * deterministic samples from a Gen and assert each. */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 400)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("d", DoubleType)))

  // row sets drawn from a narrow range so filters land inside, outside,
  // and on the boundaries with similar likelihood
  private val genLongs = Gen.nonEmptyListOf(Gen.chooseNum(-20L, 20L))
  // signed zero appears explicitly: chooseNum never draws -0.0, and the
  // zone-map eliminator must treat ±0.0 equal the way Spark's predicate
  // semantics do (a file whose min/max stamped as one sign must not be
  // pruned for a filter literal of the other)
  private val genDoubles = Gen.nonEmptyListOf(Gen.frequency(
    8 -> Gen.chooseNum(-20.0, 20.0), 1 -> Gen.const(Double.NaN),
    1 -> Gen.oneOf(-0.0d, 0.0d)))

  private val genLongFilter: Gen[Filter] = for {
    v <- Gen.chooseNum(-25L, 25L)
    f <- Gen.oneOf[Filter](EqualTo("l", v), GreaterThan("l", v),
      GreaterThanOrEqual("l", v), LessThan("l", v), LessThanOrEqual("l", v),
      In("l", Array[Any](v, v + 3)))
  } yield f

  private val genDoubleFilter: Gen[Filter] = for {
    v <- Gen.frequency(8 -> Gen.chooseNum(-25.0, 25.0),
      2 -> Gen.oneOf(-0.0d, 0.0d))
    f <- Gen.oneOf[Filter](EqualTo("d", v), GreaterThan("d", v),
      GreaterThanOrEqual("d", v), LessThan("d", v), LessThanOrEqual("d", v),
      In("d", Array[Any](v, v + 1.5)))
  } yield f

  /** The true footer stats the writers would stamp for these rows. */
  private def stamp(ls: List[Long], ds: List[Double]): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    m += (ArrowInterchange.minMetaKey(0) -> ls.min.toString)
    m += (ArrowInterchange.maxMetaKey(0) -> ls.max.toString)
    val finite = ds.filterNot(_.isNaN)
    // any NaN disables the column's stats, exactly like StatsTracker;
    // zero bounds widen to cover both signs, exactly like stamp()
    if (finite.nonEmpty && finite.size == ds.size) {
      val lo = finite.min; val hi = finite.max
      m += (ArrowInterchange.minMetaKey(1) ->
        (if (lo == 0.0d) -0.0d else lo).toString)
      m += (ArrowInterchange.maxMetaKey(1) ->
        (if (hi == 0.0d) 0.0d else hi).toString)
    }
    m.result()
  }

  /** Spark's comparison semantics: NaN orders ABOVE every double and
    * equals itself, and -0.0 == 0.0 (SQLOrderingUtil.compareDoubles
    * short-circuits on primitive ==, unlike raw Double.compare which
    * orders -0.0 < 0.0 — the `+ 0.0` collapses the signs first). */
  private def cmpD(a: Double, b: Double): Int =
    java.lang.Double.compare(a + 0.0d, b + 0.0d)

  private def rowMatches(f: Filter, l: Long, d: Double): Boolean = f match {
    case EqualTo("l", v: Long) => l == v
    case GreaterThan("l", v: Long) => l > v
    case GreaterThanOrEqual("l", v: Long) => l >= v
    case LessThan("l", v: Long) => l < v
    case LessThanOrEqual("l", v: Long) => l <= v
    case In("l", vs) => vs.exists(_ == l)
    case EqualTo("d", v: Double) => cmpD(d, v) == 0
    case GreaterThan("d", v: Double) => cmpD(d, v) > 0
    case GreaterThanOrEqual("d", v: Double) => cmpD(d, v) >= 0
    case LessThan("d", v: Double) => cmpD(d, v) < 0
    case LessThanOrEqual("d", v: Double) => cmpD(d, v) <= 0
    case In("d", vs) => vs.exists(v => cmpD(d, v.asInstanceOf[Double]) == 0)
    case other => fail(s"unexpected filter $other")
  }

  test("skippable is sound: a pruned file can hold no matching row") {
    val gen = for {
      ls <- genLongs
      ds <- genDoubles
      fs <- Gen.nonEmptyListOf(Gen.oneOf(genLongFilter, genDoubleFilter))
        .map(_.take(3))
    } yield (ls, ds, fs)
    var pruned = 0
    forAllSeeded(gen) { case (ls, ds, fs) =>
      val meta = stamp(ls, ds)
      if (ArrowFileSkip.skippable(fs, schema, meta)) {
        pruned += 1
        // conjunction semantics: a row survives only if EVERY filter
        // matches — the file may be pruned only if NO row survives
        val rows = for (l <- ls; d <- ds) yield (l, d)
        val survivor = rows.find { case (l, d) =>
          fs.forall(f => rowMatches(f, l, d))
        }
        assert(survivor.isEmpty,
          s"pruned a file containing matching row $survivor " +
            s"(filters $fs, stats $meta)")
      }
    }
    assert(pruned > 20, s"property exercised only $pruned pruned cases " +
      "— generators drifted, the soundness check isn't biting")
  }

  test("string skippable is sound under truncation: a pruned file can " +
       "hold no matching row") {
    val sSchema = StructType(Seq(StructField("s", StringType)))
    // short keys, shared-prefix families, and >64-byte strings so the
    // truncated lower / truncate-and-increment upper bounds both fire
    val longPrefix = "p" * 70
    val genStr: Gen[String] = Gen.frequency(
      5 -> (for {
        n <- Gen.chooseNum(0, 4)
        cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'z'))
      } yield cs.mkString),
      2 -> Gen.chooseNum(0, 99).map(i => f"$longPrefix$i%02d"),
      1 -> Gen.chooseNum(0, 99).map(i => f"key-$i%02d"))
    val genStrFilter: Gen[Filter] = for {
      v <- genStr
      f <- Gen.oneOf[Filter](EqualTo("s", v), GreaterThan("s", v),
        GreaterThanOrEqual("s", v), LessThan("s", v),
        LessThanOrEqual("s", v), In("s", Array[Any](v, v + "a")),
        StringStartsWith("s", v.take(3)))
    } yield f
    def utf8(s: String) =
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
    def stampS(ss: List[String]): Map[String, String] = {
      // exactly StatsTracker's string stamp: full extrema by bytewise
      // order, truncation only at stamp time, bounds-or-nothing
      val bytes = ss.map(_.getBytes("UTF-8"))
      val lo = bytes.reduce((a, b) =>
        if (ArrowInterchange.cmpBytes(a, b) <= 0) a else b)
      val hi = bytes.reduce((a, b) =>
        if (ArrowInterchange.cmpBytes(a, b) >= 0) a else b)
      ArrowInterchange.truncUpper(hi) match {
        case Some(u) =>
          val b64 = java.util.Base64.getEncoder
          Map(ArrowInterchange.strMinMetaKey(0) ->
            b64.encodeToString(ArrowInterchange.truncLower(lo)),
            ArrowInterchange.strMaxMetaKey(0) -> b64.encodeToString(u))
        case None => Map.empty
      }
    }
    def rowMatchesS(f: Filter, s: String): Boolean = f match {
      case EqualTo("s", v: String) => utf8(s).compareTo(utf8(v)) == 0
      case GreaterThan("s", v: String) => utf8(s).compareTo(utf8(v)) > 0
      case GreaterThanOrEqual("s", v: String) => utf8(s).compareTo(utf8(v)) >= 0
      case LessThan("s", v: String) => utf8(s).compareTo(utf8(v)) < 0
      case LessThanOrEqual("s", v: String) => utf8(s).compareTo(utf8(v)) <= 0
      case In("s", vs) => vs.exists(v =>
        utf8(s).compareTo(utf8(v.asInstanceOf[String])) == 0)
      case StringStartsWith("s", p) => s.startsWith(p)
      case other => fail(s"unexpected filter $other")
    }
    val gen = for {
      ss <- Gen.nonEmptyListOf(genStr)
      fs <- Gen.nonEmptyListOf(genStrFilter).map(_.take(3))
    } yield (ss, fs)
    var pruned = 0
    forAllSeeded(gen) { case (ss, fs) =>
      val meta = stampS(ss)
      if (ArrowFileSkip.skippable(fs, sSchema, meta)) {
        pruned += 1
        val survivor = ss.find(s => fs.forall(f => rowMatchesS(f, s)))
        assert(survivor.isEmpty,
          s"pruned a file containing matching row '$survivor' " +
            s"(filters $fs, rows $ss, stats $meta)")
      }
    }
    assert(pruned > 20, s"property exercised only $pruned pruned cases " +
      "— generators drifted, the soundness check isn't biting")
  }

  test("missing stats and unknown shapes never prune") {
    // no stats at all
    assert(!ArrowFileSkip.skippable(
      Seq(GreaterThan("l", 5L)), schema, Map.empty))
    // untracked column
    assert(!ArrowFileSkip.skippable(
      Seq(EqualTo("s", "x")), schema,
      Map(ArrowInterchange.minMetaKey(0) -> "0",
        ArrowInterchange.maxMetaKey(0) -> "1")))
    // unsupported filter shape referencing a tracked column
    assert(!ArrowFileSkip.skippable(
      Seq(IsNull("l")), schema,
      Map(ArrowInterchange.minMetaKey(0) -> "0",
        ArrowInterchange.maxMetaKey(0) -> "1")))
    // IN with a null element and an in-range element must keep
    assert(!ArrowFileSkip.skippable(
      Seq(In("l", Array[Any](null, 0L))), schema,
      Map(ArrowInterchange.minMetaKey(0) -> "0",
        ArrowInterchange.maxMetaKey(0) -> "1")))
    // corrupted stats text keeps the file
    assert(!ArrowFileSkip.skippable(
      Seq(GreaterThan("l", 5L)), schema,
      Map(ArrowInterchange.minMetaKey(0) -> "garbage",
        ArrowInterchange.maxMetaKey(0) -> "1")))
  }
}
