package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property law for [[PartPruning.matchesAll]] — the multi-axis
  * decision the composite-partition pruning, metadata DELETE, and
  * overwrite scoping all lean on: for ANY per-axis bindings (decided,
  * undecidable, or null-partition) and ANY leaf filters,
  *
  *  1. a single-column leaf decides under `matchesAll` exactly as the
  *     single-axis [[PartPruning.matches]] wrapper on its own axis;
  *  2. a conjunction decides as the THREE-VALUED AND of its leaves
  *     (definite false short-circuits; any unknown degrades to
  *     unknown = keep).
  */
class PartPruningPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 60)(body: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(n).foreach { seed =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
    }
  }

  private val axes = Seq(("a", LongType: DataType),
    ("b", StringType: DataType), ("c", DateType: DataType))

  private def canonGen(dt: DataType): Gen[Any] = dt match {
    case LongType => Gen.chooseNum(-5L, 5L).map(v => v: Any)
    case StringType => Gen.oneOf("x", "y", "zz").map(v => v: Any)
    case _ => Gen.chooseNum(0L, 10L).map(v => v: Any) // DateType epochDay
  }

  private val bindingGen: Gen[Seq[(String, DataType, Option[Option[Any]])]] =
    Gen.sequence[Seq[(String, DataType, Option[Option[Any]])],
      (String, DataType, Option[Option[Any]])](axes.map { case (c, dt) =>
      Gen.choose(0, 2).flatMap {
        case 0 => Gen.const((c, dt, None: Option[Option[Any]]))
        case 1 => Gen.const((c, dt, Some(None): Option[Option[Any]]))
        case _ => canonGen(dt).map(v =>
          (c, dt, Some(Some(v)): Option[Option[Any]]))
      }
    })

  private def litGen(dt: DataType): Gen[Any] = dt match {
    case LongType => Gen.chooseNum(-5L, 5L).map(_.asInstanceOf[Any])
    case StringType => Gen.oneOf("x", "y", "zz").map(_.asInstanceOf[Any])
    case _ => Gen.chooseNum(0L, 10L)
      .map(d => java.time.LocalDate.ofEpochDay(d).asInstanceOf[Any])
  }

  private def leafGen(c: String, dt: DataType): Gen[Filter] =
    litGen(dt).flatMap(v => Gen.oneOf(
      EqualTo(c, v), GreaterThan(c, v), LessThanOrEqual(c, v),
      IsNull(c), IsNotNull(c), In(c, Array(v))))

  private val filtersGen: Gen[Seq[Filter]] =
    Gen.listOfN(3, Gen.oneOf(axes).flatMap { case (c, dt) =>
      leafGen(c, dt) })

  test("matchesAll == per-axis matches on leaves; three-valued AND on conjunctions") {
    forAll(Gen.zip(bindingGen, filtersGen)) { case (bindings, filters) =>
      filters.foreach { f =>
        val c = f.references.head
        val all = PartPruning.matchesAll(bindings, f)
        val own = bindings.find(_._1 == c).flatMap {
          case (_, dt, Some(part)) => PartPruning.matches(part, c, dt, f)
          case _ => None
        }
        assert(all === own, s"leaf $f under $bindings")
      }
      val conj = filters.reduceLeft[Filter](And(_, _))
      val leaves = filters.map(PartPruning.matchesAll(bindings, _))
      val expected: Option[Boolean] =
        if (leaves.contains(Some(false))) Some(false)
        else if (leaves.forall(_.contains(true))) Some(true)
        else None
      assert(PartPruning.matchesAll(bindings, conj) === expected,
        s"conj $conj under $bindings")
    }
  }

  test("Or is the three-valued dual; null partition matched only by IsNull/null-safe eq") {
    forAll(Gen.zip(bindingGen, filtersGen)) { case (bindings, filters) =>
      val disj = filters.reduceLeft[Filter](Or(_, _))
      val leaves = filters.map(PartPruning.matchesAll(bindings, _))
      val expected: Option[Boolean] =
        if (leaves.contains(Some(true))) Some(true)
        else if (leaves.forall(_.contains(false))) Some(false)
        else None
      assert(PartPruning.matchesAll(bindings, disj) === expected)
    }
    // null partition: comparisons are definite false, IsNull selects
    val nullB = Seq(("a", LongType: DataType,
      Some(None): Option[Option[Any]]))
    assert(PartPruning.matchesAll(nullB, EqualTo("a", 3L)) === Some(false))
    assert(PartPruning.matchesAll(nullB, GreaterThan("a", 3L)) ===
      Some(false))
    assert(PartPruning.matchesAll(nullB, IsNull("a")) === Some(true))
    assert(PartPruning.matchesAll(nullB, IsNotNull("a")) === Some(false))
    assert(PartPruning.matchesAll(nullB,
      EqualNullSafe("a", null)) === Some(true))
  }
}
