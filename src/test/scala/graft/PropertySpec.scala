package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.streaming.StateMachines
import graft.streaming.StateMachines._

/** Property-based checks of the pure state-machine cores and fixture
  * math — random event sequences against brute-force specifications.
  */
class PropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val eventSeq: Gen[List[(Long, Boolean)]] =
    Gen.listOfN(40, for {
      ts <- Gen.choose(0L, 500L)
      failed <- Gen.prob(0.7)
    } yield (ts, failed)).map(_.sortBy(_._1))

  test("login FSM warnings == brute-force consecutive-fail-pair spec") {
    holds(Prop.forAll(eventSeq, Gen.choose(1L, 50L)) { (events, gap) =>
      val got = StateMachines.loginFold(1L, events, gap)
      val expected = events.zip(events.drop(1)).collect {
        case ((t1, true), (t2, true)) if t2 - t1 <= gap =>
          LoginWarning(1L, t1, t2, "repeated failures")
      }
      got == expected
    })
  }

  test("order FSM outcome depends only on (min create, min pay)") {
    val orderEvents: Gen[List[(Long, Boolean)]] =
      Gen.listOfN(10, for {
        ts <- Gen.choose(0L, 1000L)
        isCreate <- Gen.prob(0.5)
      } yield (ts, isCreate))
    holds(Prop.forAll(orderEvents, Gen.choose(1L, 500L)) { (events, timeout) =>
      val sorted = events.sortBy(_._1)
      val st = sorted.foldLeft(OrderState(None, None)) {
        case (s, (ts, c)) => StateMachines.orderStep(s, OrderEvent(1, ts, c))
      }
      val got = StateMachines.orderOutcome(1, st, timeout).status
      val creates = events.filter(_._2).map(_._1)
      val pays = events.filterNot(_._2).map(_._1)
      val expected = (creates.minOption, pays.minOption) match {
        case (Some(c), Some(p)) if p >= c && p - c <= timeout => "payed"
        case (Some(c), Some(p)) if p >= c => "payed but timeout"
        case (Some(_), Some(_)) => "pay before create"
        case (Some(_), None) => "timeout"
        case (None, Some(_)) => "pay without create"
        case _ => "empty"
      }
      got == expected
    })
  }

  test("blacklist FSM: one warning iff total >= threshold; passes capped at threshold-1") {
    holds(Prop.forAll(Gen.choose(1, 40), Gen.choose(1L, 20L)) { (clicks, threshold) =>
      val outs = (1 to clicks).foldLeft((ClickState(0, warned = false), Vector.empty[ClickOut])) {
        case ((st, acc), _) =>
          val (st2, o) = StateMachines.clickStep(st, threshold)
          (st2, acc ++ o)
      }._2
      val warnings = outs.count(_.isInstanceOf[BlacklistWarning])
      val passes = outs.count(_.isInstanceOf[PassedClick])
      warnings == (if (clicks >= threshold) 1 else 0) &&
        passes == math.min(clicks.toLong, threshold - 1)
    })
  }

  test("tx FSM outcome is order-insensitive") {
    holds(Prop.forAll(Gen.listOf(Gen.oneOf(true, false))) { sides =>
      val a = sides.foldLeft(TxState(false, false))(StateMachines.txStep)
      val b = sides.reverse.foldLeft(TxState(false, false))(StateMachines.txStep)
      StateMachines.txOutcome(a) == StateMachines.txOutcome(b)
    })
  }

  test("multimodal frame offsets: within bounds, stride-spaced, capped") {
    holds(Prop.forAll(Gen.choose(0L, 5000L), Gen.choose(1, 64), Gen.choose(1, 128),
      Gen.choose(0, 16)) { (len, frame, stride, maxF) =>
      val offs = graft.multimodal.Multimodal.frameOffsets(len, frame, stride, maxF)
      offs.size <= maxF &&
        offs.forall(o => o >= 1 && o + frame - 1 <= len) &&
        offs.zip(offs.drop(1)).forall { case (a, b) => b - a == stride }
    })
  }

  test("rolling fingerprint: stable and within modulus") {
    val toks: Gen[List[Long]] = Gen.listOf(Gen.choose(0L, (1L << 32) - 1))
    holds(Prop.forAll(toks) { hs =>
      def fp(vals: List[Long]): Long =
        vals.foldLeft(0L)((acc, v) => (acc * 31 + v) % 1000000007L)
      val v = fp(hs)
      v >= 0 && v < 1000000007L && v == fp(hs)
    })
  }

  // ---- fused vector expression kernels vs the sequential-fold spec --
  // The fused codegen expressions replaced interpreted HOF folds; these
  // properties pin BIT-IDENTICAL results against the reference fold the
  // DuckDB oracles also run (left-to-right, elements promoted to
  // double), so swapping them in can never perturb an oracle.

  private val floatVec: Gen[Array[Float]] =
    Gen.choose(1, 96).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-8.0f, 8.0f)).map(_.toArray))

  private def arr(fs: Array[Float]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      fs.map(f => f: Any))

  test("HyperplaneSig kernel == per-plane sequential-fold sign bits") {
    val planesGen: Gen[Array[Array[Double]]] =
      Gen.choose(1, 12).flatMap(p => Gen.listOfN(p,
        Gen.listOfN(96, Gen.choose(-1.0, 1.0)).map(_.toArray)).map(_.toArray))
    holds(Prop.forAll(floatVec, planesGen) { (v, planes) =>
      val got = graft.plans.HyperplaneSig.sig(arr(v), planes)
      val want = planes.zipWithIndex.map { case (p, j) =>
        val dot = (0 until math.min(p.length, v.length))
          .foldLeft(0.0)((acc, i) => acc + p(i) * v(i).toDouble)
        if (dot > 0) 1L << j else 0L
      }.sum
      got == want
    })
  }

  test("VecL2Dist2 eval == sequential (a-b)^2 fold (float and double inputs)") {
    holds(Prop.forAll(floatVec, floatVec) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n); val b = b0.take(n)
      val want = (0 until n).foldLeft(0.0) { (acc, i) =>
        val d = a(i).toDouble - b(i).toDouble; acc + d * d
      }
      val ff = graft.plans.VecL2Dist2(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)))
        .eval(null).asInstanceOf[Double]
      val df = graft.plans.VecL2Dist2(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a.map(_.toDouble),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)))
        .eval(null).asInstanceOf[Double]
      // float/float is exact vs the spec; double/float promotes the
      // left side losslessly, so both must be bit-equal to the fold
      ff == want && df == want
    })
  }

  // The interpreted nullSafeEval above and the hand-written doGenCode
  // Java loops are separate code paths; production runs the latter
  // under whole-stage codegen. This test pushes the same vectors
  // through a DataFrame projection with CODEGEN_ONLY forced, so a
  // divergence in the generated Java (not just the Scala eval) fails.
  test("fused vector kernels through CODEGEN path == fold reference") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42)
    val rows = (1 to 64).map { i =>
      val n = 1 + rnd.nextInt(96)
      (i,
       Array.fill(n)(rnd.nextFloat() * 16f - 8f),
       Array.fill(n)(rnd.nextFloat() * 16f - 8f))
    }
    val planes: Seq[Seq[Double]] =
      Seq.fill(12)(Seq.fill(96)(rnd.nextDouble() * 2 - 1))
    val planesArr = planes.map(_.toArray).toArray
    val adcRows = (1 to 64).map { i =>
      val nb = 1 + rnd.nextInt(16)
      val cells = 1 + rnd.nextInt(16)
      (i,
       Array.fill(nb)(rnd.nextInt(cells).toLong),
       Array.fill(nb * cells)(rnd.nextLong() % 1000000L))
    }
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = rows.toDF("id", "a", "b")
        .select(col("id"),
          graft.plans.VectorExpressions.dotF32(col("a"), col("b")).as("dot"),
          graft.plans.VectorExpressions.l2Dist2(col("a"), col("b")).as("d2"),
          graft.plans.VectorExpressions.planeSig(col("a"), planes).as("sig"))
        .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
      rows.foreach { case (id, a, b) =>
        val n = math.min(a.length, b.length)
        val dot = (0 until n).foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
        val d2 = (0 until n).foldLeft(0.0) { (acc, i) =>
          val d = a(i).toDouble - b(i).toDouble; acc + d * d
        }
        val sig = planesArr.zipWithIndex.map { case (p, j) =>
          val s = (0 until math.min(p.length, a.length))
            .foldLeft(0.0)((acc, i) => acc + p(i) * a(i).toDouble)
          if (s > 0) 1L << j else 0L
        }.sum
        assert(got(id) === ((dot, d2, sig)), s"row $id diverged under codegen")
      }
      val gotAdc = adcRows.toDF("id", "cids", "luts")
        .select(col("id"),
          graft.plans.VectorExpressions.adcSum(col("cids"), col("luts")).as("adc"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      adcRows.foreach { case (id, cids, lut) =>
        val cells = lut.length / cids.length
        val want = cids.zipWithIndex.map { case (c, b) => lut(b * cells + c.toInt) }.sum
        assert(gotAdc(id) === want, s"adc row $id diverged under codegen")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("PqAdcSum kernel == grouped per-block LUT sum") {
    val gen = for {
      nb <- Gen.choose(1, 16)
      cells <- Gen.choose(1, 16)
      codes <- Gen.listOfN(nb, Gen.choose(0L, cells - 1L))
      lut <- Gen.listOfN(nb * cells, Gen.choose(-1000000L, 1000000L))
    } yield (codes.toArray, lut.toArray, cells)
    holds(Prop.forAll(gen) { case (codes, lut, cells) =>
      val got = graft.plans.PqAdcSum.sum(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(codes.map(c => c: Any)),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(lut.map(l => l: Any)))
      // the grouped form this kernel replaced: one (blk, cid) row per
      // block joined to the LUT, summed per pair
      val want = codes.zipWithIndex.map { case (cid, b) => lut(b * cells + cid.toInt) }.sum
      got == want
    })
  }

  test("PqAdcSum fails loudly on null elements (no silent 0-valued read)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // a null code slot would otherwise read as code 0 — a VALID cell —
    // and produce a silently wrong sum
    val nullCode = new GenericArrayData(Array[Any](1L, null))
    val lut = new GenericArrayData((0L until 8L).map(l => l: Any).toArray)
    val e1 = intercept[IllegalArgumentException] {
      graft.plans.PqAdcSum.sum(nullCode, lut)
    }
    assert(e1.getMessage.contains("null code"))
    val codes = new GenericArrayData(Array[Any](1L, 2L))
    val nullLut = new GenericArrayData(
      Array[Any](0L, 1L, 2L, 3L, 4L, 5L, null, 7L))
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.PqAdcSum.sum(codes, nullLut)
    }
    assert(e2.getMessage.contains("null LUT"))
  }

  test("FloatVecDot eval == sequential product fold") {
    holds(Prop.forAll(floatVec, floatVec) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n); val b = b0.take(n)
      val want = (0 until n).foldLeft(0.0)((acc, i) =>
        acc + a(i).toDouble * b(i).toDouble)
      val got = graft.plans.FloatVecDot(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)))
        .eval(null).asInstanceOf[Double]
      got == want
    })
  }
}
