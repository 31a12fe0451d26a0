package graft

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.Admission

/** Property coverage for [[Admission.admit]] — previously correct by
  * reading and integration use only. Checks the per-limit contracts and
  * the invariants every limit must satisfy, over a seeded sweep of
  * (start, hi, maxRows) triples including the overflow edge.
  */
class AdmissionSpec extends AnyFunSuite {

  private val interesting = Seq(0L, 1L, 2L, 24L, 25L, 26L, 99L, 100L,
    1000L, 1L << 31, Long.MaxValue / 2, Long.MaxValue - 1, Long.MaxValue)

  private def triples: Seq[(Long, Long, Long)] = {
    val rng = new scala.util.Random(0xa11ce5L)
    val seeded = Seq.fill(500) {
      val hi = rng.nextLong(1L << 40)
      (rng.nextLong(hi + 1), hi, rng.nextLong(1L << 20))
    }
    val edges = for {
      s <- interesting; h <- interesting if s <= h; m <- interesting
    } yield (s, h, m)
    seeded ++ edges
  }

  test("maxRows: advances exactly min(hi, start + max), overflow-safe") {
    triples.foreach { case (s, hi, m) =>
      val got = Admission.admit(s, hi, ReadLimit.maxRows(m))
      val want =
        if (s + m < s) hi // overflowed advance saturates to available
        else math.min(hi, s + m)
      assert(got === want, s"(start=$s hi=$hi max=$m)")
    }
  }

  test("allAvailable and minRows admit everything available") {
    triples.foreach { case (s, hi, m) =>
      assert(Admission.admit(s, hi, ReadLimit.allAvailable()) === hi)
      assert(Admission.admit(s, hi,
        ReadLimit.minRows(math.max(1, m), 1000L)) === hi,
        s"(start=$s hi=$hi min=$m)")
    }
  }

  test("composite limits admit the minimum of their parts — the " +
      "AvailableNow wrapper shape (allAvailable + paced max) stays paced") {
    triples.foreach { case (s, hi, m) =>
      val paced = Admission.admit(s, hi, ReadLimit.maxRows(m))
      val composite = Admission.admit(s, hi, ReadLimit.compositeLimit(
        Array(ReadLimit.allAvailable(), ReadLimit.maxRows(m))))
      assert(composite === math.min(paced, hi), s"(start=$s hi=$hi max=$m)")
      // nested composites collapse the same way
      val nested = Admission.admit(s, hi, ReadLimit.compositeLimit(
        Array(ReadLimit.compositeLimit(
          Array(ReadLimit.maxRows(m), ReadLimit.minRows(1L, 10L))),
          ReadLimit.allAvailable())))
      assert(nested === composite, s"(start=$s hi=$hi max=$m)")
    }
  }

  test("invariants for every limit: monotone (never behind start), " +
      "bounded (never past hi)") {
    val limits = (m: Long) => Seq(
      ReadLimit.maxRows(m), ReadLimit.allAvailable(),
      ReadLimit.minRows(math.max(1, m), 100L),
      ReadLimit.compositeLimit(
        Array(ReadLimit.allAvailable(), ReadLimit.maxRows(m))))
    triples.foreach { case (s, hi, m) =>
      limits(m).foreach { l =>
        val got = Admission.admit(s, hi, l)
        assert(got >= s && got <= hi, s"(start=$s hi=$hi limit=$l -> $got)")
      }
    }
  }
}
