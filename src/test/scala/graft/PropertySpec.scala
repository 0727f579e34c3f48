package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{MediaOps, TextOps, VectorOps}

/** Property/fuzz tests over the pure-JVM kernels behind graft's native
  * expressions — the functions that see every byte of a 100 TB corpus run
  * here against adversarial inputs: random binary garbage, pathological
  * unicode, empty/huge strings. Deterministic seeds, hundreds of cases per
  * property, no SparkSession — milliseconds, not minutes. */
class PropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  private def randomString(r: Random): String = r.nextInt(3) match {
    case 0 => r.alphanumeric.take(r.nextInt(20)).mkString
    case 1 => Seq.fill(r.nextInt(20))(r.nextInt(0xFFFF).toChar).mkString
    case _ =>
      val pool = "ab é€Ã©caf"
      Seq.fill(r.nextInt(20))(pool(r.nextInt(pool.length))).mkString
  }

  test("jaro/jaroWinkler: range, symmetry, identity — 1000 adversarial pairs") {
    val r = new Random(42)
    (1 to 1000).foreach { _ =>
      val (a, b) = (randomString(r), randomString(r))
      val j = TextOps.jaroSim(u(a), u(b))
      val jw = TextOps.jaroWinkler(u(a), u(b))
      assert(j >= 0.0 && j <= 1.0, s"jaro out of range for ${a.toList}/${b.toList}")
      assert(jw >= j - 1e-15 && jw <= 1.0, "prefix bonus must only move the score up")
      assert(TextOps.jaroSim(u(b), u(a)) == j, "jaro must be symmetric")
      if (a.nonEmpty) assert(TextOps.jaroSim(u(a), u(a)) == 1.0)
    }
  }

  test("imageMeta never throws on binary garbage, including truncated/corrupt signatures") {
    val r = new Random(7)
    val sigs = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      Array[Byte](0xff.toByte, 0xd8.toByte),
      "GIF89a".getBytes.toSeq.toArray, "BM".getBytes.toSeq.toArray)
    (1 to 2000).foreach { i =>
      val tail = Array.fill(r.nextInt(64))(r.nextInt(256).toByte)
      val payload = if (i % 2 == 0) tail else sigs(r.nextInt(sigs.length)) ++ tail
      val m = MediaOps.imageMeta(payload) // must not throw on any input
      assert(m.numElements() == 3)
    }
  }

  test("fixMojibake is idempotent everywhere and a no-op on pure ASCII") {
    val r = new Random(11)
    (1 to 1000).foreach { _ =>
      val s = randomString(r)
      val once = TextOps.fixMojibake(u(s)).toString
      val twice = TextOps.fixMojibake(u(once)).toString
      assert(twice == once, s"not idempotent on ${s.toList}")
    }
    (1 to 200).foreach { _ =>
      val s = r.alphanumeric.take(r.nextInt(30)).mkString
      assert(TextOps.fixMojibake(u(s)).toString == s)
    }
  }

  test("deletion neighborhoods: SymSpell completeness for every distance-1 edit kind") {
    def nbhd(s: String): Set[String] = {
      val arr = TextOps.deletionNeighborhood(u(s), 1)
      (0 until arr.numElements()).map(arr.getUTF8String(_).toString).toSet
    }
    val r = new Random(13)
    (1 to 500).foreach { _ =>
      val w = (1 to (1 + r.nextInt(12))).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      val i = r.nextInt(w.length)
      val c = ('a' + r.nextInt(26)).toChar
      val mutated = r.nextInt(3) match {
        case 0 => w.substring(0, i) + c + w.substring(i + 1) // substitution
        case 1 => w.substring(0, i) + c + w.substring(i) // insertion
        case _ => if (w.length > 1) w.substring(0, i) + w.substring(i + 1) else w // deletion
      }
      assert(nbhd(w).intersect(nbhd(mutated)).nonEmpty,
        s"neighborhoods of '$w' and '$mutated' are disjoint")
    }
  }

  test("tokenSetRatio: range [0,100], symmetry, token-permutation invariance") {
    val vocab = Seq("alpha", "beta", "gamma", "de", "x")
    val r = new Random(17)
    (1 to 500).foreach { _ =>
      val a = Seq.fill(r.nextInt(6))(vocab(r.nextInt(vocab.length)))
      val b = Seq.fill(r.nextInt(6))(vocab(r.nextInt(vocab.length)))
      val (sa, sb) = (a.mkString(" "), b.mkString(" "))
      val score = TextOps.tokenSetRatio(u(sa), u(sb))
      assert(score >= 0 && score <= 100)
      assert(TextOps.tokenSetRatio(u(sb), u(sa)) == score, "must be symmetric")
      val shuffled = r.shuffle(a).mkString(" ")
      assert(TextOps.tokenSetRatio(u(shuffled), u(sb)) == score, "set semantics")
    }
  }

  test("rankBelow equals the linear count of strictly-smaller boundaries") {
    val r = new Random(19)
    (1 to 1000).foreach { _ =>
      val bounds = Seq.fill(r.nextInt(40))(r.nextDouble() * 2000 - 1000).sorted
      val v = r.nextDouble() * 3000 - 1500
      val arr = new GenericArrayData(bounds.toArray)
      assert(VectorOps.rankBelow(arr, v) == bounds.count(_ < v))
    }
  }

  test("quantizeI8: output length, monotonicity per dimension, clamped range") {
    val r = new Random(23)
    (1 to 500).foreach { _ =>
      val n = 1 + r.nextInt(16)
      val v = Array.fill(n)(r.nextFloat() * 24 - 12) // intentionally exceeds [lo, hi]
      val lo = new GenericArrayData(Array.fill(n)(-10.0))
      val hi = new GenericArrayData(Array.fill(n)(10.0))
      val q = VectorOps.quantizeI8(new GenericArrayData(v), lo, hi)
      assert(q.length == n)
      val bumped = v.map(x => math.min(x + 1.0f, 12.0f))
      val q2 = VectorOps.quantizeI8(new GenericArrayData(bumped), lo, hi)
      v.indices.foreach(i => assert(q2(i) >= q(i), "quantization must be monotone"))
    }
  }

  test("fusePair: concatenation preserved, greedy pass leaves no adjacent (l,r) singles — 500 cases") {
    val r = new Random(11)
    for (_ <- 1 to 500) {
      val syms = Array.fill(r.nextInt(12) + 1)(('a' + r.nextInt(3)).toChar.toString)
      val l = ('a' + r.nextInt(3)).toChar.toString
      val rr = ('a' + r.nextInt(3)).toChar.toString
      val fused = TextOps.fusePair(syms, l, rr)
      // the trainer/encoder invariant: merging never changes the word
      assert(fused.mkString == syms.mkString, s"${syms.toSeq} fuse ($l,$rr)")
      // left-to-right non-overlapping: single-char inputs can't leave an
      // adjacent (l, rr) pair behind (fused tokens are 2 chars, != l)
      fused.sliding(2).foreach {
        case Array(a, b) => assert(!(a == l && b == rr), s"${fused.toSeq} kept ($l,$rr)")
        case _ =>
      }
    }
  }

  test("BPE tokens always concatenate back to the input words, under any merge table") {
    val r = new Random(31)
    (1 to 500).foreach { _ =>
      val words = Seq.fill(1 + r.nextInt(5))(
        (1 to (1 + r.nextInt(8))).map(_ => ('a' + r.nextInt(4)).toChar).mkString)
      val text = words.mkString(" ")
      // random (possibly nonsensical) merge table — encode must stay lossless
      val merges = new GenericArrayData(
        Seq.fill(r.nextInt(10)) {
          val l = ('a' + r.nextInt(4)).toChar.toString * (1 + r.nextInt(2))
          val rr = ('a' + r.nextInt(4)).toChar.toString
          UTF8String.fromString(s"$l $rr"): Any
        }.toArray)
      val toks = TextOps.bpeTokens(u(text), merges)
      val rebuilt = (0 until toks.numElements())
        .map(toks.getUTF8String(_).toString).mkString
      assert(rebuilt == words.mkString(""), s"lossy encode of '$text'")
    }
  }

  test("sortedJaccard over shingleSet equals direct ngramJaccard on every pair") {
    val vocab = Seq("a", "b", "c", "dd", "e")
    val r = new Random(29)
    (1 to 500).foreach { _ =>
      val a = Seq.fill(r.nextInt(8))(vocab(r.nextInt(vocab.length))).mkString(" ")
      val b = Seq.fill(r.nextInt(8))(vocab(r.nextInt(vocab.length))).mkString(" ")
      val direct = TextOps.ngramJaccard(u(a), u(b), 2)
      val viaSets = TextOps.sortedJaccard(
        TextOps.shingleSet(u(a), 2), TextOps.shingleSet(u(b), 2))
      assert(viaSets == direct, s"mismatch on '$a' / '$b'")
    }
  }

  test("l2DistSqFD: non-negative, identity zero, equals naive fold — 500 random pairs") {
    val r = new Random(31)
    (1 to 500).foreach { _ =>
      val n = 1 + r.nextInt(64)
      val a = Array.fill(n)(r.nextFloat() * 4 - 2)
      val b = Array.fill(n)(r.nextDouble() * 4 - 2)
      val d = VectorOps.l2DistSqFD(
        new GenericArrayData(a.map(java.lang.Float.valueOf)),
        new GenericArrayData(b.map(java.lang.Double.valueOf)))
      var naive = 0.0
      (0 until n).foreach { i => val t = a(i).toDouble - b(i); naive += t * t }
      assert(d == naive && d >= 0.0)
      val self = VectorOps.l2DistSqFD(
        new GenericArrayData(a.map(java.lang.Float.valueOf)),
        new GenericArrayData(a.map(x => java.lang.Double.valueOf(x.toDouble))))
      assert(self == 0.0)
    }
  }
}
