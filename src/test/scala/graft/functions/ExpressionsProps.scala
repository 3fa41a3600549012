package graft.functions

import graft.multimodal.MediaCodecs
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the engine's custom kernels — the pieces whose
  * correctness the DuckDB oracle only samples (it sees the corpus's
  * values, not the input space): the two codegen'd Catalyst
  * expressions, the resize gather, and d07's pigeonhole banding
  * invariant.
  */
object ExpressionsProps extends Properties("graft-kernels") {

  private val P = 2147483647L

  // Reference model: the documented fold, written independently
  // (BigInt, code-point iteration via the Java stream API).
  private def polyHashModel(s: String): Long = {
    var acc = BigInt(0)
    s.codePoints().forEach(cp => acc = (acc * 31 + cp) mod BigInt(P))
    acc.toLong
  }

  property("polyHash matches the BigInt code-point model") =
    forAll(Gen.oneOf(Gen.asciiPrintableStr, Gen.stringOf(Gen.asciiChar))) { s =>
      PolyHash.hash(UTF8String.fromString(s)) == polyHashModel(s)
    }

  private val doubles = Gen.containerOf[Array, Double](
    Gen.chooseNum(-1e3, 1e3))

  property("dot(double, double) equals the naive left-to-right loop") =
    forAll(doubles) { a =>
      val b = a.map(x => x * 0.5 - 1.0)
      val got = DotProduct.dot(
        UnsafeArrayData.fromPrimitiveArray(a),
        UnsafeArrayData.fromPrimitiveArray(b), false, false)
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      got == acc || (got.isNaN && acc.isNaN)
    }

  property("dot(float, float) promotes each element before multiplying") =
    forAll(Gen.containerOf[Array, Float](Gen.chooseNum(-100f, 100f))) { a =>
      val got = DotProduct.dot(
        UnsafeArrayData.fromPrimitiveArray(a),
        UnsafeArrayData.fromPrimitiveArray(a), true, true)
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * a(i).toDouble; i += 1 }
      got == acc
    }

  private val payloads =
    Gen.chooseNum(MediaCodecs.ImageRowBytes, 600).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum[Byte](Byte.MinValue, Byte.MaxValue)))

  property("resizeStub emits outW*outH bytes, each gathered from the grid") =
    forAll(payloads) { p =>
      val e = MediaCodecs.ThumbEdge
      val out = MediaCodecs.resizeStub(p, e, e)
      val h = p.length / MediaCodecs.ImageRowBytes
      out.length == e * e && (0 until e * e).forall { k =>
        val (r, c) = (k / e, k % e)
        out(k) == p((r * h / e) * MediaCodecs.ImageRowBytes +
          c * MediaCodecs.ImageRowBytes / e)
      }
    }

  // d07's losslessness hinges on this pure-bit-math fact: two 32-bit
  // signatures within Hamming distance 3 agree exactly on at least one
  // of the 4 disjoint 8-bit bands (pigeonhole: 3 flipped bits cannot
  // touch 4 bands).
  private val sigAndFlips = for {
    sig <- Gen.chooseNum(0L, (1L << 32) - 1)
    k <- Gen.chooseNum(0, 3)
    bits <- Gen.listOfN(k, Gen.chooseNum(0, 31))
  } yield (sig, bits.foldLeft(sig)((s, b) => s ^ (1L << b)))

  property("Hamming<=3 pairs always share one of the 4 bands") =
    forAll(sigAndFlips) { case (a, b) =>
      java.lang.Long.bitCount(a ^ b) > 3 ||
        (0 until 4).exists(band =>
          ((a >> (8 * band)) & 0xff) == ((b >> (8 * band)) & 0xff))
    }
}
