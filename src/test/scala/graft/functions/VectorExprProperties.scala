package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Generative checks for the fused signature expressions: for ANY
  * token-hash array, the one-pass codegen forms must equal their
  * reference formulations computed independently in plain Scala.
  * ScalaCheck shrinks a violating array to a minimal counterexample.
  */
object VectorExprProperties extends Properties("VectorExprs") {

  private val genHashes: Gen[List[Long]] =
    Gen.listOfN(40, Gen.chooseNum(0L, (1L << 60) - 1)).flatMap(l =>
      Gen.choose(0, 40).map(l.take))

  private def refSimhash(hs: Seq[Long]): Option[Long] =
    if (hs.isEmpty) None
    else Some((0 until 32).foldLeft(0L) { (acc, b) =>
      val sgn = hs.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
      if (sgn > 0) acc | (1L << b) else acc
    })

  property("SimhashMix equals the per-bit majority vote") =
    forAll(genHashes) { hs =>
      val lit = Literal.create(hs.toArray, ArrayType(LongType))
      val got = Option(SimhashMix(lit).eval(null)).map(_.asInstanceOf[Long])
      got == refSimhash(hs)
    }

  property("MinhashMix equals the per-family affine minimum") =
    forAll(genHashes) { hs =>
      val coeffs = graft.ops.Dedup.mixCoeffs.toSeq
      val mod = graft.ops.Dedup.MixMod
      val lit = Literal.create(hs.toArray, ArrayType(LongType))
      val got = Option(MinhashMix(lit, coeffs, mod).eval(null))
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq)
      val want =
        if (hs.isEmpty) None
        else Some(coeffs.map { case (a, b) => hs.map(h => (h * a + b) % mod).min })
      got == want
    }

  property("SimhashMix bit b set implies majority of hashes have bit b") =
    forAll(genHashes.suchThat(_.nonEmpty)) { hs =>
      val sig = refSimhash(hs).get
      Prop.all((0 until 32).map { b =>
        val ones = hs.count(h => ((h >>> b) & 1L) == 1L)
        val bitSet = ((sig >>> b) & 1L) == 1L
        Prop(bitSet == (ones * 2 > hs.size)) :| s"bit $b"
      }: _*)
    }
}
