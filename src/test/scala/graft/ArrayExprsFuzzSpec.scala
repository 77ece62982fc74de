package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashSig

/** Deterministic fuzz over the codegen'd expressions: hundreds of random
  * inputs, each checked against an independent plain-Scala reference
  * computed driver-side (not against another Spark expression — so a
  * shared Catalyst bug can't mask itself). Seeded → reproducible. */
class ArrayExprsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(987654321L)
  private val N = 300

  test("graft_dot matches a strict left-to-right Scala fold on random vectors") {
    val data = Seq.fill(N) {
      val n = rnd.nextInt(65)
      (Seq.fill(n)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)),
        Seq.fill(n)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)))
    }
    val got = data.toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b"))).as[Double].collect()
    data.zip(got).foreach { case ((a, b), g) =>
      var s = 0.0
      a.indices.foreach(i => s += a(i) * b(i))
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(s), s"dot($a, $b)")
    }
  }

  test("graft_intersect_size matches Set intersection on random sorted arrays") {
    val data = Seq.fill(N) {
      def arr = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (arr, arr)
    }.map { case (x, _) =>
      (x, Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted)
    }
    val got = data.toDF("x", "y")
      .select(call_function("graft_intersect_size", col("x"), col("y")))
      .as[Int].collect()
    data.zip(got).foreach { case ((x, y), g) =>
      assert(g == x.toSet.intersect(y.toSet).size, s"intersect($x, $y)")
    }
  }

  test("graft_minhash matches the A*x+B min formula on random hash sets") {
    val data = Seq.fill(N)(Seq.fill(rnd.nextInt(50))(rnd.nextLong()))
    val got = data.toDF("sh")
      .select(call_function("graft_minhash", col("sh"))).as[Seq[Long]].collect()
    data.zip(got).foreach { case (sh, g) =>
      val exp = (0 until MinHashSig.NumHashes).map { j =>
        if (sh.isEmpty) Long.MaxValue
        else sh.map(x => MinHashSig.A(j) * x + MinHashSig.B(j)).min
      }
      assert(g == exp, s"minhash($sh)")
    }
  }

  test("graft_md5_minhash matches a driver-side MessageDigest reference on random strings") {
    // independent reference: plain java.security MessageDigest + hex +
    // string min — not the Spark HOF formula, so a shared Catalyst bug
    // can't mask itself. Unicode chars included (UTF-8 byte paths).
    def refSig(shingles: Seq[String]): Seq[String] =
      (0 until graft.functions.Md5MinHashSig.NumHashes).map { i =>
        if (shingles.isEmpty) null
        else shingles.map { x =>
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"p$i|$x".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
        }.min
      }
    val alphabet = "abc XYZ09-éπ漢"
    val data = Seq.fill(N) {
      Seq.fill(rnd.nextInt(20))(
        Seq.fill(rnd.nextInt(12) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = data.toDF("sh")
      .select(call_function("graft_md5_minhash", col("sh")))
      .as[Seq[String]].collect()
    data.zip(got).foreach { case (sh, g) =>
      assert(g == refSig(sh), s"md5_minhash($sh)")
    }
  }

  test("graft_simhash matches the per-bit majority formula on random hash sets") {
    val data = Seq.fill(N)(Seq.fill(rnd.nextInt(50))(rnd.nextLong()))
    val got = data.toDF("th")
      .select(call_function("graft_simhash", col("th"))).as[Long].collect()
    data.zip(got).foreach { case (th, g) =>
      var exp = 0L
      (0 until 64).foreach { j =>
        val cnt = th.count(x => ((x >>> j) & 1L) == 1L)
        if (2 * cnt > th.length) exp |= (1L << j)
      }
      assert(g == exp, s"simhash($th)")
    }
  }
}
