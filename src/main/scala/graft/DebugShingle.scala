package graft
import org.apache.spark.sql.functions._
import graft.functions.gf
object DebugShingle {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.TextOps
    import org.scalacheck.Gen
    val wordGen: Gen[String] =
      Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const("café"),
        Gen.const("日本語"), Gen.const("a-b_c"), Gen.const("x"))
    val sepGen: Gen[String] =
      Gen.nonEmptyListOf(Gen.oneOf(" ", "\t", "\n", "\r", "\f", "  "))
        .map(_.mkString)
    val textGen: Gen[String] = for {
      lead <- Gen.oneOf("", " ", "\t", "  \t")
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, wordGen)
      seps <- Gen.listOfN(n, sepGen)
      trail <- Gen.oneOf("", " ", "\n", "\t ")
    } yield lead + ws.zip(seps).map { case (w, s) => w + s }.mkString + trail
    val texts = Gen.listOfN(5000, textGen).sample.getOrElse(Nil)
    val df = texts.toDF("text").select(col("text"),
      gf.shingle_md5_h32(col("text"), 3).as("f"),
      array_distinct(transform(TextOps.shingleStrings(col("text")), s => gf.h32_builtin(s))).as("c"),
      TextOps.shingleStrings(col("text")).as("sh"),
      split(trim(col("text")), "\\s+").as("tk"))
    df.collect().foreach { r =>
      val f = r.getSeq[Long](1); val c = r.getSeq[Long](2)
      if (f != c) {
        def esc(s: String) = s.replace("\t","\\t").replace("\n","\\n").replace("\r","\\r").replace("\f","\\f")
        println(s"MISMATCH [${esc(r.getString(0))}]")
        println(s"  fused=$f")
        println(s"  composed=$c")
        println(s"  shingles=${r.getSeq[String](3).map(s=>"["+esc(s)+"]")}")
        println(s"  tokens=${r.getSeq[String](4).map(s=>"["+esc(s)+"]")}")
      }
    }
    spark.stop()
  }
}
