package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for graft's text/dedup/similarity
  * kernels (SURVEY.md §4). Each stays inside whole-stage codegen via
  * `defineCodeGen` delegating to the static [[GraftHash]] kernels — one
  * static call per row, no boxing, no UDF serialization overhead.
  * (Preference order per the build brief: native Expression > UDF.)
  */

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes. */
case class RollingHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rolling_hash64"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.rolling64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.rolling64($c)")
  override protected def withNewChildInternal(c: Expression): RollingHash64 = copy(c)
}

/** Hashes of k-token shingles (order-sensitive windows over
  * whitespace tokens) — the dedup family's unit of comparison. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.shingleHashes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.shingleHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** MinHash signature (numPerm universal-hash minima) over an array of
  * element hashes. */
case class MinHashSig(child: Expression, numPerm: Int, seed: Long)
    extends UnaryExpression {
  require(numPerm >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.minhash(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      numPerm, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.minhash($c, $numPerm, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** 64-bit SimHash of a string's whitespace tokens. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.simhash64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Hamming distance between two 64-bit hashes (popcount of XOR). */
case class HammingDist64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hamming64"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftHash.hamming64($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDist64 =
    copy(left = l, right = r)
}

/** Cosine similarity of two float vectors (double accumulation) — the
  * ANN/dedup hot loop; native expression keeps it in whole-stage
  * codegen (vs the boxing-heavy zip_with/aggregate composition). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine_sim"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.cosineF(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftHash.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** L2 distance of two float vectors. */
case class L2Dist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_l2_dist"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.l2F(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftHash.l2F($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Dist =
    copy(left = l, right = r)
}

/** Sign-bit LSH bucket (Charikar random hyperplanes) of a float
  * vector: `numBits` sign bits under hyperplanes derived from `seed`. */
case class SignBits64(child: Expression, numBits: Int, seed: Long)
    extends UnaryExpression {
  require(numBits >= 1 && numBits <= 64)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sign_bits64"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.signBits(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      numBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.signBits($c, $numBits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): SignBits64 = copy(child = c)
}

/** Portable MinHash signature (mod-2^61-1 universal hashing over
  * 32-bit element hashes) — exact-integer math a SQL oracle replicates
  * bit-for-bit; see GraftHash.minhashMod. */
case class MinHashSigMod(child: Expression, numPerm: Int)
    extends UnaryExpression {
  require(numPerm >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig_mod"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.minhashMod(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numPerm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.minhashMod($c, $numPerm)")
  override protected def withNewChildInternal(c: Expression): MinHashSigMod = copy(child = c)
}

/** Portable SimHash over pre-hashed elements (low `bits` bits). */
case class SimHashInts(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash_ints"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.simhashInts(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhashInts($c, $bits)")
  override protected def withNewChildInternal(c: Expression): SimHashInts = copy(child = c)
}

/** Exact squared L2 distance of two long vectors. */
case class L2SqLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_l2sq_long"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.l2sqLong(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftHash.l2sqLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqLong =
    copy(left = l, right = r)
}

/** Portable sign-LSH bucket: quantized integer dot products against
  * deterministic ±1 hyperplanes (GraftHash.planeCoeff). */
case class SignBitsQ(child: Expression, numBits: Int, planeBase: Int)
    extends UnaryExpression {
  require(numBits >= 1 && numBits <= 64)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sign_bits_q"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.signBitsQ(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      numBits, planeBase)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.signBitsQ($c, $numBits, $planeBase)")
  override protected def withNewChildInternal(c: Expression): SignBitsQ = copy(child = c)
}

/** Portable md5-h32 string hash as a single native kernel:
  * == conv(substr(md5(s),1,8),16,10) (KernelSpec-pinned) but with no
  * hex-string materialization or base-16 parse per value. */
case class Md5H32(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5_h32"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.md5H32(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.md5H32($c)")
  override protected def withNewChildInternal(c: Expression): Md5H32 = copy(c)
}

/** Fused tokenize→shingle→md5-h32→distinct kernel: the portable
  * MinHash front end in one codegen call per document (KernelSpec pins
  * equality with the composed shingleStrings+h32 form). */
case class ShingleMd5H32(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_md5_h32"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.shingleMd5H32(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.shingleMd5H32($c, $k)")
  override protected def withNewChildInternal(c: Expression): ShingleMd5H32 = copy(child = c)
}

/** 64-bit portable SimHash (two packed 32-bit md5-derived halves) in
  * one codegen call per document. */
case class SimHashMd5(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash_md5"
  protected override def nullSafeEval(v: Any): Any =
    GraftHash.simhashMd5(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhashMd5($c)")
  override protected def withNewChildInternal(c: Expression): SimHashMd5 = copy(c)
}

/** Column-API façade for the graft expressions. */
object gf {
  private def col(e: Expression): Column = Bridge.column(e)
  private def ex(c: Column): Expression = Bridge.expression(c)

  def rolling_hash64(c: Column): Column = col(RollingHash64(ex(c)))
  def shingle_hashes(c: Column, k: Int): Column = col(ShingleHashes(ex(c), k))
  def minhash_sig(c: Column, numPerm: Int, seed: Long): Column =
    col(MinHashSig(ex(c), numPerm, seed))
  def simhash64(c: Column): Column = col(SimHash64(ex(c)))
  def hamming64(a: Column, b: Column): Column = col(HammingDist64(ex(a), ex(b)))
  def cosine_sim(a: Column, b: Column): Column = col(CosineSim(ex(a), ex(b)))
  def l2_dist(a: Column, b: Column): Column = col(L2Dist(ex(a), ex(b)))
  def sign_bits64(c: Column, numBits: Int, seed: Long): Column =
    col(SignBits64(ex(c), numBits, seed))
  def minhash_sig_mod(c: Column, numPerm: Int): Column =
    col(MinHashSigMod(ex(c), numPerm))
  def simhash_ints(c: Column, bits: Int): Column = col(SimHashInts(ex(c), bits))
  def l2sq_long(a: Column, b: Column): Column = col(L2SqLong(ex(a), ex(b)))
  def sign_bits_q(c: Column, numBits: Int, planeBase: Int): Column =
    col(SignBitsQ(ex(c), numBits, planeBase))

  /** Portable 32-bit string hash shared with the DuckDB oracles:
    * first 8 hex chars of md5 as an integer — native kernel. */
  def h32(c: Column): Column = col(Md5H32(ex(c)))

  /** h32 as the original built-in composition (md5/substring/conv) —
    * kept as the KernelSpec reference for the native kernel. */
  def h32_builtin(c: Column): Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")
  }

  def shingle_md5_h32(c: Column, k: Int): Column = col(ShingleMd5H32(ex(c), k))
  def simhash_md5(c: Column): Column = col(SimHashMd5(ex(c)))

  /** Register all graft expressions for SQL use (idempotent). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_rolling_hash64",
      es => RollingHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64",
      es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_hamming64",
      es => HammingDist64(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine_sim",
      es => CosineSim(es(0), es(1)), "built-in")
  }
}
