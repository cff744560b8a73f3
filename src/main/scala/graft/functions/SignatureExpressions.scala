package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot signature computations.
  *
  * The declarative forms (`transform`/`aggregate` lambda folds) are
  * correct but interpreted — Spark evaluates higher-order functions
  * expression-node-by-node per element, which made MinHash/SimHash
  * signature generation the bench bottleneck (~24 s for 5 000 docs at
  * sf0.1). These expressions collapse each signature into ONE compiled
  * primitive loop per row (no intermediate arrays, no boxing, each
  * shingle hashed exactly once), preserving bit-identical arithmetic with
  * [[Portable]] and therefore with the DuckDB oracle.
  *
  * Registered under `graft_*` names via [[GraftFunctions.register]].
  */
object Sig {
  final val P = Portable.P // 1000000007
  final val Seed = Portable.Seed // 7

  /** Polynomial rolling hash of UTF-8 bytes — identical to
    * [[Portable.polyHash]] for ASCII input. */
  @inline def polyHash(bytes: Array[Byte]): Long = {
    var h = Seed
    var k = 0
    while (k < bytes.length) { h = (h * 31L + (bytes(k) & 0xffL)) % P; k += 1 }
    h
  }

  @inline def hashJ(h: Long, j: Long): Long =
    ((j + 1) * 1000003L % P * h + (j * 999983L + 12345L) % P) % P
}

/** `graft_minhash32(array<string>) -> array<long>`: 32-permutation MinHash
  * signature of a shingle set (null for an empty set, matching
  * `list_min([]) IS NULL` on the oracle side).
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(32)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = Sig.polyHash(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < 32) {
        val v = Sig.hashJ(h, j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** `graft_simhash63(array<string>) -> long`: 63-bit SimHash of a token
  * set — bit b set when Σ_tokens (parity(hashJ(polyhash(t), b))·2 − 1) > 0.
  */
case class SimHash63(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = new Array[Long](63)
    var i = 0
    while (i < n) {
      val h = Sig.polyHash(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 63) {
        sums(b) += Sig.hashJ(h, b) % 2 * 2 - 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 62
    while (b >= 0) { sim = sim * 2 + (if (sums(b) > 0) 1L else 0L); b -= 1 }
    sim
  }
  override protected def withNewChildInternal(c: Expression): SimHash63 = copy(child = c)
}

/** `graft_hyperplane_bucket8(array<double>) -> long`: 8-plane
  * random-hyperplane LSH bucket id; plane coefficients are the ±1 parity
  * signs of [[Portable.planeSign]], projections summed in index order so
  * the IEEE result is bit-identical to the declarative/oracle forms.
  */
case class HyperplaneBucket8(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0L
    var p = 0
    while (p < 8) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val sign = if (Sig.hashJ(i + 13L, p) % 2 == 0) 1.0 else -1.0
        proj += arr.getDouble(i) * sign
        i += 1
      }
      bucket = bucket * 2 + (if (proj > 0) 1L else 0L)
      p += 1
    }
    bucket
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneBucket8 = copy(child = c)
}

/** `graft_ngrams(array<string>, n, distinct) -> array<string>`: word
  * n-gram shingles joined with single spaces; `distinct = true` keeps the
  * first occurrence of each shingle (same order contract as
  * `array_distinct` over the declarative [[Portable.shingles3]] form).
  * Returns an empty array when the doc has fewer than `n` tokens.
  */
case class NGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](total)
    var i = 0
    while (i < total) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new java.util.ArrayList[Any](total - n + 1)
    val seen = if (distinct) new java.util.HashSet[Any]() else null
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    i = 0
    while (i <= total - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](2 * n - 1)
      var k = 0
      while (k < n) {
        if (k > 0) parts(2 * k - 1) = space
        parts(2 * k) = toks(i + k)
        k += 1
      }
      val gram = org.apache.spark.unsafe.types.UTF8String.concat(parts: _*)
      if (seen == null || seen.add(gram)) out.add(gram)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): NGrams = copy(child = c)
}

/** `graft_dot(array<double>, array<double>) -> double`: sequential
  * (index-order) dot product — one compiled loop, bit-identical to the
  * `zip_with`+`aggregate` fold and to the oracle's `list_reduce` sum.
  */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Session registration + typed `Column` wrappers for the `graft_*`
  * expressions. `register` is idempotent and cheap — query builders call
  * it unconditionally.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_minhash32",
      (args: Seq[Expression]) => MinHashSig(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash63",
      (args: Seq[Expression]) => SimHash63(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_hyperplane_bucket8",
      (args: Seq[Expression]) => HyperplaneBucket8(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      (args: Seq[Expression]) => DotProduct(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_ngrams",
      (args: Seq[Expression]) => NGrams(args(0),
        args(1).eval().asInstanceOf[Int],
        args(2).eval().asInstanceOf[Boolean]), "built-in")
  }

  def minhash32(c: Column): Column = call_function("graft_minhash32", c)
  def simhash63(c: Column): Column = call_function("graft_simhash63", c)
  def hyperplaneBucket8(c: Column): Column = call_function("graft_hyperplane_bucket8", c)
  def dotp(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def ngrams(toks: Column, n: Int, distinct: Boolean): Column =
    call_function("graft_ngrams", toks,
      org.apache.spark.sql.functions.lit(n), org.apache.spark.sql.functions.lit(distinct))
}
