package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k candidate buffer: keeps the k best (score DESC, id ASC)
  * pairs in a binary heap whose root is the WORST kept candidate, so
  * admission against a full buffer is one comparison and eviction is
  * O(log k). Used as the aggregation state of [[TopKByScore]].
  */
final class TopKHeap(val k: Int, val dedupeIds: Boolean = false) {
  // parallel primitive arrays, worst-at-root heap — no boxing in update
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  /** a strictly worse than b: lower score, or same score and larger id. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = ts; ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(start: Int = 0): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(m); ids(i) = ids(m)
      scores(m) = ts; ids(m) = ti
      i = m
    }
  }

  def add(score: Double, id: Long): Unit = {
    if (dedupeIds) {
      // an id already in the buffer may not occupy a second slot — keep
      // its best score (O(k) scan; k is small for every dedupe user, and
      // the scan replaces a whole distinct() shuffle upstream)
      var i = 0
      while (i < n) {
        if (ids(i) == id) {
          if (worse(scores(i), ids(i), score, id)) {
            scores(i) = score
            siftDown(i) // score improved: node may now be better than a child
          }
          return
        }
        i += 1
      }
    }
    if (n < k) {
      scores(n) = score; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Kept candidates sorted best-first as array<struct<score,id>>.
    * Ordering uses PRIMITIVE double comparisons (not `Ordering[Double]`'s
    * IEEE total order) so -0.0 and 0.0 tie and fall back to the id — the
    * same semantics as the heap's admission test and SQL's
    * `ORDER BY score DESC, id`. */
  def result(): GenericArrayData = {
    val idx = (0 until n).sortWith { (i, j) =>
      if (scores(i) > scores(j)) true
      else if (scores(i) < scores(j)) false
      else ids(i) < ids(j)
    }
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](scores(i), ids(i)))
    }.toArray[Any])
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(scores(i)); out.writeLong(ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TopKHeap {
  def fromBytes(bytes: Array[Byte], k: Int, dedupeIds: Boolean = false): TopKHeap = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val m = in.readInt()
    val h = new TopKHeap(k, dedupeIds)
    var i = 0
    while (i < m) { h.add(in.readDouble(), in.readLong()); i += 1 }
    h
  }
}

/** `graft_topk(struct<score:double, id:bigint>, k[, dedupe_ids]) ->
  * array<struct<score,id>>`: bounded-heap top-k aggregate ordered
  * (score DESC, id ASC).
  *
  * This is the scale-path replacement for
  * `row_number() OVER (PARTITION BY q ORDER BY score DESC)` top-k: the
  * window form funnels every candidate of a group through one task's
  * sort; this aggregate keeps only k rows per group in each map task
  * (partial aggregation), shuffles ≤ k·partitions rows, and merges
  * k-lists — one query with a million candidates costs each task O(k)
  * memory instead of one task a million-row sort.
  *
  * With `dedupeIds` set, a candidate id occupies at most one slot (best
  * score wins) — `distinct()`-before-topk semantics WITHOUT the distinct
  * shuffle. The multi-table kNN graph uses this: a pair surfacing in
  * several LSH tables carries the same exact cosine each time, so heap
  * dedupe is exactly pair-distinct, and the whole candidate stream folds
  * map-side.
  */
case class TopKByScore(
    child: Expression, k: Int, dedupeIds: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with UnaryLike[Expression] {

  require(k > 0, "graft_topk: k must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(a, b))
          if a.dataType == DoubleType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk expects struct<double, bigint>, got ${other.simpleString(5)}")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, dedupeIds)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val row = child.eval(input)
    if (row != null) {
      val r = row.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        val s = r.getDouble(0)
        // NaN never participates in ranking (all NaN comparisons are
        // false, which would both block admissions and pin NaN entries);
        // drop it like SQL ordering drops incomparable values
        if (s == s) buf.add(s, r.getLong(1))
      }
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKHeap): Any = buf.result()

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(bytes, k, dedupeIds)

  override def dataType: DataType = TopKByScore.OutType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKByScore =
    copy(child = newChild)
}

object TopKByScore {
  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
}
