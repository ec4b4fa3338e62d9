package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{UnaryLike, BinaryLike}
import org.apache.spark.sql.types._
import graft.core.sketch._

/**
 * Sketch aggregates as `TypedImperativeAggregate`s — Spark's partial/final
 * aggregation contract is exactly the reference's collect/aggregate split:
 * per-partition `update` mirrors MagnitudeDataset.updateStats
 * (/root/reference/internal/dataset.go:156-214), shuffle-side `merge`
 * mirrors AggregateDatasets' StrictUnion fold
 * (/root/reference/internal/dataset.go:232-298). Each family ships a BUILD
 * aggregate (from raw values) and a MERGE aggregate (from stored sketch
 * bytes — the resume/re-aggregation path). `eval` emits the serialized
 * sketch (BinaryType); estimator scalars decode it downstream, so sketch
 * columns are first-class mergeable values exactly like the reference's
 * CBOR-stored HLLs.
 *
 * These run under ObjectHashAggregateExec: buffers live per group in the
 * hash map, so the cores keep compact in-memory forms (sparse HLL map,
 * t-digest centroid arrays) and serialize small at shuffle boundaries.
 */
abstract class SketchAggBase[S] extends TypedImperativeAggregate[S] with ImplicitCastInputTypes {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
}

/** Mutable holder for the *_merge adoption buffer (null = unset). */
final class MergeBuf[T <: AnyRef](var v: T)

/**
 * Shared base for the *_merge aggregates. The buffer starts UNSET and
 * adopts the first input sketch it sees — its parameters included — so
 * sketches serialized with non-default parameters (e.g. cms_build at
 * depth=7, an HLL at non-(14,5) settings) merge correctly through SQL,
 * which has no way to parameterize the merge function. Mixing sketches of
 * DIFFERENT parameters within one group still errors, as it must
 * (mergeability only holds between equal-parameter sketches).
 */
abstract class SketchMergeAggBase[T <: AnyRef] extends SketchAggBase[MergeBuf[T]]
    with UnaryLike[Expression] {
  def child: Expression
  protected def parse(bytes: Array[Byte]): T
  protected def mergeCores(into: T, from: T): Unit
  protected def coreBytes(v: T): Array[Byte]
  /** Serialized empty sketch at this aggregate's default parameters — the
    * result for groups that saw no (non-null) input. */
  protected def emptySketchBytes: Array[Byte]

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def createAggregationBuffer(): MergeBuf[T] = new MergeBuf[T](null.asInstanceOf[T])
  private def absorb(buf: MergeBuf[T], core: T): Unit =
    if (buf.v == null) buf.v = core else mergeCores(buf.v, core)
  override def update(buf: MergeBuf[T], row: InternalRow): MergeBuf[T] = {
    val v = child.eval(row)
    if (v != null) absorb(buf, parse(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(a: MergeBuf[T], b: MergeBuf[T]): MergeBuf[T] = {
    if (b.v != null) absorb(a, b.v)
    a
  }
  override def eval(buf: MergeBuf[T]): Any =
    if (buf.v == null) emptySketchBytes else coreBytes(buf.v)
  override def serialize(buf: MergeBuf[T]): Array[Byte] =
    if (buf.v == null) Array.emptyByteArray else coreBytes(buf.v)
  override def deserialize(bytes: Array[Byte]): MergeBuf[T] =
    new MergeBuf[T](if (bytes.isEmpty) null.asInstanceOf[T] else parse(bytes))
}

// -------------------------------- HLL --------------------------------

/** hll_build(hash LONG) -> AK-spec sketch bytes. */
case class HllBuildAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAggBase[Hll] with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def prettyName: String = "hll_build"
  override def createAggregationBuffer(): Hll = Hll()
  override def update(buf: Hll, row: InternalRow): Hll = {
    val v = child.eval(row)
    if (v != null) buf.addRaw(v.asInstanceOf[Long])
    buf
  }
  override def merge(a: Hll, b: Hll): Hll = { a.union(b); a }
  override def eval(buf: Hll): Any = buf.toBytes
  override def serialize(buf: Hll): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Hll = Hll.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int): HllBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllBuildAgg = copy(child = c)
}

/** hll_merge(sketch BINARY) -> unioned sketch bytes (param adoption; strict
  * settings between inputs). */
case class HllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAggBase[Hll] {

  override def prettyName: String = "hll_merge"
  override protected def parse(bytes: Array[Byte]): Hll = Hll.fromBytes(bytes)
  override protected def mergeCores(into: Hll, from: Hll): Unit = into.union(from)
  override protected def coreBytes(v: Hll): Array[Byte] = v.toBytes
  override protected def emptySketchBytes: Array[Byte] = Hll().toBytes
  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllMergeAgg = copy(child = c)
}

// ------------------------------ Count-Min ------------------------------

/** cms_build(hash LONG, count LONG) -> CM sketch bytes. */
case class CmsBuildAgg(
    left: Expression,
    right: Expression,
    depth: Int = CountMin.DefaultDepth,
    width: Int = CountMin.DefaultWidth,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAggBase[CountMin] with BinaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def prettyName: String = "cms_build"
  override def createAggregationBuffer(): CountMin = new CountMin(depth, width)
  override def update(buf: CountMin, row: InternalRow): CountMin = {
    val h = left.eval(row)
    val c = right.eval(row)
    if (h != null && c != null) buf.update(h.asInstanceOf[Long], c.asInstanceOf[Long])
    buf
  }
  override def merge(a: CountMin, b: CountMin): CountMin = { a.merge(b); a }
  override def eval(buf: CountMin): Any = buf.toBytes
  override def serialize(buf: CountMin): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): CountMin = CountMin.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int): CmsBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsBuildAgg =
    copy(left = l, right = r)
}

/** cms_merge(sketch BINARY) -> element-wise-summed CM bytes (param
  * adoption). */
case class CmsMergeAgg(
    child: Expression,
    depth: Int = CountMin.DefaultDepth,
    width: Int = CountMin.DefaultWidth,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAggBase[CountMin] {

  override def prettyName: String = "cms_merge"
  override protected def parse(bytes: Array[Byte]): CountMin = CountMin.fromBytes(bytes)
  override protected def mergeCores(into: CountMin, from: CountMin): Unit = into.merge(from)
  override protected def coreBytes(v: CountMin): Array[Byte] = v.toBytes
  override protected def emptySketchBytes: Array[Byte] = new CountMin(depth, width).toBytes
  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsMergeAgg = copy(child = c)
}

// ------------------------------- Bloom -------------------------------

/** bloom_build(hash LONG) -> Bloom filter bytes. */
case class BloomBuildAgg(
    child: Expression,
    numHashes: Int = BloomFilter.DefaultHashes,
    log2Bits: Int = BloomFilter.DefaultLog2Bits,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAggBase[BloomFilter] with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def prettyName: String = "bloom_build"
  override def createAggregationBuffer(): BloomFilter = new BloomFilter(numHashes, log2Bits)
  override def update(buf: BloomFilter, row: InternalRow): BloomFilter = {
    val v = child.eval(row)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }
  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = { a.merge(b); a }
  override def eval(buf: BloomFilter): Any = buf.toBytes
  override def serialize(buf: BloomFilter): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): BloomFilter = BloomFilter.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomBuildAgg = copy(child = c)
}

/** bloom_merge(sketch BINARY) -> OR-merged Bloom bytes (param adoption). */
case class BloomMergeAgg(
    child: Expression,
    numHashes: Int = BloomFilter.DefaultHashes,
    log2Bits: Int = BloomFilter.DefaultLog2Bits,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAggBase[BloomFilter] {

  override def prettyName: String = "bloom_merge"
  override protected def parse(bytes: Array[Byte]): BloomFilter = BloomFilter.fromBytes(bytes)
  override protected def mergeCores(into: BloomFilter, from: BloomFilter): Unit = into.merge(from)
  override protected def coreBytes(v: BloomFilter): Array[Byte] = v.toBytes
  override protected def emptySketchBytes: Array[Byte] =
    new BloomFilter(numHashes, log2Bits).toBytes
  override def withNewMutableAggBufferOffset(o: Int): BloomMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomMergeAgg = copy(child = c)
}

// ------------------------------ t-digest ------------------------------

/** tdigest_build(x DOUBLE) -> t-digest bytes. */
case class TDigestBuildAgg(
    child: Expression,
    compression: Double = TDigest.DefaultCompression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAggBase[TDigest] with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def prettyName: String = "tdigest_build"
  override def createAggregationBuffer(): TDigest = new TDigest(compression)
  override def update(buf: TDigest, row: InternalRow): TDigest = {
    val v = child.eval(row)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }
  override def merge(a: TDigest, b: TDigest): TDigest = { a.merge(b); a }
  override def eval(buf: TDigest): Any = buf.toBytes
  override def serialize(buf: TDigest): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int): TDigestBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestBuildAgg = copy(child = c)
}

/** tdigest_merge(sketch BINARY) -> merged t-digest bytes (param adoption). */
case class TDigestMergeAgg(
    child: Expression,
    compression: Double = TDigest.DefaultCompression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAggBase[TDigest] {

  override def prettyName: String = "tdigest_merge"
  override protected def parse(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)
  override protected def mergeCores(into: TDigest, from: TDigest): Unit = into.merge(from)
  override protected def coreBytes(v: TDigest): Array[Byte] = v.toBytes
  override protected def emptySketchBytes: Array[Byte] = new TDigest(compression).toBytes
  override def withNewMutableAggBufferOffset(o: Int): TDigestMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestMergeAgg = copy(child = c)
}

// ---------------------------- vector sum ----------------------------

/** vec_sum(array<float|double>) -> array<double> element-wise sum — the
  * embedding-pooling / centroid-update primitive. One buffer per group
  * (dims doubles) instead of exploding dims rows per vector through the
  * shuffle; inputs of differing lengths sum over the shorter prefix. */
case class VecSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_sum requires array<float|double>, got ${other.catalogString}")
    }
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray
  override def update(buf: Array[Double], row: InternalRow): Array[Double] = {
    val v = child.eval(row)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = if (isFloat) {
      val f = arr.toFloatArray()
      val t = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { t(i) = f(i); i += 1 }
      t
    } else arr.toDoubleArray()
    merge(buf, d)
  }
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val (into, from) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < from.length) { into(i) += from(i); i += 1 }
    into
  }
  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)
  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }
  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VecSumAgg = copy(child = c)
}

// -------------------------------- KLL --------------------------------

/** kll_build(x DOUBLE) -> KLL sketch bytes. */
case class KllBuildAgg(
    child: Expression,
    k: Int = Kll.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAggBase[Kll] with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def prettyName: String = "kll_build"
  override def createAggregationBuffer(): Kll = new Kll(k)
  override def update(buf: Kll, row: InternalRow): Kll = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def merge(a: Kll, b: Kll): Kll = { a.merge(b); a }
  override def eval(buf: Kll): Any = buf.toBytes
  override def serialize(buf: Kll): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Kll = Kll.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KllBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllBuildAgg = copy(child = c)
}

/** kll_merge(sketch BINARY) -> merged KLL bytes (param adoption). */
case class KllMergeAgg(
    child: Expression,
    k: Int = Kll.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAggBase[Kll] {

  override def prettyName: String = "kll_merge"
  override protected def parse(bytes: Array[Byte]): Kll = Kll.fromBytes(bytes)
  override protected def mergeCores(into: Kll, from: Kll): Unit = into.merge(from)
  override protected def coreBytes(v: Kll): Array[Byte] = v.toBytes
  override protected def emptySketchBytes: Array[Byte] = new Kll(k).toBytes
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg = copy(child = c)
}

// -------------------------------- KMV --------------------------------

/** kmv_build(hash LONG) -> bottom-k distinct sketch bytes. */
case class KmvBuildAgg(
    child: Expression,
    k: Int = Kmv.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAggBase[Kmv] with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def prettyName: String = "kmv_build"
  override def createAggregationBuffer(): Kmv = new Kmv(k)
  override def update(buf: Kmv, row: InternalRow): Kmv = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }
  override def merge(a: Kmv, b: Kmv): Kmv = { a.merge(b); a }
  override def eval(buf: Kmv): Any = buf.toBytes
  override def serialize(buf: Kmv): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Kmv = Kmv.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KmvBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvBuildAgg = copy(child = c)
}

/** kmv_merge(sketch BINARY) -> bottom-k union bytes (param adoption;
  * lattice join — idempotent, safe to re-merge on replay). */
case class KmvMergeAgg(
    child: Expression,
    k: Int = Kmv.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAggBase[Kmv] {

  override def prettyName: String = "kmv_merge"
  override protected def parse(bytes: Array[Byte]): Kmv = Kmv.fromBytes(bytes)
  override protected def mergeCores(into: Kmv, from: Kmv): Unit = into.merge(from)
  override protected def coreBytes(v: Kmv): Array[Byte] = v.toBytes
  override protected def emptySketchBytes: Array[Byte] = new Kmv(k).toBytes
  override def withNewMutableAggBufferOffset(o: Int): KmvMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvMergeAgg = copy(child = c)
}

// ---------------------------- FreqItems ----------------------------

/** freq_build(hash LONG, weight LONG) -> Misra-Gries sketch bytes. */
case class FreqItemsBuildAgg(
    left: Expression,
    right: Expression,
    k: Int = FreqItems.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAggBase[FreqItems] with BinaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def prettyName: String = "freq_build"
  override def createAggregationBuffer(): FreqItems = new FreqItems(k)
  override def update(buf: FreqItems, row: InternalRow): FreqItems = {
    val h = left.eval(row)
    val w = right.eval(row)
    if (h != null && w != null) buf.update(h.asInstanceOf[Long], w.asInstanceOf[Long])
    buf
  }
  override def merge(a: FreqItems, b: FreqItems): FreqItems = { a.merge(b); a }
  override def eval(buf: FreqItems): Any = buf.toBytes
  override def serialize(buf: FreqItems): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): FreqItems = FreqItems.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int): FreqItemsBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FreqItemsBuildAgg =
    copy(left = l, right = r)
}

/** freq_merge(sketch BINARY) -> merged Misra-Gries bytes (param adoption;
  * contents may depend on merge order, the error bounds never do). */
case class FreqItemsMergeAgg(
    child: Expression,
    k: Int = FreqItems.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAggBase[FreqItems] {

  override def prettyName: String = "freq_merge"
  override protected def parse(bytes: Array[Byte]): FreqItems = FreqItems.fromBytes(bytes)
  override protected def mergeCores(into: FreqItems, from: FreqItems): Unit = into.merge(from)
  override protected def coreBytes(v: FreqItems): Array[Byte] = v.toBytes
  override protected def emptySketchBytes: Array[Byte] = new FreqItems(k).toBytes
  override def withNewMutableAggBufferOffset(o: Int): FreqItemsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsMergeAgg = copy(child = c)
}
