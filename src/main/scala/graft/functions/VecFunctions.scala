package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native vector kernels for the embedding operators (`embeddings.embedding`
 * is `array<float>`).
 *
 * [[CosineF]] is a codegen'd Catalyst `BinaryExpression` replacing the
 * `aggregate(zip_with(...))` higher-order-function formulation: HOFs build a
 * boxed intermediate array per row-pair, which dominates the label-blocked
 * near-dup scan (O(pairs) allocations). The kernel reads both `ArrayData`
 * buffers in one fused loop with three double accumulators, in the SAME
 * per-accumulator fold order as the HOF version — bit-identical doubles, so
 * `round(x, 6)` oracle comparisons are unaffected.
 */
object VecFunctions {

  /** Fused cosine over two float arrays; double accumulation. Codegen target. */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic hyperplanes: [table][bit][dim] from a seeded Gaussian. */
  def hyperplanes(nTables: Int, nBits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] =
    Array.tabulate(nTables) { t =>
      val rnd = new java.util.Random(seed + t)
      Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
    }

  /** Per-table sign-of-dot bucket signatures for one vector. Codegen target. */
  def bucketsFor(v: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var sig = 0
      var b = 0
      while (b < table.length) {
        val p = table(b)
        var d = 0.0
        var i = 0
        val lim = math.min(p.length, n)
        while (i < lim) { d += p(i) * v.getFloat(i); i += 1 }
        if (d >= 0) sig |= (1 << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** IVF coarse-quantizer centroids: same seeded-Gaussian generator as the
    * LSH hyperplanes, different seed family. */
  def ivfCentroids(nCells: Int, dim: Int, seed: Long): Array[Array[Double]] =
    hyperplanes(1, nCells, dim, seed)(0)

  /**
   * The `nProbe` IVF cells nearest to `v` by cosine (rounded to 6 dp before
   * ranking so cell assignment is engine-portable: the SQL oracle ranks
   * round(list_cosine_similarity(centroid, vec), 6) identically), ties by
   * cell id. Per-accumulator fold order matches [[cosineFloat]] /
   * list_cosine_similarity, so the rounded values are bit-identical.
   */
  def ivfCellsFor(v: ArrayData, cents: Array[Array[Double]], nProbe: Int): ArrayData = {
    val n = v.numElements()
    val k = cents.length
    var nb = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; nb += x * x; i += 1 }
    val nbs = math.sqrt(nb)
    val cos = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ct = cents(c)
      var dot = 0.0; var na = 0.0
      var j = 0
      val lim = math.min(ct.length, n)
      while (j < lim) { dot += ct(j) * v.getFloat(j); na += ct(j) * ct(j); j += 1 }
      cos(c) = math.rint(dot / (math.sqrt(na) * nbs) * 1e6) / 1e6
      c += 1
    }
    val out = new Array[Int](math.min(nProbe, k))
    val used = new Array[Boolean](k)
    var p = 0
    while (p < out.length) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) && (best < 0 || cos(c2) > cos(best))) best = c2
        c2 += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /**
   * Round-6 cosine of two double arrays with EXACTLY the arithmetic of
   * [[ivfCellsFor]] (fold order, `dot / (sqrt(na) * sqrt(nb))` grouping,
   * `math.rint` scaling) — the driver-side kernel for IVF quantizer
   * training, bit-identical to DuckDB's
   * `round(list_cosine_similarity(a, b), 6)` so the trained centroids (and
   * therefore every cell assignment) reproduce in the SQL oracle.
   */
  def cosineRound6(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
  }

  /**
   * Round-6 SQUARED Euclidean distance via the dot-product identity
   * `d² = a·a − 2·a·b + b·b`, each dot a sequential fold — chosen over the
   * direct `Σ(aᵢ−bᵢ)²` because `list_dot_product` is the DuckDB kernel with
   * PROVEN bit-parity to a Scala sequential fold, so the oracle expression
   * `round(list_dot_product(a,a) - 2*list_dot_product(a,b) +
   * list_dot_product(b,b), 6)` reproduces this value exactly (same
   * left-associated `−`/`+` grouping, each op exactly rounded). The PQ
   * training/encode/ADC kernels all rank on this. Argument order is pinned:
   * centroid FIRST, everywhere, in both engines.
   */
  def d2Round6(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var daa = 0.0; var dab = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) { daa += a(i) * a(i); dab += a(i) * b(i); dbb += b(i) * b(i); i += 1 }
    math.rint((daa - 2.0 * dab + dbb) * 1e6) / 1e6
  }

  /**
   * Product-quantization codes: for each of the `codebooks.length` blocks,
   * the index of the sub-codebook centroid nearest (round-6 squared L2,
   * ties to the lowest code) to the vector's sub-block. Fold order and
   * rounding mirror [[d2Round6]] exactly; `dbb` (the sub-vector's own
   * self-dot) is computed once per block — folds are independent, so the
   * factoring is bit-identical to per-centroid recomputation.
   */
  def pqCodesFor(v: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val blocks = codebooks.length
    val out = new Array[Int](blocks)
    var m = 0
    var off = 0
    while (m < blocks) {
      val cb = codebooks(m)
      val sub = cb(0).length
      var dbb = 0.0
      var j = 0
      while (j < sub) { val x = v.getFloat(off + j).toDouble; dbb += x * x; j += 1 }
      var best = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < cb.length) {
        val ct = cb(k)
        var daa = 0.0; var dab = 0.0
        j = 0
        while (j < sub) {
          daa += ct(j) * ct(j)
          dab += ct(j) * v.getFloat(off + j)
          j += 1
        }
        val d = math.rint((daa - 2.0 * dab + dbb) * 1e6) / 1e6
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(m) = best
      off += sub
      m += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  private val eu = org.apache.spark.sql.graftbridge.ColumnBridge

  /** Cosine similarity of two `array<float>` columns — native, codegen'd. */
  def cosine_f(a: Column, b: Column): Column =
    eu.column(CosineF(eu.expression(a), eu.expression(b)))

  /** nTables hyperplane-LSH bucket ids for an `array<float>` column. */
  def lsh_buckets(v: Column, nTables: Int, nBits: Int, dim: Int, seed: Long = 42L): Column =
    eu.column(HyperplaneBuckets(eu.expression(v), nTables, nBits, dim, seed))

  /** The nProbe nearest IVF cell ids for an `array<float>` column — native, codegen'd. */
  def ivf_cells(v: Column, nCells: Int, nProbe: Int, dim: Int, seed: Long): Column =
    eu.column(IvfCells(eu.expression(v), nCells, nProbe, dim, seed))

  /** Same, against EXPLICIT (trained) centroids instead of seeded ones. */
  def ivf_cells_trained(v: Column, cents: Seq[Seq[Double]], nProbe: Int): Column =
    eu.column(IvfCellsTrained(eu.expression(v), cents, nProbe))

  /** Per-block PQ code assignment for an `array<float>` column — native, codegen'd. */
  def pq_codes(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    eu.column(PqCodes(eu.expression(v), codebooks))
}

/** Cosine similarity of two float-array columns — native codegen'd expression. */
case class CosineF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecFunctions.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecFunctions.cosineFloat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineF =
    copy(left = l, right = r)
}

/**
 * Hyperplane-LSH bucket signatures of a float-array column — native codegen'd
 * expression. Replaces a Scala UDF that measured ~60x slower than the raw
 * kernel (Spark 4 ScalaUDF Seq conversion per call), which dominated the ANN
 * query because Catalyst re-evaluates the projection in the generator's
 * null/empty Filter guard.
 */
/**
 * Nearest-IVF-cells of a float-array column (coarse quantizer for the IVF
 * ANN path) — native codegen'd expression, same shape and rationale as
 * [[HyperplaneBuckets]] (a ScalaUDF here pays ~0.85 ms/call conversion and
 * is re-evaluated by the generator null-guard).
 */
case class IvfCells(child: Expression, nCells: Int, nProbe: Int, dim: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val cents: Array[Array[Double]] =
    VecFunctions.ivfCentroids(nCells, dim, seed)
  override protected def nullSafeEval(v: Any): Any =
    VecFunctions.ivfCellsFor(v.asInstanceOf[ArrayData], cents, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecFunctions.ivfCellsFor($c, $ref, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfCells =
    copy(child = newChild)
}

/**
 * [[IvfCells]] with an explicit centroid table — the TRAINED coarse
 * quantizer (k-means over a corpus sample, [[graft.ops.Ann.trainIvfCentroids]])
 * instead of seeded Gaussians. Centroids are a `Seq[Seq[Double]]` so the
 * expression stays a value-comparable case class; the array form is
 * memoized for the kernel.
 */
case class IvfCellsTrained(child: Expression, cents: Seq[Seq[Double]], nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  override protected def nullSafeEval(v: Any): Any =
    VecFunctions.ivfCellsFor(v.asInstanceOf[ArrayData], centArr, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", centArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecFunctions.ivfCellsFor($c, $ref, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfCellsTrained =
    copy(child = newChild)
}

/** Product-quantization encode against an explicit per-block codebook table
  * ([[graft.ops.Pq.trainCodebooks]]) — nearest sub-centroid per block by
  * round-6 squared L2, ties to the lowest code. Seq form keeps the
  * expression a value-comparable case class; the array form is memoized. */
case class PqCodes(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  override protected def nullSafeEval(v: Any): Any =
    VecFunctions.pqCodesFor(v.asInstanceOf[ArrayData], cbArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", cbArr, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecFunctions.pqCodesFor($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

case class HyperplaneBuckets(child: Expression, nTables: Int, nBits: Int, dim: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val planes: Array[Array[Array[Double]]] =
    VecFunctions.hyperplanes(nTables, nBits, dim, seed)
  override protected def nullSafeEval(v: Any): Any =
    VecFunctions.bucketsFor(v.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecFunctions.bucketsFor($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}
