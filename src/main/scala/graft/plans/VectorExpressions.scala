package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ArrayDoubleBinaryExpression, ArrayDoubleUnaryExpression, Bridge}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the ANN/dedup hot path: dot product
  * of two array<double> columns without materializing the intermediate
  * array that zip_with + aggregate would allocate per row. Generated
  * code is a tight primitive loop inside whole-stage codegen.
  *
  * Declares array<double> input types (via ImplicitCastInputTypes), so
  * SQL-registered calls get analysis-time coercion — array<float> is
  * cast, strings fail analysis — instead of reading garbage at
  * runtime. A NULL element in either array, or a length mismatch,
  * nulls the result — matching the zip_with + aggregate SQL this
  * replaces (zip_with pads the shorter array with NULLs), so a
  * truncated embedding surfaces as NULL instead of a plausible
  * partial-sum score.
  */
case class DotProduct(left: Expression, right: Expression)
    extends ArrayDoubleBinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native L2-normalize for array<double> columns — replaces the
  * `transform(a, x -> x / sqrt(aggregate(zip_with(a, a, *), ...)))`
  * higher-order-function tree, which Spark evaluates INTERPRETED with
  * per-element copies and re-evaluates the norm subtree per element
  * (measured ~100× slower for comparable per-row loops, SURVEY.md §5).
  * Sits in the scan path of every ANN operator and the embedding
  * dedup, so it must stay inside whole-stage codegen.
  *
  * Floating-point contract matches the HOF chain it replaces (and the
  * DuckDB oracle): sum of squares accumulated in element order, one
  * sqrt, then per-element division by the norm — bit-identical
  * results. A NULL element nulls the whole result (the HOF version
  * produced an array of NULLs; all-or-nothing is the saner contract
  * and the oracle tables carry no NULL elements). A zero vector yields
  * IEEE NaNs, same as the division it replaces.
  */
case class L2Normalize(child: Expression) extends ArrayDoubleUnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      out(i) = x
      s += x * x
      i += 1
    }
    val norm = java.lang.Math.sqrt(s)
    i = 0
    while (i < n) { out(i) = out(i) / norm; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val vals = ctx.freshName("vals")
      val norm = ctx.freshName("norm")
      s"""
         |int $n = $a.numElements();
         |double[] $vals = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = $a.getDouble($i);
         |  $vals[$i] = $x;
         |  $s += $x * $x;
         |}
         |if (!${ev.isNull}) {
         |  double $norm = java.lang.Math.sqrt($s);
         |  for (int $i = 0; $i < $n; $i++) { $vals[$i] = $vals[$i] / $norm; }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($vals);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native nearest-centroid assignment — the N×K ANN/dedup build pass
  * (SURVEY's named residual ANN cost), previously a per-row ScalaUDF
  * with Seq boxing and catalyst↔scala conversion per vector. The
  * codebook travels as a FLAT primitive double[] (K·dim,
  * row-major) reference object into generated code; the row vector is
  * copied once to a local double[] and scanned K times — a tight
  * two-level primitive loop inside whole-stage codegen, no allocation
  * beyond the one local copy.
  *
  * BIT-EXACT contract with the ScalaUDF it replaces (oracle replays
  * are pinned on it, spec-asserted at every graded SF): dots
  * accumulate in element order, `s > bestDot` with first-index
  * tie-break (IEEE >, so a NaN dot never wins and ±0.0 ties keep the
  * earlier index). Vectors shorter than `dim` dot over their own
  * length (the UDF's loop bound); a NULL element nulls the result
  * (the corpus never carries one — same all-or-nothing rule as
  * [[DotProduct]]).
  */
case class NearestCentroid(child: Expression, centroids: Array[Double],
    dim: Int) extends ArrayDoubleUnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_nearest"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = if (n < dim) n else dim
    val v = new Array[Double](m)
    var i = 0
    while (i < m) {
      if (a.isNullAt(i)) return null
      v(i) = a.getDouble(i)
      i += 1
    }
    val k = centroids.length / dim
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var s = 0.0
      val off = c * dim
      i = 0
      while (i < m) { s += v(i) * centroids(off + i); i += 1 }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("graftCentroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot")
      val k = centroids.length / dim
      s"""
         |int $n = $a.numElements();
         |int $m = $n < $dim ? $n : $dim;
         |double[] $v = new double[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $v[$i] = $a.getDouble($i);
         |}
         |int $best = 0;
         |if (!${ev.isNull}) {
         |  double $bestDot = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $s = 0.0;
         |    int $off = $c * $dim;
         |    for (int $i = 0; $i < $m; $i++) { $s += $v[$i] * $cs[$off + $i]; }
         |    if ($s > $bestDot) { $bestDot = $s; $best = $c; }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native nProbe-nearest-centroid list — [[NearestCentroid]]'s probe
  * sibling, replacing the query-side ScalaUDF that sorted a boxed
  * (−dot, index) tuple Seq per row. Selection replays the UDF's
  * `sorted.take(nProbe)` ordering EXACTLY via repeated minimum of the
  * negated dots under java.lang.Double.compare (so −0.0/0.0 and NaN
  * order as the tuple sort did, index ascending on ties) — an
  * O(K·nProbe) scan over a primitive array, allocation-free beyond
  * the per-row locals. nProbe is query-side-small by contract, so the
  * quadratic term is bounded (nProbe ≤ K, both driver-chosen).
  */
case class ProbeCentroids(child: Expression, centroids: Array[Double],
    dim: Int, nProbe: Int) extends ArrayDoubleUnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_probes"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = if (n < dim) n else dim
    val v = new Array[Double](m)
    var i = 0
    while (i < m) {
      if (a.isNullAt(i)) return null
      v(i) = a.getDouble(i)
      i += 1
    }
    val k = centroids.length / dim
    val neg = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0
      val off = c * dim
      i = 0
      while (i < m) { s += v(i) * centroids(off + i); i += 1 }
      neg(c) = -s
      c += 1
    }
    val take = if (nProbe < k) nProbe else k
    val out = new Array[Int](take)
    val used = new Array[Boolean](k)
    var slot = 0
    while (slot < take) {
      var bc = -1
      c = 0
      while (c < k) {
        if (!used(c) && (bc < 0 || java.lang.Double.compare(neg(c), neg(bc)) < 0))
          bc = c
        c += 1
      }
      used(bc) = true
      out(slot) = bc
      slot += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("graftCentroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val neg = ctx.freshName("neg")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val slot = ctx.freshName("slot")
      val bc = ctx.freshName("bc")
      val k = centroids.length / dim
      val take = if (nProbe < k) nProbe else k
      s"""
         |int $n = $a.numElements();
         |int $m = $n < $dim ? $n : $dim;
         |double[] $v = new double[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $v[$i] = $a.getDouble($i);
         |}
         |if (!${ev.isNull}) {
         |  double[] $neg = new double[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $s = 0.0;
         |    int $off = $c * $dim;
         |    for (int $i = 0; $i < $m; $i++) { $s += $v[$i] * $cs[$off + $i]; }
         |    $neg[$c] = -$s;
         |  }
         |  boolean[] $used = new boolean[$k];
         |  int[] $out = new int[$take];
         |  for (int $slot = 0; $slot < $take; $slot++) {
         |    int $bc = -1;
         |    for (int $c = 0; $c < $k; $c++) {
         |      if (!$used[$c] && ($bc < 0 ||
         |          java.lang.Double.compare($neg[$c], $neg[$bc]) < 0)) $bc = $c;
         |    }
         |    $used[$bc] = true;
         |    $out[$slot] = $bc;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** In-cell nearest sub-centroid — the second level of the two-level
  * coarse quantizer (round-11): `books` holds k1·k2 sub-centroids
  * row-major by (cell, sub); a row assigned to coarse cell c scans
  * ONLY its cell's k2 sub-books, so the full assignment costs
  * N·(k1 + k2) dots instead of N·(k1·k2) — the factorization that
  * lifts the list count past the flat cap without the flat cost.
  * Same dot/tie contract as [[NearestCentroid]] (element order,
  * strict >, first index wins). A cell id outside [0, k1) nulls the
  * result (it cannot occur from a composed assignment; conservative
  * over garbage).
  */
case class NearestInCell(left: Expression, right: Expression,
    books: Array[Double], dim: Int, k2: Int)
    extends org.apache.spark.sql.graftbridge.ArrayDoubleIntBinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_nearest_in_cell"

  override protected def nullSafeEval(input: Any, cellAny: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val cell = cellAny.asInstanceOf[Int]
    if (cell < 0 || (cell + 1) * k2 * dim > books.length) return null
    val n = a.numElements()
    val m = if (n < dim) n else dim
    val v = new Array[Double](m)
    var i = 0
    while (i < m) {
      if (a.isNullAt(i)) return null
      v(i) = a.getDouble(i)
      i += 1
    }
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k2) {
      var s = 0.0
      val off = (cell * k2 + c) * dim
      i = 0
      while (i < m) { s += v(i) * books(off + i); i += 1 }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bk = ctx.addReferenceObj("graftSubBooks", books, "double[]")
    nullSafeCodeGen(ctx, ev, (a, cell) => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot")
      s"""
         |int $best = 0;
         |if ($cell < 0 || ($cell + 1) * $k2 * $dim > ${books.length}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  int $m = $n < $dim ? $n : $dim;
         |  double[] $v = new double[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $v[$i] = $a.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    double $bestDot = Double.NEGATIVE_INFINITY;
         |    for (int $c = 0; $c < $k2; $c++) {
         |      double $s = 0.0;
         |      int $off = ($cell * $k2 + $c) * $dim;
         |      for (int $i = 0; $i < $m; $i++) { $s += $v[$i] * $bk[$off + $i]; }
         |      if ($s > $bestDot) { $bestDot = $s; $best = $c; }
         |    }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column API for [[DotProduct]]; inputs are cast to array<double>. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  /** Column API for [[L2Normalize]]; input is cast to array<double>. */
  def normalizeNative(a: Column): Column =
    Bridge.column(L2Normalize(Bridge.expression(a.cast("array<double>"))))

  private def flat(cs: Array[Array[Double]]): (Array[Double], Int) = {
    val dim = cs(0).length
    val f = new Array[Double](cs.length * dim)
    var c = 0
    while (c < cs.length) {
      System.arraycopy(cs(c), 0, f, c * dim, dim)
      c += 1
    }
    (f, dim)
  }

  /** Column API for [[NearestCentroid]] over a per-row array<double>. */
  def nearestNative(a: Column, cs: Array[Array[Double]]): Column = {
    val (f, dim) = flat(cs)
    Bridge.column(NearestCentroid(
      Bridge.expression(a.cast("array<double>")), f, dim))
  }

  /** Column API for [[ProbeCentroids]] over a per-row array<double>. */
  def probesNative(a: Column, cs: Array[Array[Double]], nProbe: Int): Column = {
    val (f, dim) = flat(cs)
    Bridge.column(ProbeCentroids(
      Bridge.expression(a.cast("array<double>")), f, dim, nProbe))
  }

  /** Column API for [[NearestInCell]]: the sub-index of the nearest
    * sub-centroid within `cell`'s slice of the flat `books`.
    */
  def nearestInCellNative(a: Column, cell: Column, books: Array[Double],
      dim: Int, k2: Int): Column =
    Bridge.column(NearestInCell(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(cell.cast("int")), books, dim, k2))
}
