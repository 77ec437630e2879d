package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and whole-stage-generated
  * code. MUST stay a TOP-LEVEL object: Scala then emits a plain class
  * `graft.functions.Kernels` with static forwarder methods, which Janino
  * can resolve as `graft.functions.Kernels.cosine(a, b)`. A nested
  * object compiles to `Outer$Kernels$`, which Janino cannot reach via a
  * dotted path — generated code fails to compile and Spark silently
  * falls back to interpreted execution (~5× slower on the d2/d3 paths).
  *
  * Returns NaN as the "undefined" sentinel (zero-norm input,
  * length-mismatched vectors, or NaN elements), mapped to SQL NULL by
  * the expression — matching the zip_with/fold formulation in
  * VectorFunctions and the DuckDB oracle, which also yield NULL on
  * malformed input.
  */
object Kernels {
  def cosine(ad: Any, bd: Any): Double = {
    val a = ad.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = bd.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    i = 0
    while (i < n) { val y = b.getFloat(i).toDouble; nb += y * y; i += 1 }
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) Double.NaN
    else dot / (sa * sb)
  }

  /** Scalar int8 quantization of a float vector: L2-normalize (same
    * left-to-right accumulation as [[cosine]]'s norm) and code each
    * component as clamp(floor(v/norm * 127.0), -127, 127). Every step
    * is one IEEE double op in a fixed order, so an external engine
    * reproduces the codes bit for bit. Returns null for a zero-norm
    * vector (no direction to encode). The byte codes are the point:
    * 1/4 the scan bytes of float32. */
  def int8Quantize(ad: Any): Array[Byte] = {
    val a = ad.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    var na = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    val norm = math.sqrt(na)
    if (norm == 0.0) return null
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      val q = math.floor(a.getFloat(i).toDouble / norm * 127.0)
      val c = if (q < -127.0) -127.0 else if (q > 127.0) 127.0 else q
      out(i) = c.toByte
      i += 1
    }
    out
  }

  /** Product-quantization encoder: per subspace j of `m`, the argmin-L2
    * centroid cell (ties → the smaller cell id — the array_min struct
    * order; `cents` arrives sorted by cell, so first-strict-win
    * iteration implements it). Each subspace distance is the SAME IEEE
    * sequence as the columnar `aggregate(zip_with(slice,slice))` fold
    * and its DuckDB `list_reduce` twin — 0.0-seeded left fold of
    * (float→double diff)² in element order — so codes stay bit-exactly
    * oracle-replicable; this kernel only removes the per-element
    * boxing and per-centroid slice allocation of the HOF form
    * (d3h measured 2.0 s → 0.94 s min-of-3 at sf0.1; the remainder is
    * the ranking windows + rescore, not encode). Null when
    * the vector is shorter than m×subDim (the HOF form would silently
    * rank truncated slices). */
  def pqEncode(vd: Any, cd: Any, m: Int, subDim: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val v = vd.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val cents = cd.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (v.numElements() < m * subDim) return null
    val ks = cents.numElements()
    if (ks == 0) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * subDim
      var bestD = Double.PositiveInfinity
      var bestCell = Int.MaxValue
      var c = 0
      while (c < ks) {
        val row = cents.getStruct(c, 2)
        val cv = row.getArray(1)
        if (cv.numElements() >= off + subDim) {
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val diff = v.getFloat(off + i).toDouble -
              cv.getFloat(off + i).toDouble
            d += diff * diff
            i += 1
          }
          val cell = row.getInt(0)
          if (d < bestD || (d == bestD && cell < bestCell)) {
            bestD = d; bestCell = cell
          }
        }
        c += 1
      }
      if (bestCell == Int.MaxValue) return null
      out(j) = bestCell
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Two-level coarse-then-fine argmax assignment — the semantic-dedup
    * production quantizer's hot loop ([[graft.operators.Dedup.semanticDedupTwoLevel]])
    * as ONE primitive-loop kernel. The HOF formulation (array_sort +
    * slice + flatten + element_at + array_max over structs) evaluates
    * interpreted with per-element boxing — this kernel does the same
    * work on raw ArrayData/MapData and replicates its ORDERING
    * semantics exactly, so the d33f exhaustive-equality contract is
    * preserved:
    *  - probe selection = top `nprobe` coarse cells by (cos DESC,
    *    ccell ASC);
    *  - candidates = the probed cells' fine members (MapData lookup —
    *    linear key scan; MapData is not hashed, and ncoarse int
    *    compares per probe are noise next to the cosines saved) PLUS
    *    the probed coarse centroids themselves (non-empty guarantee);
    *  - winner = (cos DESC, cell ASC);
    *  - double comparisons follow Spark's total order (NaN greatest,
    *    ±0.0 equal — normalized before compare), matching what the
    *    struct sort/argmax did.
    * Returns null only for an empty coarse array.
    *
    * @param cd coarse: ArrayData of struct(ccell: Int, cv: Array[Float])
    * @param md finemap: MapData ccell -> ArrayData of struct(cell, cv)
    */
  def twoLevelAssign(vd: Any, cd: Any, md: Any, nprobe: Int): Any = {
    import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
    val coarse = cd.asInstanceOf[ArrayData]
    val map = md.asInstanceOf[MapData]
    val nc = coarse.numElements()
    if (nc == 0 || nprobe < 1) return null
    def norm(c: Double): Double = if (c == 0.0) 0.0 else c // -0.0 -> +0.0
    // cosines against every coarse centroid (the O(ncoarse) half)
    val cosArr = new Array[Double](nc)
    val cellArr = new Array[Int](nc)
    var i = 0
    while (i < nc) {
      val row = coarse.getStruct(i, 2)
      cellArr(i) = row.getInt(0)
      cosArr(i) = norm(cosine(vd, row.getArray(1)))
      i += 1
    }
    // select top-nprobe by (cos desc, ccell asc): repeated max scan —
    // nprobe * ncoarse compares, negligible next to the cosines
    val p = math.min(nprobe, nc)
    val taken = new Array[Boolean](nc)
    var k = 0
    val probeIdx = new Array[Int](p)
    while (k < p) {
      var bi = -1; var bc = 0.0; var bl = 0
      i = 0
      while (i < nc) {
        if (!taken(i)) {
          val cmp =
            if (bi < 0) 1
            else {
              val dc = java.lang.Double.compare(cosArr(i), bc)
              if (dc != 0) dc else Integer.compare(bl, cellArr(i))
            }
          if (cmp > 0) { bi = i; bc = cosArr(i); bl = cellArr(i) }
        }
        i += 1
      }
      taken(bi) = true
      probeIdx(k) = bi
      k += 1
    }
    // argmax over the probed cells' members + the probed centroids
    var haveBest = false
    var bCos = 0.0
    var bCell = 0
    def consider(cell: Int, cos: Double): Unit = {
      val c = norm(cos)
      val better =
        if (!haveBest) true
        else {
          val dc = java.lang.Double.compare(c, bCos)
          dc > 0 || (dc == 0 && cell < bCell)
        }
      if (better) { haveBest = true; bCos = c; bCell = cell }
    }
    val keys = map.keyArray()
    val vals = map.valueArray()
    val nm = map.numElements()
    k = 0
    while (k < p) {
      val ci = probeIdx(k)
      val ccell = cellArr(ci)
      // the probed coarse centroid stands in as its own cell's candidate
      consider(ccell, cosArr(ci))
      var mi = 0
      var found = -1
      while (found < 0 && mi < nm) {
        if (keys.getInt(mi) == ccell) found = mi
        mi += 1
      }
      if (found >= 0) {
        val members = vals.getArray(found)
        val nMem = members.numElements()
        var j = 0
        while (j < nMem) {
          val m = members.getStruct(j, 2)
          consider(m.getInt(0), cosine(vd, m.getArray(1)))
          j += 1
        }
      }
      k += 1
    }
    Integer.valueOf(bCell)
  }

  /** Integer dot product of two int8 code vectors — exact int64
    * arithmetic, no FP anywhere. Long.MinValue is the length-mismatch
    * sentinel (mapped to SQL NULL by the expression). */
  def int8Dot(ad: Any, bd: Any): Long = {
    val a = ad.asInstanceOf[Array[Byte]]
    val b = bd.asInstanceOf[Array[Byte]]
    if (a.length != b.length) return Long.MinValue
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }
}

/** Native Catalyst expressions for the hot sketching paths.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
  * evaluate interpreted (CodegenFallback) with per-element boxing; a
  * MinHash signature expressed through them costs ~1 ms/row. These
  * expressions do the same math in one tight eval loop — measured ~10×
  * faster — while staying pure expressions (distributed, no UDF
  * registration, usable in any DataFrame).
  *
  * (The reference has no sketching at all — SURVEY.md §2b — these back
  * the north-star near-dup operators D2/D2b.)
  */
object NativeExpressions {

  /** Tokenize per TextFunctions.tokens semantics: maximal [a-z0-9]+ runs
    * of the lowercased text. Tight char loop, no regex. */
  private[functions] def tokenizeLower(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < n) {
      val c = Character.toLowerCase(s.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  private def xxh64(bytes: Array[Byte], seed: Long): Long =
    XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, seed)

  /** MinHash signature: sig[i] = min over word-k-shingles of the i-th
    * hash of the shingle. Hash family via Kirsch–Mitzenmacher double
    * hashing — h_i(s) = a(s) + i·b(s) (wrapping) from two xxhash64 base
    * hashes — so each shingle costs 2 hash evaluations instead of
    * numHashes (measured ~2× on the d2 headline at 128 hashes). K-M
    * preserves the estimator: pairwise agreement of h_i still tracks
    * shingle-set Jaccard (same guarantee bloom filters rely on), and the
    * d2 oracle's recall argument depends only on banding miss
    * probability, which the spec re-checks empirically. */
  case class MinHashSigExpr(child: Expression, shingleK: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenizeLower(input.asInstanceOf[UTF8String].toString)
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i + shingleK <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < shingleK) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val a = xxh64(bytes, 0L)
        val b = xxh64(bytes, 1L) | 1L // odd → i·b cycles all 2^64 residues
        var h = 0
        var v = a
        while (h < numHashes) {
          if (v < mins(h)) mins(h) = v
          v += b
          h += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "minhash_sig"
  }

  /** Portable 62-bit token hash backing SimHashExpr: two independent
    * polynomial hashes over the token's characters —
    * h1 = fold((h*131 + c) mod (2^31-1)), h2 = fold((h*137 + c) mod
    * (2^31-19)) — packed as (h1 << 31) | h2. Bits 62-63 are always
    * zero. Like FingerprintExpr, chosen over xxhash64 so the DuckDB
    * oracle can recompute the identical hash with list_reduce
    * (CORRECTNESS gate); intermediates stay < 2^39, no wrap. */
  private[functions] def portableTokenHash(t: String): Long = {
    var h1 = 0L
    var h2 = 0L
    var j = 0
    while (j < t.length) {
      val c = t.charAt(j).toLong
      h1 = (h1 * 131L + c) % 2147483647L
      h2 = (h2 * 137L + c) % 2147483629L
      j += 1
    }
    (h1 << 31) | h2
  }

  /** [[portableTokenHash]] as a scalar expression over an arbitrary
    * string — the hash-pair source for Kirsch–Mitzenmacher families
    * (Count-Min rows in [[graft.operators.Sketches]]): h1 = bits 31-61,
    * h2 = bits 0-30, both non-negative. Oracle-replicable with two
    * list_reduce folds, like the SimHash oracle. */
  case class TokenHash62Expr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        portableTokenHash(input.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "token_hash62"
  }

  /** SimHash over word tokens: bit j (j < 62) set iff the sum over
    * tokens of ±1 (bit j of portableTokenHash(token)) is positive; bits
    * 62-63 always zero, so 16-bit chunk banding still applies (the top
    * chunk just carries 14 informative bits). */
  case class SimHashExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenizeLower(input.asInstanceOf[UTF8String].toString)
      val counts = new Array[Int](62)
      var i = 0
      while (i < toks.length) {
        val h = portableTokenHash(toks(i))
        var j = 0
        while (j < 62) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < 62) {
        if (counts(j) > 0) sig |= (1L << j)
        j += 1
      }
      java.lang.Long.valueOf(sig)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "simhash64"
  }

  /** Plane-component generator for HyperplaneSigExpr: xxhash64 of
    * (plane, dim, seed) → uniform in [-1, 1). Public because the
    * hyperplane matrix is a data-independent deterministic constant:
    * the DuckDB oracle for the LSH queries embeds the identical matrix
    * as SQL literals (NorthStarQueries.planesLiteral), making the
    * banding predicate exactly replicable cross-engine. */
  def hyperplaneComponent(plane: Int, dim: Int, seed: Int): Double = {
    val buf = java.nio.ByteBuffer.allocate(12)
      .putInt(plane).putInt(dim).putInt(seed).array()
    val h = xxh64(buf, 7L)
    (math.floorMod(h, 2000001L).toDouble / 1000000.0) - 1.0
  }

  /** Random-hyperplane signature for cosine LSH: bit b = sign of
    * dot(vec, plane_b), plane components derived from xxhash64 of
    * (b, dim, seed) → uniform in [-1, 1). */
  case class HyperplaneSigExpr(child: Expression, numBits: Int, seed: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    private def component(plane: Int, dim: Int): Double =
      hyperplaneComponent(plane, dim, seed)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val dim = arr.numElements()
      val vec = new Array[Double](dim)
      var d = 0
      while (d < dim) { vec(d) = arr.getFloat(d).toDouble; d += 1 }
      val bits = new Array[Int](numBits)
      var b = 0
      while (b < numBits) {
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += vec(i) * component(b, i); i += 1 }
        bits(b) = if (dot >= 0.0) 1 else 0
        b += 1
      }
      new GenericArrayData(bits)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "hyperplane_sig"
  }

  /** 64-bit-safe rolling document fingerprint, portable across engines:
    * h = (h * 131 + codepoint) mod (2^31 - 1) folded over the characters
    * of the space-joined token stream (same tokenizer as MinHashSigExpr:
    * maximal [a-z0-9]+ runs of the lowercased text). Order-sensitive and
    * whitespace-insensitive; intermediates stay < 2^39 so plain long
    * arithmetic never wraps. Chosen over an xxhash chain so the DuckDB
    * oracle can replicate it with list_reduce (CORRECTNESS gate). */
  case class FingerprintExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenizeLower(input.asInstanceOf[UTF8String].toString)
      var h = 0L
      var i = 0
      while (i < toks.length) {
        if (i > 0) h = (h * 131L + 32L) % 2147483647L // ' ' separator
        val t = toks(i)
        var j = 0
        while (j < t.length) {
          h = (h * 131L + t.charAt(j).toLong) % 2147483647L
          j += 1
        }
        i += 1
      }
      java.lang.Long.valueOf(h)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "doc_fingerprint"
  }

  /** Cosine similarity over two float arrays, computed with the exact
    * same operation order as the fold formulation in VectorFunctions
    * (left-to-right double accumulation, sqrt/division IEEE ops) — so it
    * is bit-identical to the DuckDB oracle's list_reduce formulation,
    * just ~20× faster than interpreted HOF evaluation. Null on zero
    * vectors, like VectorFunctions.cosine. Implements doGenCode (a call
    * into the static kernel) so surrounding operators stay inside
    * whole-stage codegen. */
  case class CosineExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val v = Kernels.cosine(l, r)
      if (java.lang.Double.isNaN(v)) null else java.lang.Double.valueOf(v)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |${ev.value} = graft.functions.Kernels.cosine($a, $b);
           |if (java.lang.Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
         """.stripMargin)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "cosine_native"
  }

  /** Int8 scalar quantization — see [[Kernels.int8Quantize]]. Binary
    * output (one signed byte per dimension): the compressed vector form
    * a 100 TB ANN corpus scans instead of float32 (4× less bandwidth);
    * candidates rank by integer dot product and only survivors touch
    * the float vectors again. Codegen'd kernel call. */
  case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = Kernels.int8Quantize(input)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.Kernels.int8Quantize($c);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "int8_quantize"
  }

  /** Exact integer dot product of two int8 code vectors — see
    * [[Kernels.int8Dot]]. Codegen'd; null on length mismatch. */
  case class Int8DotExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val v = Kernels.int8Dot(l, r)
      if (v == Long.MinValue) null else java.lang.Long.valueOf(v)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |${ev.value} = graft.functions.Kernels.int8Dot($a, $b);
           |if (${ev.value} == Long.MIN_VALUE) { ${ev.isNull} = true; }
         """.stripMargin)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "int8_dot"
  }

  /** Distinct k-shingle hashes of a text, sorted ascending — the
    * pre-computed form of a shingle set for pairwise verification.
    * Computing this ONCE per document and verifying pairs with
    * [[SortedJaccardExpr]] replaces per-pair re-tokenization/re-hashing
    * (O(pairs × doclen) string work) with a per-pair merge walk over
    * long arrays (O(pairs × shingles) comparisons) — the verify-stage
    * design that holds at corpus scale. 64-bit hashing makes hashed-set
    * Jaccard equal string-set Jaccard barring ~2^-64 collisions. */
  case class ShingleHashesExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenizeLower(input.asInstanceOf[UTF8String].toString)
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        set.add(xxh64(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0L))
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var n = 0
      while (it.hasNext) { out(n) = it.next(); n += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "shingle_hashes"
  }

  /** Jaccard of two ascending-sorted distinct long arrays via a single
    * merge walk. Both empty → 0.0 (matching ShingleJaccardExpr). */
  case class SortedJaccardExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val na = a.numElements(); val nb = b.numElements()
      if (na == 0 && nb == 0) return java.lang.Double.valueOf(0.0)
      var i = 0; var j = 0; var inter = 0
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      java.lang.Double.valueOf(inter.toDouble / (na + nb - inter).toDouble)
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "sorted_jaccard"
  }

  /** Table-generating function (UDTF surface): explode a text into its
    * word n-grams as (pos, ngram) rows — same tokenizer as the sketch
    * expressions, so generated grams line up with MinHash/SimHash
    * shingles. A native Generator streams rows out of eval (no
    * intermediate array column materialized per document, unlike
    * explode(transform(...)) formulations).
    */
  case class NGramsExplodeExpr(child: Expression, n: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.Generator
      with CodegenFallback {
    require(n > 0, s"ngrams_explode: n must be positive, got $n")
    override def elementSchema: StructType = StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("ngram", StringType, nullable = false)))
    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val v = child.eval(input)
      if (v == null) return Nil
      val toks = tokenizeLower(v.asInstanceOf[UTF8String].toString)
      if (toks.length < n) return Nil
      val sb = new java.lang.StringBuilder(64)
      (0 to toks.length - n).iterator.map { i =>
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, UTF8String.fromString(sb.toString)))
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "ngrams_explode"
  }

  /** Exact k-shingle Jaccard of two texts — native form of
    * Dedup.shingleJaccard (same tokenizer as MinHashSigExpr). */
  case class ShingleJaccardExpr(left: Expression, right: Expression, k: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = DoubleType
    private def shingleSet(s: String): java.util.HashSet[String] = {
      val toks = tokenizeLower(s)
      val out = new java.util.HashSet[String]()
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
      out
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val sa = shingleSet(l.asInstanceOf[UTF8String].toString)
      val sb = shingleSet(r.asInstanceOf[UTF8String].toString)
      if (sa.isEmpty && sb.isEmpty) return java.lang.Double.valueOf(0.0)
      var inter = 0
      val it = sa.iterator()
      while (it.hasNext) if (sb.contains(it.next())) inter += 1
      val union = sa.size + sb.size - inter
      java.lang.Double.valueOf(inter.toDouble / union.toDouble)
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "shingle_jaccard"
  }

  /** PQ subspace encoder — see [[Kernels.pqEncode]]. Codegen'd static
    * call; null for under-length vectors or an empty codebook. */
  case class PqEncodeExpr(vec: Expression, cents: Expression,
      m: Int, subDim: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    require(m >= 1 && subDim >= 1, "pq_encode: bad subspace shape")
    override def left: Expression = vec
    override def right: Expression = cents
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any, c: Any): Any =
      Kernels.pqEncode(v, c, m, subDim)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (v, c) =>
        s"""
           |${ev.value} = graft.functions.Kernels.pqEncode($v, $c, $m, $subDim);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(vec = newLeft, cents = newRight)
    override def prettyName: String = "pq_encode"
  }

  /** Two-level quantizer assignment — see [[Kernels.twoLevelAssign]].
    * Codegen'd static call; null only for an empty coarse array. */
  case class TwoLevelAssignExpr(vec: Expression, coarse: Expression,
      finemap: Expression, nprobe: Int)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    require(nprobe >= 1, "two_level_assign: nprobe must be >= 1")
    override def first: Expression = vec
    override def second: Expression = coarse
    override def third: Expression = finemap
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any, c: Any, m: Any): Any =
      Kernels.twoLevelAssign(v, c, m, nprobe)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (v, c, m) =>
        s"""
           |Object r = graft.functions.Kernels.twoLevelAssign($v, $c, $m, $nprobe);
           |if (r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ((java.lang.Integer) r).intValue(); }
         """.stripMargin)
    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): Expression =
      copy(vec = newFirst, coarse = newSecond, finemap = newThird)
    override def prettyName: String = "two_level_assign"
  }

  // Spark 4 Column is ColumnNode-backed; the bridge exposes the
  // sql-private Expression<->Column conversions.
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def cosineNative(a: Column, b: Column): Column =
    column(CosineExpr(expression(a), expression(b)))

  def int8Quantize(v: Column): Column =
    column(Int8QuantizeExpr(expression(v)))

  def int8Dot(a: Column, b: Column): Column =
    column(Int8DotExpr(expression(a), expression(b)))

  def pqEncodeNative(vec: Column, cents: Column, m: Int, subDim: Int): Column =
    column(PqEncodeExpr(expression(vec), expression(cents), m, subDim))

  def twoLevelAssign(vec: Column, coarse: Column, finemap: Column,
      nprobe: Int): Column =
    column(TwoLevelAssignExpr(expression(vec), expression(coarse),
      expression(finemap), nprobe))

  def shingleJaccardNative(a: Column, b: Column, k: Int): Column =
    column(ShingleJaccardExpr(expression(a), expression(b), k))

  def shingleHashes(text: Column, k: Int): Column =
    column(ShingleHashesExpr(expression(text), k))

  def sortedJaccard(a: Column, b: Column): Column =
    column(SortedJaccardExpr(expression(a), expression(b)))

  def minhashSig(text: Column, shingleK: Int, numHashes: Int): Column =
    column(MinHashSigExpr(expression(text), shingleK, numHashes))

  def simhash64(text: Column): Column = column(SimHashExpr(expression(text)))

  def tokenHash62(s: Column): Column = column(TokenHash62Expr(expression(s)))

  def docFingerprint(text: Column): Column =
    column(FingerprintExpr(expression(text)))

  def hyperplaneSig(vec: Column, numBits: Int, seed: Int): Column =
    column(HyperplaneSigExpr(expression(vec), numBits, seed))

  /** Generator (UDTF): word n-grams of a text as (pos, ngram) rows. */
  def ngramsExplode(text: Column, n: Int): Column =
    column(NGramsExplodeExpr(expression(text), n))

  /** Aggregate: k best (score, id) pairs, strongest first — see
    * [[TopKByScoreAgg]]. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    column(TopKByScoreAgg(expression(score), expression(id), k)
      .toAggregateExpression())
}
