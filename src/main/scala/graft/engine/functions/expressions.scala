package graft.engine.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the operators Spark's built-ins can't
  * express efficiently (prompt preference order (b): a native `Expression`
  * beats a Scala UDF — no SerDe, null handling inside the expression tree,
  * usable from SQL once registered).
  *
  * All three are deterministic, null-intolerant scalar kernels. They use
  * `CodegenFallback` — each call is a single tight JVM loop over a small
  * array/string, so interpreted dispatch cost is amortized; the surrounding
  * plan stays in whole-stage codegen.
  */

/** Cosine similarity between two ARRAY<FLOAT>/ARRAY<DOUBLE> vectors.
  *
  * Accumulates dot and norms in double in element order — bit-identical to
  * the DuckDB oracle's in-order `SUM(a[i]*b[i])` formulation, which is what
  * makes exact-equality verification possible. Returns 0 when either norm
  * is 0. One fused pass: no intermediate zip_with array is allocated (the
  * `aggregate(zip_with(...))` built-in formulation allocates two).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  @inline private def elem(arr: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case _ => throw new IllegalArgumentException(s"unsupported element type $dt")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val lt = left.dataType.asInstanceOf[ArrayType].elementType
    val rt = right.dataType.asInstanceOf[ArrayType].elementType
    val n = math.min(la.numElements(), ra.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(la, lt, i)
      val y = elem(ra, rt, i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of a token array (near-dup fingerprint, X2).
  *
  * Each token is hashed with xxHash64-compatible mixing (Spark's own
  * XXH64 seed 42 via Murmur-style finalization below — self-consistent, not
  * claimed to match any external tool); each of the 64 positions votes
  * +1/-1 by the token-hash bit; the sign of the vote sum becomes the
  * output bit. Documents differing in a few tokens land within a small
  * Hamming distance — dedup then groups by band (see Dedup.simHashNearDups).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  @inline private def mix64(input: Long): Long = {
    var h = input
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  private def tokenHash(s: UTF8String): Long = {
    // FNV-1a over bytes, then a strong finalizer — deterministic across
    // JVMs, no dependency on String.hashCode.
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = tokenHash(arr.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-token shingles of a token array in one pass (X2).
  *
  * The HOF formulation (`transform(sequence(0, n-k), i -> concat_ws(' ',
  * element_at(tok, i+1), ...))`) re-evaluates the token-producing child
  * (a regex split) on EVERY element_at in interpreted mode — O(S·k) full
  * splits per row. This expression receives the token array once and
  * builds the windows in a single pass. Short docs (< k tokens) collapse
  * to one whole-text shingle.
  */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = Array.tabulate(n)(i =>
      if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString)
    val out: Array[UTF8String] =
      if (n < k) Array(UTF8String.fromString(toks.mkString(" ")))
      else Array.tabulate(n - k + 1) { i =>
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        UTF8String.fromString(sb.toString)
      }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of a shingle array in one pass (X2).
  *
  * Each shingle's bytes are hashed ONCE (FNV-1a + avalanche); each of the
  * `numHashes` families is a cheap integer re-mix of that base value
  * (mix64(base ^ seed_j)). The equivalent higher-order-function formulation
  * (`transform(sequence(..), j -> array_min(transform(sh, s -> xxhash64(s, j))))`)
  * re-hashes the string per family through interpreted lambdas — measured
  * ~25 s at sf0.1 where this expression is ~100 ms.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  @inline private def mix64(input: Long): Long = {
    var h = input
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  private def baseHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  private val seeds: Array[Long] =
    Array.tabulate(numHashes)(j => mix64(0x9E3779B97F4A7C15L * (j + 1)))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val base = baseHash(arr.getUTF8String(t))
        var j = 0
        while (j < numHashes) {
          val h = mix64(base ^ seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-random-projection LSH buckets for every hash table in ONE pass
  * (X3 ANN / X2e embedding near-dup).
  *
  * `planes(t)(b)` is hyperplane b of table t; output element t is table
  * t's bucket id (bit b set iff vec · planes(t)(b) >= 0). The Column-DSL
  * formulation (`element_at` chains reduced with `+`) builds a
  * bits × dim × tables expression tree — ~12k nodes at the published
  * operating point (6 bits × 64 dims × 8 tables), which overflows janino's
  * 64 KB method limit, falls back to interpreted eval, and turned x44 into
  * a 40 s query. This kernel is one expression node: the tree stays
  * codegen-friendly and the dot products run as tight JVM loops
  * (measured back under the legacy single-table cost).
  */
case class SignLshBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(planes.nonEmpty && planes.forall(_.length == planes(0).length),
    "every table needs the same number of hyperplanes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_lsh"

  @inline private def elem(arr: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case _ => throw new IllegalArgumentException(s"unsupported element type $dt")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var bucket = 0L
      var b = 0
      while (b < table.length) {
        val p = table(b)
        val n = math.min(arr.numElements(), p.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += elem(arr, et, i) * p(i); i += 1 }
        if (dot >= 0.0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encode: per-subspace argmax-cosine centroid ids as
  * ARRAY<INT> (index = subspace) — the X3 compressed-corpus kernel.
  *
  * Same janino story as [[SignLshBuckets]]: the Column-DSL formulation
  * (one struct per (subspace, centroid) through array_max) is m·k nodes —
  * 512 at the x48 operating point (8 subspaces × 64 centroids), which
  * overflows whole-stage codegen's 64 KB method limit and drops the encode
  * scan to interpreted eval (measured ~2× the whole query's budget). This
  * kernel is ONE expression node of tight JVM loops.
  *
  * `books(s)(c)` is subspace s's centroid c; the returned code for s is
  * the argmax-cosine c, ties to the LARGER c and zero-norm cosines scored
  * 0 — bit-matching the ivfCell/CosineSimilarity composition it replaces.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(books.nonEmpty && books.forall(_.nonEmpty), "need >= 1 centroid per book")
  private val ds = books(0)(0).length
  require(books.forall(_.forall(_.length == ds)),
    "every centroid must have the subvector width")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  @inline private def elem(arr: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case _ => throw new IllegalArgumentException(s"unsupported element type $dt")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val m = books.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * ds
      val n = math.max(math.min(ds, arr.numElements() - off), 0)
      var nv = 0.0
      var i = 0
      while (i < n) { val x = elem(arr, et, off + i); nv += x * x; i += 1 }
      val book = books(s)
      var best = Double.NegativeInfinity
      var bestCid = 0
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dot = 0.0
        var nc = 0.0
        var j = 0
        while (j < n) {
          val x = elem(arr, et, off + j)
          dot += x * cent(j); nc += cent(j) * cent(j); j += 1
        }
        while (j < ds) { nc += cent(j) * cent(j); j += 1 }
        val cos = if (nv == 0.0 || nc == 0.0) 0.0
                  else dot / (math.sqrt(nv) * math.sqrt(nc))
        if (cos >= best) { best = cos; bestCid = c }
        c += 1
      }
      out(s) = bestCid
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ asymmetric-distance scoring of one code against EVERY query — the
  * codegen-safe replacement for pqTopK's per-query Column-DSL fan-out
  * (one explode(array(q structs)) of element_at chains = O(q·m) expression
  * nodes: at 256 queries that overflows whole-stage codegen's 64 KB method
  * limit and drops the hot corpus scan to interpreted eval). This kernel
  * is ONE expression node regardless of query count: per row it computes
  * the code's reconstruction norm once (O(m)) and each query's LUT sum in
  * a tight loop (O(q·m) WORK, O(1) NODES).
  *
  * Layout: `ipLuts(q)(s)(c)` = query q · centroid c of subspace s
  * (driver-computed); `normLuts(s)(c)` = |centroid|²; `qnorms(q)` = |q|.
  * Output: ARRAY<STRUCT<qid, cos>> with cos = Σ_s ip / (√Σ_s n² · |q|)
  * accumulated in subspace order — bit-identical to the Column-DSL
  * formulation it replaces (q84's oracle pins this).
  */
case class PqAdcScores(child: Expression, qids: Array[Long],
    ipLuts: Array[Array[Array[Double]]], qnorms: Array[Double],
    normLuts: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(qids.length == ipLuts.length && qids.length == qnorms.length,
    "qids, ipLuts, qnorms must align")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_pq_adc_scores"

  override def nullSafeEval(v: Any): Any = {
    val code = v.asInstanceOf[ArrayData]
    val m = normLuts.length
    var n2 = 0.0
    var s = 0
    while (s < m) { n2 += normLuts(s)(code.getInt(s)); s += 1 }
    val rnorm = math.sqrt(n2)
    val out = new Array[Any](qids.length)
    var q = 0
    while (q < qids.length) {
      val lut = ipLuts(q)
      var ip = 0.0
      s = 0
      while (s < m) { ip += lut(s)(code.getInt(s)); s += 1 }
      val denom = rnorm * qnorms(q)
      val cos = if (denom == 0.0) 0.0 else ip / denom
      out(q) = org.apache.spark.sql.catalyst.InternalRow(qids(q), cos)
      q += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ ADC scoring of one (code, qid) row — ivfPqTopK's kernel, replacing
  * the per-query `when`-chain LUT dispatch (O(q·m) expression nodes on the
  * hot probed-cell scan; the janino-64KB pattern at production query
  * batches). `qids` must be SORTED ascending with `ipLuts`/`qnorms`
  * aligned: the qid resolves by binary search, so per-row cost is
  * O(m + log q) regardless of query count. An unknown qid scores NaN —
  * the same poison value the `when`-chain's fold seed produced. */
case class PqAdcScore(left: Expression, right: Expression, qids: Array[Long],
    ipLuts: Array[Array[Array[Double]]], qnorms: Array[Double],
    normLuts: Array[Array[Double]])
    extends BinaryExpression with CodegenFallback {
  require(qids.length == ipLuts.length && qids.length == qnorms.length,
    "qids, ipLuts, qnorms must align")
  require(qids.length <= 1 ||
    qids.sliding(2).forall(p => p(0) < p(1)), "qids must be sorted, distinct")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_score"

  override def nullSafeEval(codeAny: Any, qidAny: Any): Any = {
    val code = codeAny.asInstanceOf[ArrayData]
    val qi = java.util.Arrays.binarySearch(qids, qidAny.asInstanceOf[Long])
    if (qi < 0) return Double.NaN
    val m = normLuts.length
    var n2 = 0.0
    var ip = 0.0
    val lut = ipLuts(qi)
    var s = 0
    while (s < m) {
      val c = code.getInt(s)
      n2 += normLuts(s)(c)
      ip += lut(s)(c)
      s += 1
    }
    val denom = math.sqrt(n2) * qnorms(qi)
    if (denom == 0.0) 0.0 else ip / denom
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Bloom-filter membership probe against a pre-built filter (X1 ingestion
  * dedup's pre-filter phase).
  *
  * The filter is built once (driver-side `DataFrameStatFunctions
  * .bloomFilter` over the existing corpus's distinct keys) and travels to
  * executors INSIDE this expression as its serialized bytes — one
  * deserialization per task via the transient lazy val, then each probe is
  * a few hash ops. No false negatives (a definitely-absent answer is
  * exact); false positives only send extra rows to the exact verify join.
  * Spark's own BloomFilterAggregate/BloomFilterMightContain pair is
  * internal (runtime-filter machinery, not in the public FunctionRegistry),
  * hence this thin public equivalent.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => filter.mightContainString(s.toString)
    case b: Array[Byte] => filter.mightContainBinary(b)
    case l: Long => filter.mightContainLong(l)
    case i: Int => filter.mightContainLong(i.toLong)
    case other => throw new IllegalArgumentException(
      s"unsupported bloom probe type ${other.getClass}")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling polynomial fingerprint of a string (X4 document fingerprinting):
  * h = Σ cp_i · B^(n-1-i) mod M over Unicode code points, B = 131,
  * M = 1e9+7. Shift-invariant enough for chunk fingerprints; cheaper than
  * md5 (no allocation, no digest object).
  * The modulus keeps every intermediate < 2^63 in plain integer SQL, so an
  * oracle engine can replay the exact values with a fold over code points
  * (see x51_fingerprint's DuckDB twin) — a 2^64-wraparound hash can't be
  * expressed in overflow-checked SQL.
  *
  * NOT collision-free: the ~2^30 range makes birthday collisions expected
  * around ~50k distinct strings, so do not use it alone for
  * equality-grouping at scale (distinct documents would silently merge) —
  * group on `(graft_rolling_hash(s), md5(s))` or the content key itself;
  * this expression is a cheap per-value fingerprint, not an identity.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL length-`len` sliding-window [[RollingHash]] fingerprints of a
  * string in one O(n) pass (X1 exact-substring dedup's scale key): entry i
  * equals `RollingHash(substring(s, i, len))` — same B = 131, M = 1e9+7
  * polynomial over Unicode code points, maintained by the rolling update
  * h' = ((h − cp_out·B^(len−1)) · B + cp_in) mod M instead of rehashing
  * each window (the naive per-window fold is O(n·len)). Positions index
  * CODE POINTS, matching SQL `substring` semantics. Strings shorter than
  * `len` yield an empty array. Inherits RollingHash's collision caveat
  * (~2^30 range): a consumer grouping for EQUALITY must verify matches on
  * the actual window text — [[graft.engine.llm.Dedup.repeatedSpansHashed]]
  * does, output-sensitively. */
case class WindowHashes(child: Expression, len: Int)
    extends UnaryExpression with CodegenFallback {
  require(len >= 1, "window length must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"

  private final val M = 1000000007L
  private final val B = 131L
  // B^(len-1) mod M — the leading coefficient the rolling update retires
  @transient private lazy val powTop: Long = {
    var p = 1L
    var i = 0
    while (i < len - 1) { p = p * B % M; i += 1 }
    p
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < len) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - len + 1)
    var h = 0L
    var i = 0
    while (i < len) { h = (h * B + cps(i)) % M; i += 1 }
    out(0) = h
    var st = 1
    while (st + len <= n) {
      h = ((h - cps(st - 1) * powTop % M + M) % M * B + cps(st + len - 1)) % M
      out(st) = h
      st += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL length-`len` sliding-window EXACT md5 keys of a string in one pass
  * (X1 published-boilerplate-model's window key,
  * [[graft.engine.llm.Dedup]] `windowKeys`): entry i is bit-identical to
  * the built-in `md5(substring(s, i+1, len))` — lowercase hex of the MD5
  * of the window's UTF-8 bytes, windows indexed by CODE POINT matching
  * SQL `substring`/`length` semantics (the same discipline as
  * [[WindowHashes]]). Strings shorter than `len` yield an empty array.
  *
  * Unlike [[WindowHashes]] md5 cannot roll, so the pass is O(n·len) byte
  * hashing by necessity — but the three-operator built-in pipeline
  * (`explode(sequence) + substring + md5`) pays, per WINDOW, a row-widen
  * carrying the full document text, a substring UTF8String copy, and a
  * per-call DigestUtils allocation. This kernel walks the document's
  * byte array once, computes each window digest over a byte-range slice
  * with a thread-cached MessageDigest, and emits the array — the row
  * explode downstream (`posexplode`) then carries only (pos, 32-char
  * key). Exactness matters: the published model stores these keys
  * without window text, so a later ingest batch can trim against the
  * frozen store with no verify stage (an 8-byte rolling hash could not —
  * see `Dedup.windowKeys`'s scaladoc). */
case class Md5WindowKeys(child: Expression, len: Int)
    extends UnaryExpression with CodegenFallback {
  require(len >= 1, "window length must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_md5_window_keys"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    // code-point start offsets (UTF-8 has no surrogates: every 1–4-byte
    // sequence is one code point, so one offset per SQL "character")
    val nb = bytes.length
    var nChars = 0
    var i = 0
    while (i < nb) {
      i += Md5WindowKeys.seqLen(bytes(i))
      nChars += 1
    }
    if (nChars < len) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](nChars + 1)
    i = 0
    var c = 0
    while (i < nb) {
      offs(c) = i
      i += Md5WindowKeys.seqLen(bytes(i))
      c += 1
    }
    offs(nChars) = nb
    val md = Md5WindowKeys.digests.get()
    val out = new Array[Any](nChars - len + 1)
    var w = 0
    while (w + len <= nChars) {
      md.reset()
      md.update(bytes, offs(w), offs(w + len) - offs(w))
      out(w) = UTF8String.fromBytes(Md5WindowKeys.hex(md.digest()))
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private object Md5WindowKeys {
  val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".getBytes

  def hex(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    out
  }

  /** UTF-8 sequence length from the first byte — mirrors Spark's
    * UTF8String.numBytesForFirstByte EXACTLY, including its treatment of
    * invalid leading bytes as width 1: 0x80–0xBF (bare continuation),
    * 0xC0/0xC1 (overlong-2-byte leads) and 0xF5–0xFF (beyond U+10FFFF)
    * all advance one byte. Bit-identity with `length`/`substring` on
    * MALFORMED input depends on these five edge values
    * (Md5WindowKeysSpec pins them against the built-in expressions). */
  def seqLen(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0xc2) 1 // ASCII, continuation, or invalid 0xC0/0xC1
    else if (u < 0xe0) 2
    else if (u < 0xf0) 3
    else if (u < 0xf5) 4
    else 1 // invalid 0xF5-0xFF
  }
}

/** Shared trie for the vocabulary tokenizer expressions: greedy
  * longest-match against a fixed word vocabulary, with every single
  * non-whitespace character an implicit base token (so tokenization
  * always terminates and unknown characters count as one token each).
  *
  * The semantics are EXACTLY those of a leftmost-first regex alternation
  * `(w1|w2|…|wK|[^\s])` with the vocabulary sorted by (length desc, word
  * asc) — the formulation both Java regex and DuckDB/RE2 replay, which is
  * what makes the operator oracle-checkable end to end (two same-length
  * distinct words can never match at the same position, so the sort is a
  * total tie-break). The trie walk is O(longest match) per position
  * instead of the alternation's O(vocab) — same answer, linear scan.
  */
private[functions] final class VocabTrie(vocab: Array[String]) extends Serializable {
  // flat trie: children as per-node HashMap (vocabularies are 10^2..10^5
  // words — driver-built once per plan, shipped with the expression)
  private val children = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Char, Int]())
  // terminal nodes carry the FIRST vocab index that ends there (-1 =
  // not a word end) — the id the token-ID kernel surfaces, kept inside
  // the walk so ids and pieces can never disagree on what matched
  private val wordIdx = scala.collection.mutable.ArrayBuffer(-1)
  vocab.zipWithIndex.foreach { case (w, wi) =>
    require(w.nonEmpty && w.forall(c => !VocabTrie.isWs(c)),
      s"vocab tokens must be non-empty and whitespace-free, got '$w'")
    var node = 0
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      node =
        if (children(node).containsKey(c)) children(node).get(c)
        else {
          children += new java.util.HashMap[Char, Int]()
          wordIdx += -1
          children(node).put(c, children.size - 1)
          children.size - 1
        }
      i += 1
    }
    if (wordIdx(node) < 0) wordIdx(node) = wi // first entry wins
  }

  /** Longest vocab match starting at `pos` (0 = none). */
  def longestMatch(s: String, pos: Int): Int =
    (longestMatchWithId(s, pos) >>> 32).toInt

  /** Longest vocab match starting at `pos`, with the matched word's
    * vocab index, packed as (length << 32) | (index & 0xffffffff) —
    * one walk, no per-token allocation. Length 0 / index -1 = no match. */
  def longestMatchWithId(s: String, pos: Int): Long = {
    var node = 0
    var i = pos
    var best = 0L
    var bestIdx = -1L
    while (i < s.length && children(node).containsKey(s.charAt(i))) {
      node = children(node).get(s.charAt(i))
      i += 1
      if (wordIdx(node) >= 0) { best = (i - pos).toLong; bestIdx = wordIdx(node) }
    }
    (best << 32) | (bestIdx & 0xffffffffL)
  }
}

private[functions] object VocabTrie {
  /** Java regex `\s`: the explicit 6-char set — NOT
    * Character.isWhitespace, which disagrees on NBSP etc. RE2's `\s`
    * omits U+000B (vertical tab), so the regex twins
    * (Tokenizer.alternationPattern / sqlVocabCtes) spell this set out as
    * an explicit character class instead of writing `\s` — otherwise the
    * DuckDB oracle would tokenize VT while this kernel skips it. */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}

/** Greedy longest-match token COUNT against a fixed vocabulary — the
  * learned-vocab successor of the `[a-z]+|[0-9]+|[^a-z0-9\s]` regex proxy
  * (TextAnalysis.tokenCount): a real LLM pipeline budgets sequences in
  * tokens of ITS tokenizer's vocabulary, and word-piece inference is
  * greedy longest-match. One tight loop, no token array allocated —
  * the packing/budgeting hot path wants only the count.
  *
  * Matches the reference's token accounting role (it has none — its only
  * text surface is iris CSV); modeled on the public WordPiece/BPE
  * inference semantics (Devlin et al. 2019; Sennrich et al. 2016).
  */
case class VocabTokenCount(child: Expression, vocab: Array[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_vocab_token_count"

  @transient private lazy val trie = new VocabTrie(vocab)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var i = 0
    var n = 0L
    while (i < s.length) {
      if (VocabTrie.isWs(s.charAt(i))) i += 1
      else {
        val m = trie.longestMatch(s, i)
        n += 1L
        // the single-"char" fallback consumes a full CODE POINT (2 UTF-16
        // units for supplementary-plane text) — the regex twins' [^\s]
        // matches code points, and splitting a surrogate pair would both
        // overcount and emit invalid lone-surrogate tokens
        i += (if (m > 0) m else Character.charCount(s.codePointAt(i)))
      }
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Greedy longest-match TOKENS (ARRAY<STRING>) against a fixed vocabulary
  * — [[VocabTokenCount]]'s materializing sibling for pipelines that need
  * the pieces themselves (vocabulary-hit analysis, sequence writers) and
  * for value-level verification: `size(vocabTokens(...))` must equal
  * `vocabTokenCount(...)` by construction, and each piece is replayable
  * through the regex-alternation twin. Unknown characters surface as
  * single-character tokens (the `[^\s]` catch-all).
  */
case class VocabTokens(child: Expression, vocab: Array[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_vocab_tokens"

  @transient private lazy val trie = new VocabTrie(vocab)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < s.length) {
      if (VocabTrie.isWs(s.charAt(i))) i += 1
      else {
        val m = trie.longestMatch(s, i)
        // code-point fallback — see VocabTokenCount: never split a
        // surrogate pair into two invalid tokens
        val len = if (m > 0) m else Character.charCount(s.codePointAt(i))
        out += UTF8String.fromString(s.substring(i, i + len))
        i += len
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[VocabTokens]]' ID form — the trainer-facing artifact: the SAME
  * greedy longest-match walk, but each piece surfaces as its rank in the
  * published vocabulary (0-based training order, [[graft.engine.llm
  * .Tokenizer.publishVocab]]'s `rank` column), and every implicit
  * single-code-point fallback token that is not itself a vocabulary
  * entry surfaces as -1 (the UNK id). decode(ids) via the vocab array is
  * exact wherever no -1 appears — the round-trip TokenizerSpec pins. */
case class VocabTokenIds(child: Expression, vocab: Array[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vocab_token_ids"

  @transient private lazy val trie = new VocabTrie(vocab)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < s.length) {
      if (VocabTrie.isWs(s.charAt(i))) i += 1
      else {
        // one walk yields BOTH the match length and the vocab index —
        // ids come from the trie terminal itself, never a parallel map
        val packed = trie.longestMatchWithId(s, i)
        val m = (packed >>> 32).toInt
        if (m > 0) {
          out += packed.toInt.toLong // sign-extends the index
          i += m
        } else {
          out += -1L
          i += Character.charCount(s.codePointAt(i))
        }
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel for TRUE BPE merge-order inference: tokenize by applying
  * the trained merge sequence IN ORDER (Sennrich et al. 2016), not by
  * greedy longest-match — the production-faithful semantics whose token
  * counts equal what a real BPE tokenizer emits for the same merges.
  *
  * Pre-tokenization matches the training side exactly: maximal
  * same-class runs of the (already lowercased) text — letter runs
  * `[a-z]+` and digit runs `[0-9]+` — are words; whitespace
  * (VocabTrie.isWs) separates; every other code point is one token.
  * Each word starts as characters, then every merge (a, b) rewrites its
  * leftmost non-overlapping occurrences to `ab` — the same tail-replace
  * fold as Tokenizer.trainBpeMerges, so training and inference share ONE
  * semantics and the DuckDB twin replays both with the same list_reduce
  * rule (LlmQueries.q120).
  *
  * Cost is INDEPENDENT of the merge budget: instead of scanning all
  * `numMerges` rounds per word (10^4+ for a production vocabulary, with
  * almost every round a no-op for any given word), the kernel indexes
  * merges by pair and JUMPS to the next applicable rank — the word's
  * pieces are constant between applications, so "smallest rank >= cursor
  * among the word's current adjacencies" selects exactly the rounds the
  * sequential fold would apply, in the same order. A word of p pieces
  * pays O(p) hash probes per applied merge and at most p-1 merges apply,
  * so inference is O(p^2) per distinct word whether the vocabulary holds
  * 8 merges or 50k (TokenizerSpec's 10^4-merge gate measures it).
  *
  * A per-expression-instance memo caches word → pieces (words repeat
  * heavily under Zipf; the cache is an access-order LRU capped at 64K
  * entries, so a pathological corpus with more distinct hot words evicts
  * the coldest entry per insert instead of oscillating between an empty
  * and a full cache on periodic wholesale clears). */
private[functions] final class BpeKernel(
    merges: Array[(String, String)]) extends Serializable {
  merges.foreach { case (a, b) =>
    require(a.nonEmpty && b.nonEmpty &&
      (a + b).forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')),
      s"BPE merge pieces must be non-empty [a-z0-9]+, got ('$a','$b')")
  }

  @transient private lazy val memo =
    new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Array[String]]): Boolean =
        size() > 65536
    }

  /** pair "a" + NUL + "b" (the separator is an escaped unicode-zero in
    * the string literals below — pieces are [a-z0-9] only, so NUL can
    * never collide, and the escape keeps this file plain text for
    * grep/diff tooling) → ascending ranks where that pair is merged (a
    * pair CAN recur in a merge list if later merges re-create its
    * pieces, so the value is a rank array, not a single rank). */
  @transient private lazy val ranksByPair: java.util.HashMap[String, Array[Int]] = {
    val tmp = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    var r = 0
    while (r < merges.length) {
      val key = merges(r)._1 + "\u0000" + merges(r)._2
      var buf = tmp.get(key)
      if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[Int]; tmp.put(key, buf) }
      buf += r // ranks are visited in order, so each buffer is ascending
      r += 1
    }
    val out = new java.util.HashMap[String, Array[Int]](tmp.size() * 2)
    tmp.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  /** Smallest element >= cur in an ascending array, or -1. */
  @inline private def firstAtLeast(rs: Array[Int], cur: Int): Int = {
    var lo = 0
    var hi = rs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (rs(mid) < cur) lo = mid + 1 else hi = mid
    }
    if (lo < rs.length) rs(lo) else -1
  }

  /** Apply the full merge sequence to one word — rank-jumping, exactly
    * the sequential fold's answer (see the class doc). */
  def encodeWord(w: String): Array[String] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    var pieces: Array[String] = Array.tabulate(w.length)(i => w.substring(i, i + 1))
    var cur = 0
    var done = pieces.length < 2
    while (!done) {
      // the smallest not-yet-passed rank applicable to ANY current
      // adjacency — the exact next round the sequential loop would apply
      var best = Int.MaxValue
      var i = 0
      while (i + 1 < pieces.length) {
        val rs = ranksByPair.get(pieces(i) + "\u0000" + pieces(i + 1))
        if (rs != null) {
          val r = firstAtLeast(rs, cur)
          if (r >= 0 && r < best) best = r
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](pieces.length)
        var j = 0
        while (j < pieces.length) {
          if (j + 1 < pieces.length && pieces(j) == a && pieces(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += pieces(j); j += 1 }
        }
        pieces = out.toArray
        cur = best + 1
        done = pieces.length < 2
      }
    }
    memo.put(w, pieces)
    pieces
  }

  @inline private def isLetter(c: Char) = c >= 'a' && c <= 'z'
  @inline private def isDigit(c: Char) = c >= '0' && c <= '9'

  /** Walk the text, invoking `onWord` per same-class run and `onChar` per
    * non-word non-whitespace code point (as its string). */
  def scan(s: String)(onWord: String => Unit, onChar: String => Unit): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (VocabTrie.isWs(c)) i += 1
      else if (isLetter(c) || isDigit(c)) {
        val letters = isLetter(c)
        var j = i + 1
        while (j < s.length &&
          (if (letters) isLetter(s.charAt(j)) else isDigit(s.charAt(j)))) j += 1
        onWord(s.substring(i, j))
        i = j
      } else {
        // code-point fallback — same surrogate-pair rule as VocabTokenCount
        val len = Character.charCount(s.codePointAt(i))
        onChar(s.substring(i, i + len))
        i += len
      }
    }
  }
}

/** TRUE BPE token COUNT: apply the merge sequence in order per word (see
  * [[BpeKernel]]); count = Σ pieces per word + 1 per non-word code point.
  * The budget/packing unit a production BPE tokenizer would report for
  * the same merges — where [[VocabTokenCount]] is the greedy
  * longest-match (WordPiece-inference) approximation over the merge
  * OUTPUTS, this is the merge-order ground truth. */
case class BpeTokenCount(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"

  @transient private lazy val kernel = new BpeKernel(merges)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var n = 0L
    kernel.scan(s)(w => n += kernel.encodeWord(w).length, _ => n += 1L)
    n
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** TRUE BPE token pieces (ARRAY<STRING>) — [[BpeTokenCount]]'s
  * materializing sibling: `size(bpeTokens(...)) == bpeTokenCount(...)`
  * by construction, and concatenating the pieces restores the
  * non-whitespace text (both TokenizerSpec-pinned). */
case class BpeTokens(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"

  @transient private lazy val kernel = new BpeKernel(merges)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    kernel.scan(s)(
      w => kernel.encodeWord(w).foreach(p => out += UTF8String.fromString(p)),
      c => out += UTF8String.fromString(c))
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API + SQL-registration surface for the custom expressions. */
object F {
  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def simHash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))

  def shingles(tokens: Column, k: Int): Column =
    Bridge.column(Shingles(Bridge.expression(tokens), k))

  def rollingHash(s: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(s)))

  /** All length-`len` sliding-window rolling-hash fingerprints
    * (ARRAY<LONG>, one O(n) pass — entry i == rollingHash of the window
    * starting at code point i). */
  def windowHashes(s: Column, len: Int): Column =
    Bridge.column(WindowHashes(Bridge.expression(s), len))

  /** All length-`len` sliding-window EXACT md5 keys (ARRAY<STRING>, one
    * pass — entry i == `md5(substring(s, i+1, len))` bit-identically). */
  def md5WindowKeys(s: Column, len: Int): Column =
    Bridge.column(Md5WindowKeys(Bridge.expression(s), len))

  /** Greedy longest-match token count against a fixed vocabulary. */
  def vocabTokenCount(text: Column, vocab: Array[String]): Column =
    Bridge.column(VocabTokenCount(Bridge.expression(text), vocab))

  /** Greedy longest-match token IDS (ARRAY<LONG> of published-vocab
    * ranks; -1 = single-char fallback outside the vocab). */
  def vocabTokenIds(text: Column, vocab: Array[String]): Column =
    Bridge.column(VocabTokenIds(Bridge.expression(text), vocab))

  /** Greedy longest-match token pieces (ARRAY<STRING>). */
  def vocabTokens(text: Column, vocab: Array[String]): Column =
    Bridge.column(VocabTokens(Bridge.expression(text), vocab))

  /** TRUE BPE merge-order token count. */
  def bpeTokenCount(text: Column, merges: Array[(String, String)]): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text), merges))

  /** TRUE BPE merge-order token pieces (ARRAY<STRING>). */
  def bpeTokens(text: Column, merges: Array[(String, String)]): Column =
    Bridge.column(BpeTokens(Bridge.expression(text), merges))

  /** Per-table sign-LSH bucket ids as ARRAY<BIGINT> (index = table). */
  def signLshBuckets(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    Bridge.column(SignLshBuckets(Bridge.expression(vec), planes))

  /** Per-subspace PQ codes as ARRAY<INT> (index = subspace). */
  def pqEncode(vec: Column, books: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), books))

  /** ADC scores of one code against every query: ARRAY<STRUCT<qid,cos>>. */
  def pqAdcScores(code: Column, qids: Array[Long],
      ipLuts: Array[Array[Array[Double]]], qnorms: Array[Double],
      normLuts: Array[Array[Double]]): Column =
    Bridge.column(PqAdcScores(Bridge.expression(code), qids, ipLuts,
      qnorms, normLuts))

  /** ADC score of one (code, qid) row; `qids` sorted with aligned LUTs. */
  def pqAdcScore(code: Column, qid: Column, qids: Array[Long],
      ipLuts: Array[Array[Array[Double]]], qnorms: Array[Double],
      normLuts: Array[Array[Double]]): Column =
    Bridge.column(PqAdcScore(Bridge.expression(code), Bridge.expression(qid),
      qids, ipLuts, qnorms, normLuts))

  /** Membership probe against a serialized `util.sketch.BloomFilter`. */
  def bloomMightContain(key: Column,
      filter: org.apache.spark.util.sketch.BloomFilter): Column = {
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      filter.writeTo(out)
      out.toByteArray
    }
    Bridge.column(BloomMightContain(Bridge.expression(key), bytes))
  }

  /** Register for SQL use: graft_cosine, graft_simhash64, graft_rolling_hash. */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_cosine",
      es => CosineSimilarity(es.head, es(1)))
    Bridge.registerFunction(spark, "graft_simhash64", es => SimHash64(es.head))
    Bridge.registerFunction(spark, "graft_rolling_hash", es => RollingHash(es.head))
  }
}
