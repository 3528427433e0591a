package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot per-row kernels of the
  * training-data pipeline (SURVEY §7.3: promote to Expression where the
  * composed built-ins can't deliver the needed performance).
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
  * evaluate their lambdas through the interpreter — fine for control flow,
  * but a 64-dim dot product or a k×m minhash fold pays per-element
  * interpretation overhead. These expressions run the same math as a tight
  * JVM loop, and [[ArrayCosineSimilarity]] additionally generates code so
  * it stays inside whole-stage codegen.
  *
  * Numerical contract: accumulation is strictly left-to-right in double,
  * IDENTICAL to the HOF formulations they replace (and to the DuckDB
  * oracle) — results are bit-equal, not just close.
  */
object expressions {

  /** cosine(a, b) over array<float> columns, codegen'd. */
  case class ArrayCosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects array<float> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
    }

    // Length-mismatched vectors yield NULL — parity with the HOF
    // formulation, where zip_with's null padding null-propagates.
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double x = (double) $a.getFloat($i);
           |    double y = (double) $b.getFloat($i);
           |    $dot += x * y; $na += x * x; $nb += y * y;
           |  }
           |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           |}
         """.stripMargin
      })

    override def nullable: Boolean = true

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** MinHash signature over an array<string> shingle set: k permutations
    * via seed-chained xxhash64, each shingle hashed once. Values are
    * identical to the HOF construction in DedupFunctions (xxhash64(s) then
    * xxhash64(i, base)). */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"minhash_signature expects array<string>, got ${other.sql}")
      }
    override def nullIntolerant: Boolean = true

    // Seed-chain parity with functions.xxhash64(i, h): fold the args with
    // the running hash as seed, starting at 42; the permutation index is an
    // IntegerType child there (sequence(0, k-1)), so it hashes via the
    // 4-byte int path, and the base hash via the long path.
    @transient private lazy val permSeeds: Array[Long] =
      Array.tabulate(k)(p => XxHash64Function.hash(p, IntegerType, 42L))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < m) {
        val s = arr.getUTF8String(i)
        val base = XxHash64Function.hash(s, StringType, 42L)
        var p = 0
        while (p < k) {
          val h = XxHash64Function.hash(base, LongType, permSeeds(p))
          if (h < mins(p)) mins(p) = h
          p += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash over an array<string> word set (sign of per-bit signed
    * counts of xxhash64(word) bits) — same construction as the HOF version. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var i = 0
      while (i < arr.numElements()) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Content-defined chunk boundaries over a (pre-normalized) string —
    * the native twin of [[graft.functions.TextFunctions.cdcBoundariesHof]],
    * bit-identical by construction: per code point,
    * `h' = (2·h + (xxhash64(char) mod 2^32)) mod 2^48`, boundary when the
    * low `maskBits` bits are zero and the chunk is ≥ `minLen` code points
    * (or unconditionally at `maxLen`), hash reset at each boundary. The
    * interpreted HOF fold allocates a struct row per character; this is
    * one JVM loop over the UTF-8 bytes (measured ~2× the whole query at
    * sf0.1). Returns 1-based code-point END positions of complete chunks. */
  case class CdcBoundaries(child: Expression,
      minLen: Int, maxLen: Int, maskBits: Int)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_boundaries expects a string, got ${child.dataType.sql}")

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val bytes = s.getBytes
      val mask = (1L << maskBits) - 1
      val gearMod = 1L << 32
      val hMod = 1L << 48
      val out = new scala.collection.mutable.ArrayBuffer[Int]()
      var h = 0L
      var since = 0
      var pos = 0
      var i = 0
      while (i < bytes.length) {
        val n = org.apache.spark.unsafe.types.UTF8String
          .numBytesForFirstByte(bytes(i))
        val cp = org.apache.spark.unsafe.types.UTF8String
          .fromBytes(bytes, i, n)
        val g = java.lang.Math.floorMod(
          XxHash64Function.hash(cp, StringType, 42L), gearMod)
        h = java.lang.Math.floorMod(h * 2 + g, hMod)
        since += 1
        pos += 1
        if (((h & mask) == 0L && since >= minLen) || since >= maxLen) {
          out += pos
          h = 0L
          since = 0
        }
        i += n
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Rolling character k-gram xxhash64 sequence over a (pre-normalized)
    * string — native twin of the HOF in
    * [[graft.functions.TextFunctions.winnowingKgramHashesHof]]:
    * hash(i) = xxhash64(substr(norm, i+1, k)) for i in 0..max(len−k, 0),
    * identical values (the oracle contract: these are echoed and
    * replayed), one JVM loop instead of an interpreted transform with a
    * substring copy per position. */
  case class KgramHashes(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kgram_hashes expects a string, got ${child.dataType.sql}")

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val n = s.numChars()
      val m = math.max(n - k + 1, 1)
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        // UTF8String.substringSQL is the engine's substr: code-point
        // indexed, length-clamped — matches substr(norm, i+1, k)
        out(i) = XxHash64Function.hash(
          s.substringSQL(i + 1, k), StringType, 42L)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Winnowing window-min POSITIONS (leftmost argmin per w-window,
    * 1-based, distinct, ascending) — native twin of
    * [[graft.functions.TextFunctions.winnowingSelectedPositionsHof]].
    * The HOF slices every window twice (O(n·w)); this is the monotonic
    * deque sliding-window minimum, O(n), with the same leftmost-on-ties
    * choice (strict `<` keeps the earliest equal element at the front). */
  case class WinnowingPositions(child: Expression, w: Int)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnowing_positions expects array<bigint>, got ${t.sql}")
      }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) { hs(i) = arr.getLong(i); i += 1 }
      val nWin = math.max(n - w + 1, 1)
      val sel = new java.util.TreeSet[Integer]()
      // monotonic deque of indices; head = leftmost minimum of the window
      val dq = new java.util.ArrayDeque[Int]()
      var j = 0
      while (j < math.min(n, nWin + w - 1)) {
        // drop tail elements strictly greater: equal elements stay, so
        // the deque head is always the EARLIEST minimum (leftmost tie)
        while (!dq.isEmpty && hs(dq.peekLast()) > hs(j)) dq.pollLast()
        dq.addLast(j)
        val winStart = j - w + 1
        if (dq.peekFirst() < winStart) dq.pollFirst()
        if (j >= w - 1 || j == n - 1) {
          // complete window ending at j, or the single clamped window of
          // an array shorter than w
          sel.add(dq.peekFirst() + 1)
        }
        j += 1
      }
      val out = new Array[Int](sel.size())
      val it = sel.iterator()
      var p = 0
      while (it.hasNext) { out(p) = it.next(); p += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Bounded top-k aggregate: keeps the k best (score, id) entries ordered
    * by score DESC, id ASC. The scale story is the whole point: used as
    * `groupBy(query).agg(top_k(...))`, partial aggregation
    * (ObjectHashAggregate) bounds every map-side buffer at k entries, the
    * shuffle carries at most k rows per (partition, query), and the final
    * merge per query folds ≤ partitions×k entries — unlike
    * `row_number over (partition by query)`, which funnels every scored
    * candidate of a query through one reducer. That window pattern is a
    * single-partition scale-killer at a 1B-row corpus; this is the
    * TakeOrdered pattern expressed as an aggregate.
    *
    * Null scores are ignored (a null cosine never ranks). Tie-break and NaN
    * ordering match Spark's `desc` sort (NaN sorts greatest).
    * Output: array<struct<score double, id bigint>> sorted best-first.
    */
  case class TopKByScore(
      score: Expression, id: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.PriorityQueue[Array[Long]]] {
    require(k > 0, "top_k requires k > 0")

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (score.dataType == DoubleType && id.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k expects (double, bigint), got (${score.dataType.sql}, ${id.dataType.sql})")

    // Entries are (score-bits, id) packed in a 2-long array; the heap head
    // is the WORST kept entry (lowest score; ties: highest id) so eviction
    // is O(log k).
    private def scoreOf(e: Array[Long]): Double = java.lang.Double.longBitsToDouble(e(0))
    @transient private lazy val worstFirst: java.util.Comparator[Array[Long]] =
      new java.util.Comparator[Array[Long]] {
        override def compare(x: Array[Long], y: Array[Long]): Int = {
          val c = java.lang.Double.compare(scoreOf(x), scoreOf(y))
          if (c != 0) c else java.lang.Long.compare(y(1), x(1))
        }
      }

    override def createAggregationBuffer(): java.util.PriorityQueue[Array[Long]] =
      new java.util.PriorityQueue[Array[Long]](k + 1, worstFirst)

    private def offer(buf: java.util.PriorityQueue[Array[Long]], e: Array[Long]): Unit =
      if (buf.size < k) buf.add(e)
      else if (worstFirst.compare(e, buf.peek()) > 0) { buf.poll(); buf.add(e) }

    override def update(
        buf: java.util.PriorityQueue[Array[Long]], input: InternalRow): java.util.PriorityQueue[Array[Long]] = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        offer(buf, Array(java.lang.Double.doubleToLongBits(s.asInstanceOf[Double]),
          i.asInstanceOf[Long]))
      buf
    }

    override def merge(
        buf: java.util.PriorityQueue[Array[Long]],
        other: java.util.PriorityQueue[Array[Long]]): java.util.PriorityQueue[Array[Long]] = {
      val it = other.iterator()
      while (it.hasNext) offer(buf, it.next())
      buf
    }

    override def eval(buf: java.util.PriorityQueue[Array[Long]]): Any = {
      val entries = new Array[Array[Long]](buf.size)
      var i = entries.length - 1
      while (i >= 0) { entries(i) = buf.poll(); i -= 1 } // worst-first poll ⇒ best-first array
      entries.foreach(e => buf.add(e)) // restore: eval must not destroy the buffer
      new GenericArrayData(entries.map(e =>
        InternalRow(scoreOf(e), e(1)): Any))
    }

    override def serialize(buf: java.util.PriorityQueue[Array[Long]]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) { val e = it.next(); bb.putLong(e(0)); bb.putLong(e(1)) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Array[Long]] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.add(Array(bb.getLong, bb.getLong)); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(score = newChildren(0), id = newChildren(1))
  }

  /** mightContain(bloomFilter, key) over a bigint key, codegen'd.
    *
    * The filter object rides the expression into the generated code via
    * `CodegenContext.addReferenceObj` — the same mechanism Spark's own
    * runtime row-level filtering uses for its injected bloom probes
    * (`BloomFilterMightContain`, an internal expression this deliberately
    * does not depend on). `BloomFilterImpl` is `java.io.Serializable`, so
    * the reference ships with the task closure; at the multi-GB filter
    * sizes of a 10^10-key corpus the filter should instead be persisted
    * and re-read per executor — the [[graft.functions.DedupFunctions]]
    * call site documents that sizing trade-off.
    *
    * No false negatives by construction: a `false` here is PROOF the key
    * was never put in the filter, which is what makes the bloom-gated
    * anti-join exact after its verify step.
    */
  case class BloomMightContainLong(child: Expression,
      filter: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression {

    override def dataType: DataType = BooleanType
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a bigint key, got ${child.dataType.sql}")

    override def nullSafeEval(v: Any): Any =
      filter.mightContainLong(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bf = ctx.addReferenceObj("bloomFilter", filter,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unicode NFC normalization (canonical composition), codegen'd.
    *
    * Text pipelines must canonicalize before ANY fingerprint/shingle/
    * dedup step: "café" with a precomposed é and "café" with e +
    * combining acute are byte-different but the same text — without NFC
    * they dodge exact dedup and skew shingles. Spark has no built-in for
    * this; the JDK's `java.text.Normalizer` implements the Unicode
    * standard algorithm, so results match any conformant engine (e.g.
    * DuckDB's `nfc_normalize`) byte-for-byte. */
  case class NfcNormalize(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects a string, got ${child.dataType.sql}")

    override def nullSafeEval(v: Any): Any =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize(v.toString, java.text.Normalizer.Form.NFC))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |  java.text.Normalizer.normalize($c.toString(),
           |    java.text.Normalizer.Form.NFC));""".stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ------------------------------------------------------- Column surface

  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.column(ArrayCosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))

  def minHashSignature(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), k))

  def simHash64(words: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(words)))

  def cdcBoundaries(normText: Column,
      minLen: Int, maxLen: Int, maskBits: Int): Column =
    Bridge.column(CdcBoundaries(Bridge.expression(normText),
      minLen, maxLen, maskBits))

  def kgramHashes(normText: Column, k: Int): Column =
    Bridge.column(KgramHashes(Bridge.expression(normText), k))

  def winnowingPositions(hashes: Column, w: Int): Column =
    Bridge.column(WinnowingPositions(Bridge.expression(hashes), w))

  /** Codegen'd bloom-filter membership probe over a bigint key column. */
  def bloomMightContain(filter: org.apache.spark.util.sketch.BloomFilter,
      key: Column): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(key), filter))

  /** Codegen'd Unicode NFC canonical composition. */
  def nfcNormalize(s: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(s)))

  /** Bounded top-k aggregate column: array of the k best (score, id) pairs,
    * best-first (score desc, id asc). */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByScore(
      Bridge.expression(score.cast("double")), Bridge.expression(id.cast("long")), k)
      .toAggregateExpression())
}
