package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native Catalyst expression — the
  * record-linkage verify kernel (Winkler '90, the census
  * string-comparator): Jaro's match/transposition similarity boosted
  * by up to 4 chars of common prefix (p = 0.1), the standard
  * parameterization every ER toolkit ships.
  *
  * Spark has `levenshtein` but no Jaro–Winkler, and entity resolution
  * wants JW (prefix-weighted, length-normalized, O(len·window) without
  * a DP matrix). A Scala UDF would box both strings and break
  * whole-stage codegen at the verify step of every fuzzy join —
  * exactly the hot loop — so this is preference (b) of SURVEY §7.3:
  * a BinaryExpression whose `doGenCode` emits a static call into
  * [[JaroWinklerAlgo]] (the `levenshtein` builtin's own codegen
  * shape: stay inside the generated code, delegate the loop to one
  * static JVM method on the unsafe UTF8String bytes).
  *
  * Determinism: matches and half-transpositions are exact integers;
  * the final similarity is a fixed 3-term IEEE tree — the expression
  * is a pure function of its inputs, layout-independent. Cross-ENGINE
  * float parity with other implementations is NOT claimed (summation
  * order differs), so fuzzy-match releases are rows-only with a
  * planted-pair bounds gate.
  *
  * Null semantics: null if either side is null (BinaryExpression
  * default); two empty strings read 1.0, one empty reads 0.0. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerAlgo.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** The loop kernel, shared by interpreted eval and generated code
  * (Scala object members compile with static forwarders, so the
  * codegen call site is a plain static invocation).
  *
  * Two paths, identical results: ASCII inputs (`numBytes == numChars`
  * — one UTF-8 byte per char, the overwhelmingly common case for the
  * entity names this kernel verifies) run directly on the unsafe
  * UTF8String bytes via `getByte`, allocating nothing but the two
  * match-flag arrays; non-ASCII inputs fall back to a `toString`
  * UTF-16 char loop (correct for any content — per-code-unit
  * comparison, the same unit the ASCII path's bytes map to 1:1).
  * The r15 version ran toString on EVERY pair, boxing two Strings in
  * the verify hot loop; the ADVICE fix makes the scaladoc's
  * "on the unsafe bytes" claim true where it matters. */
object JaroWinklerAlgo {

  /** Standard Jaro–Winkler: match window ⌊max(la,lb)/2⌋−1,
    * transpositions = mismatched matched-char pairs / 2, prefix boost
    * ℓ·0.1·(1−jaro) with ℓ ≤ 4. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes()
    val lb = b.numBytes()
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    if (la == a.numChars() && lb == b.numChars()) asciiSimilarity(a, b, la, lb)
    else {
      val s = a.toString
      val t = b.toString
      charSimilarity(s, t, s.length, t.length)
    }
  }

  /** Byte-loop path: valid when both sides are pure ASCII (byte i IS
    * char i). No String materialization. */
  private def asciiSimilarity(a: UTF8String, b: UTF8String,
      la: Int, lb: Int): Double = {
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val sMatch = new Array[Boolean](la)
    val tMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && a.getByte(i) == b.getByte(j)) {
          sMatch(i) = true
          tMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var halfTrans = 0
    var k = 0
    i = 0
    while (i < la) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) halfTrans += 1
        k += 1
      }
      i += 1
    }
    finish(m, halfTrans, la, lb, prefixLenAscii(a, b, la, lb))
  }

  private def prefixLenAscii(a: UTF8String, b: UTF8String,
      la: Int, lb: Int): Int = {
    var prefix = 0
    while (prefix < math.min(4, math.min(la, lb)) &&
      a.getByte(prefix) == b.getByte(prefix)) prefix += 1
    prefix
  }

  /** UTF-16 char-loop fallback for non-ASCII inputs. */
  private def charSimilarity(s: String, t: String, la: Int, lb: Int): Double = {
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val sMatch = new Array[Boolean](la)
    val tMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true
          tMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var halfTrans = 0
    var k = 0
    i = 0
    while (i < la) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) halfTrans += 1
        k += 1
      }
      i += 1
    }
    var prefix = 0
    while (prefix < math.min(4, math.min(la, lb)) &&
      s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    finish(m, halfTrans, la, lb, prefix)
  }

  /** The shared terminal IEEE tree — ONE spelling for both paths so
    * they cannot drift by association order. */
  private def finish(m: Int, halfTrans: Int, la: Int, lb: Int,
      prefix: Int): Double = {
    val trans = halfTrans / 2.0
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - trans) / m) / 3.0
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

object StringSimilarity {

  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  def register(spark: SparkSession): Unit = {
    val firstUse = registered.putIfAbsent(spark, java.lang.Boolean.TRUE) == null
    if (firstUse || !spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    }
  }

  /** Column surface for [[JaroWinkler]]. */
  def jaroWinkler(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function("jaro_winkler", a, b)
  }
}
