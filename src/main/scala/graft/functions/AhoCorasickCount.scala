package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern counting automaton over raw bytes.
  *
  * Dense goto table (states × 256 ints) converted to a total
  * transition function (the classic BFS fail-link construction, with
  * fail transitions folded INTO the table so the scan loop is one
  * array lookup per input byte — no fail-chain walking at match
  * time). Per-state pattern-hit lists are pre-closed over the fail
  * chain and flattened into (offset, ids) arrays, so emitting matches
  * is a straight array scan.
  *
  * Counting semantics: every END POSITION of every pattern counts —
  * i.e. all occurrences, overlapping included, per pattern
  * independently. For patterns with no proper border (prefix that is
  * also a suffix) this equals the non-overlapping count.
  *
  * Memory: states ≤ Σ pattern bytes + 1; the table is
  * 1 KiB per state — a 5k-term, 8-byte-average blocklist is ~40 MiB,
  * built once per executor from the tiny pattern list (the list, not
  * the table, travels with the serialized plan).
  */
final class AcAutomaton(patterns: Array[Array[Byte]])
    extends Serializable {

  require(patterns.forall(_.nonEmpty), "empty blocklist pattern")

  val nPatterns: Int = patterns.length

  // --- trie construction -------------------------------------------------
  // ONLY `patterns` is serialized state: the dense tables (1 KiB per
  // state) live in this @transient lazy group and are rebuilt once
  // per JVM on first use, so the plan ships the tiny term list, never
  // the automaton. The flat table is built in place (the 2-D build
  // array is local and dropped), so peak memory is one table, not two.
  // goto(state)(byte) = next state, -1 while building
  @transient private lazy val tables: (Array[Int], Array[Int], Array[Int]) = {
    val maxStates = patterns.map(_.length).sum + 1
    val g = Array.fill(maxStates, 256)(-1)
    val ends = Array.fill(maxStates)(List.empty[Int]) // pattern ids ending here
    var nStates = 1
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xff
        if (g(s)(c) == -1) { g(s)(c) = nStates; nStates += 1 }
        s = g(s)(c)
      }
      ends(s) ::= id
    }
    // BFS: fail links; fold fails into the table (total function) and
    // close the hit lists over the fail chain.
    val fail = new Array[Int](nStates)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      if (g(0)(c) == -1) g(0)(c) = 0
      else { fail(g(0)(c)) = 0; queue += g(0)(c) }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      ends(s) = ends(s) ++ ends(fail(s)) // fail-chain closure
      (0 until 256).foreach { c =>
        val t = g(s)(c)
        if (t == -1) g(s)(c) = g(fail(s))(c)
        else { fail(t) = g(fail(s))(c); queue += t }
      }
    }
    val off = new Array[Int](nStates + 1)
    (0 until nStates).foreach(s => off(s + 1) = off(s) + ends(s).size)
    val ids = new Array[Int](off(nStates))
    (0 until nStates).foreach { s =>
      var k = off(s)
      ends(s).foreach { id => ids(k) = id; k += 1 }
    }
    // flatten (state*256 + byte) — one bounds check and better
    // locality than the 2-D form in the hot loop
    val f = new Array[Int](nStates * 256)
    var s = 0
    while (s < nStates) {
      System.arraycopy(g(s), 0, f, s * 256, 256)
      s += 1
    }
    (f, off, ids)
  }

  @transient private lazy val gotoFlat: Array[Int] = tables._1
  @transient private lazy val hitOff: Array[Int] = tables._2
  @transient private lazy val hitIds: Array[Int] = tables._3

  /** One pass; per-pattern occurrence counts. */
  def count(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](nPatterns)
    val g = gotoFlat
    val off = hitOff
    val ids = hitIds
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = g((s << 8) | (bytes(i) & 0xff))
      var k = off(s)
      val end = off(s + 1)
      while (k < end) { out(ids(k)) += 1L; k += 1 }
      i += 1
    }
    out
  }

  /** One pass with EARLY EXIT: true as soon as ANY pattern occurs —
    * the boolean gate form (`max hits = 0`), where a rejected
    * document stops at its first hit and a kept document costs
    * exactly one scan. */
  def anyHit(bytes: Array[Byte]): Boolean = {
    val g = gotoFlat
    val off = hitOff
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = g((s << 8) | (bytes(i) & 0xff))
      if (off(s) != off(s + 1)) return true
      i += 1
    }
    false
  }

  /** Codegen entry point: UTF8String in, Catalyst array out. */
  def countArray(str: UTF8String): GenericArrayData =
    new GenericArrayData(count(str.getBytes))

  /** Codegen entry point for the gate form. */
  def hit(str: UTF8String): Boolean = anyHit(str.getBytes)
}

/** Native Catalyst expression: per-pattern occurrence counts of a
  * literal pattern list in one Aho–Corasick pass over the input
  * string (SURVEY.md §7.5 tier (b) — the composed built-in form is k
  * separate full-string scans). Returns `array<bigint>` aligned with
  * the pattern list; null in → null out.
  */
case class AhoCorasickCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ac_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ac_counts needs a string input, got ${child.dataType.catalogString}")
    else if (patterns.isEmpty || patterns.exists(_.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        "ac_counts needs a non-empty list of non-empty patterns")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val ac =
    new AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)

  override def nullSafeEval(input: Any): Any =
    ac.countArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = $acRef.countArray($str);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AhoCorasickCount = copy(child = newChild)
}

/** Boolean gate form of [[AhoCorasickCount]]: does ANY pattern occur?
  * Same automaton, but the scan EARLY-EXITS at the first hit — the
  * right shape for a zero-tolerance blocklist filter, where rejected
  * documents (the ones that cost a naive k-scan composition the most)
  * stop at their first match. */
case class AhoCorasickHit(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ac_hit"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ac_hit needs a string input, got ${child.dataType.catalogString}")
    else if (patterns.isEmpty || patterns.exists(_.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        "ac_hit needs a non-empty list of non-empty patterns")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val ac =
    new AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)

  override def nullSafeEval(input: Any): Any =
    ac.hit(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = $acRef.hit($str);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AhoCorasickHit = copy(child = newChild)
}

object AhoCorasickCount {
  import org.apache.spark.sql.graftbridge.GraftSql

  /** Column API: `ac_counts(lower(col("text")), terms)`. */
  def ac_counts(c: Column, patterns: Seq[String]): Column =
    GraftSql.column(AhoCorasickCount(GraftSql.expression(c), patterns))

  /** Column API: `ac_hit(lower(col("text")), terms)` — early-exit
    * boolean gate. */
  def ac_hit(c: Column, patterns: Seq[String]): Column =
    GraftSql.column(AhoCorasickHit(GraftSql.expression(c), patterns))

  private def litPatterns(exprs: Seq[Expression]): Seq[String] =
    exprs.tail.map(_.eval(null)
      .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  /** SQL registration: `ac_counts(text, 't1', 't2', …)` /
    * `ac_hit(text, 't1', …)` with literal pattern arguments. */
  def register(spark: SparkSession): Unit = {
    GraftSql.registerFunction(spark, "ac_counts",
      exprs => AhoCorasickCount(exprs.head, litPatterns(exprs)))
    GraftSql.registerFunction(spark, "ac_hit",
      exprs => AhoCorasickHit(exprs.head, litPatterns(exprs)))
  }
}
