package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text-scan kernels for the quality/language-ID layer. The
  * regex formulations (`regexp_count`, `size(split(...))`) materialize
  * match arrays and — once several of them are fused into one predicate —
  * blow past codegen limits into interpreted evaluation with each
  * sub-regex re-evaluated per CASE branch. These kernels compute the
  * identical counts in one byte-scan per call.
  *
  * Exactness domain (pinned by the DuckDB oracles at sf0.01): the regex
  * character classes in play are ASCII (`[a-zA-Z]`, `[0-9]`, `\s`, and
  * `\b` over `\w = [A-Za-z0-9_]` — Java and RE2 agree on all of them),
  * so byte-level scanning is exact; any non-ASCII code point is counted
  * via its UTF-8 lead byte and classified as "other" (matches none of
  * the ASCII classes, matches their negation).
  */
object TextOps {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isWord(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '_'
  @inline private def isCont(b: Byte): Boolean = (b & 0xc0) == 0x80

  /** Count of maximal non-whitespace byte runs — the one scanner behind
    * both `ws_token_count` and `ws_split`'s sizing pass, so the two can
    * never disagree on what a token is. */
  private def tokenRunCount(bytes: Array[Byte]): Int = {
    var n = 0; var inRun = false; var i = 0
    while (i < bytes.length) {
      val ws = !isCont(bytes(i)) && isWs(bytes(i))
      if (!ws && !inRun) { n += 1; inRun = true }
      else if (ws) inRun = false
      i += 1
    }
    n
  }

  /** Count of maximal non-whitespace runs == `size(split(trim(s), "\s+"))`
    * for non-blank s, and 0 for blank (the `wsTokens` special case).
    */
  def wsTokenCount(s: UTF8String): Int = tokenRunCount(s.getBytes)

  /** Mixing finalizer for [[tokenHash]] (murmur3's avalanche), so the
    * rolling byte hash distributes well as a hash-table bucket key. */
  @inline def mixHash(h0: Int): Int = {
    var h = h0
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  /** Hash of a UTF8String's bytes under the SAME function
    * [[foreachWsTokenHashed]] computes inline during its scan — the one
    * token-hash every SpaceSaving state operation uses, so a hash
    * computed by either path always matches.
    */
  def tokenHash(s: UTF8String): Int = {
    var h = 1
    var i = 0
    val n = s.numBytes()
    while (i < n) { h = h * 31 + (s.getByte(i) & 0xff); i += 1 }
    mixHash(h)
  }

  /** Visit each maximal non-whitespace run of `s` as a UTF8String slice
    * plus its [[tokenHash]], computed DURING the boundary scan (one pass
    * over the bytes total — the consumer never re-reads token bytes just
    * to hash them). Token boundaries identical to [[wsSplit]] — same
    * isWs/isCont scanner, so a consumer can never disagree with the
    * exploded-stream form on what a token is. Slices alias `s`'s byte
    * array: a consumer that retains one must clone it.
    */
  def foreachWsTokenHashed(s: UTF8String, f: (UTF8String, Int) => Unit): Unit = {
    val bytes = s.getBytes
    var start = -1
    var h = 1
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = !isCont(b) && isWs(b)
      if (!ws) {
        if (start < 0) { start = i; h = 1 }
        h = h * 31 + (b & 0xff)
      } else if (start >= 0) {
        f(UTF8String.fromBytes(bytes, start, i - start), mixHash(h))
        start = -1
      }
      i += 1
    }
    if (start >= 0)
      f(UTF8String.fromBytes(bytes, start, bytes.length - start), mixHash(h))
  }

  /** [[foreachWsTokenHashed]] without the hash. */
  def foreachWsToken(s: UTF8String, f: UTF8String => Unit): Unit =
    foreachWsTokenHashed(s, (t, _) => f(t))

  /** Maximal non-whitespace byte runs as an array — exactly
    * `filter(split(trim(s), "\s+"), t -> length(t) > 0)` (empty array
    * for blank s). The regex-split + interpreted HOF-filter form walks
    * the interpreter per token; this is one byte scan emitting slices.
    */
  def wsSplit(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = tokenRunCount(bytes)
    val out = new Array[Any](n)
    var k = 0; var start = -1
    var i = 0
    while (i < bytes.length) {
      val ws = !isCont(bytes(i)) && isWs(bytes(i))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) {
        out(k) = UTF8String.fromBytes(bytes, start, i - start); k += 1
        start = -1
      }
      i += 1
    }
    if (start >= 0) { out(k) = UTF8String.fromBytes(bytes, start, bytes.length - start) }
    new GenericArrayData(out)
  }

  // ---- PII redaction kernel (td_redact) -------------------------------
  //
  // Exact emulation of the three-pass regex cascade
  //   1. [a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}  -> <EMAIL>
  //   2. \+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4} -> <PHONE>
  //   3. [0-9]{9,}                                       -> <NUM>
  // as hand matchers over raw bytes (all classes are ASCII; UTF-8
  // continuation bytes are ≥ 0x80 and match no class, so byte scanning
  // is exact). Each pass preserves java.util.regex/RE2 leftmost-first,
  // non-overlapping semantics, including the places backtracking can and
  // cannot change the outcome:
  //  - email local/domain runs are maximal (their classes exclude '@'
  //    and '.', the anchors that follow, so shrinking never helps) and a
  //    failed attempt anywhere in a local run fails for every later
  //    start inside the same run — the scanner may skip to the run end;
  //  - the domain backtracks only over WHICH dot starts the TLD: the
  //    largest split point whose dot is followed by ≥ 2 letters wins;
  //  - phone digit groups are bounded by separators ({1,3} and {3}
  //    cannot end inside a digit run), the {3,4} group prefers 4, and
  //    the trailing [- .]?[0-9]{0,4} is pure greed with nothing after
  //    it, so it never backtracks.
  // PiiRedactSpec pins equivalence against the regexp_replace cascade on
  // the real corpus plus adversarial generated strings.

  private val EmailTok = "<EMAIL>".getBytes
  private val PhoneTok = "<PHONE>".getBytes
  private val NumTok = "<NUM>".getBytes

  @inline private def isLocal(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  @inline private def isDomain(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'
  @inline private def isSep(b: Byte): Boolean =
    b == '-' || b == ' ' || b == '.'

  /** End offset of an email match starting exactly at `i` given the
    * local run ends at `le`, or -1. */
  private def tryEmail(b: Array[Byte], le: Int): Int = {
    val n = b.length
    if (le >= n || b(le) != '@') return -1
    val ds = le + 1
    var de = ds
    while (de < n && isDomain(b(de))) de += 1
    if (de == ds) return -1
    // largest dot split with >= 2 letters after it; domain part before
    // the dot must be nonempty (k >= ds + 1)
    var k = de - 1
    while (k >= ds + 1) {
      if (b(k) == '.') {
        var lr = k + 1
        while (lr < n && isAlpha(b(lr))) lr += 1
        if (lr - (k + 1) >= 2) return lr
      }
      k -= 1
    }
    -1
  }

  /** End offset of a phone match starting exactly at `i`, or -1. */
  private def tryPhone(b: Array[Byte], i: Int): Int = {
    val n = b.length
    var j = i
    if (j < n && b(j) == '+') j += 1
    var d1 = j
    while (d1 < n && isDigit(b(d1))) d1 += 1
    val len1 = d1 - j
    if (len1 < 1 || len1 > 3) return -1
    if (d1 >= n || !isSep(b(d1))) return -1
    val g2 = d1 + 1
    var d2 = g2
    while (d2 < n && isDigit(b(d2))) d2 += 1
    if (d2 - g2 != 3) return -1 // {3} then separator: a 4th digit kills it
    val p2 = g2 + 3
    if (p2 >= n || !isSep(b(p2))) return -1
    val g3 = p2 + 1
    var d3 = g3
    while (d3 < n && isDigit(b(d3))) d3 += 1
    val len3 = d3 - g3
    if (len3 < 3) return -1
    var p = g3 + (if (len3 >= 4) 4 else 3)
    if (p < n && isSep(b(p))) p += 1 // greedy optional separator
    var t = 0
    while (p < n && t < 4 && isDigit(b(p))) { p += 1; t += 1 }
    p
  }

  /** Pass 1: email replace + count. Returns the rewritten bytes (the
    * input array itself when no match) and the match count packed as
    * (bytes, count). */
  private def emailPass(b: Array[Byte]): (Array[Byte], Int) = {
    val n = b.length
    var out: java.io.ByteArrayOutputStream = null
    var count = 0
    var copied = 0
    var i = 0
    while (i < n) {
      if (isLocal(b(i))) {
        var le = i
        while (le < n && isLocal(b(le))) le += 1
        val end = tryEmail(b, le)
        if (end >= 0) {
          if (out == null) out = new java.io.ByteArrayOutputStream(n + 16)
          out.write(b, copied, i - copied)
          out.write(EmailTok, 0, EmailTok.length)
          count += 1
          copied = end
          i = end
        } else i = le // every start inside this local run fails identically
      } else i += 1
    }
    if (out == null) (b, 0)
    else { out.write(b, copied, n - copied); (out.toByteArray, count) }
  }

  /** Pass 2/3 driver: generic scan with a per-position matcher. */
  private def replacePass(b: Array[Byte], tok: Array[Byte],
                          canStart: Byte => Boolean,
                          matcher: (Array[Byte], Int) => Int): Array[Byte] = {
    val n = b.length
    var out: java.io.ByteArrayOutputStream = null
    var copied = 0
    var i = 0
    while (i < n) {
      var matched = -1
      if (canStart(b(i))) matched = matcher(b, i)
      if (matched >= 0) {
        if (out == null) out = new java.io.ByteArrayOutputStream(n + 16)
        out.write(b, copied, i - copied)
        out.write(tok, 0, tok.length)
        copied = matched
        i = matched
      } else i += 1
    }
    if (out == null) b
    else { out.write(b, copied, n - copied); out.toByteArray }
  }

  private def tryNum(b: Array[Byte], i: Int): Int = {
    var j = i
    while (j < b.length && isDigit(b(j))) j += 1
    if (j - i >= 9) j else -1
  }

  /** The full redaction cascade: (n_emails, redacted text) in one call —
    * three byte-array passes, no regex engine, no intermediate
    * UTF8String/String round trips.
    */
  def piiRedact(s: UTF8String): InternalRow = {
    val (afterEmail, nEmails) = emailPass(s.getBytes)
    val afterPhone = replacePass(afterEmail, PhoneTok,
      b => b == '+' || isDigit(b), tryPhone)
    val afterNum = replacePass(afterPhone, NumTok, isDigit, tryNum)
    new GenericInternalRow(Array[Any](nEmails, UTF8String.fromBytes(afterNum)))
  }

  /** One-pass per-document repetition stats over an (already
    * lowercased) text: `[n_tok, n_distinct_tok, max_tok_freq,
    * n_distinct_bigrams]`. Tokens are the maximal non-`\s` byte runs —
    * exactly `filter(split(s, "\s+"), length > 0)` — interned into an
    * id map as they stream by; bigram distinctness is EXACT, counted as
    * a set of packed (prev_id << 32 | id) longs rather than hashed
    * strings, so two different bigrams can never collide. Replaces an
    * explode → two aggregates → join pipeline (three shuffles of
    * token-scale data) with zero shuffles.
    */
  def tokenRepStats(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    val ids = new java.util.HashMap[UTF8String, Array[Int]]()
    val bigrams = new java.util.HashSet[Long]()
    var nTok = 0; var maxFreq = 0; var prevId = -1
    var i = 0; var start = -1
    while (i <= bytes.length) {
      val ws = i == bytes.length ||
        (!isCont(bytes(i)) && isWs(bytes(i)))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        var e = ids.get(tok)
        if (e == null) { e = Array(0, ids.size()); ids.put(tok, e) }
        e(0) += 1
        if (e(0) > maxFreq) maxFreq = e(0)
        if (nTok > 0) bigrams.add((prevId.toLong << 32) | e(1).toLong)
        prevId = e(1)
        nTok += 1
        start = -1
      }
      i += 1
    }
    Array(nTok, ids.size(), maxFreq, bigrams.size())
  }

  /** Per-document term frequencies — one `(tok, tf)` struct per DISTINCT
    * token, in first-occurrence order, from a single byte scan.
    * Equivalent to `explode(wsSplit(s))` followed by a per-document
    * `groupBy(tok).count()`, but the repeat-collapsing happens inside
    * the scan: the exploded form ships the FULL token stream (every
    * repeat a row) into a hash aggregate, which at corpus scale is the
    * dominant shuffle of the tf-idf / inverted-index builds — this
    * kernel hands downstream operators the already-collapsed pair
    * stream, so nothing token-volume ever moves.
    */
  def tokTf(s: UTF8String): GenericArrayData = {
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    foreachWsToken(s, { tok =>
      var e = counts.get(tok)
      if (e == null) { e = Array(0L); counts.put(tok, e) }
      e(0) += 1L
    })
    val out = new Array[Any](counts.size())
    var k = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** xxhash64 (seed 42 — Spark's `xxhash64`) of every word n-gram of an
    * ALREADY whitespace-normalized string (single spaces, the
    * `regexp_replace(\s+ → ' ')` form), without materializing a single
    * gram string: tokens of a normalized string are separated by
    * exactly one space, so gram i IS the byte range
    * [start(tok_i), end(tok_{i+n-1})) and hashes in place. Token
    * boundaries replicate `split(s, " ")` EXACTLY — empty tokens from
    * leading/trailing/lone spaces participate in grams just like the
    * string form (`concat_ws` keeps their separators), which
    * WordGramHashesSpec pins against `xxhash64(concat_ws(...))`.
    * Returns empty when the string has fewer than n tokens.
    */
  def wordGramHashes(s: UTF8String, n: Int): Array[Long] = {
    val bytes = s.getBytes
    var starts = new Array[Int](16)
    var nt = 0
    def addStart(x: Int): Unit = {
      if (nt == starts.length) starts = java.util.Arrays.copyOf(starts, nt * 2)
      starts(nt) = x; nt += 1
    }
    addStart(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') addStart(i + 1)
      i += 1
    }
    if (nt < n) return Array.emptyLongArray
    val out = new Array[Long](nt - n + 1)
    var g = 0
    while (g <= nt - n) {
      val from = starts(g)
      val until = if (g + n < nt) starts(g + n) - 1 else bytes.length
      out(g) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        until - from, 42L)
      g += 1
    }
    out
  }

  /** Signed feature-hash document vector (ta_doc_embed's kernel): one
    * byte scan over the ws-tokens of s, each token hashed with the
    * seeded md5Long60 and accumulated as ±1 into bucket h mod dim —
    * byte-identical to the explode → md5LongSeeded → pmod/shiftright →
    * dim conditional sums pipeline (h ≥ 0, so % == pmod and
    * (h>>8)&1 == pmod(shiftright(h,8),2)), as ONE map call: no token
    * stream, no doc_id shuffle.
    */
  def docVecHash(s: UTF8String, dim: Int, prefix: Array[Byte]): GenericArrayData = {
    val bytes = s.getBytes
    val acc = new Array[Long](dim)
    var start = -1
    var i = 0
    while (i <= bytes.length) {
      val ws = i == bytes.length || (!isCont(bytes(i)) && isWs(bytes(i)))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) {
        val h = SketchOps.md5Long60(prefix, UTF8String.fromBytes(bytes, start, i - start))
        acc((h % dim).toInt) += 1L - 2L * ((h >> 8) & 1L)
        start = -1
      }
      i += 1
    }
    val out = new Array[Any](dim)
    i = 0
    while (i < dim) { out(i) = acc(i); i += 1 }
    new GenericArrayData(out)
  }

  /** BPE-ish token count == `regexp_count(s, "[a-z]+|[0-9]+|[^a-z0-9\s]")`
    * on an already-lowercased string: one count per lowercase-alpha run,
    * per digit run, and per OTHER non-whitespace code point (non-ASCII
    * counts once per code point — lead byte, continuations skipped).
    * Alternation order matters in the regex (runs beat single chars);
    * the scan reproduces it by consuming maximal runs first.
    */
  def bpeTokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0; var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') {
        n += 1
        while (i < bytes.length && bytes(i) >= 'a' && bytes(i) <= 'z') i += 1
      } else if (isDigit(b)) {
        n += 1
        while (i < bytes.length && isDigit(bytes(i))) i += 1
      } else {
        if (!isCont(b) && !isWs(b)) n += 1
        i += 1
      }
    }
    n
  }

  /** mode 0: `[a-zA-Z]` count; mode 1: `[^a-zA-Z0-9\s]` count (each
    * non-ASCII code point counts once).
    */
  def asciiClassCount(s: UTF8String, mode: Int): Int = {
    val bytes = s.getBytes
    var n = 0; var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (!isCont(b)) {
        val alpha = isAlpha(b)
        if (mode == 0) { if (alpha) n += 1 }
        else if (!alpha && !isDigit(b) && !isWs(b)) n += 1
      }
      i += 1
    }
    n
  }

  /** Winnowing parameters (MOSS-style document fingerprinting, Schleimer
    * et al. SIGMOD'03): K-codepoint grams, rolling polynomial hash base B
    * mod prime M, sliding-window-min over W gram hashes. M < 2^27 keeps
    * every intermediate product exact in a signed 64-bit long, so any
    * engine reproduces the values with plain integer arithmetic.
    */
  final val WinnowK = 5
  final val WinnowW = 4
  final val WinnowB = 131L
  final val WinnowM = 134217689L // 2^27 - 39, prime

  /** Unicode codepoints of a UTF-8 string (decoded, not bytes). */
  def codepoints(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length)
    var n = 0; var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      var cp = b0; var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; len = 2 }
        else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; len = 3 }
        else { cp = b0 & 0x07; len = 4 }
        var j = 1
        while (j < len && i + j < bytes.length) {
          cp = (cp << 6) | (bytes(i + j) & 0x3f); j += 1
        }
      }
      out(n) = cp; n += 1; i += len
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** Distinct winnowing fingerprints of a (pre-normalized) string, in one
    * pass: rolling K-gram hashes (O(1) per position after the first gram),
    * then the min of each W-window, deduplicated. Shorter-than-K texts
    * hash as a single whole-text gram; fewer-than-W grams winnow to the
    * single global min; empty text fingerprints as [0].
    */
  def winnowFingerprints(s: UTF8String): Array[Long] = {
    val cps = codepoints(s.getBytes)
    val n = cps.length
    // gram hashes, rolling: h_{i+1} = (h_i*B + c_{i+K} - c_i*B^K) mod M
    val gh: Array[Long] =
      if (n < WinnowK) {
        var h = 0L; var i = 0
        while (i < n) { h = (h * WinnowB + cps(i)) % WinnowM; i += 1 }
        Array(h)
      } else {
        val out = new Array[Long](n - WinnowK + 1)
        var bk = 1L // B^K mod M
        var j = 0
        while (j < WinnowK) { bk = bk * WinnowB % WinnowM; j += 1 }
        var h = 0L; var i = 0
        while (i < WinnowK) { h = (h * WinnowB + cps(i)) % WinnowM; i += 1 }
        out(0) = h
        while (i < n) {
          h = (h * WinnowB + cps(i)) % WinnowM
          h = (h - cps(i - WinnowK) * bk % WinnowM + WinnowM) % WinnowM
          out(i - WinnowK + 1) = h
          i += 1
        }
        out
      }
    // winnow: min per W-window, distinct, ascending. Sliding minima via a
    // monotonic index deque (O(1) amortized per gram, vs the O(W) rescan
    // the first version paid), collected into a PRIMITIVE buffer with
    // adjacent-duplicate suppression (neighboring windows usually share
    // their min), then sort + dedup — same value SET as a TreeSet of all
    // window minima, without boxing one java.lang.Long per gram (which
    // at sf1 was ~100 M allocations and most of the kernel's cost).
    val mins = new Array[Long](gh.length)
    var nm = 0
    @inline def record(v: Long): Unit =
      if (nm == 0 || mins(nm - 1) != v) { mins(nm) = v; nm += 1 }
    if (gh.length <= WinnowW) {
      var m = gh(0); var i = 1
      while (i < gh.length) { if (gh(i) < m) m = gh(i); i += 1 }
      record(m)
    } else {
      val dq = new Array[Int](gh.length)
      var head = 0; var tail = 0 // dq[head until tail] = candidate indices
      var i = 0
      while (i < gh.length) {
        while (tail > head && gh(dq(tail - 1)) >= gh(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - WinnowW) head += 1
        if (i >= WinnowW - 1) record(gh(dq(head)))
        i += 1
      }
    }
    val sorted = java.util.Arrays.copyOf(mins, nm)
    java.util.Arrays.sort(sorted)
    var out = 0
    var i = 0
    while (i < nm) {
      if (out == 0 || sorted(out - 1) != sorted(i)) { sorted(out) = sorted(i); out += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(sorted, out)
  }

  /** Count of maximal `\w`-runs whose ASCII-lowercased form is in
    * `words` == `regexp_count(lower(s), "\b(?:w1|w2|...)\b")` for
    * ASCII word lists.
    */
  def wordSetCount(s: UTF8String, words: java.util.HashSet[String]): Int = {
    val bytes = s.getBytes
    var n = 0; var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < bytes.length) {
      val b = bytes(i)
      if (!isCont(b) && isWord(b)) {
        sb.append((if (b >= 'A' && b <= 'Z') b + 32 else b.toInt).toChar)
      } else if (sb.length() > 0) {
        // any non-word byte — including the lead/continuation bytes of a
        // non-ASCII char, which is never `\w` — terminates the run
        if (words.contains(sb.toString)) n += 1
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length() > 0 && words.contains(sb.toString)) n += 1
    n
  }

  private val EmptyLongArray =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.emptyLongArray)

  /** One byte-scan heavy-hitter counting kernel (ta_heavy_hitters_exact
    * pass 2): token boundaries are [[wsSplit]]'s EXACTLY (the same
    * maximal non-whitespace-run scanner), each run is probed into the
    * row's source-specific candidate map (UTF8String wraps the slice —
    * no byte copy), and the result is one long[|candidates(source)|]
    * count vector per document. Replaces the exploded-token-stream ⋈
    * broadcast-candidates pass: same counts, zero explode rows, one
    * scan of `text`.
    */
  def tokenSetCounts(src: UTF8String, s: UTF8String,
                     idx: TokenSetIndex): org.apache.spark.sql.catalyst.util.ArrayData = {
    val per = idx.bySource.get(src)
    if (per == null || per.n == 0) return EmptyLongArray
    val counts = new Array[Long](per.n)
    val bytes = s.getBytes
    var start = -1
    var i = 0
    while (i < bytes.length) {
      val ws = !isCont(bytes(i)) && isWs(bytes(i))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) {
        val slot = per.slots.get(UTF8String.fromBytes(bytes, start, i - start))
        if (slot != null) counts(slot.intValue()) += 1L
        start = -1
      }
      i += 1
    }
    if (start >= 0) {
      val slot = per.slots.get(UTF8String.fromBytes(bytes, start, bytes.length - start))
      if (slot != null) counts(slot.intValue()) += 1L
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(counts)
  }
}

/** `ws_token_count(string)` → int. */
case class WsTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ws_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ws_token_count expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.wsTokenCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.wsTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ws_split(string)` → array<string>: maximal non-whitespace runs,
  * == `filter(split(trim(s), "\s+"), t -> length(t) > 0)`.
  */
case class WsSplit(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ws_split"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ws_split expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.wsSplit(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.wsSplit($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `doc_vec_hash(string, dim, seed)` → array<long> of length dim — the
  * one-pass signed feature-hash document vector
  * ([[TextOps.docVecHash]]).
  */
case class DocVecHash(child: Expression, dim: Int, seed: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "doc_vec_hash"

  @transient private lazy val prefix: Array[Byte] = SketchOps.seedPrefix(seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"doc_vec_hash expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.docVecHash(s.asInstanceOf[UTF8String], dim, prefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefix", prefix, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.docVecHash($c, $dim, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pii_redact(string)` → struct<n_emails int, clean_text string>: the
  * email/phone/digit-run redaction cascade plus the email count in one
  * compiled call — see the kernel notes on [[TextOps.piiRedact]].
  */
case class PiiRedact(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PiiRedact.resultType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pii_redact"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pii_redact expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.piiRedact(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.piiRedact($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiRedact {
  val resultType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_emails", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("clean_text", StringType, nullable = false)))
}

/** `ascii_class_count(string, mode)` → int. */
case class AsciiClassCount(child: Expression, mode: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_class_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ascii_class_count expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.asciiClassCount(s.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.asciiClassCount($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_set_count(string, words)` → int: `\b(?:w1|...)\b` matches on the
  * ASCII-lowercased text.
  */
case class WordSetCount(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_set_count"

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(w => s.add(w.toLowerCase))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_set_count expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.wordSetCount(s.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", wordSet, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.wordSetCount($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_set_counts(source, text)` → array<long>: per-candidate exact
  * token counts against the source's candidate list (see
  * [[TextOps.tokenSetCounts]]; expects already-normalized text — the
  * caller composes `lower(trim(text))` so the boundaries and byte
  * equality are identical to the `ws_split` token stream the candidates
  * came from).
  */
case class TokenSetCounts(left: Expression, right: Expression,
                          index: TokenSetIndex)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_set_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_set_counts expects (string, string), got ($l, $r)")
    }

  override protected def nullSafeEval(src: Any, s: Any): Any =
    TextOps.tokenSetCounts(src.asInstanceOf[UTF8String],
      s.asInstanceOf[UTF8String], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("idx", index,
      "graft.functions.TokenSetIndex")
    defineCodeGen(ctx, ev, (src, s) =>
      s"graft.functions.TextOps.tokenSetCounts($src, $s, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `bpe_token_count(string)` → int (see [[TextOps.bpeTokenCount]];
  * expects already-lowercased input).
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_token_count expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.bpeTokenCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.bpeTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_rep_stats(string)` → array<int>:
  * [n_tok, n_distinct_tok, max_tok_freq, n_distinct_bigrams] in one
  * byte-scan (see [[TextOps.tokenRepStats]]).
  */
case class TokenRepStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_rep_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_rep_stats expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextOps.tokenRepStats(s.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextOps.tokenRepStats($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `tok_tf(string)` → array<struct<tok:string, tf:bigint>>: per-document
  * distinct-token term frequencies in one byte scan (see
  * [[TextOps.tokTf]]).
  */
case class TokTf(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tok", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("tf",
          org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tok_tf"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"tok_tf expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextOps.tokTf(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.tokTf($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_gram_hashes(string, n)` → array<long>: xxhash64 of each word
  * n-gram of a whitespace-normalized string, hashed in place (see
  * [[TextOps.wordGramHashes]]).
  */
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType,
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_gram_hashes expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextOps.wordGramHashes(s.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextOps.wordGramHashes($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `winnow_fingerprints(string)` → array<long>: distinct MOSS-style
  * winnowing fingerprints (rolling K-gram hash + sliding-window min) of
  * the input, ascending.
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType,
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_fingerprints expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextOps.winnowFingerprints(s.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextOps.winnowFingerprints($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  def wsTokenCount(c: Column): Column =
    Bridge.column(WsTokenCount(Bridge.expression(c)))
  def winnowFingerprints(c: Column): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c)))
  def alphaCount(c: Column): Column =
    Bridge.column(AsciiClassCount(Bridge.expression(c), 0))
  def punctCount(c: Column): Column =
    Bridge.column(AsciiClassCount(Bridge.expression(c), 1))
  def wordSetCount(c: Column, words: Seq[String]): Column =
    Bridge.column(WordSetCount(Bridge.expression(c), words))
  def tokenRepStats(c: Column): Column =
    Bridge.column(TokenRepStats(Bridge.expression(c)))
  def tokTf(c: Column): Column =
    Bridge.column(TokTf(Bridge.expression(c)))
  def wordGramHashes(c: Column, n: Int): Column =
    Bridge.column(WordGramHashes(Bridge.expression(c), n))
  def bpeTokenCount(c: Column): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(c)))
  def wsSplit(c: Column): Column =
    Bridge.column(WsSplit(Bridge.expression(c)))
  def docVecHash(c: Column, dim: Int, seed: Int): Column =
    Bridge.column(DocVecHash(Bridge.expression(c), dim, seed))
  def piiRedact(c: Column): Column =
    Bridge.column(PiiRedact(Bridge.expression(c)))
  def tokenSetCounts(src: Column, text: Column, idx: TokenSetIndex): Column =
    Bridge.column(TokenSetCounts(Bridge.expression(src), Bridge.expression(text), idx))
}

/** Per-source candidate index for [[TextOps.tokenSetCounts]]: source →
  * (token → slot, slot count). Built once on the driver from a bounded
  * control table (≤ sketch-capacity × |sources| rows) and shipped as an
  * expression reference object — top-level so codegen can name the type.
  */
final class TokenSetIndex(entries: Map[String, Array[String]]) extends Serializable {
  @transient lazy val bySource: java.util.HashMap[UTF8String, TokenSetIndex.PerSource] = {
    val m = new java.util.HashMap[UTF8String, TokenSetIndex.PerSource]()
    entries.foreach { case (src, toks) =>
      val tm = new java.util.HashMap[UTF8String, Integer]()
      toks.zipWithIndex.foreach { case (t, i) =>
        tm.put(UTF8String.fromString(t), Integer.valueOf(i))
      }
      m.put(UTF8String.fromString(src), new TokenSetIndex.PerSource(tm, toks.length))
    }
    m
  }
}

object TokenSetIndex {
  final class PerSource(val slots: java.util.HashMap[UTF8String, Integer], val n: Int)
}
