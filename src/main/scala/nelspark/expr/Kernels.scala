package nelspark.expr

import java.text.Normalizer
import java.util.Locale
import scala.collection.mutable

/**
 * Pure, deterministic scalar kernels backing the custom Catalyst
 * expressions in [[Exprs]]. Each is a static function so generated
 * (whole-stage codegen) code can call it directly.
 *
 * Determinism rules (SURVEY.md §7.6): explicit UTF-8, `Locale.ROOT`
 * everywhere, no wall-clock, no global RNG.
 *
 * Reference semantics: andychisholm/nel derives name-similarity and
 * char-n-gram name-model features during candidate ranking
 * (nel/features/, nel/model/prepare/derived.py — reference absent at
 * survey time, see SURVEY.md §0; module paths per the public repo).
 */
object Kernels {

  // ---------------------------------------------------------------- hashing

  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L

  /** SplitMix64-style avalanche; used to derive per-seed hash families. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + P1
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic 64-bit hash of UTF-8 bytes with a seed (xxh64-flavored
    * byte mix; stable across JVMs — no reliance on String.hashCode). */
  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    var h = seed ^ (bytes.length * P1)
    var i = 0
    // 8-byte stride
    while (i + 8 <= bytes.length) {
      var k = 0L
      var j = 0
      while (j < 8) { k = (k << 8) | (bytes(i + j) & 0xffL); j += 1 }
      h = java.lang.Long.rotateLeft(h ^ mix64(k), 27) * P1 + P2
      i += 8
    }
    while (i < bytes.length) {
      h = java.lang.Long.rotateLeft(h ^ ((bytes(i) & 0xffL) * P3), 11) * P1
      i += 1
    }
    mix64(h)
  }

  def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  // ------------------------------------------------------ name similarity

  /** Jaro similarity. Semantics pinned to DuckDB `jaro_similarity` so the
    * driver's DuckDB oracle compares bit-exactly: either side empty → 0.0,
    * equal → 1.0, match window = max(l1,l2)/2 - 1 (min 0). */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  /** Jaro-Winkler, DuckDB/rapidfuzz semantics: prefix boost (scale 0.1,
    * max prefix 4) applied only when jaro > 0.7. Verified against DuckDB
    * 1.0 `jaro_winkler_similarity` on 3000 fuzz pairs (0 mismatches). */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(s1.length, s2.length))
    while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
    j + 0.1 * l * (1.0 - j)
  }

  /** Levenshtein ratio in [0,1]: 1 - dist/max(len); 1.0 for two empties. */
  def levenshteinRatio(s1: String, s2: String): Double = {
    val n = math.max(s1.length, s2.length)
    if (n == 0) 1.0 else 1.0 - levenshtein(s1, s2).toDouble / n
  }

  /** Classic two-row DP Levenshtein (unit costs), same as DuckDB/Spark. */
  def levenshtein(s1: String, s2: String): Int = {
    if (s1 == s2) return 0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    var prev = Array.tabulate(l2 + 1)(identity)
    var cur = new Array[Int](l2 + 1)
    var i = 1
    while (i <= l1) {
      cur(0) = i
      var j = 1
      while (j <= l2) {
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(l2)
  }

  // ------------------------------------------------------- normalization

  /** Name-normalization key (blocking pass #1): lowercase (ROOT), NFD
    * diacritic fold, non-alphanumeric → space, collapse runs, trim.
    * Reference analog: alias-key build in nel/model/prepare/derived.py +
    * nel/process/candidates.py (UNVERIFIED, SURVEY.md §2.2 P4). */
  def normalizeName(s: String): String = {
    val folded = Normalizer.normalize(s.toLowerCase(Locale.ROOT), Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(folded.length)
    var lastSpace = true
    var i = 0
    while (i < folded.length) {
      val c = folded.charAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK) {
        if (Character.isLetterOrDigit(c)) { sb.append(c); lastSpace = false }
        else if (!lastSpace) { sb.append(' '); lastSpace = true }
      }
      i += 1
    }
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    sb.substring(0, end)
  }

  // --------------------------------------------------------- text extract

  private val BlockTags: Set[String] = Set(
    "title", "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "section",
    "article", "header", "footer", "body", "html", "head")

  /**
   * Deterministic HTML → text (the `north_rule` byte-identical invariant,
   * FIXTURES.md §3 pins the contract): UTF-8 decode; drop script/style
   * subtrees; block-element boundaries emit '\n'; tags stripped; entities
   * `&amp; &lt; &gt; &quot; &apos; &#NN; &#xNN;` decoded; within-line
   * whitespace runs collapse to one space, lines trimmed; empty lines
   * dropped; no Unicode normalization.
   */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.lang.StringBuilder(s.length)
    val line = new java.lang.StringBuilder(128)
    var i = 0
    var skipUntil: String = null // inside <script>/<style>

    def flushLine(): Unit = {
      var end = line.length
      while (end > 0 && line.charAt(end - 1) == ' ') end -= 1
      if (end > 0) {
        if (out.length > 0) out.append('\n')
        out.append(line, 0, end)
      }
      line.setLength(0)
    }
    def appendChar(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        if (line.length > 0 && line.charAt(line.length - 1) != ' ') line.append(' ')
      } else line.append(c)
    }

    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close < 0) { i = s.length } // malformed trailing tag: drop rest
        else {
          val inner = s.substring(i + 1, close).trim
          val isEnd = inner.startsWith("/")
          val rawName = (if (isEnd) inner.substring(1) else inner)
            .takeWhile(ch => Character.isLetterOrDigit(ch)).toLowerCase(Locale.ROOT)
          if (skipUntil != null) {
            if (isEnd && rawName == skipUntil) skipUntil = null
          } else if (!isEnd && (rawName == "script" || rawName == "style")) {
            skipUntil = rawName
          } else if (BlockTags.contains(rawName)) {
            flushLine()
          }
          // inline tags contribute nothing (no implicit space)
          i = close
        }
      } else if (skipUntil == null) {
        if (c == '&') {
          val semi = s.indexOf(';', i + 1)
          if (semi > i && semi - i <= 8) {
            val ent = s.substring(i + 1, semi)
            val dec: Int = ent match {
              case "amp"  => '&'
              case "lt"   => '<'
              case "gt"   => '>'
              case "quot" => '"'
              case "apos" => '\''
              case e if e.startsWith("#x") || e.startsWith("#X") =>
                try Integer.parseInt(e.substring(2), 16) catch { case _: NumberFormatException => -1 }
              case e if e.startsWith("#") =>
                try Integer.parseInt(e.substring(1)) catch { case _: NumberFormatException => -1 }
              case _ => -1
            }
            if (dec >= 0) {
              if (Character.isSupplementaryCodePoint(dec)) {
                line.append(Character.toChars(dec)); // supplementary never ws
              } else appendChar(dec.toChar)
              i = semi
            } else appendChar(c)
          } else appendChar(c)
        } else appendChar(c)
      }
      i += 1
    }
    flushLine()
    out.toString
  }

  // ----------------------------------------------------------- n-grams

  /** Distinct character n-grams in first-occurrence order; the whole
    * string if shorter than n. Input expected pre-normalized. */
  def charNGrams(s: String, n: Int): Array[String] = {
    if (s.length <= n) return if (s.isEmpty) Array.empty else Array(s)
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    while (i + n <= s.length) { seen.add(s.substring(i, i + n)); i += 1 }
    seen.toArray
  }

  /** Whitespace tokens (simple split, empties dropped). */
  def tokens(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  // ----------------------------------------------------------- minhash

  /** k-permutation MinHash signature over a term set. One byte-level hash
    * per term; family i = mix64(h ^ salt_i) (Kirsch-Mitzenmacher-style
    * derived families — k× cheaper than re-hashing the bytes per family,
    * same collision behavior for LSH banding). Empty input →
    * Long.MaxValue rows (never collides with real signatures in band
    * hashing). */
  def minHashSignature(terms: Array[String], k: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val salts = new Array[Long](k)
    var i = 0
    while (i < k) { salts(i) = mix64(seed + i); i += 1 }
    var t = 0
    while (t < terms.length) {
      val h0 = hashBytes(
        terms(t).getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)
      i = 0
      while (i < k) {
        val h = mix64(h0 ^ salts(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    sig
  }

  /** Seeded hash of a char window of `s` — no substring/byte-array
    * allocation (chars mixed as 16-bit values; a distinct family from
    * [[hashBytes]], which is fine — minhash only needs a consistent one). */
  @inline def hashChars(s: String, off: Int, n: Int, seed: Long): Long = {
    var h = seed ^ (n * P1)
    var j = 0
    while (j < n) {
      h = java.lang.Long.rotateLeft(h ^ mix64(s.charAt(off + j).toLong), 27) * P1 + P2
      j += 1
    }
    mix64(h)
  }

  /** Fused char-n-gram MinHash: signature of the n-gram multiset of `s`
    * computed by sliding a char window — no n-gram materialization, no
    * dedup (the min over a multiset equals the min over its set). Replaces
    * charNGrams→minHashSignature composition in the hot path: the
    * composed form allocates ~len substrings + a LinkedHashSet per row. */
  def minHashNgrams(s: String, n: Int, k: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val salts = new Array[Long](k)
    var i = 0
    while (i < k) { salts(i) = mix64(seed + i); i += 1 }
    val len = s.length
    @inline def update(h0: Long): Unit = {
      var j = 0
      while (j < k) {
        val h = mix64(h0 ^ salts(j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
    }
    if (len == 0) return sig
    if (len <= n) { update(hashChars(s, 0, len, seed)); return sig }
    var off = 0
    while (off + n <= len) { update(hashChars(s, off, n, seed)); off += 1 }
    sig
  }

  /** LSH band keys: signature sliced into `bands` equal bands, each band
    * hashed to one Long (band index mixed in so bands never cross). */
  def minHashBands(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix64(0x5EEDB00L + b)
      var r = 0
      while (r < rows) { h = mix64(h ^ sig(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** 64-bit SimHash over a term multiset (near-dup fingerprint). */
  def simHash64(terms: Array[String]): Long = {
    val acc = new Array[Int](64)
    var t = 0
    while (t < terms.length) {
      val h = hashString(terms(t), 0x51ABA5EL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Rolling-hash (Rabin-style) document fingerprint: min of window-w
    * rolling hashes over the token-hash sequence — robust to local edits
    * (winnowing-lite, one fingerprint). */
  def docFingerprint(toks: Array[String], w: Int): Long = {
    if (toks.isEmpty) return 0L
    val hs = toks.map(hashString(_, 0xF1A9L))
    if (hs.length <= w) return hs.foldLeft(mix64(0xF1A9L))((a, b) => mix64(a ^ b))
    var min = Long.MaxValue
    var i = 0
    while (i + w <= hs.length) {
      var h = mix64(0xF1A9L)
      var j = 0
      while (j < w) { h = mix64(h ^ hs(i + j)); j += 1 }
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Character-set Jaccard similarity, pinned to DuckDB `jaccard()`:
    * |chars(a) ∩ chars(b)| / |chars(a) ∪ chars(b)| (multiset-insensitive). */
  def charSetJaccard(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    val sa = new java.util.HashSet[Char]()
    val sb = new java.util.HashSet[Char]()
    a.foreach(sa.add); b.foreach(sb.add)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  // -------------------------------------------------------- dense vectors

  /** Cosine similarity of two equal-length float vectors; 0.0 if either
    * has zero norm or lengths differ. */
  def cosineFloat(a: Array[Float], b: Array[Float]): Double = {
    if (a.length != b.length) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    // dot/(sqrt·sqrt) — matches DuckDB list_cosine_similarity on DOUBLE[]
    // bit-for-bit (sequential double accumulation, separate sqrts)
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // -------------------------------------------------------- sign LSH

  /** Deterministic pseudo-gaussian hyperplane component for sign-LSH
    * (symmetric zero-mean uniform in [-1,1) from a mixed hash; sign-LSH
    * needs no true gaussian). Bit-compatible with the Column-composed
    * form previously in nelspark.ann.Ann. */
  def lshComponent(seed: Long, table: Int, bit: Int, dim: Int): Double = {
    val h = mix64(seed ^ (table.toLong << 40) ^ (bit.toLong << 20) ^ dim.toLong)
    (h >>> 11) * 1.1102230246251565e-16 * 2.0 - 1.0
  }

  private val lshPlanes =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int, Int), Array[Double]]()

  /** All `tables` sign-LSH bucket keys of a float vector in one pass:
    * element t = the `bits` hyperplane-dot signs of table t packed into a
    * long. Hyperplanes are seed-derived and cached per (seed,tables,bits,
    * dim) — one plane build per executor, 0 allocations per row beyond
    * the output array. */
  def signLshBuckets(vec: Array[Float], tables: Int, bits: Int, seed: Long): Array[Long] = {
    val dim = vec.length
    val planes = lshPlanes.computeIfAbsent((seed, tables, bits, dim), key => {
      val p = new Array[Double](tables * bits * dim)
      var t = 0
      while (t < tables) {
        var b = 0
        while (b < bits) {
          var d = 0
          while (d < dim) {
            p((t * bits + b) * dim + d) = lshComponent(seed, t, b, d)
            d += 1
          }
          b += 1
        }
        t += 1
      }
      p
    })
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        val off = (t * bits + b) * dim
        var d = 0
        while (d < dim) { dot += vec(d) * planes(off + d); d += 1 }
        if (dot >= 0) key |= (1L << b)
        b += 1
      }
      out(t) = key
      t += 1
    }
    out
  }

  /**
   * Indices of the `nprobe` nearest centroids of `vec` by cosine
   * similarity (ties → lowest index), against a caller-supplied centroid
   * matrix with precomputed L2 norms. Per-row cost nlist×dim flops, zero
   * shuffle — the map-side replacement for the crossJoin+window IVF
   * assignment plan. Zero-norm vectors/centroids score 0.0 (cosineFloat
   * semantics).
   */
  def nearestCells(vec: Array[Float], cent: Array[Array[Float]],
      centNorms: Array[Double], nprobe: Int): Array[Int] = {
    val m = cent.length
    var nv = 0.0
    var i = 0
    while (i < vec.length) { nv += vec(i).toDouble * vec(i); i += 1 }
    val vNorm = math.sqrt(nv)
    val sims = new Array[Double](m)
    var cIdx = 0
    while (cIdx < m) {
      val cv = cent(cIdx)
      if (cv.length == vec.length && nv != 0.0 && centNorms(cIdx) != 0.0) {
        var dot = 0.0
        var d = 0
        while (d < cv.length) { dot += vec(d).toDouble * cv(d); d += 1 }
        sims(cIdx) = dot / (vNorm * centNorms(cIdx))
      }
      cIdx += 1
    }
    val k = math.min(nprobe, m)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](m)
    var r = 0
    while (r < k) {
      // NaN sims (NaN input components) sort below everything: they
      // never beat a number and seed bestSim as -inf, so the output is
      // always k DISTINCT indices — never a repeated cell
      var best = -1
      var bestSim = Double.NegativeInfinity
      var j = 0
      while (j < m) {
        if (!taken(j)) {
          val s = sims(j)
          // strict > keeps the lowest index on ties (≡ desc(sim), asc(cell))
          if (best == -1) { best = j; if (!s.isNaN) bestSim = s }
          else if (s > bestSim) { best = j; bestSim = s }
        }
        j += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    out
  }

  // ------------------------------------------------------ mention spans

  /** A detected mention span: [begin, end) char offsets into the text. */
  final case class Span(begin: Int, end: Int, name: String)

  private def isCapToken(t: String): Boolean =
    t.nonEmpty && Character.isUpperCase(t.charAt(0))

  /**
   * Deterministic capitalized-span mention detector (SURVEY.md §2.2 P3):
   * maximal runs of capitalized tokens (incl. initials "J.") of 1..5
   * tokens. Replaces nel's external NER taggers (nel/process/tag.py,
   * UNVERIFIED) — sufficient because the gate scores clusters, not NER.
   */
  def extractMentions(text: String): Array[Span] = {
    val out = mutable.ArrayBuffer.empty[Span]
    var i = 0
    val n = text.length
    var runStart = -1
    var runEnd = -1
    var runLen = 0
    def closeRun(): Unit = {
      if (runStart >= 0 && runLen >= 1 && runLen <= 5) {
        out += Span(runStart, runEnd, text.substring(runStart, runEnd))
      }
      runStart = -1; runLen = 0
    }
    while (i < n) {
      // skip whitespace; '\n' is a block boundary — never span across it
      var sawNewline = false
      while (i < n && Character.isWhitespace(text.charAt(i))) {
        if (text.charAt(i) == '\n') sawNewline = true
        i += 1
      }
      if (sawNewline) closeRun()
      val tokStart = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > tokStart) {
        // trim trailing sentence punctuation (keep '.' for initials like "J.")
        var te = i
        while (te > tokStart && { val c = text.charAt(te - 1)
            c == ',' || c == ';' || c == ':' || c == '!' || c == '?' || c == ')' || c == '"' }) te -= 1
        var ts = tokStart
        while (ts < te && { val c = text.charAt(ts); c == '(' || c == '"' }) ts += 1
        val tok = if (te > ts) text.substring(ts, te) else ""
        val isInitial = tok.length == 2 && tok.charAt(1) == '.' && Character.isUpperCase(tok.charAt(0))
        val keepDot = isInitial
        val cleanEnd = if (!keepDot && tok.nonEmpty && tok.charAt(tok.length - 1) == '.') te - 1 else te
        val clean = if (cleanEnd > ts) text.substring(ts, cleanEnd) else ""
        if (isCapToken(clean)) {
          if (runStart < 0) runStart = ts
          runEnd = cleanEnd
          runLen += 1
        } else closeRun()
      }
    }
    closeRun()
    out.toArray
  }
}
