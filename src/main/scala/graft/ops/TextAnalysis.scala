package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All operators are pure Column expressions built from higher-order
  * functions (`transform`/`filter`/`aggregate`) — no UDFs, so they stay
  * inside Catalyst, serialize with the plan, and run fully distributed
  * per-row with zero shuffle. At 100 TB each is a narrow map over the
  * documents table.
  *
  * Numeric convention: ratios are computed with IEEE double division in a
  * fixed expression shape so results are bit-reproducible across engines
  * (the DuckDB oracle mirrors the same shapes).
  */
object TextAnalysis {

  /** Whitespace tokenization with empty-token cleanup (robust to leading/
    * trailing/repeated whitespace). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(toks: Column): Column = size(toks).cast("long")

  def distinctTokenCount(toks: Column): Column =
    size(array_distinct(toks)).cast("long")

  /** Total characters across tokens (exact integer sum). */
  def tokenChars(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t))

  /** Count of tokens in a stopword list. */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("long")

  /** Number of NON-overlapping occurrences of `marker` in `text` (the
    * length-difference/replace trick consumes matches left-to-right:
    * occurrences("aaa", "aa") = 1); exact integer result. Self-overlapping
    * markers undercount vs a sliding scan — fine for word-ish profile
    * markers, wrong tool for overlap-sensitive n-gram stats. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) / lit(marker.length))
      .cast("long")

  /** Marker-profile language ID: each language profile is a list of marker
    * substrings; score = total marker occurrences; prediction = argmax with
    * ties broken by profile order. A character-n-gram profile heuristic in
    * the same spirit as public langid approaches, expressible without UDFs. */
  def langScores(text: Column, profiles: Seq[(String, Seq[String])]): Seq[(String, Column)] =
    profiles.map { case (lang, markers) =>
      lang -> markers.map(m => occurrences(text, m)).reduce(_ + _)
    }

  def langPredict(scores: Seq[(String, Column)]): Column = {
    // argmax, first-listed wins ties: lang_i wins if score_i >= all later
    val preds = scores.zipWithIndex.map { case ((lang, s), i) =>
      val laterMax = scores.drop(i + 1).map(_._2)
      val cond = laterMax.foldLeft(lit(true))((acc, o) => acc && s >= o)
      (cond, lang)
    }
    preds.init.foldRight(lit(preds.last._2): Column) { case ((cond, lang), rest) =>
      when(cond, lang).otherwise(rest)
    }
  }

  /** Rolling polynomial hash fingerprint over characters:
    * h = fold(chars, 0, (h, c) => (h * 31 + ascii(c)) mod 1e9+7).
    * Character-indexed (not split-based) so the shape mirrors engines
    * without empty-split edge cases; exact 64-bit modular arithmetic. */
  /** Polynomial fingerprint via the native [[graft.functions.RollingHash]]
    * (one eval/row over bytes; the per-character HOF form it replaces is
    * documented there). */
  def rollingHash(text: Column): Column =
    graft.functions.RollingHash(text)
}
