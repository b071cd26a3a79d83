package graft.dsl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators.{Dedup, Sampling, TextOps}

/** Declarative curation pipeline — the reference's JSON-DSL surface
  * ([[JsonQuery]], `beacon-core/src/query/mod.rs`) extended over the
  * engine's training-data operators: a `stages` array applied in
  * order to a document table. Every stage preserves the row shape
  * (id + text + passenger columns), so stages compose like the
  * relational DSL's clauses do.
  *
  * {{{
  * {"stages": [
  *   {"op": "c4_clean", "require_pass": false},
  *   {"op": "normalize"},
  *   {"op": "gopher_filter", "min_words": 20},
  *   {"op": "pii_redact"},
  *   {"op": "dedup_exact"},
  *   {"op": "cap_per_group", "group": "source", "salt": "v1", "cap": 7}
  * ]}
  * }}}
  *
  * Scale: the map-only stages (normalize, c4_clean, gopher_filter,
  * pii_redact) fuse into one projection pass over the scan; dedup and
  * the cap each cost their one documented shuffle. Stage order is the
  * caller's policy — e.g. c4_clean before normalize, because
  * normalization collapses the newlines the line rules read.
  */
object CuratePipeline {
  import JsonQuery.DslException

  def compile(df: DataFrame, json: String,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val stages = JsonMethods.parse(json) \ "stages" match {
      case JArray(xs) => xs
      case _ => throw new DslException("curate body must have a 'stages' array")
    }
    stages.foldLeft(df)((cur, st) => applyStage(cur, st, textCol, idCol))
  }

  private def applyStage(df: DataFrame, st: JValue,
      textCol: String, idCol: String): DataFrame = {
    val op = st \ "op" match {
      case JString(s) => s
      case _ => throw new DslException(s"stage missing string 'op': $st")
    }
    op match {
      case "normalize" =>
        df.withColumn(textCol, TextOps.normalizeText(col(textCol)))
      case "c4_clean" =>
        val cleaned = df.withColumn(textCol, TextOps.c4CleanedText(col(textCol)))
        if (bool(st, "require_pass", default = true))
          cleaned.filter(TextOps.c4DocPass(col(textCol)))
        else cleaned
      case "gopher_filter" =>
        df.filter(TextOps.gopherPass(col(textCol),
          int(st, "min_words", 50), int(st, "max_words", 100000)))
      case "pii_redact" =>
        df.withColumn(textCol, TextOps.piiRedact(col(textCol)))
      case "dedup_exact" =>
        Dedup.exact(df, textCol, idCol)
      case "cap_per_group" =>
        Sampling.capPerGroup(df, str(st, "group"), idCol,
          str(st, "salt"), int(st, "cap", -1) match {
            case n if n > 0 => n
            case _ => throw new DslException("cap_per_group needs a positive 'cap'")
          })
      case other =>
        throw new DslException(s"unknown curate op '$other'")
    }
  }

  private def str(st: JValue, field: String): String = st \ field match {
    case JString(s) => s
    case _ => throw new DslException(s"stage needs string '$field': $st")
  }

  private def int(st: JValue, field: String, default: Int): Int = st \ field match {
    case JInt(i) => i.toInt
    case JNothing => default
    case other => throw new DslException(s"'$field' must be an integer, got $other")
  }

  private def bool(st: JValue, field: String, default: Boolean): Boolean =
    st \ field match {
      case JBool(b) => b
      case JNothing => default
      case other => throw new DslException(s"'$field' must be a boolean, got $other")
    }
}
