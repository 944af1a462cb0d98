package graft.eval

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.core.TextSpan

/** One labelled passage: text + spans (+ free-form metadata), the reference's
  * LabelledPassage (/root/reference/knowledge_graph/labelled_passage.py:17-47)
  * in normalized form. */
final case class GoldPassage(id: String, text: String, spans: Vector[TextSpan])

/** Reader for the reference's labelled-passage serializations — needed to
  * evaluate against its golden fixtures:
  *  - production JSONL: one LabelledPassage JSON object per line
  *    (flows/inference.py:617-643)
  *  - legacy: a JSON array whose ELEMENTS are JSON-encoded strings of
  *    LabelledPassage objects (knowledge_graph/utils.py:121-135)
  * Jackson (shipped with Spark) does the parsing; only the fields the eval
  * harness needs are materialized.
  */
object LabelledPassages {

  private val mapper = new ObjectMapper()

  private def parsePassage(node: JsonNode): GoldPassage = {
    val text = node.get("text").asText()
    val spans = Vector.newBuilder[TextSpan]
    val arr = node.get("spans")
    if (arr != null && arr.isArray) {
      arr.forEach { s =>
        val labellers = Vector.newBuilder[String]
        val ls = s.get("labellers")
        if (ls != null && ls.isArray) ls.forEach(l => labellers += l.asText())
        spans += TextSpan(
          start = s.get("start_index").asInt(),
          end = s.get("end_index").asInt(),
          conceptId = Option(s.get("concept_id")).filterNot(_.isNull).map(_.asText()).orNull,
          labellers = labellers.result()
        )
      }
    }
    val id = Option(node.get("id")).filterNot(_.isNull).map(_.asText()).getOrElse("")
    GoldPassage(id, text, spans.result())
  }

  /** Parse a whole fixture file (legacy array-of-strings, plain array, or
    * JSONL). */
  def parseFile(path: java.nio.file.Path): Vector[GoldPassage] = {
    val content = new String(java.nio.file.Files.readAllBytes(path), "UTF-8").trim
    if (content.startsWith("[")) {
      val root = mapper.readTree(content)
      val out = Vector.newBuilder[GoldPassage]
      root.forEach { el =>
        val node = if (el.isTextual) mapper.readTree(el.asText()) else el
        out += parsePassage(node)
      }
      out.result()
    } else {
      content.linesIterator.filter(_.nonEmpty).map(l => parsePassage(mapper.readTree(l))).toVector
    }
  }
}
