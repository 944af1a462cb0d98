package graft.kg

import graft.core.Concept
import graft.extract.KeywordMatcher

/** Generates the DuckDB oracle SQL for the KG queries FROM THE SAME concept
  * store the engine runs, so engine and oracle can never drift apart on label
  * data. The oracle is intentionally a completely different evaluation
  * strategy (RE2 regexes in SQL vs the broadcast trie), making the
  * correctness gate a real cross-check.
  *
  * Dialect notes (verified against DuckDB 1.0 / RE2):
  *  - RE2 has no lookbehind, so the engine's `(?<!\w)...(?!\w)` boundaries
  *    become `\b...\b`. Equivalent here: every label starts/ends with a word
  *    char and the corpus is ASCII (RE2's \b is ASCII, Python's \w Unicode —
  *    identical on ASCII text).
  *  - \Q...\E quoting and the separator class [\s\-–—]+ parse identically.
  *  - case-sensitive labels in the store never match the all-lowercase
  *    corpus, so count oracles need only the case-insensitive pattern with
  *    (?i).
  *  - negative-label counts subtract: valid because every negative match in
  *    this store overlaps exactly one positive match (see DemoConceptStore).
  */
object OracleGen {

  /** Shared WITH prologue deriving transcripts/turns from documents —
    * the SQL twin of Transcripts.fromDocuments + KgPipeline.eligibleTurns. */
  val transcriptsCte: String =
    s"""transcripts AS (
       |  SELECT source || '.conv.' || CAST(doc_id % ${Transcripts.ConvBuckets} AS VARCHAR) AS conv_id,
       |         CAST(doc_id // ${Transcripts.ConvBuckets} AS INT) AS turn_idx,
       |         CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' WHEN 2 THEN 'user' ELSE 'tool' END AS role,
       |         text,
       |         CASE WHEN CAST(doc_id % 4 AS INT) = 3 THEN 'search' ELSE NULL END AS tool,
       |         CAST(${Transcripts.EpochStart} + doc_id * 60 AS BIGINT) AS ts_epoch
       |  FROM documents WHERE lang = 'en')""".stripMargin

  val turnsCte: String =
    "turns AS (SELECT * FROM transcripts WHERE role <> 'tool' AND length(trim(text)) > 0)"

  private def sq(s: String): String = s.replace("'", "''")

  /** Case-insensitive positive pattern in RE2 dialect. */
  def ciPattern(labels: Seq[String]): Option[String] = {
    val (_, ci) = KeywordMatcher.splitByCaseHandling(labels)
    if (ci.isEmpty) None
    else Some("(?i)\\b(?:" + ci.map(KeywordMatcher.separatorFlexible).mkString("|") + ")\\b")
  }

  /** SQL expression: number of engine mentions of `c` in column `text`. */
  def mentionCountExpr(c: Concept): String = {
    val pos = ciPattern(c.allLabels)
      .getOrElse(sys.error(s"concept ${c.wikibaseId} has no case-insensitive labels for the oracle"))
    val posExpr = s"len(regexp_extract_all(text, '${sq(pos)}'))"
    ciPattern(c.negativeLabels) match {
      case None      => posExpr
      case Some(neg) => s"($posExpr - len(regexp_extract_all(text, '${sq(neg)}')))"
    }
  }

  def concepts: Vector[Concept] = DemoConceptStore.concepts

  /** Per-(conv, turn, concept) mention counts > 0, as a union of one SELECT
    * per concept (generated — each concept gets its own regex). */
  def perTurnCountsSqlFor(cs: Vector[Concept]): String =
    cs.map { c =>
      s"""SELECT conv_id, turn_idx, '${c.wikibaseId}' AS concept_id, ${mentionCountExpr(c)} AS n_mentions FROM turns"""
    }.mkString("\nUNION ALL\n")

  def perTurnCountsSql: String = perTurnCountsSqlFor(concepts)

  def mentionCountsSqlFor(cs: Vector[Concept]): String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSqlFor(cs)}
       |)
       |SELECT conv_id, concept_id, CAST(SUM(n_mentions) AS BIGINT) AS n_mentions
       |FROM per_turn WHERE n_mentions > 0 GROUP BY conv_id, concept_id""".stripMargin

  val mentionCountsSql: String = mentionCountsSqlFor(concepts)

  val vespaConceptsSql: String = {
    val dims = concepts
      .map(c =>
        s"('${c.wikibaseId}', '${sq(c.preferredLabel)}', '${sq(c.parentConceptIdsFlat)}', '${sq(DemoConceptStore.modelString(c))}')"
      )
      .mkString(",\n    ")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |dim(concept_id, name, parent_concept_ids_flat, model) AS (
       |  SELECT * FROM (VALUES
       |    $dims))
       |SELECT p.conv_id, p.turn_idx, p.concept_id, d.name, d.parent_concept_ids_flat, d.model,
       |       CAST(p.n_mentions AS BIGINT) AS n_mentions
       |FROM per_turn p JOIN dim d ON p.concept_id = d.concept_id
       |WHERE p.n_mentions > 0""".stripMargin
  }

  /** Span-grain labeller/timestamp oracle: re-derives the two labelling
    * passes, the first-seen labeller merge and the max-timestamp sink rule
    * from the executed-reference span fixture (legitimate as `kg_mentions`
    * proves engine==fixture byte-exactly). */
  def vespaConceptsTsSql: String = {
    val ids = KgPipeline.secondPassIds(concepts).map(i => s"'$i'").mkString(", ")
    val dims = concepts
      .map(c => s"('${c.wikibaseId}', '${sq(c.preferredLabel)}', '${sq(DemoConceptStore.modelString(c))}')")
      .mkString(",\n    ")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |$refMentionsCte,
       |passes AS (
       |  SELECT conv_id, turn_idx, start, "end", concept_id, 1 AS pass_rank,
       |         'KeywordClassifier:v1' AS labeller,
       |         CAST(${KgPipeline.Pass1Epoch} + (start*7 + "end"*3) % 3600 AS BIGINT) AS ts_epoch
       |  FROM ref_mentions
       |  UNION ALL
       |  SELECT conv_id, turn_idx, start, "end", concept_id, 2,
       |         'KeywordClassifier:v2',
       |         CAST(${KgPipeline.Pass2Epoch} + (start*5 + "end") % 3600 AS BIGINT)
       |  FROM ref_mentions WHERE concept_id IN ($ids)),
       |merged AS (
       |  SELECT conv_id, turn_idx, start, "end", concept_id,
       |         array_to_string(list(labeller ORDER BY pass_rank), ',') AS labellers_str,
       |         CAST(COUNT(*) AS INT) AS n_labellers,
       |         MAX(ts_epoch) AS ts_epoch
       |  FROM passes GROUP BY 1, 2, 3, 4, 5),
       |dim(concept_id, name, model) AS (SELECT * FROM (VALUES
       |    $dims))
       |SELECT m.conv_id, m.turn_idx, m.start, m."end", m.concept_id, d.name, d.model,
       |       m.labellers_str, m.n_labellers, m.ts_epoch
       |FROM merged m JOIN dim d ON m.concept_id = d.concept_id""".stripMargin
  }

  val conceptCountsSql: String = {
    val names = concepts.map(c => s"('${c.wikibaseId}', '${sq(c.preferredLabel)}')").mkString(", ")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |dim(concept_id, name) AS (SELECT * FROM (VALUES $names))
       |SELECT p.conv_id, p.concept_id || ':' || d.name AS concept_key, CAST(SUM(p.n_mentions) AS BIGINT) AS n
       |FROM per_turn p JOIN dim d ON p.concept_id = d.concept_id
       |WHERE p.n_mentions > 0 GROUP BY 1, 2""".stripMargin
  }

  /** Keyed-map grain of conceptCounts, stringified in sorted-key order. */
  val conceptCountsMapSql: String = {
    val names = concepts.map(c => s"('${c.wikibaseId}', '${sq(c.preferredLabel)}')").mkString(", ")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |dim(concept_id, name) AS (SELECT * FROM (VALUES $names)),
       |long AS (
       |  SELECT p.conv_id, p.concept_id || ':' || d.name AS concept_key, CAST(SUM(p.n_mentions) AS BIGINT) AS n
       |  FROM per_turn p JOIN dim d ON p.concept_id = d.concept_id
       |  WHERE p.n_mentions > 0 GROUP BY 1, 2)
       |SELECT conv_id,
       |  array_to_string(list(concept_key || '=' || CAST(n AS VARCHAR) ORDER BY concept_key), ';') AS counts_str
       |FROM long GROUP BY conv_id""".stripMargin
  }

  val triplesSql: String = {
    val edgeValues = DemoConceptStore.conceptEdges
      .map { case (s, p, o) => s"('$s', '$p', '$o')" }
      .mkString(", ")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |)
       |SELECT conv_id AS subj, 'HAS_PASSAGE' AS pred, conv_id || '_' || CAST(turn_idx AS VARCHAR) AS obj FROM turns
       |UNION
       |SELECT conv_id || '_' || CAST(turn_idx AS VARCHAR) AS subj, 'MENTIONS_CONCEPT' AS pred, concept_id AS obj
       |FROM per_turn WHERE n_mentions > 0
       |UNION
       |SELECT subj, pred, obj FROM (VALUES $edgeValues) e(subj, pred, obj)""".stripMargin
  }

  val cooccurrenceSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0)
       |SELECT a.concept_id AS concept_a, b.concept_id AS concept_b, CAST(COUNT(*) AS BIGINT) AS n_convs
       |FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |GROUP BY 1, 2""".stripMargin

  /** Triangle-count oracle: naive a<b<c three-way self-join over the
    * co-occurrence edges — a genuinely different formulation from the
    * engine's degree-ordered orientation (counts are orientation-free). */
  val trianglesSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |tri AS (
       |  SELECT e1.ca AS u, e1.cb AS v, e2.cb AS w
       |  FROM co e1 JOIN co e2 ON e2.ca = e1.cb
       |       JOIN co e3 ON e3.ca = e1.ca AND e3.cb = e2.cb),
       |corners AS (
       |  SELECT u AS node FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri),
       |nodes AS (SELECT ca AS node FROM co UNION SELECT cb AS node FROM co)
       |SELECT n.node AS concept_id, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS n_triangles
       |FROM nodes n LEFT JOIN (SELECT node, COUNT(*) AS cnt FROM corners GROUP BY 1) c
       |     ON c.node = n.node""".stripMargin

  /** Link-prediction oracle: common-neighbour counts over the STRONG-edge
    * backbone (weight within 85% of max — same scale-free relative
    * threshold as the query) via plain adjacency self-join (no degree
    * cap — the query uses a cap far above this graph's max degree, so the
    * formulations must agree), top-k with the same deterministic
    * (score desc, a, b) boundary. */
  def linkPredictionSql(k: Int): String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS (SELECT MAX(w) AS m FROM co0),
       |co AS (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |und AS (SELECT ca AS u, cb AS v FROM co UNION ALL SELECT cb, ca FROM co),
       |cn AS (
       |  SELECT x.v AS a, y.v AS b, COUNT(*) AS n_common
       |  FROM und x JOIN und y ON x.u = y.u AND x.v < y.v
       |  GROUP BY 1, 2),
       |ne AS (
       |  SELECT cn.a, cn.b, cn.n_common FROM cn
       |  LEFT JOIN co e ON e.ca = cn.a AND e.cb = cn.b WHERE e.ca IS NULL)
       |SELECT a AS concept_a, b AS concept_b, CAST(n_common AS BIGINT) AS n_common
       |FROM ne ORDER BY n_common DESC, a, b LIMIT $k""".stripMargin

  /** Resource-Allocation link-prediction oracle: the same backbone wedge
    * join, scored Σ (10^6 // deg(z)) over shared neighbours z — mirrors
    * [[Triangles.linkPredictionRA]]'s exact integer arithmetic. */
  def linkPredictionRaSql(k: Int): String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS (SELECT MAX(w) AS m FROM co0),
       |co AS (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |und AS (SELECT ca AS u, cb AS v FROM co UNION ALL SELECT cb, ca FROM co),
       |deg AS (SELECT u, COUNT(*) AS deg FROM und GROUP BY 1),
       |ra AS (
       |  SELECT x.v AS a, y.v AS b, CAST(SUM(${Triangles.RaScale} // d.deg) AS BIGINT) AS ra_q
       |  FROM und x JOIN und y ON x.u = y.u AND x.v < y.v JOIN deg d ON d.u = x.u
       |  GROUP BY 1, 2),
       |ne AS (
       |  SELECT ra.a, ra.b, ra.ra_q FROM ra
       |  LEFT JOIN co e ON e.ca = ra.a AND e.cb = ra.b WHERE e.ca IS NULL)
       |SELECT a AS concept_a, b AS concept_b, ra_q
       |FROM ne ORDER BY ra_q DESC, a, b LIMIT $k""".stripMargin

  /** Neighborhood-Jaccard link-prediction oracle: the same backbone wedge
    * join, scored (10^6 · common) // (deg_a + deg_b − common) — mirrors
    * [[Triangles.linkPredictionJaccard]]'s exact fixed point. */
  def linkPredictionJaccardSql(k: Int): String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS (SELECT MAX(w) AS m FROM co0),
       |co AS (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |und AS (SELECT ca AS u, cb AS v FROM co UNION ALL SELECT cb, ca FROM co),
       |deg AS (SELECT u, COUNT(*) AS deg FROM und GROUP BY 1),
       |cn AS (
       |  SELECT x.v AS a, y.v AS b, COUNT(*) AS n_common
       |  FROM und x JOIN und y ON x.u = y.u AND x.v < y.v
       |  GROUP BY 1, 2),
       |jac AS (
       |  SELECT cn.a, cn.b,
       |         CAST((1000000 * cn.n_common) // (da.deg + db.deg - cn.n_common) AS BIGINT) AS jac_ppm
       |  FROM cn JOIN deg da ON da.u = cn.a JOIN deg db ON db.u = cn.b),
       |ne AS (
       |  SELECT jac.a, jac.b, jac.jac_ppm FROM jac
       |  LEFT JOIN co e ON e.ca = jac.a AND e.cb = jac.b WHERE e.ca IS NULL)
       |SELECT a AS concept_a, b AS concept_b, jac_ppm
       |FROM ne ORDER BY jac_ppm DESC, a, b LIMIT $k""".stripMargin

  /** k-hop oracle: independent recursive-CTE walk (bounded by hops, so it
    * terminates despite cycles) with a min-hop rollup — cross-checks the
    * engine's frontier-expansion BFS. */
  def kHopSql(seed: String, maxHops: Int): String =
    s"""WITH RECURSIVE e(src, dst) AS (SELECT * FROM (VALUES ${componentEdgeValuesFor(concepts)})),
       |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
       |walk(node, hops) AS (
       |  SELECT '${sq(seed)}', 0
       |  UNION ALL
       |  SELECT u.dst, w.hops + 1 FROM walk w JOIN und u ON u.src = w.node WHERE w.hops < $maxHops
       |)
       |SELECT node, CAST(MIN(hops) AS INT) AS hops FROM walk GROUP BY node""".stripMargin

  /** HITS oracle: the bipartite conv → concept mention-weight edges, then
    * `iterations` unrolled hub/authority half-steps in exact fixed-point
    * arithmetic (scale 2^24, L-inf normalization by the pre-divided
    * denominator ceil(max/Scale)) — mirrors [[Hits.run]] bit-for-bit;
    * DuckDB `//` matches Spark `div` on the all-positive scores. */
  def hitsSql(iterations: Int): String = {
    val sc = Hits.Scale
    // every per-iteration CTE is MATERIALIZED: h_i references hr_i TWICE
    // (the scalar-max denominator subquery plus the FROM), so without the
    // hint DuckDB's inlining doubles the expansion per HALF-iteration —
    // 2^(2·iterations) copies of the mention-extraction chain (the r4
    // BIGSWEEP oracle-blowup class; observed live as a >14-minute hang at
    // sf0.001 before this hint)
    val iterCtes = (1 to iterations)
      .map { i =>
        s"""hr$i AS MATERIALIZED (
           |  SELECT e.conv_id AS node, CAST(SUM(e.w * a.s) AS BIGINT) AS raw
           |  FROM e JOIN a${i - 1} a ON a.node = e.concept_id GROUP BY 1),
           |h$i AS MATERIALIZED (
           |  SELECT node, CAST(raw // ((SELECT (MAX(raw) + ${sc - 1}) // $sc FROM hr$i)) AS BIGINT) AS s
           |  FROM hr$i),
           |ar$i AS MATERIALIZED (
           |  SELECT e.concept_id AS node, CAST(SUM(e.w * h.s) AS BIGINT) AS raw
           |  FROM e JOIN h$i h ON h.node = e.conv_id GROUP BY 1),
           |a$i AS MATERIALIZED (
           |  SELECT node, CAST(raw // ((SELECT (MAX(raw) + ${sc - 1}) // $sc FROM ar$i)) AS BIGINT) AS s
           |  FROM ar$i)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |e AS MATERIALIZED (SELECT conv_id, concept_id, CAST(SUM(n_mentions) AS BIGINT) AS w
       |      FROM per_turn WHERE n_mentions > 0 GROUP BY 1, 2),
       |a0 AS MATERIALIZED (SELECT DISTINCT concept_id AS node, CAST($sc AS BIGINT) AS s FROM e),
       |$iterCtes
       |SELECT node, 'auth' AS kind, s AS score_q FROM a$iterations
       |UNION ALL SELECT node, 'hub' AS kind, s AS score_q FROM h$iterations""".stripMargin
  }

  /** Personalized-PageRank oracle: the co-occurrence chain, a 1-row seed
    * CTE (argmax incident weight, tie min id — same device as the engine's
    * min(struct)), then `iterations` unrolled fixed-point steps where the
    * teleport term lands ONLY on the seed. Mirrors
    * [[PageRank.personalized]] bit-for-bit. */
  def pprSql(iterations: Int): String = {
    // the seed scalar subquery re-enters every iteration CTE, so the chain
    // under it (sym/outw, i.e. the whole mention-extraction CTE) must be
    // MATERIALIZED or DuckDB re-inlines the extraction once per iteration
    val iterCtes = (1 to iterations)
      .map { i =>
        s"""p$i AS MATERIALIZED (
           |  SELECT n.node,
           |         CAST(CASE WHEN n.node = (SELECT node FROM seed) THEN ${PageRank.Teleport} ELSE 0 END
           |              + (85 * COALESCE(s.csum, 0)) // 100 AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, SUM((r.r * e.w) // o.wtot) AS csum
           |    FROM sym e JOIN p${i - 1} r ON r.node = e.src JOIN outw o ON o.src = e.src
           |    GROUP BY 1) s ON s.node = n.node)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |sym AS MATERIALIZED (SELECT ca AS src, cb AS dst, w FROM co UNION ALL SELECT cb, ca, w FROM co),
       |outw AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS wtot FROM sym GROUP BY 1),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
       |seed AS MATERIALIZED (SELECT src AS node FROM outw ORDER BY wtot DESC, src LIMIT 1),
       |p0 AS (SELECT n.node,
       |              CAST(CASE WHEN n.node = (SELECT node FROM seed) THEN ${PageRank.Scale} ELSE 0 END AS BIGINT) AS r
       |       FROM nodes n),
       |$iterCtes
       |SELECT node AS concept_id, r AS rank_q FROM p$iterations""".stripMargin
  }

  /** Harmonic-centrality oracle: the strong-edge backbone (85%-of-max, the
    * [[kCoreSql]] device), then `maxHops` unrolled multi-source BFS rounds
    * — each round the union of the previous distance set with one-step
    * relaxations, MIN per (source, node) — mirroring [[Centrality.harmonic]]
    * exactly, then the same 10^6 floor-division harmonic sum. */
  def harmonicSql(maxHops: Int): String = {
    val rounds = (1 to maxHops)
      .map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT s, v, MIN(hops) AS hops FROM (
           |    SELECT s, v, hops FROM d${i - 1}
           |    UNION ALL
           |    SELECT w.s, e.dst AS v, w.hops + 1 FROM d${i - 1} w JOIN sym e ON e.src = w.v
           |  ) GROUP BY 1, 2)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS MATERIALIZED (SELECT MAX(w) AS m FROM co0),
       |co AS MATERIALIZED (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |sym AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM co UNION ALL SELECT cb, ca FROM co),
       |d0 AS MATERIALIZED (SELECT DISTINCT src AS s, src AS v, 0 AS hops FROM sym),
       |$rounds
       |SELECT s AS concept_id, CAST(SUM(${Centrality.Scale} // hops) AS BIGINT) AS harm_q
       |FROM d$maxHops WHERE hops > 0 GROUP BY 1""".stripMargin
  }

  /** Eccentricity oracle: the [[harmonicSql]] BFS skeleton with a MAX-hops
    * rollup per source instead of the harmonic sum — mirrors
    * [[Centrality.eccentricity]] (the (s, s, 0) self row is included, so an
    * edge-bearing node's max is always >= 1). */
  def eccentricitySql(maxHops: Int): String = {
    val rounds = (1 to maxHops)
      .map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT s, v, MIN(hops) AS hops FROM (
           |    SELECT s, v, hops FROM d${i - 1}
           |    UNION ALL
           |    SELECT w.s, e.dst AS v, w.hops + 1 FROM d${i - 1} w JOIN sym e ON e.src = w.v
           |  ) GROUP BY 1, 2)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS MATERIALIZED (SELECT MAX(w) AS m FROM co0),
       |co AS MATERIALIZED (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |sym AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM co UNION ALL SELECT cb, ca FROM co),
       |d0 AS MATERIALIZED (SELECT DISTINCT src AS s, src AS v, 0 AS hops FROM sym),
       |$rounds
       |SELECT s AS concept_id, CAST(MAX(hops) AS INT) AS ecc_hops
       |FROM d$maxHops GROUP BY 1""".stripMargin
  }

  /** Landmark-distance oracle: the [[harmonicSql]] BFS skeleton seeded at
    * only the k smallest-md5 landmark nodes (the same deterministic pivot
    * coin as [[betweennessSql]]), then the pair estimate
    * min_l d(u,l)+d(l,v) — mirrors [[Centrality.landmarkDistances]]
    * bit-for-bit (exact integer hops throughout). */
  def landmarkDistSql(landmarks: Int, maxHops: Int): String = {
    val rounds = (1 to maxHops)
      .map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT s, v, MIN(hops) AS hops FROM (
           |    SELECT s, v, hops FROM d${i - 1}
           |    UNION ALL
           |    SELECT w.s, e.dst AS v, w.hops + 1 FROM d${i - 1} w JOIN sym e ON e.src = w.v
           |  ) GROUP BY 1, 2)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS MATERIALIZED (SELECT MAX(w) AS m FROM co0),
       |co AS MATERIALIZED (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |sym AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM co UNION ALL SELECT cb, ca FROM co),
       |lm AS MATERIALIZED (
       |  SELECT node FROM (SELECT DISTINCT src AS node FROM sym)
       |  ORDER BY md5(node), node LIMIT $landmarks),
       |d0 AS MATERIALIZED (SELECT node AS s, node AS v, 0 AS hops FROM lm),
       |$rounds
       |SELECT a.v AS concept_a, b.v AS concept_b, CAST(MIN(a.hops + b.hops) AS INT) AS est_hops
       |FROM d$maxHops a JOIN d$maxHops b ON a.s = b.s AND a.v < b.v
       |GROUP BY 1, 2""".stripMargin
  }

  /** Connected-components oracle over the strong-edge backbone: an
    * INDEPENDENT formulation — a recursive-CTE transitive reachability
    * closure (UNION-deduped, so it terminates at the fixpoint regardless of
    * diameter; no unroll-depth caveat) with component = MIN reachable node
    * id, cross-checking the engine's large-star/small-star CC. */
  def componentsSql: String =
    s"""WITH RECURSIVE $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS MATERIALIZED (SELECT MAX(w) AS m FROM co0),
       |co AS MATERIALIZED (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |sym AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM co UNION ALL SELECT cb, ca FROM co),
       |reach(s, v) AS (
       |  SELECT DISTINCT src, src FROM sym
       |  UNION
       |  SELECT r.s, e.dst FROM reach r JOIN sym e ON e.src = r.v
       |),
       |comp AS (SELECT s AS node, MIN(v) AS component FROM reach GROUP BY 1)
       |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM comp GROUP BY 1""".stripMargin

  /** Betweenness oracle (Brandes, hop-bounded): forward BFS LEVELS with
    * shortest-path counts (per-level aggregate + NOT EXISTS against the
    * cumulative seen set — a node enters exactly one level), then the
    * backward pair-dependency recurrence with the SAME per-edge floor
    * division — mirrors [[Centrality.betweenness]] bit-for-bit. Every CTE
    * is MATERIALIZED ([[hitsSql]]'s inlining-blowup lesson: the seen chain
    * references each level twice). */
  def betweennessSql(maxHops: Int, pivots: Int = 0): String = {
    val sc = Centrality.Scale
    val fwd = (1 to maxHops)
      .map { t =>
        s"""l$t AS MATERIALIZED (
           |  SELECT * FROM (
           |    SELECT p.s, e.dst AS v, CAST(SUM(p.sigma) AS BIGINT) AS sigma
           |    FROM l${t - 1} p JOIN sym e ON e.src = p.v
           |    GROUP BY 1, 2) q
           |  WHERE NOT EXISTS (SELECT 1 FROM seen${t - 1} x WHERE x.s = q.s AND x.v = q.v)),
           |seen$t AS MATERIALIZED (SELECT s, v FROM seen${t - 1} UNION ALL SELECT s, v FROM l$t)""".stripMargin
      }
      .mkString(",\n")
    val bwd = ((maxHops - 1) to 1 by -1)
      .map { t =>
        s"""d$t AS MATERIALIZED (
           |  SELECT c.s, c.v, c.sigma, CAST(COALESCE(x.delta, 0) AS BIGINT) AS delta
           |  FROM l$t c LEFT JOIN (
           |    SELECT c2.s, c2.v, CAST(SUM((c2.sigma * ($sc + w.delta)) // w.sigma) AS BIGINT) AS delta
           |    FROM l$t c2 JOIN sym e ON e.src = c2.v
           |                JOIN d${t + 1} w ON w.s = c2.s AND w.v = e.dst
           |    GROUP BY 1, 2) x ON x.s = c.s AND x.v = c.v)""".stripMargin
      }
      .mkString(",\n")
    val accUnion = (1 to (maxHops - 1))
      .map(t => s"SELECT v, delta FROM d$t WHERE delta > 0")
      .mkString("\n    UNION ALL ")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS MATERIALIZED (SELECT MAX(w) AS m FROM co0),
       |co AS MATERIALIZED (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |sym AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM co UNION ALL SELECT cb, ca FROM co),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
       |piv AS MATERIALIZED (${
      if (pivots > 0) s"SELECT node FROM nodes ORDER BY md5(node), node LIMIT $pivots"
      else "SELECT node FROM nodes"
    }),
       |l0 AS MATERIALIZED (SELECT node AS s, node AS v, CAST(1 AS BIGINT) AS sigma FROM piv),
       |seen0 AS MATERIALIZED (SELECT s, v FROM l0),
       |$fwd,
       |d$maxHops AS MATERIALIZED (SELECT s, v, sigma, CAST(0 AS BIGINT) AS delta FROM l$maxHops),
       |$bwd
       |SELECT n.node AS concept_id, CAST(COALESCE(b.bc, 0) AS BIGINT) AS bc_q
       |FROM nodes n LEFT JOIN (
       |  SELECT v, SUM(delta) AS bc FROM (
       |    $accUnion) GROUP BY 1) b ON b.v = n.node""".stripMargin
  }

  /** Negative-sampling oracle: the co-occurrence chain, the id-sorted
    * dictionary with ROW_NUMBER indexes, and the SAME md5 coin
    * (md5("a|b") mod |dict|) — accidental positives filtered, mirroring
    * [[Walks.negativeSamples]] bit-for-bit. */
  def negativesSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |nodes AS MATERIALIZED (SELECT DISTINCT n FROM (SELECT ca AS n FROM co UNION ALL SELECT cb FROM co)),
       |dict AS MATERIALIZED (SELECT n AS node, ROW_NUMBER() OVER (ORDER BY n) - 1 AS rn FROM nodes),
       |cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |neg AS (SELECT ca, cb,
       |               CAST('0x' || substr(md5(ca || '|' || cb), 1, 15) AS BIGINT) % cnt.n AS idx
       |        FROM co CROSS JOIN cnt)
       |SELECT neg.ca AS concept_a, neg.cb AS concept_b, d.node AS neg_tail
       |FROM neg JOIN dict d ON d.rn = neg.idx
       |WHERE d.node <> neg.ca AND d.node <> neg.cb""".stripMargin

  /** Trends oracle: per-turn mention counts joined back to the turn's
    * epoch-day (ts_epoch // 86400), summed per (concept, day). */
  def trendsSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |)
       |SELECT p.concept_id, t.ts_epoch // 86400 AS day_num,
       |       CAST(SUM(p.n_mentions) AS BIGINT) AS n_mentions
       |FROM per_turn p JOIN turns t ON t.conv_id = p.conv_id AND t.turn_idx = p.turn_idx
       |WHERE p.n_mentions > 0
       |GROUP BY 1, 2""".stripMargin

  /** Burst-detection oracle: the trends aggregation + the SAME calendar
    * RANGE window (trailing `window` days, excluding today) and the same
    * all-integer burst predicate as [[KgPipeline.burstDays]]. */
  def burstsSql(window: Int, factor: Int): String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |trends AS (
       |  SELECT p.concept_id, t.ts_epoch // 86400 AS day_num,
       |         CAST(SUM(p.n_mentions) AS BIGINT) AS n_mentions
       |  FROM per_turn p JOIN turns t ON t.conv_id = p.conv_id AND t.turn_idx = p.turn_idx
       |  WHERE p.n_mentions > 0
       |  GROUP BY 1, 2),
       |w AS (
       |  SELECT concept_id, day_num, n_mentions,
       |         CAST(COALESCE(SUM(n_mentions) OVER (
       |           PARTITION BY concept_id ORDER BY day_num
       |           RANGE BETWEEN $window PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS trail_sum
       |  FROM trends)
       |SELECT concept_id, day_num, n_mentions, trail_sum,
       |       CAST(CASE WHEN n_mentions * $window > $factor * trail_sum THEN 1 ELSE 0 END AS INT) AS is_burst
       |FROM w""".stripMargin

  /** Modularity oracle: the label-propagation CTE chain (same recurrence as
    * [[communitiesSql]]) to derive the assignment, then the exact integer
    * sufficient statistics and the SAME nested floor-division q_ppm as
    * [[Communities.modularity]]. */
  def modularitySql(iterations: Int): String = {
    val iterCtes = (1 to iterations)
      .map { i =>
        s"""s$i AS (
           |  SELECT e.dst, l.label, CAST(SUM(e.w) AS BIGINT) AS ws
           |  FROM sym e JOIN l${i - 1} l ON l.node = e.src GROUP BY 1, 2),
           |m$i AS (SELECT dst, MAX(ws) AS mx FROM s$i GROUP BY 1),
           |l$i AS (
           |  SELECT s.dst AS node, MIN(s.label) AS label
           |  FROM s$i s JOIN m$i m ON m.dst = s.dst AND s.ws = m.mx GROUP BY 1)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |sym AS MATERIALIZED (SELECT ca AS src, cb AS dst, w FROM co UNION ALL SELECT cb, ca, w FROM co),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
       |$iterCtes,
       |lab AS MATERIALIZED (SELECT node, label FROM l$iterations),
       |ej AS MATERIALIZED (SELECT co.w, la.label AS cla, lb.label AS clb
       |       FROM co JOIN lab la ON la.node = co.ca JOIN lab lb ON lb.node = co.cb),
       |mm AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM ej),
       |inter AS (SELECT cla AS community, CAST(SUM(w) AS BIGINT) AS internal_w FROM ej WHERE cla = clb GROUP BY 1),
       |degree AS (SELECT community, CAST(SUM(w) AS BIGINT) AS deg_sum FROM (
       |  SELECT cla AS community, w FROM ej UNION ALL SELECT clb, w FROM ej) GROUP BY 1),
       |sizes AS (SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM lab GROUP BY 1)
       |SELECT z.community, z.n_nodes,
       |       COALESCE(i.internal_w, 0) AS internal_w,
       |       COALESCE(d.deg_sum, 0) AS deg_sum,
       |       CAST((1000000 * COALESCE(i.internal_w, 0)) // m.m
       |            - (1000000 * ((COALESCE(d.deg_sum, 0) * COALESCE(d.deg_sum, 0)) // m.m)) // (4 * m.m)
       |         AS BIGINT) AS q_ppm
       |FROM sizes z LEFT JOIN degree d ON d.community = z.community
       |             LEFT JOIN inter i ON i.community = z.community
       |CROSS JOIN mm m""".stripMargin
  }

  /** DeepWalk oracle: the co-occurrence chain, every node × `nWalks` start
    * rows, then `len` unrolled argmin steps over the SAME portable md5
    * hash coin ("walk|step|candidate" → first 15 hex digits as a 60-bit
    * integer) with the (hash, dst) tie order — mirrors [[Walks.deepWalks]]
    * bit-for-bit. */
  def walksSql(nWalks: Int, len: Int): String = {
    val steps = (1 to len)
      .map { t =>
        s"""w$t AS MATERIALIZED (
           |  SELECT walk_id, dst AS node FROM (
           |    SELECT f.walk_id, e.dst,
           |           ROW_NUMBER() OVER (PARTITION BY f.walk_id
           |             ORDER BY CAST('0x' || substr(md5(f.walk_id || '|' || '$t' || '|' || e.dst), 1, 15) AS BIGINT),
           |                      e.dst) AS rn
           |    FROM w${t - 1} f JOIN sym e ON e.src = f.node)
           |  WHERE rn = 1)""".stripMargin
      }
      .mkString(",\n")
    val emits = (1 to len)
      .map(t => s"UNION ALL SELECT walk_id, $t AS step, node FROM w$t")
      .mkString("\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |sym AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM co UNION ALL SELECT cb, ca FROM co),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
       |w0 AS MATERIALIZED (SELECT n.node || '#' || CAST(j AS VARCHAR) AS walk_id, n.node
       |       FROM nodes n CROSS JOIN (SELECT unnest(range($nWalks)) AS j)),
       |$steps
       |SELECT walk_id, 0 AS step, node FROM w0
       |$emits""".stripMargin
  }

  /** node2vec oracle: step 1 is the [[walksSql]] uniform argmin; each later
    * step classifies candidates against the frontier's prev (return /
    * distance-1 via a LEFT JOIN probe / distance-2), then reproduces the
    * exact cumulative-bucket pick — SUM(w) windows per walk, one md5 coin
    * per (walk, step) reduced mod the weight total — bit-for-bit. */
  def node2vecSql(nWalks: Int, len: Int, wReturn: Long, wIn: Long, wOut: Long): String = {
    val step1 =
      s"""w1 AS MATERIALIZED (
         |  SELECT walk_id, prev, dst AS node FROM (
         |    SELECT f.walk_id, f.node AS prev, e.dst,
         |           ROW_NUMBER() OVER (PARTITION BY f.walk_id
         |             ORDER BY CAST('0x' || substr(md5(f.walk_id || '|' || '1' || '|' || e.dst), 1, 15) AS BIGINT),
         |                      e.dst) AS rn
         |    FROM w0 f JOIN sym e ON e.src = f.node)
         |  WHERE rn = 1)""".stripMargin
    val steps = (2 to len)
      .map { t =>
        s"""c$t AS MATERIALIZED (
           |  SELECT f.walk_id, f.node AS cur, e.dst AS cand,
           |         CASE WHEN e.dst = f.prev THEN $wReturn
           |              WHEN ie.src IS NOT NULL THEN $wIn
           |              ELSE $wOut END AS w
           |  FROM w${t - 1} f JOIN sym e ON e.src = f.node
           |  LEFT JOIN sym ie ON ie.src = f.prev AND ie.dst = e.dst),
           |w$t AS MATERIALIZED (
           |  SELECT walk_id, cur AS prev, cand AS node FROM (
           |    SELECT walk_id, cur, cand, w,
           |           SUM(w) OVER (PARTITION BY walk_id ORDER BY cand) AS cum,
           |           SUM(w) OVER (PARTITION BY walk_id) AS tot,
           |           CAST('0x' || substr(md5(walk_id || '|' || '$t'), 1, 15) AS BIGINT) AS h
           |    FROM c$t)
           |  WHERE (h % tot) >= cum - w AND (h % tot) < cum)""".stripMargin
      }
      .mkString(",\n")
    val emits = (1 to len)
      .map(t => s"UNION ALL SELECT walk_id, $t AS step, node FROM w$t")
      .mkString("\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |sym AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM co UNION ALL SELECT cb, ca FROM co),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
       |w0 AS MATERIALIZED (SELECT n.node || '#' || CAST(j AS VARCHAR) AS walk_id, n.node
       |       FROM nodes n CROSS JOIN (SELECT unnest(range($nWalks)) AS j)),
       |$step1,
       |$steps
       |SELECT walk_id, 0 AS step, node FROM w0
       |$emits""".stripMargin
  }

  /** PageRank oracle: the co-occurrence CTE chain, then `iterations`
    * unrolled fixed-point iterations (scale 2^32, damping 85/100) in exact
    * integer arithmetic — DuckDB `//` floor-division matches Spark's `div`
    * on the all-positive ranks, and HUGEINT sums are cast back to BIGINT.
    * Mirrors graft.kg.PageRank.run bit-for-bit. */
  def pageRankSql(iterations: Int): String = {
    val iterCtes = (1 to iterations)
      .map { i =>
        s"""r$i AS (
           |  SELECT n.node,
           |         CAST(${PageRank.Teleport} + (85 * COALESCE(s.csum, 0)) // 100 AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, SUM((r.r * e.w) // o.wtot) AS csum
           |    FROM sym e JOIN r${i - 1} r ON r.node = e.src JOIN outw o ON o.src = e.src
           |    GROUP BY 1) s ON s.node = n.node)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |sym AS (SELECT ca AS src, cb AS dst, w FROM co UNION ALL SELECT cb, ca, w FROM co),
       |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wtot FROM sym GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM sym),
       |r0 AS (SELECT node, CAST(${PageRank.Scale} AS BIGINT) AS r FROM nodes),
       |$iterCtes
       |SELECT node AS concept_id, r AS rank_q FROM r$iterations""".stripMargin
  }

  /** Lift (exp-PMI) oracle: the co-occurrence chain plus marginal/total
    * CTEs and the same quantized floor-division formula. */
  val pmiSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, CAST(COUNT(*) AS BIGINT) AS n_ab
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |marg AS (SELECT concept_id, CAST(COUNT(*) AS BIGINT) AS n FROM pc GROUP BY 1),
       |tot AS (SELECT CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_total FROM pc)
       |SELECT co.ca AS concept_a, co.cb AS concept_b, co.n_ab AS n_convs,
       |  (1000000 * co.n_ab * t.n_total) // (ma.n * mb.n) AS lift_q
       |FROM co JOIN marg ma ON ma.concept_id = co.ca
       |        JOIN marg mb ON mb.concept_id = co.cb CROSS JOIN tot t""".stripMargin

  /** Weighted label-propagation oracle: the synchronous recurrence unrolled
    * into per-iteration CTE triples — (dst, label) incident-weight sums,
    * per-dst max, MIN-label winner — mirroring
    * [[Communities.labelPropagation]]'s min(struct(-ws, label)) argmax
    * exactly (long sums + string mins only, so bit-equal). */
  def communitiesSql(iterations: Int): String = {
    val iterCtes = (1 to iterations)
      .map { i =>
        s"""s$i AS (
           |  SELECT e.dst, l.label, CAST(SUM(e.w) AS BIGINT) AS ws
           |  FROM sym e JOIN l${i - 1} l ON l.node = e.src GROUP BY 1, 2),
           |m$i AS (SELECT dst, MAX(ws) AS mx FROM s$i GROUP BY 1),
           |l$i AS (
           |  SELECT s.dst AS node, MIN(s.label) AS label
           |  FROM s$i s JOIN m$i m ON m.dst = s.dst AND s.ws = m.mx GROUP BY 1)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |sym AS (SELECT ca AS src, cb AS dst, w FROM co UNION ALL SELECT cb, ca, w FROM co),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
       |$iterCtes
       |SELECT node AS concept_id, label AS community FROM l$iterations""".stripMargin
  }

  /** Clustering-coefficient oracle: the naive-triangle chain plus a degree
    * CTE and the same ppm floor-division formula. */
  val clusteringSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |tri AS (
       |  SELECT e1.ca AS u, e1.cb AS v, e2.cb AS w
       |  FROM co e1 JOIN co e2 ON e2.ca = e1.cb
       |       JOIN co e3 ON e3.ca = e1.ca AND e3.cb = e2.cb),
       |corners AS (
       |  SELECT u AS node FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri),
       |deg AS (
       |  SELECT node, COUNT(*) AS deg FROM (
       |    SELECT ca AS node FROM co UNION ALL SELECT cb FROM co) GROUP BY 1),
       |tc AS (
       |  SELECT d.node, d.deg, COALESCE(c.cnt, 0) AS tri
       |  FROM deg d LEFT JOIN (SELECT node, COUNT(*) AS cnt FROM corners GROUP BY 1) c
       |       ON c.node = d.node)
       |SELECT node AS concept_id, CAST(deg AS BIGINT) AS deg,
       |  CAST(tri AS BIGINT) AS n_triangles,
       |  CAST(CASE WHEN deg >= 2 THEN (2 * tri * 1000000) // (deg * (deg - 1)) ELSE 0 END AS BIGINT) AS coef_ppm
       |FROM tc""".stripMargin

  /** k-core oracle over the strong-edge backbone: `rounds` peel iterations
    * unrolled into CTEs (degree → keep-set → edge restriction). Peeling is
    * monotone, so any unroll depth ≥ the data's fixpoint depth equals the
    * engine's run-to-convergence result — extra rounds are no-ops; 6 is
    * generous for a dictionary-sized graph (the peel depth observed across
    * sf0.001/0.01/0.1 and the 10× corpus is ≤ 2). Each e$i is
    * AS MATERIALIZED: every round references its predecessor more than
    * once, so an inlining planner would otherwise expand the chain
    * exponentially (2^rounds base-table scans — measured as an fd-exhaustion
    * failure at 12 rounds before materialization was forced). Default unroll
    * is 16 (observed fixpoint depth ≤ 2 at all four corpus scales, but a
    * pendant chain on the backbone peels one node per round — extra rounds
    * past the fixpoint are free no-ops, so depth is cheap insurance against
    * a false verification failure on a deeper corpus). */
  def kCoreSql(k: Int, rounds: Int = 16): String = {
    val peels = (1 to rounds)
      .map { i =>
        s"""d$i AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e${i - 1} GROUP BY 1),
           |n$i AS MATERIALIZED (SELECT src FROM d$i WHERE deg >= $k),
           |e$i AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM e${i - 1} e
           |  JOIN n$i a ON a.src = e.src JOIN n$i b ON b.src = e.dst)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS (SELECT MAX(w) AS m FROM co0),
       |co AS (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |e0 AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM co UNION ALL SELECT cb, ca FROM co),
       |$peels
       |SELECT src AS concept_id, CAST(COUNT(*) AS BIGINT) AS deg
       |FROM e$rounds GROUP BY 1""".stripMargin
  }

  /** k-truss oracle: unrolled support-peel rounds (the [[kCoreSql]]
    * device at EDGE grain) — per round a naive a<b<c three-way self-join
    * enumerates triangles (a genuinely different formulation from the
    * engine's degree-ordered orientation), support = per-edge triangle
    * incidences, edges below k−2 drop. Rounds past the fixpoint are
    * no-ops, so a generous unroll equals the engine's run-to-fixpoint. */
  def kTrussSql(k: Int, rounds: Int = 12): String = {
    val peels = (1 to rounds)
      .map { i =>
        s"""t$i AS MATERIALIZED (
           |  SELECT e1.a AS u, e1.b AS v, e2.b AS w
           |  FROM e${i - 1} e1 JOIN e${i - 1} e2 ON e2.a = e1.b
           |       JOIN e${i - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
           |s$i AS MATERIALIZED (
           |  SELECT a, b, COUNT(*) AS sup FROM (
           |    SELECT u AS a, v AS b FROM t$i
           |    UNION ALL SELECT u AS a, w AS b FROM t$i
           |    UNION ALL SELECT v AS a, w AS b FROM t$i) GROUP BY 1, 2),
           |e$i AS MATERIALIZED (SELECT a, b FROM s$i WHERE sup >= ${k - 2})""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS (SELECT MAX(w) AS m FROM co0),
       |e0 AS MATERIALIZED (SELECT ca AS a, cb AS b FROM co0, mx WHERE w * 100 >= m * 85),
       |$peels
       |SELECT e.a AS concept_a, e.b AS concept_b, CAST(s.sup AS BIGINT) AS support
       |FROM e$rounds e JOIN s$rounds s ON s.a = e.a AND s.b = e.b""".stripMargin
  }

  /** Degree-assortativity oracle over the FULL co-occurrence graph: the
    * same exact-long sufficient statistics as [[GraphStats.assortativity]]
    * computed by plain SQL joins (DuckDB raises natively on int64 overflow
    * — the loud behavior the engine's guard mirrors), r as the single IEEE
    * division of the two exact longs. */
  val assortativitySql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |sym AS (SELECT ca AS src, cb AS dst FROM co UNION ALL SELECT cb, ca FROM co),
       |dg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
       |prs AS (
       |  SELECT d1.deg AS dx, d2.deg AS dy
       |  FROM sym s JOIN dg d1 ON d1.node = s.src JOIN dg d2 ON d2.node = s.dst),
       |sums AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
       |         CAST(COALESCE(SUM(dx), 0) AS BIGINT) AS sx,
       |         CAST(COALESCE(SUM(dx * dy), 0) AS BIGINT) AS sxy,
       |         CAST(COALESCE(SUM(dx * dx), 0) AS BIGINT) AS sx2
       |  FROM prs)
       |SELECT m2, sx, sxy, sx2,
       |       m2 * sxy - sx * sx AS num,
       |       m2 * sx2 - sx * sx AS den,
       |       CASE WHEN m2 * sx2 - sx * sx = 0 THEN CAST(0.0 AS DOUBLE)
       |            ELSE CAST(m2 * sxy - sx * sx AS DOUBLE) / CAST(m2 * sx2 - sx * sx AS DOUBLE)
       |       END AS r
       |FROM sums""".stripMargin

  /** Rectangle-count oracle: brute-force ordered closed-4-walk enumeration
    * over the hub-pruned strong backbone — four adjacency joins with the
    * two diagonal-distinctness predicates, counted per start node and
    * halved for the direction symmetry. A genuinely different formulation
    * from the engine's wedge-pair combinatorics
    * ([[GraphStats.rectangleCounts]]); they must agree on every node. */
  def rectanglesSql(maxDeg: Long): String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co0 AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS MATERIALIZED (SELECT MAX(w) AS m FROM co0),
       |co AS MATERIALIZED (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |sym AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM co UNION ALL SELECT cb, ca FROM co),
       |dg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
       |keep AS MATERIALIZED (SELECT node FROM dg WHERE deg <= $maxDeg),
       |sub AS MATERIALIZED (
       |  SELECT s.src AS u, s.dst AS v FROM sym s
       |  JOIN keep k1 ON k1.node = s.src JOIN keep k2 ON k2.node = s.dst),
       |walks AS (
       |  SELECT e1.u AS node
       |  FROM sub e1 JOIN sub e2 ON e2.u = e1.v
       |       JOIN sub e3 ON e3.u = e2.v
       |       JOIN sub e4 ON e4.u = e3.v AND e4.v = e1.u
       |  WHERE e1.u <> e2.v AND e1.v <> e3.v),
       |cnt AS (SELECT node, COUNT(*) AS c FROM walks GROUP BY 1)
       |SELECT n.u AS concept_id, CAST(COALESCE(c.c, 0) // 2 AS BIGINT) AS n_rectangles
       |FROM (SELECT DISTINCT u FROM sub) n LEFT JOIN cnt c ON c.node = n.u""".stripMargin

  /** SCC oracle over the implication digraph: a recursive reachability
    * closure + MUTUAL-pair self-join + MIN rollup — scc_id(v) = min w with
    * v →* w and w →* v (v itself included via the zero-length base rows).
    * Independent of the engine's forward-backward coloring rounds. */
  private def sccPrefix: String =
    s"""WITH RECURSIVE $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS MATERIALIZED (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |mar AS MATERIALIZED (SELECT concept_id, COUNT(*) AS n FROM pc GROUP BY 1),
       |co0 AS MATERIALIZED (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, COUNT(*) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |mx AS MATERIALIZED (SELECT MAX(w) AS m FROM co0),
       |co AS MATERIALIZED (SELECT ca, cb FROM co0, mx WHERE w * 100 >= m * 85),
       |dig AS MATERIALIZED (
       |  SELECT co.ca AS src, co.cb AS dst
       |  FROM co JOIN mar ma ON ma.concept_id = co.ca JOIN mar mb ON mb.concept_id = co.cb
       |  WHERE ma.n <= mb.n
       |  UNION ALL
       |  SELECT co.cb, co.ca
       |  FROM co JOIN mar ma ON ma.concept_id = co.ca JOIN mar mb ON mb.concept_id = co.cb
       |  WHERE mb.n <= ma.n),
       |reach(s, v) AS (
       |  SELECT src, src FROM dig UNION SELECT dst, dst FROM dig
       |  UNION
       |  SELECT r.s, e.dst FROM reach r JOIN dig e ON e.src = r.v
       |),
       |mutual AS (
       |  SELECT a.s AS v, a.v AS w FROM reach a JOIN reach b ON b.s = a.v AND b.v = a.s),
       |scc AS (SELECT v AS node, MIN(w) AS scc_id FROM mutual GROUP BY 1)""".stripMargin

  val sccSql: String =
    s"""$sccPrefix
       |SELECT node, scc_id FROM scc""".stripMargin

  /** Condensation oracle: the SCC closure's component assignment projected
    * onto the digraph's edges — distinct cross-component (scc_src, scc_dst)
    * pairs, mirroring [[Scc.condensation]]. */
  val condensationSql: String =
    s"""$sccPrefix
       |SELECT DISTINCT sa.scc_id AS scc_src, sb.scc_id AS scc_dst
       |FROM dig e JOIN scc sa ON sa.node = e.src JOIN scc sb ON sb.node = e.dst
       |WHERE sa.scc_id <> sb.scc_id""".stripMargin

  /** Diameter/radius oracle: the 1-row MAX/MIN/COUNT rollup over the
    * hop-bounded eccentricity oracle (same CTE chain, different tail). */
  def diameterSql(maxHops: Int): String =
    s"""SELECT CAST(MAX(ecc_hops) AS INT) AS diameter_hops,
       |       CAST(MIN(ecc_hops) AS INT) AS radius_hops,
       |       CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM (${eccentricitySql(maxHops)})""".stripMargin

  /** Bounded-weighted-shortest-path oracle: recursive-CTE walk enumeration
    * (≤ maxHops edges, costs accumulated in exact longs) + MIN rollup —
    * independent of the engine's Bellman-Ford relaxation rounds. Seed =
    * max-strength node, tie min id, same as the engine. */
  def shortestPathSql(maxHops: Int): String =
    s"""WITH RECURSIVE $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |pc AS (SELECT DISTINCT conv_id, concept_id FROM per_turn WHERE n_mentions > 0),
       |co AS (
       |  SELECT a.concept_id AS ca, b.concept_id AS cb, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM pc a JOIN pc b ON a.conv_id = b.conv_id AND a.concept_id < b.concept_id
       |  GROUP BY 1, 2),
       |sym AS (
       |  SELECT ca AS src, cb AS dst, CAST(1000000 // w AS BIGINT) AS cost FROM co
       |  UNION ALL SELECT cb, ca, CAST(1000000 // w AS BIGINT) FROM co),
       |strength AS (
       |  SELECT node, SUM(w) AS wtot FROM (
       |    SELECT ca AS node, w FROM co UNION ALL SELECT cb, w FROM co) GROUP BY 1),
       |seed AS (SELECT node FROM strength ORDER BY wtot DESC, node LIMIT 1),
       |walk(node, cost, hops) AS (
       |  SELECT node, CAST(0 AS BIGINT), 0 FROM seed
       |  UNION ALL
       |  SELECT e.dst, w.cost + e.cost, w.hops + 1
       |  FROM walk w JOIN sym e ON e.src = w.node WHERE w.hops < $maxHops)
       |SELECT node AS concept_id, CAST(MIN(cost) AS BIGINT) AS dist_q
       |FROM walk GROUP BY 1""".stripMargin

  /** Component-edge VALUES list shared by the canonical oracles. */
  private def componentEdgeValuesFor(cs: Vector[Concept]): String = {
    val ids = cs.map(_.wikibaseId).toSet
    val pairs =
      DemoConceptStore.conceptEdgesOf(cs).collect { case (s, _, o) if ids(s) && ids(o) => (s, o) } ++
        DemoConceptStore.surfaceEdgesOf(cs).filter { case (_, c) => ids(c) }
    pairs.map { case (s, d) => s"('${sq(s)}', '${sq(d)}')" }.mkString(", ")
  }

  /** Recursive-CTE member list computing (node, component) — min-reachable-id
    * connected components, the independent cross-check of the engine's
    * star-contraction CC. Use inside a WITH RECURSIVE prologue. */
  private def componentCtesFor(cs: Vector[Concept]): String =
    s"""e(src, dst) AS (SELECT * FROM (VALUES ${componentEdgeValuesFor(cs)})),
       |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
       |nodes AS (SELECT DISTINCT src AS node FROM und),
       |reach(node, r) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT reach.node, u.dst FROM reach JOIN und u ON u.src = reach.r),
       |comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)""".stripMargin

  private def componentCtes: String = componentCtesFor(concepts)

  def canonicalSqlFor(cs: Vector[Concept]): String =
    s"""WITH RECURSIVE ${componentCtesFor(cs)}
       |SELECT node, component FROM comp""".stripMargin

  val canonicalSql: String = canonicalSqlFor(concepts)

  // ---- executed-reference span-grain oracles --------------------------------
  //
  // The span grain (start/end/surface/span_id) is not SQL-expressible, so the
  // oracle joins turns onto a parquet fixture of spans produced by RUNNING the
  // reference KeywordClassifier over every distinct corpus text
  // (tools/gen_ref_mentions.py). Mentions are a pure function of
  // (text, concept store) — the reference's Span.id is
  // Identifier.generate(text, start, end, concept_id)
  // (/root/reference/knowledge_graph/span.py:82-91) — so keying by md5(text)
  // is exact at any scale factor.

  /** Repo root at oracle-GENERATION time: -Dgraft.repoRoot wins, else a
    * classpath anchor (three levels up from the sbt classes directory,
    * "target/scala-2.13/classes", validated by the build.sbt there), else
    * user.dir (correct when Verify runs via sbt from the checkout). Every
    * fixture-backed oracle breaks loudly at once if this resolves wrong, so
    * prefer the launch-directory-independent anchors. */
  val repoRoot: String =
    sys.props.get("graft.repoRoot").orElse {
      // classes dir is <repo>/target/scala-2.13/classes when run via sbt
      Option(getClass.getProtectionDomain.getCodeSource)
        .map(_.getLocation.toURI)
        .filter(_.getScheme == "file")
        .map(u => new java.io.File(u))
        .filter(_.isDirectory)
        .flatMap(d => Option(d.getParentFile).flatMap(p => Option(p.getParentFile)).flatMap(t => Option(t.getParentFile)))
        .filter(r => new java.io.File(r, "build.sbt").isFile)
        .map(_.getAbsolutePath)
    }.getOrElse(sys.props.getOrElse("user.dir", "/root/repo"))

  val refMentionsPath: String = s"$repoRoot/src/test/resources/ref_mentions.parquet"

  val refMentionsCte: String =
    s"""ref_mentions AS (
       |  SELECT t.conv_id, t.turn_idx, m.concept_id, m.start, m."end", m.surface, m.span_id
       |  FROM turns t JOIN read_parquet('$refMentionsPath') m ON md5(t.text) = m.text_md5)""".stripMargin

  val mentionsSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |$refMentionsCte
       |SELECT conv_id, turn_idx, concept_id, start, "end", surface, span_id FROM ref_mentions""".stripMargin

  /** G1 per-turn collated span arrays, stringified exactly like the Spark
    * registration (sorted by (start, end, concept_id, span_id), ':'-joined
    * fields, ';'-joined spans). */
  val passageConceptsSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |$refMentionsCte
       |SELECT conv_id, turn_idx,
       |  array_to_string(list(
       |      CAST(start AS VARCHAR) || ':' || CAST("end" AS VARCHAR) || ':' || concept_id || ':' || span_id
       |      ORDER BY start, "end", concept_id, span_id), ';') AS concepts_str,
       |  COUNT(*) AS n_spans
       |FROM ref_mentions GROUP BY conv_id, turn_idx""".stripMargin

  /** G5 v2 spans: identical (start, end) intervals grouped per turn, distinct
    * sorted concept list stringified. */
  val spansV2Sql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |$refMentionsCte
       |SELECT conv_id, turn_idx, start, "end",
       |  array_to_string(list_sort(list(DISTINCT concept_id)), ',') AS concepts_v2_str
       |FROM ref_mentions GROUP BY conv_id, turn_idx, start, "end"""".stripMargin

  /** SQL twin of graft.core.Sanitise for the ASCII subset present in the
    * corpus + planted variants (XML specials -> '_', \n and \t -> ' ').
    * Replace order matches the JVM single-pass switch; no produced char
    * ('_', ' ') is an input of a later replace, so the chain is equivalent.
    * Full unicode pass-2 fidelity (ellipsis, curly quotes, em-dash) is
    * locked by CoreSpec differential vectors instead. */
  private def sanSql(x: String): String =
    s"replace(replace(replace(replace(replace(replace(replace($x, '&', '_'), '<', '_'), '>', '_'), " +
      s"'${"\""}', '_'), chr(39), '_'), chr(10), ' '), chr(9), ' ')"

  /** A8/A9 oracle: sanitise + content-id passage consolidation. Mirrors the
    * engine's planting (a '\n'-for-space twin of every 7th turn that
    * sanitises back to the base text, an '<...>'-wrapped variant of every
    * 11th turn) and re-derives the merged span multiset per content id. */
  val consolidateSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |$refMentionsCte,
       |base AS (SELECT conv_id, turn_idx, 'b' AS kind, ${sanSql("text")} AS stext FROM turns),
       |dup AS (SELECT conv_id, turn_idx, 'd' AS kind, ${sanSql("replace(text, ' ', chr(10))")} AS stext
       |        FROM turns WHERE turn_idx % 7 = 0),
       |mark AS (SELECT conv_id, turn_idx, 'm' AS kind, ${sanSql("'<' || text || '>'")} AS stext
       |         FROM turns WHERE turn_idx % 11 = 3),
       |passages AS (SELECT * FROM base UNION ALL SELECT * FROM dup UNION ALL SELECT * FROM mark),
       |pass_spans AS (
       |  SELECT p.stext, m.start, m."end", m.concept_id
       |  FROM passages p JOIN ref_mentions m ON p.kind = 'b' AND p.conv_id = m.conv_id AND p.turn_idx = m.turn_idx
       |  UNION ALL
       |  SELECT stext, 0 AS start, 4 AS "end", 'QDUP' AS concept_id FROM passages WHERE kind = 'd'),
       |ids AS (SELECT DISTINCT md5(stext) AS id, stext FROM passages),
       |agg AS (SELECT md5(stext) AS id,
       |               array_to_string(list(CAST(start AS VARCHAR) || ':' || CAST("end" AS VARCHAR) || ':' || concept_id
       |                                    ORDER BY start, "end", concept_id), ';') AS spans_str,
       |               CAST(COUNT(*) AS INT) AS n_spans
       |        FROM pass_spans GROUP BY 1)
       |SELECT i.id, CAST(length(i.stext) AS INT) AS n_chars,
       |       COALESCE(a.spans_str, '') AS spans_str,
       |       COALESCE(a.n_spans, 0) AS n_spans
       |FROM ids i LEFT JOIN agg a USING (id)""".stripMargin

  /** G6 eval harness oracle: span-level confusion counts at jaccard
    * thresholds {0, .5, .9, .99} (metrics.py:98-142 semantics). Gold = the
    * executed-reference fixture spans; predicted = the same spans under the
    * deterministic perturbation the engine applies to its OWN mentions
    * (engine mentions == fixture is proven by the kg_mentions row, so
    * deriving predicted from ref_mentions here is an independent re-check of
    * the COUNTING, not of extraction). Counting strategy is deliberately
    * different from the engine's per-passage array filters: per-span
    * max-jaccard via join+group, thresholded afterwards (max > t  <=>
    * exists jac > t). Jaccard uses the same envelope formula as
    * Metrics.spanLevelDF — identical int arithmetic then one double
    * division, so comparisons are bit-exact across engines. */
  val evalPrSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |$refMentionsCte,
       |gold AS (SELECT conv_id, turn_idx, start, "end", span_id FROM ref_mentions WHERE turn_idx % 6 NOT IN (1, 2)),
       |pred AS (
       |  SELECT conv_id, turn_idx, start,
       |         CASE WHEN (start + "end") % 7 = 3 THEN "end" + 3 ELSE "end" END AS "end",
       |         span_id
       |  FROM ref_mentions WHERE (start + "end" + turn_idx) % 5 <> 0 AND turn_idx % 9 NOT IN (1, 4)
       |  UNION ALL
       |  SELECT conv_id, turn_idx, 0 AS start, 7 AS "end",
       |         'spur|' || conv_id || '|' || CAST(turn_idx AS VARCHAR) AS span_id
       |  FROM turns WHERE turn_idx % 11 = 7 AND len(text) >= 10 AND turn_idx % 9 NOT IN (1, 4)),
       |gold_best AS (
       |  -- the CASE guard matters: DuckDB's LEAST/GREATEST IGNORE NULLs, so
       |  -- without it an unmatched LEFT-JOIN row would score jac = 1.0
       |  -- against the missing side instead of propagating NULL
       |  SELECT g.conv_id, g.turn_idx, g.span_id,
       |         COALESCE(MAX(CASE WHEN p.span_id IS NULL THEN NULL
       |                      ELSE CAST(GREATEST(0, LEAST(g."end", p."end") - GREATEST(g.start, p.start)) AS DOUBLE)
       |                           / (GREATEST(g."end", p."end") - LEAST(g.start, p.start)) END), -1) AS best
       |  FROM gold g LEFT JOIN pred p ON g.conv_id = p.conv_id AND g.turn_idx = p.turn_idx
       |  GROUP BY 1, 2, 3),
       |pred_best AS (
       |  SELECT p.conv_id, p.turn_idx, p.span_id,
       |         COALESCE(MAX(CASE WHEN g.span_id IS NULL THEN NULL
       |                      ELSE CAST(GREATEST(0, LEAST(g."end", p."end") - GREATEST(g.start, p.start)) AS DOUBLE)
       |                           / (GREATEST(g."end", p."end") - LEAST(g.start, p.start)) END), -1) AS best
       |  FROM pred p LEFT JOIN gold g ON g.conv_id = p.conv_id AND g.turn_idx = p.turn_idx
       |  GROUP BY 1, 2, 3),
       |th AS (SELECT unnest([0, 50, 90, 99]) AS threshold_pct),
       |counts_g AS (
       |  SELECT th.threshold_pct,
       |         CAST(SUM(CASE WHEN gb.best > th.threshold_pct / 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |         CAST(SUM(CASE WHEN gb.best > th.threshold_pct / 100.0 THEN 0 ELSE 1 END) AS BIGINT) AS fn
       |  FROM th CROSS JOIN gold_best gb GROUP BY 1),
       |counts_p AS (
       |  SELECT th.threshold_pct,
       |         CAST(SUM(CASE WHEN pb.best > th.threshold_pct / 100.0 THEN 0 ELSE 1 END) AS BIGINT) AS fp
       |  FROM th CROSS JOIN pred_best pb GROUP BY 1),
       |tn_c AS (
       |  SELECT COUNT(*) AS tn FROM turns t
       |  WHERE NOT EXISTS (SELECT 1 FROM gold g WHERE g.conv_id = t.conv_id AND g.turn_idx = t.turn_idx)
       |    AND NOT EXISTS (SELECT 1 FROM pred p WHERE p.conv_id = t.conv_id AND p.turn_idx = t.turn_idx))
       |SELECT cg.threshold_pct, cg.tp, cp.fp, tn_c.tn, cg.fn
       |FROM counts_g cg JOIN counts_p cp USING (threshold_pct) CROSS JOIN tn_c""".stripMargin

  /** G6 × G8: the span-level sweep stratified by source (the conv_id prefix)
    * — same independent max-jaccard strategy as evalPrSql, with every count
    * grouped by stratum. */
  val evalPrStrataSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |$refMentionsCte,
       |gold AS (SELECT conv_id, turn_idx, start, "end", span_id FROM ref_mentions WHERE turn_idx % 6 NOT IN (1, 2)),
       |pred AS (
       |  SELECT conv_id, turn_idx, start,
       |         CASE WHEN (start + "end") % 7 = 3 THEN "end" + 3 ELSE "end" END AS "end",
       |         span_id
       |  FROM ref_mentions WHERE (start + "end" + turn_idx) % 5 <> 0 AND turn_idx % 9 NOT IN (1, 4)
       |  UNION ALL
       |  SELECT conv_id, turn_idx, 0 AS start, 7 AS "end",
       |         'spur|' || conv_id || '|' || CAST(turn_idx AS VARCHAR) AS span_id
       |  FROM turns WHERE turn_idx % 11 = 7 AND len(text) >= 10 AND turn_idx % 9 NOT IN (1, 4)),
       |gold_best AS (
       |  SELECT string_split(g.conv_id, '.')[1] AS stratum, g.span_id, g.conv_id, g.turn_idx,
       |         COALESCE(MAX(CASE WHEN p.span_id IS NULL THEN NULL
       |                      ELSE CAST(GREATEST(0, LEAST(g."end", p."end") - GREATEST(g.start, p.start)) AS DOUBLE)
       |                           / (GREATEST(g."end", p."end") - LEAST(g.start, p.start)) END), -1) AS best
       |  FROM gold g LEFT JOIN pred p ON g.conv_id = p.conv_id AND g.turn_idx = p.turn_idx
       |  GROUP BY 1, 2, 3, 4),
       |pred_best AS (
       |  SELECT string_split(p.conv_id, '.')[1] AS stratum, p.span_id, p.conv_id, p.turn_idx,
       |         COALESCE(MAX(CASE WHEN g.span_id IS NULL THEN NULL
       |                      ELSE CAST(GREATEST(0, LEAST(g."end", p."end") - GREATEST(g.start, p.start)) AS DOUBLE)
       |                           / (GREATEST(g."end", p."end") - LEAST(g.start, p.start)) END), -1) AS best
       |  FROM pred p LEFT JOIN gold g ON g.conv_id = p.conv_id AND g.turn_idx = p.turn_idx
       |  GROUP BY 1, 2, 3, 4),
       |th AS (SELECT unnest([0, 50, 90, 99]) AS threshold_pct),
       |strata AS (SELECT DISTINCT string_split(conv_id, '.')[1] AS stratum FROM turns),
       |counts_g AS (
       |  SELECT gb.stratum, th.threshold_pct,
       |         CAST(SUM(CASE WHEN gb.best > th.threshold_pct / 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |         CAST(SUM(CASE WHEN gb.best > th.threshold_pct / 100.0 THEN 0 ELSE 1 END) AS BIGINT) AS fn
       |  FROM th CROSS JOIN gold_best gb GROUP BY 1, 2),
       |counts_p AS (
       |  SELECT pb.stratum, th.threshold_pct,
       |         CAST(SUM(CASE WHEN pb.best > th.threshold_pct / 100.0 THEN 0 ELSE 1 END) AS BIGINT) AS fp
       |  FROM th CROSS JOIN pred_best pb GROUP BY 1, 2),
       |tn_c AS (
       |  SELECT string_split(t.conv_id, '.')[1] AS stratum, COUNT(*) AS tn FROM turns t
       |  WHERE NOT EXISTS (SELECT 1 FROM gold g WHERE g.conv_id = t.conv_id AND g.turn_idx = t.turn_idx)
       |    AND NOT EXISTS (SELECT 1 FROM pred p WHERE p.conv_id = t.conv_id AND p.turn_idx = t.turn_idx)
       |  GROUP BY 1)
       |SELECT s.stratum, th.threshold_pct,
       |       COALESCE(cg.tp, 0) AS tp, COALESCE(cp.fp, 0) AS fp,
       |       COALESCE(tn_c.tn, 0) AS tn, COALESCE(cg.fn, 0) AS fn
       |FROM strata s CROSS JOIN th
       |LEFT JOIN counts_g cg ON cg.stratum = s.stratum AND cg.threshold_pct = th.threshold_pct
       |LEFT JOIN counts_p cp ON cp.stratum = s.stratum AND cp.threshold_pct = th.threshold_pct
       |LEFT JOIN tn_c ON tn_c.stratum = s.stratum""".stripMargin

  /** G6 passage grain: positive-passage set intersections over the full turn
    * universe (metrics.py:145-186), same gold/pred CTEs as evalPrSql. */
  val evalPrPassageSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |$refMentionsCte,
       |gold AS (SELECT conv_id, turn_idx FROM ref_mentions WHERE turn_idx % 6 NOT IN (1, 2)),
       |pred AS (
       |  SELECT conv_id, turn_idx FROM ref_mentions WHERE (start + "end" + turn_idx) % 5 <> 0 AND turn_idx % 9 NOT IN (1, 4)
       |  UNION ALL
       |  SELECT conv_id, turn_idx FROM turns WHERE turn_idx % 11 = 7 AND len(text) >= 10 AND turn_idx % 9 NOT IN (1, 4)),
       |flags AS (
       |  SELECT t.conv_id, t.turn_idx,
       |         EXISTS(SELECT 1 FROM gold g WHERE g.conv_id = t.conv_id AND g.turn_idx = t.turn_idx) AS gpos,
       |         EXISTS(SELECT 1 FROM pred p WHERE p.conv_id = t.conv_id AND p.turn_idx = t.turn_idx) AS ppos
       |  FROM turns t)
       |SELECT CAST(SUM(CASE WHEN gpos AND ppos THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |       CAST(SUM(CASE WHEN NOT gpos AND ppos THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |       CAST(SUM(CASE WHEN NOT gpos AND NOT ppos THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |       CAST(SUM(CASE WHEN gpos AND NOT ppos THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |FROM flags""".stripMargin

  /** Dictionary VALUES for the linking oracles: (label_lc, concept_id, kind)
    * for every preferred and alternative label — the SQL twin of the
    * broadcast dictionary in Linking.linkSurfaces. */
  private def dictValues: String =
    concepts
      .flatMap { c =>
        (s"('${sq(c.preferredLabel.toLowerCase)}', '${c.wikibaseId}', 'preferred')") +:
          c.alternativeLabels.map(l => s"('${sq(l.toLowerCase)}', '${c.wikibaseId}', 'alternative')")
      }
      .mkString(", ")

  /** Linking-scoring CTE members over ref_mentions: candidate ranking
    * (preferred beats alternative, then per-concept corpus frequency, then
    * concept id) — the SQL twin of Linking.linkSurfaces' max_by. */
  private def linkedCtes: String =
    s"""dict(label, dict_concept_id, link_kind) AS (SELECT * FROM (VALUES $dictValues)),
       |surf_freq AS (SELECT lower(surface) AS label, COUNT(*) AS n_occurrences FROM ref_mentions GROUP BY 1),
       |concept_freq AS (SELECT lower(surface) AS label, concept_id AS dict_concept_id, COUNT(*) AS cf FROM ref_mentions GROUP BY 1, 2),
       |cand AS (
       |  SELECT s.label, d.dict_concept_id, d.link_kind, s.n_occurrences, COALESCE(f.cf, 0) AS cf
       |  FROM surf_freq s JOIN dict d ON s.label = d.label
       |  LEFT JOIN concept_freq f ON f.label = s.label AND f.dict_concept_id = d.dict_concept_id),
       |ranked AS (
       |  SELECT label, dict_concept_id, link_kind, n_occurrences,
       |         ROW_NUMBER() OVER (PARTITION BY label ORDER BY
       |           CASE WHEN link_kind = 'preferred' THEN 1 ELSE 0 END DESC, cf DESC, dict_concept_id DESC) AS rn
       |  FROM cand),
       |linked AS (SELECT label, dict_concept_id, link_kind, n_occurrences FROM ranked WHERE rn = 1)""".stripMargin

  val linkedSurfacesSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |$refMentionsCte,
       |$linkedCtes
       |SELECT label AS surface, dict_concept_id AS concept_id, link_kind, n_occurrences FROM linked""".stripMargin

  /** J7 end-to-end: every mention row with its linked concept and canonical
    * component id (KgPipeline.canonicalizeMentions). */
  val canonicalMentionsSql: String =
    s"""WITH RECURSIVE $transcriptsCte,
       |$turnsCte,
       |$refMentionsCte,
       |$linkedCtes,
       |$componentCtes
       |SELECT m.conv_id, m.turn_idx, m.concept_id, m.start, m."end", m.surface,
       |       COALESCE(l.dict_concept_id, m.concept_id) AS linked_concept_id,
       |       COALESCE(l.link_kind, 'extraction') AS link_kind,
       |       COALESCE(c.component, m.concept_id) AS canonical_id
       |FROM ref_mentions m
       |LEFT JOIN linked l ON lower(m.surface) = l.label
       |LEFT JOIN comp c ON c.node = m.concept_id""".stripMargin

  /** Geography fuzzy linking (geography.py:22-33): the synthetic geography
    * strings are re-derived with the same doc_id arithmetic, and expected ISO
    * codes come from an INDEPENDENT python DP implementation of rapidfuzz's
    * InDel ratio (tools/gen_geo_vectors.py fixture). */
  val geographySql: String = {
    val names = graft.core.Geography.dim.map { case (n, _) => s"'${sq(n)}'" }.mkString(", ")
    val n = graft.core.Geography.dim.size
    s"""WITH base AS (
       |  SELECT doc_id, list_extract([$names], CAST(doc_id % $n AS INT) + 1) AS nm,
       |         CAST(doc_id % 5 AS INT) + 2 AS p
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0 THEN substr(nm, 1, p - 1) || substr(nm, p + 1, 1000000) ELSE nm END AS geo_string
       |  FROM base)
       |SELECT s.doc_id, s.geo_string, f.iso
       |FROM s JOIN read_parquet('$repoRoot/src/test/resources/ref_geo_links.parquet') f USING (geo_string)""".stripMargin
  }

  /** G1 multi-classifier collation: keyword-pass counts (regex twin of the
    * trie) unioned with the embedding pass recomputed from scratch —
    * deterministic synthetic embeddings from doc_id arithmetic,
    * list_dot_product cosine (bit-exact vs the engine's sequential fold). */
  val multiClassifierSql: String = {
    val clfDims = concepts
      .map(c => s"('${c.wikibaseId}', '${DemoConceptStore.classifierId(c)}')")
      .mkString(", ")
    val embClf = KgPipeline.embeddingClassifierId(DemoConceptStore.byId("Q15"))
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |clf_dim(concept_id, classifier_id) AS (SELECT * FROM (VALUES $clfDims)),
       |kw AS (
       |  SELECT d.classifier_id, p.conv_id, p.turn_idx, p.concept_id, CAST(p.n_mentions AS BIGINT) AS n_mentions
       |  FROM per_turn p JOIN clf_dim d ON p.concept_id = d.concept_id WHERE p.n_mentions > 0),
       |embh AS (
       |  SELECT source || '.conv.' || CAST(doc_id % ${Transcripts.ConvBuckets} AS VARCHAR) AS conv_id,
       |         CAST(doc_id // ${Transcripts.ConvBuckets} AS INT) AS turn_idx,
       |         list_transform(string_split(text, ' '),
       |                        tok -> CAST(CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 8 AS INT)) AS hv
       |  FROM documents
       |  WHERE lang = 'en' AND CAST(doc_id % 4 AS INT) <> 3 AND length(trim(text)) > 0),
       |embp AS (
       |  SELECT conv_id, turn_idx,
       |         list_transform(range(8), i -> CAST(1 + len(list_filter(hv, h -> h = i)) AS DOUBLE)) AS e,
       |         list_transform(range(8), i -> CAST((i * 5 + 2) % 101 AS DOUBLE) / 101.0) AS c
       |  FROM embh),
       |emb AS (
       |  SELECT '$embClf' AS classifier_id, conv_id, turn_idx, 'Q15' AS concept_id, CAST(1 AS BIGINT) AS n_mentions
       |  FROM embp
       |  WHERE list_dot_product(e, c) / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(c, c))) >= 0.65),
       |allm AS (SELECT * FROM kw UNION ALL SELECT * FROM emb)
       |SELECT conv_id, turn_idx,
       |  array_to_string(list_sort(list(classifier_id || ':' || concept_id || ':' || CAST(n_mentions AS VARCHAR))), ';') AS models_str,
       |  CAST(COUNT(DISTINCT classifier_id) AS BIGINT) AS n_classifiers
       |FROM allm GROUP BY conv_id, turn_idx""".stripMargin
  }

  val lineageSql: String =
    s"""WITH $transcriptsCte,
       |$turnsCte,
       |per_turn AS (
       |${perTurnCountsSql}
       |),
       |m AS (SELECT conv_id, SUM(CASE WHEN n_mentions > 0 THEN n_mentions ELSE 0 END) AS n FROM per_turn GROUP BY conv_id),
       |t AS (SELECT conv_id, COUNT(*) AS n_turns FROM turns GROUP BY conv_id)
       |SELECT CAST(CAST(regexp_extract(t.conv_id, '([0-9]+)$$', 1) AS INT) % 32 AS INT) AS bucket,
       |       CAST(SUM(t.n_turns) AS BIGINT) AS n_turns,
       |       CAST(SUM(COALESCE(m.n, 0)) AS BIGINT) AS n_mentions
       |FROM t LEFT JOIN m ON t.conv_id = m.conv_id
       |GROUP BY 1""".stripMargin

  val nodesSql: String = {
    val conceptValues = concepts
      .map(c => s"('${c.wikibaseId}', 'concept', '${sq(c.preferredLabel)}')")
      .mkString(", ")
    s"""WITH $transcriptsCte,
       |$turnsCte
       |SELECT conv_id AS node_id, 'document' AS kind, CAST(COUNT(*) AS VARCHAR) AS prop FROM turns GROUP BY conv_id
       |UNION ALL
       |SELECT conv_id || '_' || CAST(turn_idx AS VARCHAR), 'passage', CAST(turn_idx AS VARCHAR) FROM turns
       |UNION ALL
       |SELECT node_id, kind, prop FROM (VALUES $conceptValues) v(node_id, kind, prop)""".stripMargin
  }

  val transcriptsSql: String =
    s"WITH $transcriptsCte SELECT conv_id, turn_idx, role, text, tool, ts_epoch FROM transcripts"

  val turnsOrderedSql: String =
    s"""WITH $transcriptsCte
       |SELECT conv_id, turn_idx,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS INT) AS turn_seq,
       |       text
       |FROM transcripts""".stripMargin
}
