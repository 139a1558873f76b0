package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import QH._

/** Round-10 corpus-statistics operator families: language-model count
  * statistics (bigram familiarity, continuation counts), distribution
  * analytics without global sorts (exact CDF binning, closed-form group
  * variance), curriculum scheduling, and embedding outlier pruning.
  * Every query keeps the corpus-sized frames in scan→explode→aggregate
  * shape; the only broadcast frames are STRUCTURALLY bounded (charset²,
  * |distinct values|, |labels|) — never corpus-sized.
  */
object StatsQueries {

  val qs: Seq[Q] = Seq(
    // CHAR-BIGRAM FAMILIARITY — the cheap LM-free fluency score used to
    // pre-filter gibberish before an expensive model scorer: a document
    // whose character bigrams are rare corpus-wide is (machine noise |
    // wrong language | binary junk). Two-phase dictionary shape: phase 1
    // aggregates the corpus to its bigram dictionary — bounded by
    // |charset|² (~10⁴ rows for UTF-8 text in practice), NOT corpus
    // size, which is why the broadcast is structurally safe where
    // broadcasting a fact-derived frame would not be. Phase 2 re-walks
    // the bigrams and broadcast-joins the counts back — one shuffle over
    // corpus bigrams (the per-doc re-agg), everything else map-side.
    // All-integer sums; the single final division is one IEEE op.
    Q("q137_bigram_familiarity",
      (s, d) => {
        // occurrences collapse to per-doc pair COUNTS before anything
        // else: every later frame (dictionary, scoring join, final agg)
        // carries one row per DISTINCT (doc, pair), not one per
        // occurrence — at 100 TB that first map-side-combined groupBy is
        // the only pass over raw token volume
        val bgc = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
            .as("pair"))
          .groupBy("doc_id", "pair")
          .agg(count(lit(1)).as("k"))
          // feeds the dictionary AND the scoring join: cache makes
          // single-computation a contract (q128 convention)
          .cache()
        val dict = bgc.groupBy("pair").agg(sum(col("k")).as("cnt"))
        bgc.join(broadcast(dict), "pair")
          .groupBy("doc_id")
          .agg(sum(col("k")).cast("long").as("n_bigrams"),
            sum(col("k") * col("cnt")).as("fs"))
          .select(col("doc_id"), col("n_bigrams"),
            col("fs").cast("long").as("fam_sum"),
            (col("fs").cast("double") / col("n_bigrams")).as("familiarity"))
          .orderBy("doc_id")
      },
      Some("""
        WITH w AS (
          SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
          FROM documents),
        bg AS (
          SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LENGTH(word)),
            i -> SUBSTR(word, CAST(i AS INT), 2))) AS pair
          FROM w WHERE LENGTH(word) >= 2),
        dict AS (SELECT pair, COUNT(*) AS cnt FROM bg GROUP BY pair)
        SELECT doc_id, COUNT(*) AS n_bigrams,
          CAST(SUM(cnt) AS BIGINT) AS fam_sum,
          CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS familiarity
        FROM bg JOIN dict USING (pair) GROUP BY doc_id ORDER BY doc_id""")),

    // EXACT CDF QUANTILE BINNING without a global sort — assign every
    // document its corpus quartile by length. NTILE over a global window
    // is the naive form (single partition sees every row). The scale
    // shape: (1) value-frequency frame (one aggregation, bounded by
    // |distinct n_chars|), (2) running below-count over THAT bounded
    // frame (the only single-partition window), (3) broadcast back and
    // assign bin = floor(4·cdf) row-locally. Ties all land in the same
    // bin — deterministic where NTILE's remainder-splitting is not.
    // 4.0 is a power of two so the multiply is exact; the one division
    // is a single IEEE op — bit-equal across engines.
    Q("q138_cdf_quantile_bins",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
        val freq = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
        val cum = freq
          .withColumn("below", coalesce(
            sum(col("c")).over(Window.orderBy("n_chars")
              .rowsBetween(Long.MinValue, -1)), lit(0L)))
          .select(col("n_chars"), col("below"))
        val tot = freq.agg(sum(col("c")).as("n"))
        docs.join(broadcast(cum), "n_chars")
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("n_chars"),
            least(lit(3), floor(col("below") * lit(4.0) / col("n")))
              .cast("int").as("qbin"))
          .orderBy("doc_id")
      },
      Some("""
        WITH f AS (SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY 1),
        cum AS (SELECT n_chars, COALESCE(SUM(c) OVER (ORDER BY n_chars
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
          FROM f),
        n AS (SELECT COUNT(*) AS n FROM documents)
        SELECT doc_id, n_chars,
          CAST(LEAST(3, FLOOR(below * 4.0 / n)) AS INT) AS qbin
        FROM documents JOIN cum USING (n_chars), n ORDER BY doc_id""")),

    // PER-GROUP EXACT VARIANCE via the closed form (n·Σx² − (Σx)²)/n² —
    // one aggregation pass, no second centered pass and no window. The
    // sums accumulate in DECIMAL (Spark) ↔ HUGEINT (DuckDB): token
    // counts are integers, so the numerator is an EXACT integer in both
    // engines before the one cast→divide→sqrt tail of correctly-rounded
    // IEEE ops — bit-equal, order-free under any partitioning. The
    // stock `var_pop` would double-accumulate and drift by partitioning.
    Q("q139_group_variance",
      (s, d) =>
        t(s, d, "documents")
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("tok"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n"),
            sum(col("tok")).as("s1"),
            sum(col("tok").cast("decimal(19,0)")
              * col("tok").cast("decimal(19,0)")).as("s2"))
          .select(col("source"), col("n"),
            (col("s1").cast("double") / col("n")).as("mean_tok"),
            ((col("n").cast("decimal(38,0)") * col("s2")
              - col("s1").cast("decimal(19,0)")
                * col("s1").cast("decimal(19,0)")).cast("double")
              / (col("n") * col("n")).cast("double")).as("var_pop"))
          .withColumn("std_pop", sqrt(col("var_pop")))
          .orderBy("source"),
      Some("""
        WITH t AS (SELECT source,
          CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS tok
          FROM documents)
        SELECT source, COUNT(*) AS n,
          CAST(SUM(tok) AS DOUBLE) / COUNT(*) AS mean_tok,
          CAST(COUNT(*) * SUM(tok * tok) - SUM(tok) * SUM(tok) AS DOUBLE)
            / CAST(COUNT(*) * COUNT(*) AS DOUBLE) AS var_pop,
          SQRT(CAST(COUNT(*) * SUM(tok * tok) - SUM(tok) * SUM(tok) AS DOUBLE)
            / CAST(COUNT(*) * COUNT(*) AS DOUBLE)) AS std_pop
        FROM t GROUP BY source ORDER BY source""")),

    // CURRICULUM INTERLEAVE — the deterministic "shuffle" that preserves
    // the difficulty mixture: band documents by score, give each doc a
    // reproducible uniform slot inside its band (portable-md5 order, the
    // q100/q136 device), and emit the schedule ordered (slot, band) —
    // i.e. round-robin across bands, so every training window sees the
    // full difficulty mixture. One PARTITIONED window (the band carries
    // one difficulty stratum); no global window, no global sort except
    // presentation. This is how you shuffle 100 TB without a shuffle: the
    // (slot, band) key IS the write-partitioning of the schedule.
    Q("q140_curriculum_interleave",
      (s, d) => {
        val w = Window.partitionBy("band").orderBy(asc("h"), asc("doc_id"))
        t(s, d, "documents")
          .withColumn("words", split(col("text"), " "))
          .select(col("doc_id"),
            (size(array_distinct(col("words"))).cast("double")
              / size(col("words"))).as("score"))
          .withColumn("band", floor(col("score") * 10).cast("int"))
          .withColumn("h", md5(col("doc_id").cast("string")))
          .withColumn("slot", row_number().over(w).cast("long"))
          .select(col("slot"), col("band"), col("doc_id"))
          .orderBy("slot", "band", "doc_id")
      },
      Some("""
        WITH s AS (SELECT doc_id,
          CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
            / LEN(STRING_SPLIT(text, ' ')) AS score FROM documents),
        b AS (SELECT doc_id, CAST(FLOOR(score * 10) AS INT) AS band,
          CAST(ROW_NUMBER() OVER (PARTITION BY CAST(FLOOR(score * 10) AS INT)
            ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS slot
          FROM s)
        SELECT slot, band, doc_id FROM b ORDER BY slot, band, doc_id""")),

    // CONTINUATION COUNTS — the Kneser-Ney statistic: for each word, how
    // many DISTINCT left contexts it follows (vs its raw frequency).
    // The ratio separates true content words from words that only ever
    // appear inside one boilerplate phrase — a boilerplate detector that
    // needs no template mining. Adjacent pairs come from one in-row
    // transform over the word array (no self-join on position);
    // countDistinct lowers to Spark's two-level expand+agg. The ≥2-word
    // guard matches the oracle's empty RANGE and dodges the descending-
    // sequence edge (sequence(2,1) = [2,1]).
    Q("q141_continuation_counts",
      (s, d) =>
        t(s, d, "documents")
          .select(split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 2)
          .select(explode(expr(
            """transform(sequence(2, size(ws)), i ->
              |  named_struct('prev', element_at(ws, i - 1),
              |               'cur',  element_at(ws, i)))""".stripMargin))
            .as("p"))
          .select(col("p.prev").as("prev"), col("p.cur").as("cur"))
          .groupBy("cur")
          .agg(countDistinct(col("prev")).as("continuation"),
            count(lit(1)).as("total"))
          .orderBy("cur"),
      Some("""
        WITH w AS (SELECT STRING_SPLIT(text, ' ') AS ws FROM documents
          WHERE LEN(STRING_SPLIT(text, ' ')) >= 2),
        p AS (SELECT ws[CAST(u.i AS INT) - 1] AS prev,
            ws[CAST(u.i AS INT)] AS cur
          FROM w, UNNEST(RANGE(2, LEN(ws) + 1)) AS u(i))
        SELECT cur, COUNT(DISTINCT prev) AS continuation, COUNT(*) AS total
        FROM p GROUP BY cur ORDER BY cur""")),

    // EMBEDDING CENTROID OUTLIERS — mislabeled/corrupt-vector pruning:
    // distance to the per-label centroid, global top-50 outliers. The
    // centroid is a (|labels| × dim)-bounded frame (posexplode + one
    // aggregation), rebuilt into an ordered array and BROADCAST — the
    // fact vectors are never shuffled. Exactness is the q78/q134 dyadic
    // device twice over: components snap to 2^-20 dyadics (sums of ≤
    // 2^33 dyadic terms are exact in double → order-free), and the
    // residuals re-snap before squaring so Σr² is again an exact dyadic
    // sum — bit-equal across engines with no decimal accumulator and no
    // tolerance. Top-50 lowers to TakeOrderedAndProject.
    Q("q142_centroid_outliers",
      (s, d) => {
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), expr(
            "transform(embedding, x -> round(cast(x as double) * 1048576d) / 1048576d)")
            .as("e"))
          .cache() // feeds the centroid build AND the distance scan
        val cent = emb
          .select(col("label"), posexplode(col("e")).as(Seq("i", "x")))
          .groupBy("label", "i")
          .agg((sum(col("x")) / count(lit(1))).as("c"))
        // collect_list here is bounded by the embedding dim (64), not by
        // data — the one place a list agg is legitimate
        val centArr = cent.groupBy("label")
          .agg(expr("transform(sort_array(collect_list(struct(i, c))), s -> s.c)")
            .as("cent"))
        emb.join(broadcast(centArr), "label")
          .select(col("vec_id"), col("label"), expr(
            """aggregate(sequence(0, size(e) - 1), 0.0d, (acc, i) -> acc +
              |  (round((element_at(e, i + 1) - element_at(cent, i + 1)) * 1048576d) / 1048576d)
              |  * (round((element_at(e, i + 1) - element_at(cent, i + 1)) * 1048576d) / 1048576d))"""
              .stripMargin).as("dist2"))
          .orderBy(desc("dist2"), asc("vec_id"))
          .limit(50)
      },
      Some("""
        WITH e AS (SELECT vec_id, label,
          LIST_TRANSFORM(embedding,
            x -> ROUND(CAST(x AS DOUBLE) * 1048576) / 1048576) AS e
          FROM embeddings),
        comp AS (SELECT label, u.i AS i, e[CAST(u.i AS INT)] AS x
          FROM e, UNNEST(RANGE(1, LEN(e) + 1)) AS u(i)),
        cent AS (SELECT label, i, SUM(x) / COUNT(*) AS c
          FROM comp GROUP BY 1, 2),
        centarr AS (SELECT label, LIST(c ORDER BY i) AS cent
          FROM cent GROUP BY label)
        SELECT vec_id, e.label,
          LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(e.e) + 1), i ->
            (ROUND((e.e[CAST(i AS INT)] - cent[CAST(i AS INT)]) * 1048576) / 1048576)
            * (ROUND((e.e[CAST(i AS INT)] - cent[CAST(i AS INT)]) * 1048576) / 1048576)))
            AS dist2
        FROM e JOIN centarr USING (label)
        ORDER BY dist2 DESC, vec_id LIMIT 50""")),

    // BOILERPLATE PRUNE — the C4 cleaning recipe as a document REWRITE
    // (q98 only scores span duplication; this removes it): chop each doc
    // into fixed 8-word segments, count each segment corpus-wide, drop
    // segments appearing ≥ 3 times, and reconstruct the text in original
    // order. The segment-frequency frame is corpus-sized, so the count
    // join is a plain shuffle equi join on the segment key (NOT a
    // broadcast — that's the q83 eval-side trap in reverse). The only
    // list aggregation is per-document and bounded by document length —
    // a doc must fit in one task's memory to exist at all (same bound
    // q84's packing relies on).
    Q("q143_boilerplate_prune",
      (s, d) => {
        val segs = t(s, d, "documents")
          .select(col("doc_id"), posexplode(expr(
            """transform(
              |  sequence(0, cast(ceil(size(split(text, ' ')) / 8.0d) as int) - 1),
              |  k -> concat_ws(' ', slice(split(text, ' '), k * 8 + 1, 8)))"""
              .stripMargin)).as(Seq("pos", "seg")))
          .cache() // feeds the frequency count AND the keep join
        val freq = segs.groupBy("seg").agg(count(lit(1)).as("cnt"))
        val kept = segs.join(freq, "seg").filter(col("cnt") < 3)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
            concat_ws(" ", expr(
              "transform(sort_array(collect_list(struct(pos, seg))), x -> x.seg)"))
              .as("new_text"))
        t(s, d, "documents")
          .select(col("doc_id"),
            expr("cast(ceil(size(split(text, ' ')) / 8.0d) as bigint)")
              .as("n_total"))
          .join(kept, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_pruned"),
            coalesce(col("new_text"), lit("")).as("new_text"))
          .orderBy("doc_id")
      },
      Some("""
        WITH segs AS (
          SELECT doc_id, u.k AS pos,
            ARRAY_TO_STRING((STRING_SPLIT(text, ' '))
              [CAST(u.k * 8 + 1 AS INT) : CAST(u.k * 8 + 8 AS INT)], ' ')
              AS seg
          FROM documents,
            UNNEST(RANGE(0,
              CAST(CEIL(LEN(STRING_SPLIT(text, ' ')) / 8.0) AS BIGINT)))
              AS u(k)),
        freq AS (SELECT seg, COUNT(*) AS cnt FROM segs GROUP BY seg),
        kept AS (
          SELECT doc_id, COUNT(*) AS n_kept,
            ARRAY_TO_STRING(LIST(s.seg ORDER BY pos), ' ') AS new_text
          FROM segs s JOIN freq USING (seg) WHERE cnt < 3 GROUP BY doc_id)
        SELECT d.doc_id,
          COALESCE(k.n_kept, 0) AS n_kept,
          CAST(CEIL(LEN(STRING_SPLIT(d.text, ' ')) / 8.0) AS BIGINT)
            - COALESCE(k.n_kept, 0) AS n_pruned,
          COALESCE(k.new_text, '') AS new_text
        FROM documents d LEFT JOIN kept k USING (doc_id)
        ORDER BY d.doc_id""")),

    // NEXT-EVENT TRAINING EXAMPLES — sequence-dataset construction for a
    // next-action model: each event becomes a (3-event context, target)
    // example. THREE lag() columns over ONE user partitioning — the
    // whole construction rides a single hash exchange on user_id and
    // never materializes per-user arrays (the collect_list-then-slide
    // formulation holds a user's whole history in one row; lag holds
    // three). Tie-broken (ts, event_id) so the sequence order is total
    // and engine-independent.
    Q("q144_next_event_dataset",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("ctx1", lag(col("event_type"), 3).over(w))
          .withColumn("ctx2", lag(col("event_type"), 2).over(w))
          .withColumn("ctx3", lag(col("event_type"), 1).over(w))
          .filter(col("ctx1").isNotNull)
          .select(col("user_id"), col("event_id"),
            col("ctx1"), col("ctx2"), col("ctx3"),
            col("event_type").as("target"))
          .orderBy("user_id", "event_id")
      },
      Some("""
        SELECT user_id, event_id, ctx1, ctx2, ctx3, target FROM (
          SELECT user_id, event_id,
            LAG(event_type, 3) OVER w AS ctx1,
            LAG(event_type, 2) OVER w AS ctx2,
            LAG(event_type, 1) OVER w AS ctx3,
            event_type AS target
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        WHERE ctx1 IS NOT NULL ORDER BY user_id, event_id""")),

    // LEAVE-ONE-OUT TARGET ENCODING — the category feature that doesn't
    // leak its own row's label: encode event_type as the mean target of
    // the OTHER rows in the group, (Σ − v)/(n − 1). One aggregation to a
    // |categories|-row stats frame, broadcast back, then two row-local
    // IEEE ops — no window over facts, no per-row re-aggregation. The
    // group sum is decimal-accumulated (QH.decSum) so Σ is bit-equal
    // across engines and partitionings; singleton groups yield NULL in
    // both engines rather than a 0/0.
    Q("q145_loo_target_encoding",
      (s, d) => {
        val ev = t(s, d, "events")
        val stats = ev.groupBy("event_type")
          .agg(decSum(col("value")).as("s"), count(lit(1)).as("n"))
        ev.join(broadcast(stats), "event_type")
          .select(col("event_id"), col("event_type"), col("value"),
            when(col("n") > 1, (col("s") - col("value")) / (col("n") - 1))
              .as("loo_mean"))
          .orderBy("event_id")
      },
      Some("""
        WITH st AS (SELECT event_type,
          CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
            AS s,
          COUNT(*) AS n FROM events GROUP BY 1)
        SELECT event_id, e.event_type, value,
          CASE WHEN n > 1 THEN (s - value) / (n - 1) END AS loo_mean
        FROM events e JOIN st USING (event_type) ORDER BY event_id""")),

    // GENERATOR NULL-PRESERVATION — explode_outer semantics pinned under
    // the hash gate: a per-segment fact build must NOT silently drop
    // parents whose array is empty (plain explode does — the classic
    // missing-rows bug in per-doc reports; 5 docs here have no ≥6-char
    // word). The generator emits a null row for empty arrays, the
    // conditional count turns it into an honest 0, and min() carries
    // the SQL-standard null-skipping through. Row count == |documents|
    // is exactly what the gate verifies.
    Q("q153_explode_outer",
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"), explode_outer(expr(
            "filter(split(text, ' '), w -> length(w) >= 6)")).as("w"))
          .groupBy("doc_id")
          .agg(
            sum(when(col("w").isNotNull, 1).otherwise(0)).cast("long")
              .as("n_long"),
            min(col("w")).as("first_long"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
          CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
            w -> LENGTH(w) >= 6)) AS BIGINT) AS n_long,
          (LIST_SORT(LIST_FILTER(STRING_SPLIT(text, ' '),
            w -> LENGTH(w) >= 6)))[1] AS first_long
        FROM documents ORDER BY doc_id""")),

    // MAP-TYPED higher-order functions under the gate: per-doc
    // word-count MAP (map_from_entries), repeated-word filter
    // (map_filter), deterministic serialization (map_entries +
    // sort_array + transform) — the map surface a feature store's
    // sparse-feature columns live on, exercised end-to-end and reduced
    // to a gate-comparable string. The per-doc collect_list is bounded
    // by the document's own vocabulary (the q143 per-doc bound); docs
    // with no repeated word survive with an empty map ('' after
    // serialization) via the left join.
    Q("q154_map_functions",
      (s, d) => {
        val wc = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        val maps = wc.groupBy("doc_id")
          .agg(map_from_entries(sort_array(collect_list(struct(col("w"),
            col("c"))))).as("m"))
          .select(col("doc_id"),
            expr("""concat_ws(',',
              |  transform(sort_array(map_entries(map_filter(m, (k, v) -> v >= 2))),
              |    e -> concat(e.key, ':', cast(e.value as string))))"""
              .stripMargin).as("repeats"),
            expr("cast(size(map_filter(m, (k, v) -> v >= 2)) as bigint)")
              .as("n_repeated"))
        t(s, d, "documents").select(col("doc_id"))
          .join(maps, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("repeats"), lit("")).as("repeats"),
            coalesce(col("n_repeated"), lit(0L)).as("n_repeated"))
          .orderBy("doc_id")
      },
      Some("""
        WITH w AS (
          SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
          FROM documents),
        wc AS (
          SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
        rep AS (
          SELECT doc_id,
            ARRAY_TO_STRING(LIST(w || ':' || c ORDER BY w), ',') AS repeats,
            COUNT(*) AS n_repeated
          FROM wc WHERE c >= 2 GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(r.repeats, '') AS repeats,
          COALESCE(r.n_repeated, 0) AS n_repeated
        FROM documents d LEFT JOIN rep r USING (doc_id)
        ORDER BY d.doc_id""")),

    // EXACT WEIGHTED MEDIAN per group — the weighted-quantile gap next
    // to plain median (A9/q07): on a weighted corpus ("each doc counts
    // by its bytes") the unweighted median answers the wrong question.
    // The q138 CDF device applied per group: collapse to the
    // (group, value)-frequency frame FIRST (bounded by distinct values
    // per group, never by row count), then two partitioned windows over
    // that bounded frame give cumulative and total weight, and the
    // median is the smallest value whose doubled cumulative weight
    // reaches the total. All-integer arithmetic — exact, order-free,
    // and no single-partition window anywhere (both windows partition
    // on the group key).
    Q("q156_weighted_median",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = t(s, d, "documents")
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("tok"),
            col("n_chars").as("wt"))
          .groupBy("source", "tok").agg(sum(col("wt")).as("w"))
        val wc = Window.partitionBy("source").orderBy("tok")
          .rowsBetween(Long.MinValue, 0)
        val wt = Window.partitionBy("source")
        g.withColumn("cum", sum(col("w")).over(wc))
          .withColumn("tot", sum(col("w")).over(wt))
          .filter(col("cum") * 2 >= col("tot"))
          .groupBy("source")
          .agg(min(col("tok")).as("wmedian_tok"),
            min(col("tot")).cast("long").as("total_weight"))
          .orderBy("source")
      },
      Some("""
        WITH s AS (
          SELECT source, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS tok,
            n_chars AS wt
          FROM documents),
        g AS (SELECT source, tok, SUM(wt) AS w FROM s GROUP BY 1, 2),
        c AS (SELECT source, tok, w,
            SUM(w) OVER (PARTITION BY source ORDER BY tok) AS cum,
            SUM(w) OVER (PARTITION BY source) AS tot
          FROM g)
        SELECT source, CAST(MIN(tok) AS BIGINT) AS wmedian_tok,
          CAST(MIN(tot) AS BIGINT) AS total_weight
        FROM c WHERE cum * 2 >= tot GROUP BY source ORDER BY source""")),

    // POISSON BOOTSTRAP confidence intervals — the bootstrap that
    // scales: instead of resampling (a B× data blowup plus a shuffle
    // per replica), every row gets 32 independent Poisson(1) weights —
    // inverse-CDF over the portable-md5 uniform (q82/q100 device), so
    // the "randomness" is reproducible in any engine — and all 32
    // replica means reduce in ONE aggregation pass as 64 agg columns
    // (map-side combined; the corpus is touched once, 32 md5s per row).
    // The replica-mean frame is |groups|×32 — the quantile step is
    // trivially small. CI = 2nd / 31st of the 32 sorted replica means
    // (≈ the 2.5/97.5 percentile bracket at B = 32).
    Q("q158_bootstrap_ci",
      (s, d) => {
        val B = 32
        // Hash economics, measured at sf0.1: one digest carries 128
        // bits — four independent 32-bit uniforms — so the 32 replica
        // weights need 8 digests, not 32 (32→8 md5/row cut ~1.2 s).
        // Everything is SCALAR columns in plain projections on purpose:
        // (a) references inside a higher-order function's lambda are
        // invisible to CollapseProject's use-count, so an array-typed
        // digest column indexed from inside transform() gets inlined
        // and re-evaluated per lane (measured 4× SLOWER — 256
        // digests/row); (b) scalar lanes keep the whole weight
        // derivation inside whole-stage codegen, where transform()'s
        // ArrayTransform drops the projection to interpreted eval.
        // Plain attribute references ARE counted, so the 4-refs-per-
        // non-cheap-alias digest projection is kept and each digest
        // computes once. A 32-bit uniform is ample for a 5-bucket
        // inverse-CDF (bucket boundaries differ at the 2nd decimal).
        // Lane fanout as ROWS, not columns. The wide form (32 weight
        // columns + 64 agg columns) re-Janino-compiles its enormous
        // generated code on every plan instance (fresh ExprIds defeat
        // the codegen source cache) — measured ~4.8 s of this query's
        // ~5.3 s at sf0.1, with warm execution at 0.2 s. Exploding
        // (digest-group, lane) into rows keeps every expression small
        // and constant-size: codegen compiles in milliseconds and the
        // cost that remains is the actual data pass. The two-level
        // explode also keeps the hash economics: one md5 per
        // (row, group) = 8 digests/row (one digest = four 32-bit
        // uniforms), a 4× cut from hashing per lane. The replica
        // aggregation is a map-side-combined groupBy on
        // (event_type, b) — |types|×32 groups — and the raw-event
        // frame is touched exactly once.
        val lanes = t(s, d, "events")
          .select(col("event_type"), col("value"), col("event_id"),
            explode(sequence(lit(0), lit(7))).as("g"))
          .select(col("event_type"), col("value"), col("g"),
            md5(concat(col("event_id").cast("string"), lit(":"),
              col("g").cast("string"))).as("h"))
          .select(col("event_type"), col("value"), col("g"), col("h"),
            explode(sequence(lit(0), lit(3))).as("lane"))
          .select(col("event_type"), col("value"),
            (col("g") * 4 + col("lane")).as("b"),
            expr("""cast(conv(substring(h, 1 + 8 * lane, 8), 16, 10)
              |  as bigint) / 4294967296.0d""".stripMargin).as("u"))
          .select(col("event_type"), col("value"), col("b"),
            expr("""case when u < 0.36787944117144233d then 0
              | when u < 0.7357588823428847d then 1
              | when u < 0.9196986029286058d then 2
              | when u < 0.9810118431238462d then 3 else 4 end"""
              .stripMargin).as("w"))
        val reps = lanes.groupBy("event_type", "b")
          .agg(
            sum((col("w") * col("value")).cast(DEC))
              .cast("string").cast("double").as("rs"),
            sum(col("w")).cast("long").as("rn"))
          .select(col("event_type"), (col("rs") / col("rn")).as("mean_b"))
          .groupBy("event_type")
          .agg(sort_array(collect_list(col("mean_b"))).as("means"))
          .select(col("event_type"),
            round(element_at(col("means"), 2), 6).as("ci_lo"),
            round(element_at(col("means"), 31), 6).as("ci_hi"))
        val point = t(s, d, "events").groupBy("event_type")
          .agg(round(decSum(col("value")) / count(lit(1)), 6).as("mean"))
        point.join(broadcast(reps), "event_type")
          .select(col("event_type"), col("mean"), col("ci_lo"), col("ci_hi"))
          .orderBy("event_type")
      },
      Some("""
        WITH b AS (SELECT UNNEST(RANGE(0, 32)) AS b),
        r AS (
          SELECT event_type, b.b AS b, value,
            CAST(LIST_REDUCE(
              LIST_TRANSFORM(SPLIT(SUBSTRING(MD5(
                CAST(event_id AS VARCHAR) || ':' ||
                  CAST(b.b // 4 AS VARCHAR)),
                1 + 8 * (b.b % 4), 8), ''),
                c -> CAST(POSITION(c IN '0123456789abcdef') - 1 AS BIGINT)),
              (a, x) -> a * 16 + x) AS DOUBLE) / 4294967296.0 AS u
          FROM events, b),
        w AS (
          SELECT event_type, b, value,
            CASE WHEN u < 0.36787944117144233 THEN 0
              WHEN u < 0.7357588823428847 THEN 1
              WHEN u < 0.9196986029286058 THEN 2
              WHEN u < 0.9810118431238462 THEN 3 ELSE 4 END AS w
          FROM r),
        m AS (
          SELECT event_type, b,
            CAST(CAST(SUM(CAST(w * value AS DECIMAL(28,6))) AS VARCHAR)
              AS DOUBLE) / SUM(w) AS mean_b
          FROM w GROUP BY 1, 2),
        ci AS (
          SELECT event_type,
            ROUND((LIST(mean_b ORDER BY mean_b))[2], 6) AS ci_lo,
            ROUND((LIST(mean_b ORDER BY mean_b))[31], 6) AS ci_hi
          FROM m GROUP BY 1),
        pt AS (
          SELECT event_type,
            ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR)
              AS DOUBLE) / COUNT(*), 6) AS mean
          FROM events GROUP BY 1)
        SELECT event_type, mean, ci_lo, ci_hi
        FROM pt JOIN ci USING (event_type)
        ORDER BY event_type""")),

    // ASSOCIATION RULES (market-basket): brand-pair support /
    // confidence / lift over order baskets. The scale discipline is
    // that pair generation is BASKET-LOCAL: items self-join on the
    // order key, so the fanout per order is bounded by basket size
    // squared (≤ ~20² here), linear in order count — never an
    // item×item or corpus×corpus product. The item dimension (part →
    // brand) is broadcast; the per-item support frame (|brands| rows)
    // and the single-row basket count are broadcast back onto the
    // HAVING-pruned pair frame. Confidence ships as one rounded IEEE
    // division (identical in both engines); the lift>1 gate
    // cross-multiplies in int64 (cxy·n > cx·cy ⟺ lift > 1) so no
    // float ratio feeds a boolean.
    Q("q183_assoc_rules",
      (s, d) => {
        // deliberately NOT cached: the basket frame feeds three
        // consumers (supports, basket count, both pair sides), but its
        // recompute is one broadcast join + distinct off a column-
        // pruned scan — measured at sf0.1, caching it DOUBLED the
        // query (1.3 s → 2.6 s: materializing the row-count-sized
        // frame costs more than three cheap recomputes). The q128
        // cache convention applies to expensive derivations
        // (split/explode/window chains), not to scan-shaped frames.
        val items = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
          .distinct()
        val nb = items.agg(countDistinct(col("ok")).as("n"))
        val isup = items.groupBy("item").agg(count(lit(1)).as("c"))
        val pairs = items.as("a")
          .join(items.as("b"),
            col("a.ok") === col("b.ok") && col("a.item") < col("b.item"))
          .groupBy(col("a.item").as("x"), col("b.item").as("y"))
          .agg(count(lit(1)).as("cxy"))
          .filter(col("cxy") >= 20)
        pairs
          .join(broadcast(isup.select(col("item").as("x"), col("c").as("cx"))), "x")
          .join(broadcast(isup.select(col("item").as("y"), col("c").as("cy"))), "y")
          .crossJoin(broadcast(nb))
          .select(col("x"), col("y"), col("cxy"),
            round(col("cxy").cast("double") / col("cx"), 6).as("conf_xy"),
            round(col("cxy").cast("double") / col("cy"), 6).as("conf_yx"),
            (col("cxy") * col("n") > col("cx") * col("cy")).as("lift_gt1"))
          .orderBy("x", "y")
      },
      Some("""
        WITH items AS (
          SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        nb AS (SELECT COUNT(DISTINCT ok) AS n FROM items),
        isup AS (SELECT item, COUNT(*) AS c FROM items GROUP BY 1),
        pairs AS (
          SELECT a.item AS x, b.item AS y, COUNT(*) AS cxy
          FROM items a JOIN items b ON a.ok = b.ok AND a.item < b.item
          GROUP BY 1, 2 HAVING COUNT(*) >= 20)
        SELECT x, y, cxy,
          ROUND(CAST(cxy AS DOUBLE) / cx.c, 6) AS conf_xy,
          ROUND(CAST(cxy AS DOUBLE) / cy.c, 6) AS conf_yx,
          (CAST(cxy AS BIGINT) * nb.n) > (CAST(cx.c AS BIGINT) * cy.c)
            AS lift_gt1
        FROM pairs JOIN isup cx ON cx.item = pairs.x
          JOIN isup cy ON cy.item = pairs.y CROSS JOIN nb
        ORDER BY x, y""")),

    // GINI CONCENTRATION per event_type over user totals — the
    // inequality diagnostic next to q148's join-key skew report: how
    // concentrated is activity value across users? (Gini ≈ 0 →
    // uniform, → 1 → one whale; the number that decides whether
    // per-user partitioning needs the q110/q175 salt.) The raw stream
    // collapses to the |users|-per-type frame FIRST (map-side-combined
    // groupBy), so the rank window runs on a user-bounded frame
    // partitioned by event_type — never a window over raw events. The
    // classic closed form G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n on
    // ascending-ranked totals; all sums decimal-exact, one rounded
    // IEEE tail mirrored term-for-term by the oracle.
    Q("q189_gini_concentration",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val peru = t(s, d, "events")
          .groupBy("event_type", "user_id")
          .agg(decSum(col("value")).as("s"))
        val ranked = peru.withColumn("i",
          row_number().over(Window.partitionBy("event_type")
            .orderBy(col("s"), col("user_id"))))
        ranked.groupBy("event_type")
          .agg(count(lit(1)).as("n_users"),
            decSum(col("s")).as("tot"),
            decSum(col("i") * col("s")).as("ws"))
          .select(col("event_type"), col("n_users"),
            round(lit(2.0) * col("ws") / (col("n_users") * col("tot"))
              - (col("n_users").cast("double") + lit(1.0)) / col("n_users"), 6)
              .as("gini"))
          .orderBy("event_type")
      },
      Some("""
        WITH peru AS (
          SELECT event_type, user_id,
            CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR)
              AS DOUBLE) AS s
          FROM events GROUP BY 1, 2),
        ranked AS (
          SELECT event_type, s,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s, user_id)
              AS i
          FROM peru),
        agg AS (
          SELECT event_type, COUNT(*) AS n,
            CAST(CAST(SUM(CAST(s AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
              AS tot,
            CAST(CAST(SUM(CAST(i * s AS DECIMAL(28,6))) AS VARCHAR)
              AS DOUBLE) AS ws
          FROM ranked GROUP BY 1)
        SELECT event_type, n AS n_users,
          ROUND(2.0 * ws / (n * tot) - (CAST(n AS DOUBLE) + 1.0) / n, 6)
            AS gini
        FROM agg ORDER BY event_type""")),

    // DECILE LIFT TABLE — the offline model-evaluation staple: score
    // the population (here the deterministic n_chars proxy), cut into
    // equal-mass deciles, and report each decile's positive rate
    // against the base rate. Deciles come from the q138 CDF device
    // (value-frequency frame → running below-counts → broadcast →
    // row-local floor(10·cdf)) — deterministic on ties where NTILE is
    // not, and no window ever touches the fact rows. The above_base
    // gate cross-multiplies in int64; lift itself is one
    // division-of-divisions mirrored exactly.
    Q("q190_decile_lift",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("n_chars"), col("lang"))
        val freq = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
        val cum = freq
          .withColumn("below", coalesce(
            sum(col("c")).over(Window.orderBy("n_chars")
              .rowsBetween(Long.MinValue, -1)), lit(0L)))
          .select(col("n_chars"), col("below"))
        val base = docs.agg(count(lit(1)).as("n"),
          sum(when(col("lang") === "en", 1).otherwise(0)).as("pos"))
        docs.join(broadcast(cum), "n_chars")
          .crossJoin(broadcast(base))
          .select(col("lang"), col("n"), col("pos"),
            least(lit(9), floor(col("below") * lit(10.0) / col("n")))
              .cast("int").as("decile"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("positives"),
            max(col("n")).as("n"), max(col("pos")).as("pos"))
          .select(col("decile"), col("n_docs"), col("positives"),
            round(col("positives").cast("double") / col("n_docs"), 6)
              .as("rate"),
            // zero-positive guard (ADVICE r10): a slice with no 'en'
            // docs makes the base rate 0 — Spark would emit
            // Infinity/NaN while DuckDB's division diverges, a
            // data-dependent gate break. NULL lift is the graceful
            // degenerate row, mirrored by the oracle CASE.
            when(col("pos") > 0,
              round((col("positives").cast("double") / col("n_docs"))
                / (col("pos").cast("double") / col("n")), 6))
              .otherwise(lit(null).cast("double")).as("lift"),
            (col("positives") * col("n") > col("n_docs") * col("pos"))
              .as("above_base"))
          .orderBy("decile")
      },
      Some("""
        WITH f AS (SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY 1),
        cum AS (SELECT n_chars, COALESCE(SUM(c) OVER (ORDER BY n_chars
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
          FROM f),
        n AS (SELECT COUNT(*) AS n,
          SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
          FROM documents),
        dec AS (
          SELECT d.lang, n.n, n.pos,
            CAST(LEAST(9, FLOOR(below * 10.0 / n.n)) AS INT) AS decile
          FROM documents d JOIN cum USING (n_chars) CROSS JOIN n)
        SELECT decile, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
            AS positives,
          ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*), 6) AS rate,
          CASE WHEN MAX(pos) > 0 THEN
            ROUND((CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
              / COUNT(*)) / (CAST(MAX(pos) AS DOUBLE) / MAX(n)), 6)
          ELSE NULL END AS lift,
          (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * MAX(n))
            > (COUNT(*) * MAX(pos)) AS above_base
        FROM dec GROUP BY 1 ORDER BY 1""")),

    // RANK-BIASED OVERLAP (RBO, Webber et al.) between two leaderboard
    // orderings of the same population — by total value vs by event
    // count — truncated at depth 20 with persistence p = 1/2. The
    // ranking-stability metric that decides whether two scoring
    // functions can be swapped (q11/q60-style leaderboards, ANN arms,
    // retrieval rankers). The device: a user's earliest depth of joint
    // membership is max(rank_a, rank_b), so each depth's intersection
    // size is a simple ≤-count — no per-depth set materialization.
    // p = 1/2 makes every weight 2^-d EXACT in IEEE (the q123 dyadic
    // trick), so the per-depth contribution is one identical double
    // product in both engines. Both rank windows run on the
    // |users|-bounded totals frame (the q138 bounded-singleton-window
    // precedent — never on raw events); the depth spine fans out
    // 20×|users| at most.
    Q("q198_rank_overlap",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val peru = t(s, d, "events")
          .groupBy("user_id")
          .agg(decSum(col("value")).as("tot"), count(lit(1)).as("cnt"))
        val ra = peru.select(col("user_id"),
          row_number().over(Window.orderBy(col("tot").desc, col("user_id")))
            .as("r_a"))
        val rb = peru.select(col("user_id"),
          row_number().over(Window.orderBy(col("cnt").desc, col("user_id")))
            .as("r_b"))
        val m = ra.join(rb, "user_id")
          .select(greatest(col("r_a"), col("r_b")).as("m"))
        val depths = s.range(1, 21).select(col("id").cast("int").as("depth"))
        depths.join(m, col("m") <= col("depth"), "left")
          .groupBy("depth")
          .agg(count(col("m")).as("inter"))
          .select(col("depth"), col("inter"),
            round(col("inter").cast("double") / col("depth"), 6)
              .as("agreement"),
            round((col("inter").cast("double") / col("depth"))
              * pow(lit(0.5), col("depth")), 9).as("contrib"))
          .orderBy("depth")
      },
      Some("""
        WITH peru AS (
          SELECT user_id,
            CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR)
              AS DOUBLE) AS tot,
            COUNT(*) AS cnt
          FROM events GROUP BY 1),
        ra AS (SELECT user_id,
          ROW_NUMBER() OVER (ORDER BY tot DESC, user_id) AS r_a FROM peru),
        rb AS (SELECT user_id,
          ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS r_b FROM peru),
        m AS (
          SELECT GREATEST(a.r_a, b.r_b) AS m
          FROM ra a JOIN rb b USING (user_id)),
        depths AS (SELECT CAST(UNNEST(RANGE(1, 21)) AS INT) AS depth)
        SELECT depth, COUNT(m.m) AS inter,
          ROUND(CAST(COUNT(m.m) AS DOUBLE) / depth, 6) AS agreement,
          ROUND((CAST(COUNT(m.m) AS DOUBLE) / depth) * POWER(0.5, depth), 9)
            AS contrib
        FROM depths LEFT JOIN m ON m.m <= depth
        GROUP BY depth ORDER BY depth""")),

    // CORRELATION MATRIX — pairwise Pearson between the event types'
    // hourly series: the metric-interaction scan a monitoring consumer
    // (or feature-engineering pass) runs before trusting any one
    // signal. The q112 exact-moments device generalized to all pairs
    // WITHOUT a pivot: the calendar-bounded hourly resample (one
    // map-side-combined pass over raw events — the q117 shape)
    // self-joins on the hour with ta < tb, so missing hours drop out
    // per pair (complete-case semantics) and the pair frame is
    // |hours|×|types|² at most. Moments accumulate in
    // decimal(18,6)² = (37,12) — exact, no engine hits the
    // precision-overflow path — and Pearson's one IEEE tail
    // (n·Σxy − ΣxΣy)/(√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) is mirrored
    // term-for-term.
    Q("q201_correlation_matrix",
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(round(decSum(col("value")), 6).as("v"))
        val pairs = hourly.select(col("event_type").as("ta"),
            col("h"), col("v").as("x"))
          .join(hourly.select(col("event_type").as("tb"),
            col("h"), col("v").as("y")), "h")
          .filter(col("ta") < col("tb"))
        // Overflow guard (ADVICE r10): decimal(18,6) holds |v| < 1e12;
        // beyond that Spark's non-ANSI cast yields NULL and the
        // correlation would silently null out where DuckDB errors
        // loudly. Fail loudly like the oracle instead — the guard rides
        // inside the used aggregate so column pruning can't drop it.
        def guarded(a: String) =
          when(abs(col(a)) < lit(1e12), col(a).cast("decimal(18,6)"))
            .otherwise(raise_error(
              lit("q201: hourly sum exceeds decimal(18,6) range"))
              .cast("decimal(18,6)"))
        def m2(a: String, b: String) =
          sum(guarded(a) * guarded(b)).cast("string").cast("double")
        val mom = pairs.groupBy("ta", "tb")
          .agg(count(lit(1)).as("n"),
            decSum(col("x")).as("sx"), decSum(col("y")).as("sy"),
            m2("x", "y").as("sxy"), m2("x", "x").as("sxx"),
            m2("y", "y").as("syy"))
        mom.select(col("ta"), col("tb"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
              * sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("r"))
          .orderBy("ta", "tb")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS h,
            ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR)
              AS DOUBLE), 6) AS v
          FROM events GROUP BY 1, 2),
        pairs AS (
          SELECT a.event_type AS ta, b.event_type AS tb, a.v AS x, b.v AS y
          FROM hourly a JOIN hourly b
            ON a.h = b.h AND a.event_type < b.event_type),
        mom AS (
          SELECT ta, tb, COUNT(*) AS n,
            CAST(CAST(SUM(CAST(x AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
              AS sx,
            CAST(CAST(SUM(CAST(y AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
              AS sy,
            -- DECIMAL(28,6) operands force int128 storage (the q112
            -- device): hourly sums reach ~2e9 at sf0.1 and their
            -- products overflow DuckDB's int64-backed DECIMAL(18)
            CAST(CAST(SUM(CAST(x AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6)))
              AS VARCHAR) AS DOUBLE) AS sxy,
            CAST(CAST(SUM(CAST(x AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6)))
              AS VARCHAR) AS DOUBLE) AS sxx,
            CAST(CAST(SUM(CAST(y AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6)))
              AS VARCHAR) AS DOUBLE) AS syy
          FROM pairs GROUP BY 1, 2)
        SELECT ta, tb, n,
          ROUND((n * sxy - sx * sy) /
            (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) AS r
        FROM mom ORDER BY ta, tb"""))
,
    // COHEN'S KAPPA — inter-annotator agreement, the measurement that
    // decides whether a labeling rubric (or a pair of quality
    // classifiers) is trustworthy enough to train on. Two deterministic
    // raters over every document (a char-length rule and a token-count
    // rule — correlated but not identical, so the 2×2 table has real
    // off-diagonal mass), reduced to FOUR integer cells per language in
    // one map-side-combined pass. Kappa's (p_o − p_e)/(1 − p_e) is
    // algebraically cleared to the integer form
    // (n·(n11+n00) − E) / (n² − E), E = (n11+n10)(n11+n01) +
    // (n01+n00)(n10+n00): exact 64-bit products until ONE mirrored IEEE
    // division. Degenerate chance-agreement (n² = E) yields NULL rather
    // than a division blowup (ADVICE-r10 q190 convention).
    Q("q223_cohens_kappa",
      (s, d) => {
        val rated = t(s, d, "documents").select(col("lang"),
          (col("n_chars") >= 300).cast("long").as("ra"),
          (size(split(col("text"), " ")) >= 55).cast("long").as("rb"))
        val cnt = rated.groupBy("lang").agg(
          count(lit(1)).as("n"),
          sum(col("ra") * col("rb")).as("n11"),
          sum(col("ra") * (lit(1L) - col("rb"))).as("n10"),
          sum((lit(1L) - col("ra")) * col("rb")).as("n01"),
          sum((lit(1L) - col("ra")) * (lit(1L) - col("rb"))).as("n00"))
        val e = (col("n11") + col("n10")) * (col("n11") + col("n01")) +
          (col("n01") + col("n00")) * (col("n10") + col("n00"))
        cnt.select(col("lang"), col("n"), col("n11"), col("n10"),
            col("n01"), col("n00"),
            when(col("n") * col("n") =!= e,
              round((col("n") * (col("n11") + col("n00")) - e)
                .cast("double") /
                (col("n") * col("n") - e).cast("double"), 6))
              .otherwise(lit(null).cast("double")).as("kappa"))
          .orderBy("lang")
      },
      Some("""
        WITH rated AS (
          SELECT lang,
            CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
            CASE WHEN LEN(STRING_SPLIT(text, ' ')) >= 55 THEN 1 ELSE 0 END
              AS rb
          FROM documents),
        cnt AS (
          SELECT lang, COUNT(*) AS n,
            CAST(SUM(ra * rb) AS BIGINT) AS n11,
            CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
            CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
            CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00
          FROM rated GROUP BY lang)
        SELECT lang, n, n11, n10, n01, n00,
          CASE WHEN n * n <> (n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)
            THEN ROUND(
              CAST(n * (n11 + n00) -
                ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) AS DOUBLE) /
              CAST(n * n -
                ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) AS DOUBLE), 6)
            ELSE NULL END AS kappa
        FROM cnt ORDER BY lang""")),

    // RECENCY-DECAYED ENGAGEMENT — the time-decay feature every
    // ranking/churn model wants: each event's contribution halves per
    // 7-day age bucket relative to the corpus watermark. The decay
    // weights are LITERAL powers of two (1, 0.5, …, 0.0625, then 0):
    // scaling a double by 2⁻ᵏ only changes its exponent, so every term
    // is IEEE-EXACT in both engines and no libm pow() — whose rounding
    // is NOT portable — ever runs. Terms round to 6dp (already exact:
    // 2-decimal values × 2⁻⁴ is 6 decimals) and decimal-accumulate
    // (the q212 device), so the gate hashes the scores bit-for-bit.
    // One scan, one map-side-combined per-user aggregate; the anchor
    // is a broadcast 1-row frame.
    Q("q228_recency_decay",
      (s, d) => {
        val ev = t(s, d, "events")
        val anchor = ev.agg(max(to_date(col("ts"))).as("anchor"))
        ev.crossJoin(broadcast(anchor))
          .select(col("user_id"), col("value"),
            expr("datediff(anchor, to_date(ts)) DIV 7").as("k"))
          .select(col("user_id"), col("value"),
            when(col("k") === 0, 1.0).when(col("k") === 1, 0.5)
              .when(col("k") === 2, 0.25).when(col("k") === 3, 0.125)
              .when(col("k") === 4, 0.0625).otherwise(0.0).as("w"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            round(decSum(col("value")), 6).as("raw_sum"),
            round(decSum(round(col("value") * col("w"), 6)), 6)
              .as("decayed_sum"))
          .orderBy("user_id")
      },
      Some("""
        WITH anchor AS (
          SELECT MAX(CAST(ts AS DATE)) AS anchor FROM events),
        wk AS (
          SELECT user_id, value,
            CASE DATEDIFF('day', CAST(ts AS DATE), anchor) // 7
              WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25
              WHEN 3 THEN 0.125 WHEN 4 THEN 0.0625 ELSE 0.0 END AS w
          FROM events, anchor)
        SELECT user_id, COUNT(*) AS n_events,
          ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR)
            AS DOUBLE), 6) AS raw_sum,
          ROUND(CAST(CAST(SUM(CAST(ROUND(value * w, 6) AS DECIMAL(28,6)))
            AS VARCHAR) AS DOUBLE), 6) AS decayed_sum
        FROM wk GROUP BY user_id ORDER BY user_id""")),

    // SPLIT-CONFORMAL PREDICTION INTERVALS — the distribution-free
    // uncertainty wrapper every model-eval pipeline wants: given ANY
    // point forecaster (here the naive last-value predictor, so the
    // whole construction is closed-form and oracle-checkable), compute
    // on a held-out calibration split the alpha=0.1 conformal quantile
    // q_hat = the ceil((n_cal+1)*0.9)-th smallest absolute residual,
    // then measure empirical coverage of [pred - q_hat, pred + q_hat]
    // on the test split. Everything is exact: residuals are |x - lag x|
    // (pure doubles, no accumulation), the quantile is an ORDER
    // STATISTIC picked by row_number (no interpolating percentile —
    // those disagree across engines), the split is a deterministic
    // event_id hash, and coverage is an integer ratio surfaced through
    // one IEEE division. Scale shape: one window pass for lags, one
    // sort per event_type restricted to the calibration rows (the only
    // sort in the job — at 100 TB this is the standard sample-or-sketch
    // spot, but conformal needs the exact order statistic so the sort
    // is the semantics), then a broadcast of |event_type| q_hat rows
    // back over the test split.
    Q("q270_conformal_interval",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lagged = t(s, d, "events")
          .withColumn("pred", lag(col("value"), 1).over(
            Window.partitionBy("event_type").orderBy("ts", "event_id")))
          .filter(col("pred").isNotNull)
          .withColumn("resid", abs(col("value") - col("pred")))
          .withColumn("is_cal", pmod(col("event_id"), lit(5)) =!= 0)
        val cal = lagged.filter(col("is_cal"))
        val n = cal.groupBy("event_type").agg(count(lit(1)).as("n_cal"))
        val qhat = cal
          .withColumn("rk", row_number().over(Window
            .partitionBy("event_type").orderBy("resid", "event_id")))
          .join(n, Seq("event_type"))
          .filter(col("rk") === ceil((col("n_cal") + 1) * 0.9).cast("int"))
          .select(col("event_type"), col("n_cal"),
            col("resid").as("q_hat"))
        lagged.filter(!col("is_cal"))
          .join(qhat, Seq("event_type"))
          .groupBy("event_type")
          .agg(first("n_cal").as("n_cal"),
            first("q_hat").as("q_hat"),
            count(lit(1)).as("n_test"),
            sum(when(col("resid") <= col("q_hat"), 1L).otherwise(0L))
              .as("n_covered"))
          .select(col("event_type"), col("n_cal"), col("q_hat"),
            col("n_test"), col("n_covered"),
            (col("n_covered").cast("double") / col("n_test").cast("double"))
              .as("coverage"))
          .orderBy("event_type")
      },
      Some("""
        WITH lagged AS (
          SELECT event_type, event_id, value,
            LAG(value) OVER (PARTITION BY event_type
              ORDER BY ts, event_id) AS pred
          FROM events),
        r AS (
          SELECT event_type, event_id, ABS(value - pred) AS resid,
            event_id % 5 <> 0 AS is_cal
          FROM lagged WHERE pred IS NOT NULL),
        n AS (
          SELECT event_type, COUNT(*) AS n_cal FROM r
          WHERE is_cal GROUP BY 1),
        rk AS (
          SELECT event_type, resid, ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY resid, event_id) AS rk
          FROM r WHERE is_cal),
        q AS (
          SELECT rk.event_type, n.n_cal, rk.resid AS q_hat
          FROM rk JOIN n USING (event_type)
          WHERE rk.rk = CAST(CEIL((n.n_cal + 1) * 0.9) AS INT))
        SELECT r.event_type, q.n_cal, q.q_hat,
          COUNT(*) AS n_test,
          CAST(SUM(CASE WHEN r.resid <= q.q_hat THEN 1 ELSE 0 END)
            AS BIGINT) AS n_covered,
          CAST(SUM(CASE WHEN r.resid <= q.q_hat THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS coverage
        FROM r JOIN q USING (event_type)
        WHERE NOT r.is_cal
        GROUP BY r.event_type, q.n_cal, q.q_hat
        ORDER BY r.event_type""")),

    // ISOTONIC (PAV) CALIBRATION — the monotone-regression upgrade of
    // q217's fixed-bin calibration table: fit the best NON-DECREASING
    // rate curve over score bins (pool-adjacent-violators), the
    // standard post-hoc calibrator for ranking/quality models. PAV is
    // sequential, but over BINS, not rows — and on a bounded bin frame
    // the fit has an exact closed form, the minimax identity
    //   iso(i) = max_{j<=i} min_{k>=i} rate(j..k)
    // where rate(j..k) is the pooled positive rate of bins j..k off
    // two cumulative sums. Every candidate rate is ONE IEEE division
    // of two exact integers and the min/max lattice involves no
    // accumulation, so both engines agree bit-for-bit. Scale shape:
    // the full fact scan collapses to a <=20-row bin frame in one
    // map-side-combined agg; the cubic minimax enumeration (<=8000
    // tuples) runs on that bounded dictionary frame — the unpartitioned
    // window and the non-equi self-joins below are bounded by
    // construction (20 bins regardless of data size), the same
    // bounded-frame license as q135/q202.
    Q("q273_isotonic_calibration",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val bins = t(s, d, "events")
          .select(least(lit(19), floor(col("value") / 25).cast("int")).as("bin"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
        // cumulative frame: <=20 rows, bounded — global window is safe
        val cum = bins
          .withColumn("cn", sum(col("n")).over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("cpos", sum(col("pos")).over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)))
        val pref = cum.select(col("bin").as("j"),
          (col("cn") - col("n")).as("pn"), (col("cpos") - col("pos")).as("pp"))
        val ends = cum.select(col("bin").as("k"),
          col("cn").as("kn"), col("cpos").as("kp"))
        // bounded 20x20 pooled-rate lattice (non-equi join on a
        // dictionary-sized frame)
        val rates = pref.join(ends, col("j") <= col("k"))
          .select(col("j"), col("k"),
            ((col("kp") - col("pp")).cast("double") /
              (col("kn") - col("pn")).cast("double")).as("r"))
        val idx = bins.select(col("bin").as("i"))
        val fit = rates.join(idx, col("j") <= col("i") && col("k") >= col("i"))
          .groupBy("i", "j").agg(min(col("r")).as("mr"))
          .groupBy("i").agg(max(col("mr")).as("iso_rate"))
        bins.join(fit, bins("bin") === fit("i"))
          .select(col("bin").cast("long").as("bin"), col("n"), col("pos"),
            (col("pos").cast("double") / col("n").cast("double"))
              .as("raw_rate"),
            col("iso_rate"))
          .orderBy("bin")
      },
      Some("""
        WITH b AS (
          SELECT LEAST(19, CAST(FLOOR(value / 25) AS INT)) AS bin,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
          FROM events),
        bins AS (
          SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
          FROM b GROUP BY bin),
        cum AS (
          SELECT bin, n, pos,
            SUM(n) OVER (ORDER BY bin) AS cn,
            SUM(pos) OVER (ORDER BY bin) AS cpos
          FROM bins),
        pref AS (SELECT bin AS j, cn - n AS pn, cpos - pos AS pp FROM cum),
        ends AS (SELECT bin AS k, cn AS kn, cpos AS kp FROM cum),
        rates AS (
          SELECT j, k,
            CAST(kp - pp AS DOUBLE) / CAST(kn - pn AS DOUBLE) AS r
          FROM pref JOIN ends ON j <= k),
        fit AS (
          SELECT i, MAX(mr) AS iso_rate FROM (
            SELECT c.bin AS i, r.j, MIN(r.r) AS mr
            FROM rates r JOIN cum c ON r.j <= c.bin AND r.k >= c.bin
            GROUP BY 1, 2)
          GROUP BY i)
        SELECT bins.bin, bins.n, bins.pos,
          CAST(bins.pos AS DOUBLE) / CAST(bins.n AS DOUBLE) AS raw_rate,
          fit.iso_rate
        FROM bins JOIN fit ON bins.bin = fit.i
        ORDER BY bins.bin""")),

    // QUANTILE NORMALIZATION — the cross-batch distribution aligner
    // (bioinformatics' workhorse, equally at home harmonizing quality
    // scores across crawl snapshots): rank every document within its
    // source, then replace its value with the ACROSS-SOURCE mean at that
    // rank, so all sources end up with the identical marginal
    // distribution. The classic method assumes equal-sized arrays;
    // the unequal-group form here truncates to the smallest source's
    // depth (ranks beyond it have no full across-source row and any
    // interpolation rule would be engine-lore, not algebra — the
    // dropped tail is the documented contract). Everything is exact:
    // ranks are total-ordered (value, doc_id), the reference value is
    // ONE IEEE division of an integer sum by the source count. Scale
    // shape: one rank window per source partition, one |ranks|-row
    // map-side-combined agg, one equi join back on rank — no
    // all-pairs, no global sort (the per-source window IS partitioned).
    Q("q278_quantile_normalize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ranked = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("rk", row_number().over(Window
            .partitionBy("source").orderBy("n_chars", "doc_id")))
        val depth = ranked.groupBy("source")
          .agg(count(lit(1)).as("sz"))
          .agg(min(col("sz")).as("k"), count(lit(1)).as("n_sources"))
        val kept = ranked.crossJoin(broadcast(depth))
          .filter(col("rk") <= col("k"))
        val ref = kept.groupBy("rk")
          .agg((sum(col("n_chars")).cast("double") /
            first(col("n_sources")).cast("double")).as("norm_value"))
        kept.join(ref, Seq("rk"))
          .select(col("doc_id"), col("source"), col("rk").cast("long").as("rk"),
            col("n_chars"), col("norm_value"))
          .orderBy("source", "rk")
      },
      Some("""
        WITH ranked AS (
          SELECT doc_id, source, n_chars, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY n_chars, doc_id) AS rk
          FROM documents),
        depth AS (
          SELECT MIN(sz) AS k, COUNT(*) AS n_sources FROM (
            SELECT source, COUNT(*) AS sz FROM ranked GROUP BY source)),
        kept AS (
          SELECT r.* FROM ranked r, depth WHERE r.rk <= depth.k),
        ref AS (
          SELECT rk, CAST(SUM(n_chars) AS DOUBLE) /
            (SELECT CAST(n_sources AS DOUBLE) FROM depth) AS norm_value
          FROM kept GROUP BY rk)
        SELECT k.doc_id, k.source, k.rk, k.n_chars, ref.norm_value
        FROM kept k JOIN ref USING (rk)
        ORDER BY k.source, k.rk"""))
  )
}
