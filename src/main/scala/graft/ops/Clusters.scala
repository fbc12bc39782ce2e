package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: candidate pairs → connected
  * components → one keeper per cluster. This is the step that turns a
  * near-dup PAIR list (Dedup/Similarity output) into something a
  * corpus-pruning pipeline can act on: `(id, cluster_id, keep)`.
  *
  * Components are computed with the alternating large-star/small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14): every iteration is two shuffles on DataFrames
  * (a groupBy-min and a self-join on the same key, so the exchange is
  * reused), the edge list only ever shrinks toward the star form
  * (u → component-min), and convergence is O(log n) rounds — the
  * driver loops over ROUNDS, never over edges. At 100 TB the per-round
  * cost is a hash aggregate + hash join on the candidate-pair table,
  * which LSH has already made sub-quadratic in the corpus.
  */
object Clusters {

  /** One large-star round: every node connects its strictly-larger
    * neighbors to the minimum of its closed neighborhood.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src").agg(min("dst").as("__m"))
      .select(col("src"), least(col("src"), col("__m")).as("m"))
    sym.join(mins, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** One small-star round: orient edges large→small, then connect every
    * smaller neighbor (and the center) to the neighborhood minimum.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    val mins = or.groupBy("src").agg(min("dst").as("m"))
    or.join(mins, "src")
      .select(col("dst").as("src"), col("m").as("dst"))
      .union(mins.select(col("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Connected components over an undirected pair list. Input: any
    * DataFrame whose first two columns are the edge endpoints (ids of
    * one orderable, hash-joinable type). Returns the star edge list
    * `(id, cluster_id)` for every NON-ROOT node — roots (= cluster
    * minima) and isolated nodes are absent; see [[resolveDuplicates]]
    * for the full labeling.
    *
    * The driver loop runs until the edge set reaches a fixpoint
    * (checked with `except` — an exact, not probabilistic, test) or
    * `maxRounds`, whichever first. Each round is CHECKPOINTED, not
    * merely persisted: a cached plan still nests every previous
    * round's plan inside its task binary, so task (de)serialization
    * grows exponentially with the round count — the job appears to
    * hang by round ~10 even on toy graphs. `localCheckpoint` cuts the
    * lineage to the materialized blocks (on a real cluster with
    * executor churn, point `spark.sparkContext.setCheckpointDir` at
    * durable storage and swap in `checkpoint(true)`).
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25): DataFrame = {
    var edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    var round = 0
    var converged = false
    // The previous round's cardinality is carried in a var instead of
    // re-counting the checkpointed frame every round (round-15: one
    // fewer job per round; the count of a materialized frame is cheap
    // but still a scheduled job on every CC consumer's driver path).
    var edgeCount = edges.count()
    while (!converged && round < maxRounds) {
      // NOTE: one star round per materialization is the measured
      // optimum — both star ops reference their input DataFrame
      // multiple times (or/mins), so fusing two lazy rounds recomputes
      // the inner round once per outer reference (tried in round 6:
      // 2.8 s → 4.9 s at sf0.1).
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextCount = next.count()
      // Star rounds are monotone (labels only decrease), so
      // next ⊆-equality with the previous round IS the fixpoint test:
      // same count and nothing new ⇒ identical sets.
      converged = nextCount == edgeCount &&
        next.except(edges).limit(1).count() == 0
      edges.unpersist()
      edges = next
      edgeCount = nextCount
      round += 1
    }
    // An unconverged edge list is not star-form: a node may still carry
    // multiple labels, which would FAN OUT a downstream left join into
    // duplicate rows per id. Warn loudly (callers that need hard
    // failure can raise maxRounds or check themselves); consumers in
    // this package also aggregate min-per-id defensively.
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"connectedComponents did NOT converge within $maxRounds rounds; " +
          "labels may be non-minimal and non-unique per node")
    edges
  }

  /** Full duplicate resolution: every id in `ids` labeled with its
    * cluster minimum and a deterministic keep flag (keep = the cluster
    * minimum itself). Ids appearing in no pair become singleton
    * clusters of themselves. Output: (idCol, cluster_id, keep).
    */
  def resolveDuplicates(ids: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String = "id_a", dstCol: String = "id_b",
      maxRounds: Int = 25): DataFrame = {
    // min-per-id aggregation is a no-op on a converged (star-form)
    // edge list — one label per node — but guarantees the left join
    // below cannot fan out duplicate id rows if maxRounds was
    // exhausted first; the groupBy and the join hash-partition on the
    // same key, so the extra exchange is reused.
    val labels = connectedComponents(pairs, srcCol, dstCol, maxRounds)
      .select(col("src").as(idCol), col("dst").as("__cid"))
      .groupBy(idCol).agg(min("__cid").as("__cid"))
    ids.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__cid"), col(idCol)).as("cluster_id"))
      .withColumn("keep", col(idCol) === col("cluster_id"))
  }

  /** Quality-aware duplicate resolution: like [[resolveDuplicates]],
    * but the keeper per cluster is the row MAXIMIZING `quality`
    * (ties → smallest id) rather than the min id — what a corpus prune
    * actually wants ("keep the best copy", e.g. longest text or
    * highest quality score), re-expressed as ONE struct-min aggregate
    * per cluster: `min(struct(−quality, id))` orders lexicographically,
    * so no window sort over the corpus is ever planned. Null quality
    * ranks WORST (never kept unless the whole cluster is null-quality,
    * then min id). `quality` is evaluated against `ids`, which must
    * carry every column it references. Output: (idCol, cluster_id,
    * keep). The keeper join keys both sides on cluster_id, the same
    * key the aggregate hash-partitioned on — the exchange is reused.
    */
  def resolveDuplicatesBy(ids: DataFrame, idCol: String, quality: Column,
      pairs: DataFrame, srcCol: String = "id_a", dstCol: String = "id_b",
      maxRounds: Int = 25): DataFrame = {
    val labels = connectedComponents(pairs, srcCol, dstCol, maxRounds)
      .select(col("src").as(idCol), col("dst").as("__cid"))
      .groupBy(idCol).agg(min("__cid").as("__cid"))
    val labeled = ids
      .join(labels, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__cid"), col(idCol)).as("cluster_id"),
        // −quality so struct-min = max quality; nulls → −∞ quality
        // (+∞ after negation, i.e. sorts last, never preferred).
        negate(coalesce(quality.cast("double"), lit(Double.NegativeInfinity)))
          .as("__nq"))
    // Keeper side renames its key — it derives from `labeled`, and
    // qualifying by the parent frame would trip ambiguous-self-join
    // detection (same pattern as Dedup.exactDuplicates).
    val keepers = labeled.groupBy("cluster_id")
      .agg(min(struct(col("__nq"), col(idCol).as("__kid"))).as("__best"))
      .select(col("cluster_id").as("__kcid"), col("__best.__kid").as("__keep_id"))
    labeled.join(keepers, col("cluster_id") === col("__kcid"))
      .select(col(idCol), col("cluster_id"),
        (col(idCol) === col("__keep_id")).as("keep"))
  }

  /** RAND INDEX between two clusterings of the same ids — the
    * agreement metric for validating one dedup pass against another
    * (minhash-derived clusters vs simhash-derived, yesterday's run vs
    * today's): of all C(n,2) id pairs, the fraction on which the two
    * clusterings AGREE (both co-cluster, or both separate). Returns
    * one row `(n_ids, n_cells, pairs_both_same, pairs_both_diff,
    * rand_ppm)`.
    *
    * Closed-form pair counting — no pair table ever materializes
    * (C(n,2) at corpus scale is the thing we're avoiding):
    * {{{
    *   S   = Σ_cells C(n_ij, 2)            (both co-cluster)
    *   D   = C(n,2) − Σ_i C(a_i,2) − Σ_j C(b_j,2) + S   (both separate)
    *   Rand = (S + D) / C(n,2)
    * }}}
    * with a_i/b_j the per-clustering cluster sizes and n_ij the
    * contingency cells. All BIGINT (products through decimal(38,0) ≡
    * HUGEINT — safe to ~10¹⁸ ids), final ppm by integral division —
    * engine-exact. Shape: one inner join on the id, one cell count,
    * two marginal aggs, a 1-row reduce.
    */
  def randIndex(a: DataFrame, idColA: String, clusterColA: String,
      b: DataFrame, idColB: String, clusterColB: String): DataFrame = {
    val dec = "decimal(38,0)"
    val j = a.select(col(idColA).as("__id"), col(clusterColA).as("__ca"))
      .join(b.select(col(idColB).as("__id"), col(clusterColB).as("__cb")), Seq("__id"))
    val cells = j.groupBy("__ca", "__cb").agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // feeds S, both marginals, and n
    def c2(x: Column): Column = (x.cast(dec) * (x - 1).cast(dec)) / lit(2).cast(dec)
    val s = cells.agg(sum(c2(col("__n"))).as("__s"),
      sum("__n").cast(dec).as("__tot"), count(lit(1)).as("n_cells"))
    val ma = cells.groupBy("__ca").agg(sum("__n").as("__an"))
      .agg(sum(c2(col("__an"))).as("__sa"))
    val mb = cells.groupBy("__cb").agg(sum("__n").as("__bn"))
      .agg(sum(c2(col("__bn"))).as("__sb"))
    s.crossJoin(ma).crossJoin(mb)
      .select(col("__tot").cast("long").as("n_ids"), col("n_cells"),
        col("__s").cast("long").as("pairs_both_same"),
        (c2(col("__tot")) - col("__sa") - col("__sb") + col("__s"))
          .cast("long").as("pairs_both_diff"),
        expr("""cast(((__s + ((__tot * (__tot - 1)) / 2 - __sa - __sb + __s))
                * 1000000) div greatest((__tot * (__tot - 1)) / 2, 1) as bigint)""")
          .as("rand_ppm"))
  }

  /** GOLDEN-RECORD construction (survivorship): per cluster, each
    * field independently takes the value of the member ranking highest
    * under that field's own rule — the master-data-management merge
    * that follows duplicate resolution: "name from the newest record,
    * address from the most complete one, id = the cluster label". A
    * whole-row keeper ([[resolveDuplicatesBy]]) can't express this —
    * survivorship is per FIELD.
    *
    * `labeled` carries `clusterCol` plus every referenced column;
    * `rules` maps each output field to its ordering column (higher
    * wins, ties to the lexicographically LARGER field value so the
    * argmax is total; NULL field values rank lowest — a null never
    * beats data, matching the resolveDuplicatesBy null-quality rule).
    * Output: one row per cluster, `(clusterCol, n_members,
    * <field> for each rule)`.
    *
    * Shape: ONE hash aggregate — every field's argmax is a
    * `max(struct(rank, field))` in the same groupBy, so the corpus is
    * scanned once and nothing windows. Mirror per field with
    * `max_by(field, rank)` only when ranks are unique; the general
    * tie-safe mirror is `max(struct)` ≡ `max((rank, field))` (DuckDB
    * composite max) — see q_golden's oracle.
    */
  def goldenRecord(labeled: DataFrame, clusterCol: String,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "goldenRecord needs at least one field rule")
    val aggs = rules.map { case (field, rank) =>
      max(struct(
        // nulls-last: a present value always beats an absent one at
        // equal rank, and a null field sorts below every string/value
        when(col(field).isNull, lit(0)).otherwise(lit(1)).as("__has"),
        rank.as("__rk"), col(field).as("__v"))).getField("__v").as(field)
    }
    labeled.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"), aggs: _*)
  }

  /** Grid-density clustering (the grid/cell form of DBSCAN, cf.
    * GRIDCLUS / DenClue): quantize 2-D points to `cellMicro`-wide
    * cells, call a cell CORE when it holds ≥ `minPts` points, and
    * label core cells by connected components over 8-neighborhood
    * adjacency. Sparse cells are noise by construction — the density
    * threshold IS the cell filter, so no per-point neighborhood query
    * (the O(n²) part of point-DBSCAN) ever runs.
    *
    * Coordinates are floored to integer micro-units then shifted +10⁶
    * (embeddings live in [−1, 1]) so the truncating integer division
    * both engines share IS floor division. Cell ids pack as
    * `cell_x·10⁶ + cell_y` — unique while cellMicro ≥ 10.
    *
    * Scale shape: one (cell_x, cell_y) hash agg over the points —
    * map-side partial, GRID-sized output (bounded by the coordinate
    * extent, not the row count); the 8-neighbor self-join and the
    * [[connectedComponents]] rounds run on the grid, never the
    * points. Output: (cell_x, cell_y, n_points, cluster_id) per core
    * cell, cluster_id = the component's minimum cell id.
    */
  def gridCluster(df: DataFrame, x: Column, y: Column, cellMicro: Long,
      minPts: Long, maxRounds: Int = 25): DataFrame = {
    require(cellMicro >= 10, s"cellMicro must be >= 10, got $cellMicro")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val cells = df.select(
        (floor(x.cast("double") * 1e6).cast("long") + 1000000L).as("__xm"),
        (floor(y.cast("double") * 1e6).cast("long") + 1000000L).as("__ym"))
      .select(expr(s"__xm div $cellMicro").as("cell_x"),
        expr(s"__ym div $cellMicro").as("cell_y"))
      .groupBy("cell_x", "cell_y").agg(count(lit(1)).as("n_points"))
    // eager checkpoint: the core grid feeds the probe explode, the
    // build side, AND the final label join — without it the full
    // point agg re-executes per consumer.
    val core = cells.filter(col("n_points") >= minPts)
      .withColumn("cid", col("cell_x") * 1000000L + col("cell_y"))
      .localCheckpoint(true)
    val offsets = for { dx <- -1L to 1L; dy <- -1L to 1L if (dx, dy) != ((0L, 0L)) }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probe = core.select(col("cid").as("id_a"),
        explode(array(offsets: _*)).as("__o"),
        col("cell_x"), col("cell_y"))
      .select(col("id_a"), (col("cell_x") + col("__o.dx")).as("cell_x"),
        (col("cell_y") + col("__o.dy")).as("cell_y"))
    val edges = probe.join(core.select(col("cell_x"), col("cell_y"),
        col("cid").as("id_b")), Seq("cell_x", "cell_y"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    // the label table derives from `core` itself — rename its key so
    // the join back is unambiguous
    val labels = resolveDuplicates(core.select(col("cid")), "cid", edges,
        maxRounds = maxRounds)
      .select(col("cid").as("__lcid"), col("cluster_id"))
    core.join(labels, col("cid") === col("__lcid"))
      .select(col("cell_x"), col("cell_y"), col("n_points"), col("cluster_id"))
  }
}
