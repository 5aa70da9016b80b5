package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.{GQ, QueryDefs}
import QueryDefs._

/** Similarity search over embedding columns (SURVEY §2 C5/C6/C12).
  *
  * Scale shape: the query set is broadcast (small side); candidate vectors
  * stream through one pass. Dot products are sequential folds over array
  * columns (whole-stage-codegen'd, IEEE-deterministic and bit-identical to
  * the DuckDB oracle's list_reduce). The LSH variant buckets vectors by
  * sign-random-projection so the candidate join touches ~1/256 of pairs.
  */
object Similarity {

  private val Dim = 64
  private val NumPlanes = 8
  private val K = 5
  private val NumQueries = 8

  /** Deterministic ±1 vectors derived from md5 at build time, embedded
    * as literals in both the Spark plan and the oracle SQL.
    */
  private def signVectors(prefix: String, n: Int, dim: Int = Dim): Seq[Seq[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until n).map { j =>
      (0 until dim).map { dd =>
        val h = md.digest(s"$prefix$j:$dd".getBytes(StandardCharsets.UTF_8))
        if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
      }
    }
  }

  private[llm] val planes: Seq[Seq[Double]] = signVectors("p", NumPlanes)

  /** IVF coarse-quantizer anchors: equal-norm ±1 vectors, so nearest-by-
    * dot == nearest-by-cosine among anchors.
    */
  private val NumCells = 8
  private[llm] val anchors: Seq[Seq[Double]] = signVectors("iv", NumCells)

  /** Semantic-dedup cosine threshold (C38): ~11% of the sf0.01 corpus
    * sits above it within a cell — enough duplication signal without
    * degenerating into drop-everything.
    */
  private val SemDedupTau = 0.35

  /** Product-quantization codebooks (C34): M subspaces x K equal-norm ±1
    * centroids per subspace, so argmin-L2 == argmax-dot inside a subspace.
    */
  private val PqM = 4
  private val PqK = 8
  private val PqSub = Dim / PqM
  private[llm] val pqBooks: Seq[Seq[Seq[Double]]] =
    (0 until PqM).map(m => signVectors(s"pq$m:", PqK, PqSub))

  /** Banded sign-random-projection planes for near-dup candidate
    * generation (C12): 4 bands x 4 planes. Two vectors at cosine 0.35
    * agree per-plane with p = 1 - theta/pi ~ 0.61, so
    * P[share a 4-plane band] = 1-(1-0.61^4)^4 ~ 0.45 per band set —
    * recall without any all-pairs join.
    */
  private val DedupBands = 4
  private val DedupRows = 4
  private[llm] val dedupPlanes: Seq[Seq[Double]] =
    signVectors("dp", DedupBands * DedupRows)

  /** Exact per-cell centroid means via 1e6-scaled integer sums (identical
    * arithmetic in the oracle's meansSql): sums are exact + associative, so
    * distributed training is aggregation-order-independent — the property
    * that makes k-means reproducible at 100 TB. Driver-side result is
    * cells × Dim doubles, metadata-sized.
    */
  private def centroidsOf(s: SparkSession, assigned: DataFrame): Seq[(Int, Seq[Double])] = {
    import s.implicits._
    // ONE codegen'd hash aggregation with 64 per-dim sums: the
    // posexplode formulation blows each row up 64× and shuffles 64N
    // rows into a (cell, dim) aggregation — this shape shuffles C×64
    // longs total. The arithmetic is unchanged (same per-element
    // round→long, same long sums, same double division chain), so the
    // oracle's meansSql still matches bit-for-bit.
    val sums = (0 until Dim).map(i =>
      sum(round(element_at($"e", i + 1) * lit(1000000.0)).cast("long")).as(s"s$i"))
    val aggs = sums :+ count(lit(1)).as("n")
    assigned.groupBy($"cell").agg(aggs.head, aggs.tail: _*)
      .select($"cell", array((0 until Dim).map(i =>
        col(s"s$i").cast("double") / lit(1000000.0) / col("n").cast("double")): _*).as("c"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
  }

  /** Trained centroids as a small relation (cell, c, c·c). Always joined
    * with `broadcast()`: a trained quantizer's C grows with the corpus, so
    * inlining C×Dim literals into the plan (the round-≤10 shape) explodes
    * plan size/compile time at scale, while a broadcast relation stays
    * O(C) data shipped once per executor. The c·c fold runs left-to-right
    * over dims, bit-matching the oracle's list_reduce.
    */
  private def centroidFrame(s: SparkSession, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    cents.toDF("cell", "c").withColumn("cc", dotD($"c", $"c"))
  }

  /** The centroid relation collapsed to ONE row holding the cell-sorted
    * array of (cell, c, cc) structs. Broadcast-crossJoined to the vectors
    * this adds the centroids as DATA (zero plan literals) without row
    * expansion — the assignment then folds over the array per row,
    * keeping the scan map-only. The N×C join + groupBy(vec_id) min_by
    * alternative re-aggregates the 64-double embedding arrays, which
    * array-typed agg buffers push off the codegen'd hash path — measured
    * 2× slower end-to-end at sf0.1 — and shuffles every embedding once.
    */
  private def centroidsRow(s: SparkSession, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    centroidFrame(s, cents)
      .agg(array_sort(collect_list(struct($"cell", $"c", $"cc"))).as("__cents"))
  }

  /** Assignment to the nearest trained centroid by argmin(c·c − 2 e·c):
    * a per-row fold over the broadcast centroid array, cells ascending
    * with strict-< replacement, so ties break to the lowest cell id —
    * the same semantics as min_by(struct(d2, cell)) and the oracles'
    * ROW_NUMBER (d2, cell) order.
    */
  private def assignByCentroids(v: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val s = v.sparkSession
    import s.implicits._
    v.crossJoin(broadcast(centroidsRow(s, cents)))
      .withColumn("cell", aggregate($"__cents",
        struct(lit(Double.MaxValue).as("d2"), lit(0).as("cell")),
        (st, ct) => {
          val d2 = ct.getField("cc") - lit(2.0) * dotD($"e", ct.getField("c"))
          when(d2 < st.getField("d2"),
            struct(d2.as("d2"), ct.getField("cell").as("cell")))
            .otherwise(st)
        },
        st => st.getField("cell")))
      .drop("__cents")
  }

  /** The TRAINED coarse quantizer: 2 exact Lloyd iterations seeded from
    * the ±1 anchors. Shared by ann_ivf_trained / ann_ivf_probe /
    * semantic_dedup so cell placement adapts to the corpus (and at scale
    * cell COUNT grows with N) instead of staying pinned to fixed anchors.
    */
  private def trainLloyd2(s: SparkSession, v: DataFrame): Seq[(Int, Seq[Double])] = {
    import s.implicits._
    val dots = array(anchors.map(a => dotD($"e", array(a.map(lit): _*))): _*)
    val a0 = v.withColumn("cell",
      array_position(dots, array_max(dots)).cast("int"))
    val c1 = centroidsOf(s, a0)
    centroidsOf(s, assignByCentroids(v, c1))
  }

  /** INDEX BUILD — the cell-bucketed PHYSICAL layout: the corpus written
    * as a graft-Delta table PARTITIONED BY the cell id, so a probe's
    * candidate read prunes unprobed cells at the transaction-log level
    * (their files are never opened). This turns nprobe/C from a compute
    * property into an I/O one — at 100 TB the scan, not the distance
    * math, is the bill, and a cell-filtered read over this layout
    * touches ~nprobe/C of the BYTES, not just of the comparisons.
    * `assigned` must carry a `cell` column; callers read the table back
    * through the `graft-delta` source (whose DeltaFileIndex serves the
    * partition pruning) and must cut lineage (stableCheckpoint) on
    * every result derived from it before [[deleteTree]] of `dir`.
    */
  private def writeCellIndexed(s: SparkSession, assigned: DataFrame,
      dir: java.nio.file.Path): DataFrame = {
    val t = graft.delta.DeltaTable.forPath(s, dir.toString)
    // cluster the write by cell: ONE shuffle (the index-build cost, paid
    // once) so each task writes whole cells — without it every input
    // partition spills a sliver into every cell and the table is
    // #partitions × #cells tiny files, the exact small-file pathology
    // OPTIMIZE exists to undo
    t.write(assigned.repartition(col("cell")), partitionBy = Seq("cell"))
    s.read.format("graft-delta").load(dir.toString)
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  // --- MAINTAINED IVF index (r17) ---------------------------------------
  // The amortized form of ann_ivf_trained's per-query build: buildIndex
  // trains the coarse quantizer ONCE and persists BOTH artifacts —
  // <dir>/centroids (the model, a graft-Delta table) and <dir>/cells
  // (the corpus PARTITIONED BY cell). admitBatch grows the index
  // incrementally: new vectors are assigned against the STORED centroids
  // (broadcast model, one map pass + one clustering shuffle) and
  // APPENDED into their Hive cell partitions — no retraining, no rewrite
  // of resident cells, and a probe over the union stays file-pruned
  // because admissions land inside the same partition directories.
  // Vectors contract: (vec_id long, e array<double> of Dim, nrm double).

  /** Train on `vectors` and materialize the index artifacts at `dir`. */
  def buildIndex(s: SparkSession, vectors: DataFrame, dir: String): Unit = {
    import s.implicits._
    val cents = trainLloyd2(s, vectors)
    graft.delta.DeltaTable.forPath(s, s"$dir/centroids")
      .write(cents.toDF("cell", "c"))
    // first admission assigns against the JUST-TRAINED centroids — the
    // exact values the line above stored, same fold, same tie-break —
    // instead of re-reading the centroid table it wrote a moment ago
    // (admitBatch's stored-read is for LATER admissions, where the
    // training-time values are gone)
    graft.delta.DeltaTable.forPath(s, s"$dir/cells")
      .write(assignByCentroids(vectors, cents)
          .select($"cell", $"vec_id", $"e", $"nrm")
          .repartition(col("cell")),
        partitionBy = Seq("cell"))
  }

  /** Assignment of a vector batch against the STORED centroids: one
    * broadcast row carrying the sorted centroid array, folded per vector
    * (argmin(c·c − 2 e·c), strict-< so ties break to the lowest cell) —
    * MAP-ONLY, the same r11 shape [[assignByCentroids]] uses, with no
    * N×C intermediate row materialization on the admission path.
    */
  private[llm] def assignToStored(s: SparkSession, vectors: DataFrame,
      dir: String): DataFrame =
    assignByCentroidRelation(vectors, storedCentroids(s, dir))

  /** Assignment against a centroid RELATION (cell, c, cc) — the same
    * map-only broadcast-row fold as [[assignByCentroids]], for centroids
    * that live in a table rather than a driver Seq (no literals in the
    * plan, one broadcast of C×Dim doubles, zero N×C row expansion).
    * Strict-< replacement over cells ascending == min_by(struct(d2,
    * cell)) — ties break to the lowest cell id, identical d2 arithmetic.
    */
  private[llm] def assignByCentroidRelation(vectors: DataFrame,
      cents: DataFrame): DataFrame = {
    val s = vectors.sparkSession
    import s.implicits._
    val centsRow = cents
      .agg(array_sort(collect_list(struct($"cell", $"c", $"cc"))).as("__cents"))
    vectors.crossJoin(broadcast(centsRow))
      .withColumn("cell", aggregate($"__cents",
        struct(lit(Double.MaxValue).as("d2"), lit(0).as("cell")),
        (st, ct) => {
          val d2 = ct.getField("cc") - lit(2.0) * dotD($"e", ct.getField("c"))
          when(d2 < st.getField("d2"),
            struct(d2.as("d2"), ct.getField("cell").as("cell")))
            .otherwise(st)
        },
        // empty centroid relation: the fold's init would silently assign
        // every vector to cell 0 — fail loudly instead (a branch on the
        // broadcast 1-row array, free under codegen)
        st => when(size($"__cents") === 0, raise_error(lit(
            "assignByCentroidRelation: empty centroid relation — " +
              "train or load centroids before assignment")))
          .otherwise(st.getField("cell"))))
      .select($"cell", $"vec_id", $"e", $"nrm")
  }

  /** Admit a new vector batch into an existing index: assignment against
    * the stored centroids, appended into the cell partitions.
    */
  def admitBatch(s: SparkSession, vectors: DataFrame, dir: String): Unit = {
    // cluster the append by cell — admitted files land WHOLE inside
    // their cell partition, preserving the probe's file pruning
    graft.delta.DeltaTable.forPath(s, s"$dir/cells")
      .write(assignToStored(s, vectors, dir).repartition(col("cell")),
        partitionBy = Seq("cell"))
  }

  /** Streaming admission (the online face of the maintained index, use
    * from `foreachBatch`): the same stored-centroid assignment, committed
    * through the exactly-once streaming sink — a REPLAYED micro-batch
    * (same appId+batchId after a failure) is a no-op, so the index never
    * double-admits. Returns false when the batch was already admitted.
    */
  def admitStreamBatch(s: SparkSession, vectors: DataFrame, dir: String,
      appId: String, batchId: Long): Boolean =
    graft.delta.DeltaTable.forPath(s, s"$dir/cells")
      .writeStreamBatch(
        assignToStored(s, vectors, dir).repartition(col("cell")),
        appId, batchId, partitionBy = Seq("cell"))

  /** The index as a DataFrame (cell, vec_id, e, nrm) through the
    * graft-delta source — cell predicates prune at the log level.
    */
  def readIndex(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-delta").load(s"$dir/cells")

  /** Index maintenance: every admitBatch appends ~1 file per touched
    * cell, so a long admission history is the classic small-file
    * pathology. This is just Delta OPTIMIZE on the cells table — a
    * partition-scoped bin-pack (dataChange=false, invisible to streams)
    * that leaves the cell layout and the probe's file pruning intact.
    * Run it on the same cadence as any table maintenance.
    */
  def compactIndex(s: SparkSession, dir: String): Long =
    graft.delta.DeltaTable.forPath(s, s"$dir/cells").compact()

  /** Removal from the maintained index (the GDPR/right-to-be-forgotten
    * path of a production vector store): a MERGE-ON-READ delete on the
    * cells table — deletion vectors mask the rows in place, so the cell
    * layout, the admitted files, and the probe's log-level pruning are
    * all untouched (no rewrite, no re-clustering); probes, drift, and
    * streams see the shrunken populations immediately through the
    * descriptor-gated DV subtraction, and the next [[compactIndex]]
    * materializes the removals. Scale shape: the delete is one
    * distributed pass over only the cells whose files match the
    * predicate; removal cost follows the REQUEST size, never the corpus.
    */
  def deleteFromIndex(s: SparkSession, dir: String,
      condition: org.apache.spark.sql.Column): Long = {
    val t = graft.delta.DeltaTable.forPath(s, s"$dir/cells")
    val md = t.deltaLog.update().metadata
    // indexes built before this surface existed lack the DV property;
    // stamp it so the delete stays merge-on-read instead of rewriting
    // whole cell files
    if (!md.configuration.get("delta.enableDeletionVectors").contains("true")) {
      val txn = t.deltaLog.startTransaction()
      txn.updateMetadata(md.copy(configuration = md.configuration +
        ("delta.enableDeletionVectors" -> "true")))
      txn.commit(Nil, graft.delta.Op.SetTableProperties)
    }
    t.delete(condition)
  }

  /** The stored quantizer as a broadcastable relation (cell, c, c·c). */
  private def storedCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.delta.DeltaTable.forPath(s, s"$dir/centroids").toDF
      .select($"cell".cast("int").as("cell"), $"c")
      .withColumn("cc", dotD($"c", $"c"))
  }

  /** The RE-TRAIN signal: per-cell population and mean squared distance
    * to the stored centroid. Admitting drifted data inflates a cell's
    * mean_d2 (and skews counts) — when it degrades materially vs the
    * build-time report, re-run [[buildIndex]]. One broadcast join + one
    * aggregation; never collects vectors.
    */
  def centroidDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    readIndex(s, dir).join(broadcast(storedCentroids(s, dir)), Seq("cell"))
      .withColumn("d2",
        $"nrm" * $"nrm" - lit(2.0) * dotD($"e", $"c") + $"cc")
      .groupBy($"cell")
      .agg(count(lit(1)).as("n"), avg($"d2").as("mean_d2"))
      .orderBy($"cell")
  }

  private def normed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    table(s, d, "embeddings")
      .withColumn("e", toDoubleArr($"embedding"))
      .withColumn("nrm", sqrt(dotD($"e", $"e")))
      .select($"vec_id", $"label", $"e", $"nrm")
  }

  // DuckDB mirrors ------------------------------------------------------
  private def duckDot(a: String, b: String) =
    s"list_reduce(list_transform(generate_series(1, $Dim), i -> ($a)[i]*($b)[i]), (x, y) -> x + y)"
  private val duckNormed =
    s"""SELECT vec_id, label, e, sqrt(${duckDot("e", "e")}) AS nrm
        FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"""

  private def anchorDotsSql: String =
    anchors.map(a => duckDot("e", a.mkString("[", ", ", "]"))).mkString("[", ", ", "]")

  // trained-quantizer SQL, mirroring trainLloyd2/assignByCentroids exactly:
  // one Lloyd step = means of `prev` assignments (1e6-scaled integer sums),
  // then re-assignment by argmin(c·c − 2 e·c) with ties to the lowest cell
  private def meansSql(prev: String) = s"""
        SELECT cell, list(CAST(ssum AS DOUBLE)/1000000.0/CAST(n AS DOUBLE) ORDER BY dim) AS c
        FROM (SELECT cell, dim, CAST(SUM(sx) AS BIGINT) AS ssum, COUNT(*) AS n
              FROM (SELECT cell, u.i - 1 AS dim, CAST(round(e[u.i]*1000000.0) AS BIGINT) AS sx
                    FROM $prev, (SELECT unnest(generate_series(1, $Dim)) AS i) u)
              GROUP BY 1, 2)
        GROUP BY cell"""
  private def assignSql(cents: String, src: String = "n") = s"""
        SELECT vec_id, e, nrm, cell FROM (
          SELECT v.vec_id, v.e, v.nrm, c.cell,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
              ${duckDot("c.c", "c.c")} - 2*${duckDot("v.e", "c.c")}, c.cell) AS rn
          FROM $src v, $cents c)
        WHERE rn = 1"""

  /** Training CTE chain a0 → c1 → a1 → c2 over `src`: c2 = the trained
    * centroids of THAT vector subset (the maintained-index oracle trains
    * on batch 1 only, then assigns everything).
    */
  private def trainedOn(src: String): String = s"""
      a0 AS (SELECT vec_id, e, nrm,
          CAST(list_position(dots, list_max(dots)) AS INTEGER) AS cell
        FROM (SELECT vec_id, e, nrm, $anchorDotsSql AS dots FROM $src)),
      c1 AS (${meansSql("a0")}),
      a1 AS (${assignSql("c1", src)}),
      c2 AS (${meansSql("a1")})"""

  /** CTE chain a0 → c1 → a1 → c2 → a2 over an existing `n` (normed) CTE:
    * c2 = trained centroids, a2 = trained assignment of every vector.
    */
  private def trainedCtes: String = s"""
      ${trainedOn("n")},
      a2 AS (${assignSql("c2")})"""

  val queries: Seq[GQ] = Seq(
    // C5 ---------------------------------------------------------------
    GQ("ann_cosine_topk", (s, d) => {
      import s.implicits._
      val v = normed(s, d)
      val q = v.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"))
      val c = v.select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"))
      val scored = c.join(broadcast(q), $"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
      // bounded top-K aggregate, not a per-query window: partial
      // aggregation keeps ≤K pairs per (map task, query) so the shuffle
      // is O(partitions × queries × K) instead of all scored pairs into
      // one reducer per query — the full-scan exact baseline stays
      // parallel at 100× data (same rows, same order as the window form)
      scored.groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("c_id"), $"col.score".as("cosine"))
        .orderBy($"q_id", $"rank")
    }, Some(s"""
      WITH n AS ($duckNormed),
      p AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          ${duckDot("q.e", "c.e")} / (q.nrm * c.nrm) AS cosine
        FROM n q JOIN n c ON q.vec_id < $NumQueries AND c.vec_id != q.vec_id)
      SELECT q_id, CAST(rn AS BIGINT) AS rank, c_id, cosine FROM (
        SELECT q_id, c_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
        FROM p)
      WHERE rn <= $K ORDER BY q_id, rank"""), bench = true),

    // C6 ---------------------------------------------------------------
    GQ("ann_lsh_bucketed", (s, d) => {
      import s.implicits._
      val v = normed(s, d)
      val bucket = (0 until NumPlanes).map { j =>
        val plane = array(planes(j).map(lit): _*)
        when(dotD($"e", plane) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      val b = v.withColumn("bucket", bucket)
      val q = b.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"), $"bucket")
      val c = b.select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"), $"bucket")
      c.join(broadcast(q), Seq("bucket")).filter($"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .select($"q_id", $"c_id", $"bucket", $"cosine")
        .orderBy($"q_id", $"c_id")
    }, {
      def planeSql(j: Int) = planes(j).mkString("[", ", ", "]")
      val bucketSql = (0 until NumPlanes).map { j =>
        s"(CASE WHEN ${duckDot("e", planeSql(j))} >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      Some(s"""
      WITH n AS ($duckNormed),
      b AS (SELECT vec_id, e, nrm, CAST($bucketSql AS BIGINT) AS bucket FROM n)
      SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.bucket AS bucket,
        ${duckDot("q.e", "c.e")} / (q.nrm * c.nrm) AS cosine
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < $NumQueries AND c.vec_id != q.vec_id
      ORDER BY q_id, c_id""")
    }),

    // C6b: IVF-style ANN — coarse quantization by argmax dot against
    // deterministic anchors; search runs inside the query's cell only
    // (nprobe=1). The scale path for embedding search: each cell is
    // ~1/NumCells of the corpus and cells shard naturally.
    GQ("ann_ivf_cells", (s, d) => {
      import s.implicits._
      val v = normed(s, d)
      val dots = array(anchors.map(a => dotD($"e", array(a.map(lit): _*))): _*)
      val withCell = v.withColumn("cell",
        array_position(dots, array_max(dots)).cast("int"))
      val q = withCell.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"), $"cell")
      val c = withCell.select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"), $"cell")
      c.join(broadcast(q), Seq("cell")).filter($"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .select($"q_id", $"c_id", $"cell", $"cosine")
        .orderBy($"q_id", $"c_id")
    }, {
      val dotsSql = anchors.map(a => duckDot("e", a.mkString("[", ", ", "]")))
        .mkString("[", ", ", "]")
      Some(s"""
      WITH n AS ($duckNormed),
      b AS (SELECT vec_id, e, nrm,
        CAST(list_position(dots, list_max(dots)) AS INTEGER) AS cell
        FROM (SELECT vec_id, e, nrm, $dotsSql AS dots FROM n))
      SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.cell AS cell,
        ${duckDot("q.e", "c.e")} / (q.nrm * c.nrm) AS cosine
      FROM b q JOIN b c ON q.cell = c.cell AND q.vec_id < $NumQueries AND c.vec_id != q.vec_id
      ORDER BY q_id, c_id""")
    }),

    // C37 --------------------------------------------------------------
    // Two-stage IVF SEARCH over the TRAINED quantizer (round 10: was the
    // fixed ±1 anchors; now the same 2-Lloyd-iteration centroids as
    // ann_ivf_trained, so cell placement — and at scale, cell count —
    // follows the corpus). Each query probes its nearest 2 cells by
    // argmin(c·c − 2 e·c); exact cosine runs only inside the probed
    // cells; a bounded top-K aggregate returns the results. At corpus
    // scale the probe touches ~nprobe/C of the vectors and the candidate
    // join is cell-partitioned — no all-pairs stage anywhere.
    // Second-best cell via argmin-then-mask (identical IEEE steps both
    // engines; ties break to the lower cell id by first-position
    // semantics, matching the oracle's ROW_NUMBER (d2, cell) order).
    GQ("ann_ivf_probe", (s, d) => {
      import s.implicits._
      val v = normed(s, d).persist()
      val cents = trainLloyd2(s, v)
      // best + second-best probe cell in ONE map-only fold over the
      // broadcast centroid array (cells ascending, strict-< replacement
      // at both ranks = first-two-by-(d2, cell) — exactly the oracle's
      // ROW_NUMBER rn <= 2): no C×Dim plan literals, no row expansion,
      // no array-typed aggregation. The index WRITE below materializes
      // the assignment once for both join sides (the fold never reruns)
      val assigned = v.crossJoin(broadcast(centroidsRow(s, cents)))
        .withColumn("pr", aggregate($"__cents",
          struct(lit(Double.MaxValue).as("d1"), lit(0).as("c1"),
            lit(Double.MaxValue).as("d2"), lit(0).as("c2")),
          (st, ct) => {
            val d = ct.getField("cc") - lit(2.0) * dotD($"e", ct.getField("c"))
            when(d < st.getField("d1"),
              struct(d.as("d1"), ct.getField("cell").as("c1"),
                st.getField("d1").as("d2"), st.getField("c1").as("c2")))
              .when(d < st.getField("d2"),
                struct(st.getField("d1").as("d1"), st.getField("c1").as("c1"),
                  d.as("d2"), ct.getField("cell").as("c2")))
              .otherwise(st)
          },
          st => struct(st.getField("c1").as("best"), st.getField("c2").as("second"))))
        .select($"vec_id", $"e", $"nrm",
          $"pr.best".as("cell"), $"pr.second".as("second"))
      // INDEX BUILD: partitioned by the vector's OWN (best) cell; the
      // probe list (best, second) rides along as data. The write
      // materializes the assignment for both consumers (replacing the
      // r15 checkpoint) AND is the pruned layout the search reads.
      val idxDir = QueryDefs.scratchDir("graft-ivf-probe-index")
      val index = writeCellIndexed(s, assigned
        .select($"cell", $"vec_id", $"e", $"nrm", $"second"), idxDir)
      v.unpersist()
      val q = index.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"),
          explode(array($"cell", $"second")).as("cell"))
      // probed = union of every query's 2 probe cells — O(2·#queries)
      // driver ints; the candidate read opens ONLY those cells' files
      val probed = q.select($"cell").distinct().as[Int].collect().toSeq.sorted
      val c = index.where($"cell".isInCollection(probed))
        .select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"), $"cell")
      val res = c.join(broadcast(q), Seq("cell")).filter($"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("c_id"), $"col.score".as("cosine"))
        .orderBy($"q_id", $"rank")
        .transform(stableCheckpoint)
      deleteTree(idxDir)
      res
    }, Some(s"""
      WITH n AS ($duckNormed),
      $trainedCtes,
      q AS (SELECT vec_id AS q_id, qe, qn, cell FROM (
          SELECT v.vec_id, v.e AS qe, v.nrm AS qn, c.cell,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
              ${duckDot("c.c", "c.c")} - 2*${duckDot("v.e", "c.c")}, c.cell) AS rn
          FROM n v, c2 c
          WHERE v.vec_id < $NumQueries)
        WHERE rn <= 2),
      scored AS (SELECT q.q_id, c.vec_id AS c_id,
          ${duckDot("q.qe", "c.e")} / (q.qn * c.nrm) AS cosine
        FROM q JOIN a2 c ON q.cell = c.cell AND c.vec_id != q.q_id)
      SELECT q_id, CAST(rn AS BIGINT) AS rank, c_id, cosine FROM (
        SELECT q_id, c_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
        FROM scored)
      WHERE rn <= $K ORDER BY q_id, rank""")),

    // C12 --------------------------------------------------------------
    // Embedding near-duplicate pairs. Round 1 blocked on `label` and
    // self-joined within the block — O(n^2) per label, quadratic when a
    // corpus has few labels. Candidates now come from banded
    // sign-random-projection buckets (the same machinery as
    // ann_lsh_bucketed, banded for recall): the candidate join carries
    // (id, band, key) only, exact cosine verifies candidates only.
    GQ("embed_cosine_dedup", (s, d) => {
      import s.implicits._
      val v = normed(s, d)
      val bandKeys = (0 until DedupBands).map { b =>
        (0 until DedupRows).map { r =>
          val plane = array(dedupPlanes(b * DedupRows + r).map(lit): _*)
          when(dotD($"e", plane) >= 0, lit(1L << r)).otherwise(lit(0L))
        }.reduce(_ + _)
      }
      val bands = v.select($"vec_id",
        posexplode(array(bandKeys: _*)).as(Seq("b", "bkey")))
      val l = bands.select($"vec_id".as("id_a"), $"b", $"bkey")
      val r = bands.select($"vec_id".as("id_b"), $"b", $"bkey")
      val cand = l.join(r, Seq("b", "bkey")).filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b").distinct()
      cand
        .join(v.select($"vec_id".as("id_a"), $"e".as("ea"), $"nrm".as("na")), Seq("id_a"))
        .join(v.select($"vec_id".as("id_b"), $"e".as("eb"), $"nrm".as("nb")), Seq("id_b"))
        .withColumn("cosine", dotD($"ea", $"eb") / ($"na" * $"nb"))
        .filter($"cosine" >= 0.35)
        .select($"id_a", $"id_b", $"cosine")
        .orderBy($"id_a", $"id_b")
    }, {
      def planeSql(i: Int) = dedupPlanes(i).mkString("[", ", ", "]")
      val bandSql = (0 until DedupBands).map { b =>
        (0 until DedupRows).map { r =>
          s"(CASE WHEN ${duckDot("e", planeSql(b * DedupRows + r))} >= 0 THEN ${1L << r} ELSE 0 END)"
        }.mkString(" + ")
      }
      Some(s"""
      WITH n AS ($duckNormed),
      bands AS (
        SELECT vec_id, u.b AS b,
          CASE ${(0 until DedupBands).map(b => s"WHEN u.b = $b THEN ${bandSql(b)}").mkString(" ")} END AS bkey
        FROM n, (SELECT unnest([${(0 until DedupBands).mkString(",")}]) AS b) u),
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
        FROM bands a JOIN bands c ON a.b = c.b AND a.bkey = c.bkey AND a.vec_id < c.vec_id)
      SELECT id_a, id_b, ${duckDot("x.e", "y.e")} / (x.nrm * y.nrm) AS cosine
      FROM cand JOIN n x ON x.vec_id = id_a JOIN n y ON y.vec_id = id_b
      WHERE ${duckDot("x.e", "y.e")} / (x.nrm * y.nrm) >= 0.35
      ORDER BY id_a, id_b""")
    }),

    // C27 ---------------------------------------------------------------
    // kNN label propagation: classify each query vector by majority label
    // of its k = 5 exact-cosine nearest neighbors (excluding itself) —
    // the standard weak-labeling / quality-transfer primitive over an
    // embedded corpus. Same shape as ann_cosine_topk (broadcast query
    // side, bounded top-K aggregate, no per-query window), plus one tiny
    // vote aggregation; ties break toward the smaller label.
    GQ("knn_classify", (s, d) => {
      import s.implicits._
      val v = normed(s, d)
      val q = v.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"label".as("true_label"), $"e".as("qe"), $"nrm".as("qn"))
      val c = v.select($"vec_id".as("c_id"), $"label".as("c_label"), $"e".as("ce"), $"nrm".as("cn"))
      val top = c.join(broadcast(q.select($"q_id", $"qe", $"qn")), $"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
        .select($"q_id", explode($"top.id").as("c_id"))
      val votes = top
        .join(broadcast(c.select($"c_id", $"c_label")), Seq("c_id"))
        .groupBy($"q_id", $"c_label").agg(count(lit(1)).as("cnt"))
        .groupBy($"q_id")
        .agg(max_by(struct($"c_label", $"cnt"),
          struct($"cnt", -$"c_label")).as("w"))
        .select($"q_id", $"w.c_label".as("pred_label"), $"w.cnt".as("n_votes"))
      votes.join(broadcast(q.select($"q_id", $"true_label")), Seq("q_id"))
        .select($"q_id", $"true_label", $"pred_label", $"n_votes",
          ($"pred_label" === $"true_label").as("correct"))
        .orderBy($"q_id")
    }, Some(s"""
      WITH n AS ($duckNormed),
      p AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label AS c_label,
          ${duckDot("q.e", "c.e")} / (q.nrm * c.nrm) AS cosine
        FROM n q JOIN n c ON q.vec_id < $NumQueries AND c.vec_id != q.vec_id),
      top AS (
        SELECT q_id, c_label FROM (
          SELECT q_id, c_label,
            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
          FROM p)
        WHERE rn <= $K),
      votes AS (SELECT q_id, c_label, CAST(count(*) AS BIGINT) AS cnt
                FROM top GROUP BY q_id, c_label),
      pred AS (
        SELECT q_id, c_label AS pred_label, cnt AS n_votes FROM (
          SELECT q_id, c_label, cnt,
            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cnt DESC, c_label) AS rn
          FROM votes)
        WHERE rn = 1)
      SELECT p.q_id, n.label AS true_label, p.pred_label, p.n_votes,
        p.pred_label = n.label AS correct
      FROM pred p JOIN n ON n.vec_id = p.q_id
      ORDER BY q_id""")),

    // C31 ---------------------------------------------------------------
    // Symmetric int8 embedding quantization: per vector, scale =
    // 127/max|x|, q_i = round(x_i * scale) — the storage/serving format
    // for billion-vector ANN indexes (4x smaller, SIMD-dot-friendly).
    // Entirely per-row array expressions: shuffle-free at any scale. The
    // report carries exact-integer checksums (sum, L1, saturation count)
    // so the oracle verifies every quantized value without shipping the
    // int8 arrays through the compare.
    GQ("embed_quantize", (s, d) => {
      import s.implicits._
      table(s, d, "embeddings")
        .withColumn("mx", array_max(transform($"embedding", x => abs(x))).cast("double"))
        .withColumn("q", transform($"embedding",
          x => round(x.cast("double") * lit(127.0) / $"mx").cast("long")))
        .select($"vec_id",
          (lit(127.0) / $"mx").as("scale"),
          aggregate($"q", lit(0L), (a, b) => a + b).as("q_sum"),
          aggregate($"q", lit(0L), (a, b) => a + abs(b)).as("q_l1"),
          size(filter($"q", x => abs(x) === 127L)).cast("long").as("n_sat"))
        .orderBy($"vec_id")
    }, Some("""
      WITH q AS (SELECT vec_id,
          CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS mx,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 127.0 /
              CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)) AS BIGINT)) AS qv
        FROM embeddings)
      SELECT vec_id, 127.0 / mx AS scale,
        CAST(list_sum(qv) AS BIGINT) AS q_sum,
        CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
        CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
      FROM q ORDER BY vec_id""")),

    // C32 ---------------------------------------------------------------
    // IVF training: one exact Lloyd refinement step of the coarse
    // quantizer — assign every vector to its argmax-dot anchor cell,
    // compute the cell's exact centroid, and report per-cell size + L1
    // drift from the anchor. Centroid sums run on 1e6-scaled INTEGER
    // coordinates (exact + associative — float means would depend on
    // aggregation order at 100 TB); the per-cell drift folds the 64
    // per-dimension diffs in fixed dim order. The shuffle carries
    // (cell, dim, int64) triples only; explode is absorbed by partial
    // aggregation. Iterating this step (re-seeding anchors with the
    // means) is k-means training at corpus scale.
    GQ("ivf_train", (s, d) => {
      import s.implicits._
      val v = normed(s, d)
      val dots = array(anchors.map(a => dotD($"e", array(a.map(lit): _*))): _*)
      val withCell = v.withColumn("cell",
        array_position(dots, array_max(dots)).cast("int"))
      val scaled = withCell.select($"cell",
        posexplode(transform($"e", x => round(x * lit(1000000.0)).cast("long")))
          .as(Seq("dim", "sx")))
      val anchorLit = array(anchors.map(a => array(a.map(lit): _*)): _*)
      withCell.groupBy($"cell").agg(count(lit(1)).as("n_assigned"))
        .join(
          scaled.groupBy($"cell", $"dim").agg(sum($"sx").as("ssum"), count(lit(1)).as("n"))
            .withColumn("mean",
              $"ssum".cast("double") / lit(1000000.0) / $"n".cast("double"))
            .withColumn("diff",
              abs($"mean" - element_at(element_at(anchorLit, $"cell"), $"dim" + 1)))
            .groupBy($"cell")
            .agg(aggregate(array_sort(collect_list(struct($"dim", $"diff"))),
              lit(0.0), (acc, x) => acc + x.getField("diff")).as("drift")),
          Seq("cell"))
        .select($"cell", $"n_assigned", $"drift")
        .orderBy($"cell")
    }, {
      val dotsSql = anchors.map(a => duckDot("e", a.mkString("[", ", ", "]")))
        .mkString("[", ", ", "]")
      val anchorsSql = anchors.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
      Some(s"""
      WITH n AS ($duckNormed),
      b AS (SELECT vec_id, e, CAST(list_position(dots, list_max(dots)) AS INTEGER) AS cell
            FROM (SELECT vec_id, e, $dotsSql AS dots FROM n)),
      x AS (SELECT cell, u.i - 1 AS dim, CAST(round(e[u.i] * 1000000.0) AS BIGINT) AS sx
            FROM b, (SELECT unnest(generate_series(1, $Dim)) AS i) u),
      sums AS (SELECT cell, dim, CAST(SUM(sx) AS BIGINT) AS ssum, COUNT(*) AS n
               FROM x GROUP BY 1, 2),
      diffs AS (SELECT cell, dim,
          abs(CAST(ssum AS DOUBLE)/1000000.0/CAST(n AS DOUBLE)
              - ($anchorsSql)[cell][dim + 1]) AS diff
        FROM sums),
      drift AS (SELECT cell, list_reduce(list(diff ORDER BY dim), (x, y) -> x + y) AS drift
                FROM diffs GROUP BY cell),
      sizes AS (SELECT cell, COUNT(*) AS n_assigned FROM b GROUP BY cell)
      SELECT s.cell, s.n_assigned, d.drift
      FROM sizes s JOIN drift d ON s.cell = d.cell
      ORDER BY s.cell""")
    }),

    // C34 ---------------------------------------------------------------
    // Product quantization: the 64-dim vector splits into 4 subspaces of
    // 16 dims; per subspace the code is the argmax-dot centroid among 8
    // equal-norm ±1 codebook vectors (== argmin L2 in that subspace).
    // 100 TB shape: codebooks are plan literals (no broadcast), encoding
    // is one shuffle-free codegen pass, and the 4-byte code word then
    // stands in for the 256-byte raw vector in coarse search / dedup.
    // Output: per (subspace, code) population + vec_id checksum — every
    // assignment is verified exactly.
    GQ("ann_pq", (s, d) => {
      import s.implicits._
      val v = table(s, d, "embeddings").withColumn("e", toDoubleArr($"embedding"))
      val codes = array((0 until PqM).map { m =>
        val sub = slice($"e", m * PqSub + 1, PqSub)
        val dots = array(pqBooks(m).map(c => dotD(sub, array(c.map(lit): _*))): _*)
        (array_position(dots, array_max(dots)) - 1).cast("int")
      }: _*)
      v.select($"vec_id", posexplode(codes).as(Seq("m", "code")))
        .groupBy($"m", $"code")
        .agg(count(lit(1)).as("n"), sum($"vec_id").as("vec_id_sum"))
        .orderBy($"m", $"code")
    }, {
      val subDotLists = (0 until PqM).map { m =>
        val off = m * PqSub
        pqBooks(m).map { c =>
          val cl = c.mkString("[", ", ", "]")
          s"list_reduce(list_transform(generate_series(1, $PqSub), i -> e[$off + i]*($cl)[i]), (x, y) -> x + y)"
        }.mkString("[", ", ", "]")
      }.mkString("[", ", ", "]")
      Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      c AS (SELECT vec_id, unnest(list_transform($subDotLists,
              (dots, mi) -> {'m': mi - 1,
                             'code': list_position(dots, list_max(dots)) - 1})) AS u
            FROM v)
      SELECT CAST(u.m AS INTEGER) AS m, CAST(u.code AS INTEGER) AS code,
        COUNT(*) AS n, CAST(SUM(vec_id) AS BIGINT) AS vec_id_sum
      FROM c GROUP BY 1, 2 ORDER BY m, code""")
    }),

    // C39 ---------------------------------------------------------------
    // TRAINED IVF: the full train -> index -> search loop a 100-TB
    // embedding pipeline runs. Training = 2 exact Lloyd iterations
    // seeded from the deterministic ±1 anchors (assignment by argmin
    // L2 = argmin(c·c - 2 e·c); centroid means from 1e6-scaled integer
    // sums, so training is exact + aggregation-order-independent). The
    // trained centroids persist to a tiny graft-Delta table and the
    // SEARCH reads them back from that table — no centroid literals in
    // the search plan: vectors re-assign by a broadcast join against
    // the centroid table, queries probe their own cell, bounded top-K.
    // At corpus scale the centroid count grows with N; everything here
    // is a broadcast of K×Dim doubles plus cell-keyed joins.
    GQ("ann_ivf_trained", (s, d) => {
      import s.implicits._
      // the 2 training passes + the final assignment all rescan the
      // vectors: persist once so they read cached blocks, not parquet
      val v = normed(s, d).persist()
      val c2 = trainLloyd2(s, v)

      // persist the trained quantizer; the search below reads it back
      val dir = QueryDefs.scratchDir("graft-ivf-centroids")
      val centTable = graft.delta.DeltaTable.forPath(s, dir.toString)
      centTable.write(c2.toDF("cell", "c"))
      val cents = centTable.toDF
        .withColumn("cc", dotD($"c", $"c"))

      // map-only broadcast-row fold (same shape as assignToStored): the
      // N×C crossJoin + groupBy(vec_id) min_by alternative re-aggregates
      // the 64-double embedding arrays — array-typed agg buffers leave
      // the codegen'd hash path AND shuffle every embedding once more
      // before the index write's own clustering shuffle (2 embedding
      // shuffles where one suffices; guide §2.3/§2.4). Ties and d2
      // arithmetic are identical, so cell placement is bit-stable.
      val assigned = Similarity.assignByCentroidRelation(
        v.select($"vec_id", $"e", $"nrm"), cents)
      // INDEX BUILD: the corpus lands PARTITIONED BY trained cell (one
      // write materializes the assignment for both consumers below —
      // the role the r15 checkpoint played, now also the durable layout)
      val idxDir = QueryDefs.scratchDir("graft-ivf-index")
      val index = writeCellIndexed(s, assigned, idxDir)
      v.unpersist()
      // the index write consumed the centroid table; the fixture can go
      deleteTree(dir)
      // SEARCH over the layout: the probed-cell set is O(#queries) ints
      // on the driver, and the candidate read is PARTITION-PRUNED — at
      // corpus scale only ~nprobe/C of the FILES open, the unprobed
      // cells' bytes are never read (the query rows themselves are
      // found by vec_id data skipping, again file-level)
      val q = index.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"), $"cell")
      val probed = q.select($"cell").distinct().as[Int].collect().toSeq.sorted
      val c = index.where($"cell".isInCollection(probed))
        .select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"), $"cell")
      val res = c.join(broadcast(q), Seq("cell")).filter($"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("c_id"), $"col.score".as("cosine"))
        .orderBy($"q_id", $"rank")
        // materialize the K×Q-row result so the scratch index can go
        .transform(stableCheckpoint)
      deleteTree(idxDir)
      res
    }, Some(s"""
      WITH n AS ($duckNormed),
      $trainedCtes,
      q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, cell
            FROM a2 WHERE vec_id < $NumQueries),
      scored AS (SELECT q.q_id, c.vec_id AS c_id,
          ${duckDot("q.qe", "c.e")} / (q.qn * c.nrm) AS cosine
        FROM q JOIN a2 c ON q.cell = c.cell AND c.vec_id != q.q_id)
      SELECT q_id, CAST(rn AS BIGINT) AS rank, c_id, cosine FROM (
        SELECT q_id, c_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
        FROM scored)
      WHERE rn <= $K ORDER BY q_id, rank""")),

    // C38 ---------------------------------------------------------------
    // Semantic deduplication (SemDeDup, Abbas et al. 2023) over the
    // TRAINED quantizer (round 10: was the fixed ±1 anchors; now the same
    // 2-Lloyd-iteration centroids as ann_ivf_trained — the whole point of
    // a trainable quantizer is that C grows with N, keeping the
    // within-cell O((N/C)²) blocks bounded as the corpus scales).
    // A vector is dropped when ANOTHER vector in its cell sits above the
    // cosine threshold with a smaller id (deterministic keep-lowest-id
    // survivor). Pairwise cosine runs ONLY within a cell — the join is
    // cell-keyed, O((N/C)² × C) work sharded across cells, never an
    // all-pairs stage. Output: dropped ids with their best
    // (highest-cosine, then lowest-id) earlier match.
    GQ("semantic_dedup", (s, d) => {
      import s.implicits._
      val v = normed(s, d).persist()
      val cents = trainLloyd2(s, v)
      // eager localCheckpoint: both sides of the pairwise join consume
      // the assignment; without it the d2 scan runs twice
      val withCell = assignByCentroids(v, cents)
        .select($"vec_id", $"e", $"nrm", $"cell")
        .transform(stableCheckpoint)
      v.unpersist()
      val a = withCell.select($"cell", $"vec_id", $"e".as("ae"), $"nrm".as("an"))
      val b = withCell.select($"cell", $"vec_id".as("b_id"), $"e".as("be"), $"nrm".as("bn"))
      a.join(b, Seq("cell")).filter($"b_id" < $"vec_id")
        .withColumn("cosine", dotD($"ae", $"be") / ($"an" * $"bn"))
        .filter($"cosine" > SemDedupTau)
        // bounded partial agg: ≤1 row per (map task, dropped id) flows
        // into the shuffle; max_by on (cosine, -id) picks the best match
        // with IEEE comparisons only (no float arithmetic)
        .groupBy($"vec_id", $"cell")
        .agg(max_by(struct($"b_id", $"cosine"),
          struct($"cosine", -$"b_id")).as("m"))
        .select($"vec_id", $"cell", $"m.b_id".as("dup_of"), $"m.cosine".as("cosine"))
        .orderBy($"vec_id")
    }, Some(s"""
      WITH n AS ($duckNormed),
      $trainedCtes,
      p AS (SELECT a.vec_id, a.cell, c.vec_id AS dup_of,
          ${duckDot("a.e", "c.e")} / (a.nrm * c.nrm) AS cosine
        FROM a2 a JOIN a2 c ON a.cell = c.cell AND c.vec_id < a.vec_id)
      SELECT vec_id, cell, dup_of, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY cosine DESC, dup_of) AS rn
        FROM p WHERE cosine > $SemDedupTau)
      WHERE rn = 1 ORDER BY vec_id""")),

    // C40 ---------------------------------------------------------------
    // IVF-PQ SEARCH with asymmetric distance computation (ADC) — the
    // search path that makes PQ codes (C34) useful. Inside the probed
    // cells a corpus vector is represented ONLY by its 4-byte PQ code;
    // each query precomputes a 4×8 table of subspace dot products
    // against the codebooks, so a candidate's approximate score is 4
    // table lookups + 3 adds instead of 64-dim arithmetic per pair.
    // The ADC shortlist (top 3K per query, bounded partial aggregate)
    // is then re-ranked by exact cosine on the raw vectors — touching
    // 3K rows per query, not the whole cell. Deterministic end to end:
    // integer code arithmetic, fixed-order IEEE folds, ties to the
    // lowest id at both ranking stages.
    GQ("ann_ivf_pq", (s, d) => {
      import s.implicits._
      val v = normed(s, d)
      val dotsCol = array(anchors.map(a => dotD($"e", array(a.map(lit): _*))): _*)
      val withCell = v.withColumn("cell",
        array_position(dotsCol, array_max(dotsCol)).cast("int"))
      val codes = array((0 until PqM).map { m =>
        val sub = slice($"e", m * PqSub + 1, PqSub)
        val dots = array(pqBooks(m).map(cb => dotD(sub, array(cb.map(lit): _*))): _*)
        (array_position(dots, array_max(dots)) - 1).cast("int")
      }: _*)
      val corpus = withCell.select($"vec_id".as("c_id"), $"cell", codes.as("code"))
      val qtab = array((0 until PqM).map { m =>
        val sub = slice($"e", m * PqSub + 1, PqSub)
        array(pqBooks(m).map(cb => dotD(sub, array(cb.map(lit): _*))): _*)
      }: _*)
      val q = withCell.filter($"vec_id" < NumQueries)
        .withColumn("dots", dotsCol)
        .withColumn("best", array_position($"dots", array_max($"dots")).cast("int"))
        .withColumn("masked",
          zip_with($"dots", sequence(lit(1), lit(NumCells)),
            (x, i) => when(i === $"best", lit(-1e18)).otherwise(x)))
        .withColumn("second",
          array_position($"masked", array_max($"masked")).cast("int"))
        .select($"vec_id".as("q_id"), qtab.as("qtab"),
          explode(array($"best", $"second")).as("cell"))
      val adcCol = (0 until PqM).map { m =>
        element_at(element_at($"qtab", m + 1), element_at($"code", m + 1) + 1)
      }.reduce(_ + _)
      val short = corpus.join(broadcast(q), Seq("cell")).filter($"c_id" =!= $"q_id")
        .withColumn("adc", adcCol)
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"adc", $"c_id", 3 * K).as("top"))
        .select($"q_id", explode($"top.id").as("c_id"))
      val cside = v.select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"))
      val qside = v.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"))
      short.join(cside, Seq("c_id")).join(broadcast(qside), Seq("q_id"))
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("c_id"), $"col.score".as("cosine"))
        .orderBy($"q_id", $"rank")
    }, {
      val subDotLists = (0 until PqM).map { m =>
        val off = m * PqSub
        pqBooks(m).map { cb =>
          val cl = cb.mkString("[", ", ", "]")
          s"list_reduce(list_transform(generate_series(1, $PqSub), i -> e[$off + i]*($cl)[i]), (x, y) -> x + y)"
        }.mkString("[", ", ", "]")
      }.mkString("[", ", ", "]")
      val adcSql = (1 to PqM)
        .map(m => s"q.qtab[$m][c.code[$m] + 1]").mkString(" + ")
      Some(s"""
      WITH n AS ($duckNormed),
      b AS (SELECT vec_id, e, nrm, dots,
          CAST(list_position(dots, list_max(dots)) AS INTEGER) AS cell
        FROM (SELECT vec_id, e, nrm, $anchorDotsSql AS dots FROM n)),
      enc AS (SELECT vec_id AS c_id, cell,
          list_transform($subDotLists, ds -> list_position(ds, list_max(ds)) - 1) AS code
        FROM b),
      q AS (SELECT vec_id AS q_id, $subDotLists AS qtab,
          unnest([cell, second]) AS cell
        FROM (SELECT *, CAST(list_position(masked, list_max(masked)) AS INTEGER) AS second
          FROM (SELECT *, list_transform(dots,
              (x, i) -> CASE WHEN i = cell THEN -1e18 ELSE x END) AS masked
            FROM b WHERE vec_id < $NumQueries))),
      adc AS (SELECT q.q_id, c.c_id, $adcSql AS adc
        FROM q JOIN enc c ON q.cell = c.cell AND c.c_id != q.q_id),
      short AS (SELECT q_id, c_id FROM (
          SELECT q_id, c_id,
            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc DESC, c_id) AS rn
          FROM adc)
        WHERE rn <= ${3 * K}),
      rer AS (SELECT s.q_id, s.c_id,
          ${duckDot("qv.e", "cv.e")} / (qv.nrm * cv.nrm) AS cosine
        FROM short s JOIN n qv ON qv.vec_id = s.q_id JOIN n cv ON cv.vec_id = s.c_id)
      SELECT q_id, CAST(rn AS BIGINT) AS rank, c_id, cosine FROM (
        SELECT q_id, c_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
        FROM rer)
      WHERE rn <= $K ORDER BY q_id, rank""")
    }),

    // C47 ---------------------------------------------------------------
    // Cluster profiling: the corpus-composition report driving
    // cluster-level curation (DCLM / SemDeDup practice — inspect each
    // embedding cluster's size, language spread and length profile, then
    // up/down-weight whole clusters). Cells come from the SAME trained
    // quantizer as ann_ivf_trained; documents join their vectors on
    // doc_id = vec_id. Scale shape: assignment is the broadcast-centroid
    // map-only fold, the doc↔vector join is id-keyed (metadata columns
    // only — text never moves), and the profile aggregate is cell-grained.
    GQ("cluster_profile", (s, d) => {
      import s.implicits._
      val v = normed(s, d).persist()
      val cents = trainLloyd2(s, v)
      val withCell = assignByCentroids(v, cents).select($"vec_id", $"cell")
      val docs = table(s, d, "documents")
        .select($"doc_id", $"lang", $"source", $"n_chars")
      val out = docs.join(withCell, docs("doc_id") === withCell("vec_id"))
        .groupBy($"cell")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"lang").as("n_langs"),
          countDistinct($"source").as("n_sources"),
          sum($"n_chars").as("sum_chars"),
          (sum($"n_chars").cast("double") / count(lit(1)).cast("double")).as("avg_chars"))
        .orderBy($"cell")
      v.unpersist()
      out
    }, Some(s"""
      WITH n AS ($duckNormed),
      $trainedCtes
      SELECT cell, COUNT(*) AS n_docs,
        COUNT(DISTINCT lang) AS n_langs,
        COUNT(DISTINCT source) AS n_sources,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        CAST(SUM(n_chars) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS avg_chars
      FROM a2 JOIN documents d ON d.doc_id = a2.vec_id
      GROUP BY cell ORDER BY cell""")),

    // C49 ---------------------------------------------------------------
    // Embedding-dimension health report: per-dimension mean and variance
    // across the corpus — the diagnostic that catches dead (zero-
    // variance), collapsed or dominant dimensions before they poison an
    // index (anisotropy is THE failure mode of learned embeddings).
    // Elements are scaled to integer micro-units so the moments sum
    // EXACTLY (decimal(38,0) ≡ HUGEINT, B28's trick — no float-order
    // drift at any parallelism); mean/variance come from one closed-form
    // double formula. ONE wide aggregation (Dim×2 sums + count, the
    // centroidsOf shape): map-side partials shuffle 129 numbers total,
    // regardless of corpus size; the 64-row report explodes from that
    // single aggregate row.
    GQ("embed_dim_stats", (s, d) => {
      import s.implicits._
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      def u(i: Int) = round(element_at($"e", i + 1) * lit(1000000.0)).cast("long")
      val sums = (0 until Dim).flatMap(i => Seq(
        sum(dec(u(i))).as(s"s$i"),
        sum(dec(u(i) * u(i))).as(s"q$i")))
      val aggs = sums :+ count(lit(1)).as("n")
      val one = normed(s, d).agg(aggs.head, aggs.tail: _*)
      val nD = $"n".cast("double")
      val rows = array((0 until Dim).map { i =>
        val s1 = col(s"s$i").cast("double")
        val s2 = col(s"q$i").cast("double")
        struct(lit(i).as("dim"),
          (s1 / nD / lit(1000000.0)).as("mean"),
          ((nD * s2 - s1 * s1) / (nD * (nD - lit(1.0)))
            / lit(1000000.0) / lit(1000000.0)).as("variance"))
      }: _*)
      one.select($"n", explode(rows).as("r"))
        .select($"r.dim".as("dim"), $"n", $"r.mean".as("mean"),
          $"r.variance".as("variance"))
        .orderBy($"dim")
    }, Some(s"""
      WITH n AS ($duckNormed),
      el AS (SELECT u.i - 1 AS dim,
               CAST(round(e[u.i] * 1000000.0) AS BIGINT) AS x
             FROM n, (SELECT unnest(generate_series(1, $Dim)) AS i) u),
      m AS (SELECT dim, COUNT(*) AS n,
              SUM(CAST(x AS HUGEINT)) AS s1,
              SUM(CAST(x * x AS HUGEINT)) AS s2
            FROM el GROUP BY dim)
      SELECT CAST(dim AS INTEGER) AS dim, n,
        CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mean,
        (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
          / 1000000.0 / 1000000.0 AS variance
      FROM m ORDER BY dim""")),

    // C56 ---------------------------------------------------------------
    // Embedding cross-dimension covariance report (the anisotropy /
    // redundant-dimension diagnostic C49's per-dim variances can't see:
    // two dimensions can each look healthy while encoding the same
    // signal). Scale shape: ONE partial-aggregated pass — MomentVector
    // packs u_i and the strict upper-triangle products u_i·u_j (exact
    // integer micro-units) into a 2080-long vector per row, and
    // LongVectorSumAgg ships ONE such vector per map task across the
    // shuffle, so the corpus scan cost is independent of the 2016 pair
    // count (vs exploding pairs per row: 2016× the shuffle). The tiny
    // (k -> pair) lookup attaches by broadcast to the single result row;
    // output = top-20 pairs by |covariance|. All sums exact integers,
    // final doubles in pinned operation order — DuckDB replays them
    // bit-identically from an explicit pair explosion.
    GQ("embed_covariance", (s, d) => {
      import s.implicits._
      val nPairs = Dim * (Dim - 1) / 2
      val mv = org.apache.spark.sql.GraftShims.column(
        graft.functions.MomentVector(
          org.apache.spark.sql.GraftShims.expression($"e"), Dim))
      val one = normed(s, d).select(mv.as("mv"))
        .agg(count(lit(1)).as("n"),
          graft.functions.LongVectorSumAgg($"mv", Dim + nPairs).as("v"))
      val pairs = (for { i <- 0 until Dim; j <- (i + 1) until Dim } yield (i, j))
        .zipWithIndex.map { case ((i, j), k) => (k, i, j) }
        .toDF("k", "dim_i", "dim_j")
      val nD = $"n".cast("double")
      one.crossJoin(broadcast(pairs))
        .withColumn("si", element_at($"v", $"dim_i" + 1).cast("double"))
        .withColumn("sj", element_at($"v", $"dim_j" + 1).cast("double"))
        .withColumn("sij", element_at($"v", $"k" + lit(Dim + 1)).cast("double"))
        .withColumn("cov",
          (nD * $"sij" - $"si" * $"sj") / (nD * (nD - lit(1.0)))
            / lit(1000000.0) / lit(1000000.0))
        .select($"dim_i", $"dim_j", $"n", $"cov")
        .orderBy(abs($"cov").desc, $"dim_i", $"dim_j")
        .limit(20)
    }, Some(s"""
      WITH n0 AS ($duckNormed),
      u AS (SELECT list_transform(range(1, ${Dim + 1}),
              i -> CAST(round(e[i]*1000000.0) AS BIGINT)) AS u FROM n0),
      p AS (SELECT a.i, b.j
            FROM (SELECT unnest(generate_series(1, $Dim)) AS i) a,
                 (SELECT unnest(generate_series(1, $Dim)) AS j) b
            WHERE a.i < b.j),
      s AS (SELECT i, j, COUNT(*) AS n,
              SUM(CAST(u[i] AS HUGEINT)) AS si,
              SUM(CAST(u[j] AS HUGEINT)) AS sj,
              SUM(CAST(u[i]*u[j] AS HUGEINT)) AS sij
            FROM u, p GROUP BY i, j)
      SELECT CAST(i - 1 AS INTEGER) AS dim_i, CAST(j - 1 AS INTEGER) AS dim_j,
        n,
        (CAST(n AS DOUBLE) * CAST(sij AS DOUBLE)
            - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE))
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
          / 1000000.0 / 1000000.0 AS cov
      FROM s ORDER BY abs(cov) DESC, dim_i, dim_j LIMIT 20""")),

    // C58 ---------------------------------------------------------------
    // ANN recall calibration: recall@K of the nprobe=1 anchor-cell IVF
    // search against the exact brute-force top-K — the number that
    // decides whether an ANN config is usable at scale (C48 plays the
    // same role for MinHash). Both legs are the existing scale shapes
    // (broadcast queries + bounded top-K partial aggregates; the IVF leg
    // touches ~1/cells of the corpus), so the report costs two bounded
    // scans and an 8-row join. Ties at the K boundary break (score desc,
    // id asc) in BOTH engines, so the K-sets — and the intersection —
    // match exactly.
    GQ("ann_recall_report", (s, d) => {
      import s.implicits._
      val v = normed(s, d)
      def topIds(scored: DataFrame): DataFrame =
        scored.groupBy($"q_id")
          .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
          .select($"q_id", expr("transform(top, x -> x.id)").as("ids"))
      val qe = v.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"))
      val exact = topIds(
        v.select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"))
          .join(broadcast(qe), $"c_id" =!= $"q_id")
          .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn")))
        .withColumnRenamed("ids", "e_ids")
      val dots = array(anchors.map(a => dotD($"e", array(a.map(lit): _*))): _*)
      val withCell = v.withColumn("cell",
        array_position(dots, array_max(dots)).cast("int"))
      // the approx leg runs against the CELL-BUCKETED layout: recall is
      // measured on the same pruned-I/O path a production probe takes
      // (the exact leg, by definition, must scan everything)
      val idxDir = QueryDefs.scratchDir("graft-ivf-recall-index")
      val index = writeCellIndexed(s,
        withCell.select($"cell", $"vec_id", $"e", $"nrm"), idxDir)
      val qa = index.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"), $"cell")
      val probed = qa.select($"cell").distinct().as[Int].collect().toSeq.sorted
      val approx = topIds(
        index.where($"cell".isInCollection(probed))
          .select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"), $"cell")
          .join(broadcast(qa), Seq("cell")).filter($"c_id" =!= $"q_id")
          .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn")))
        .withColumnRenamed("ids", "a_ids")
      val res = exact.join(approx, Seq("q_id"), "left")
        .withColumn("n_approx",
          coalesce(size($"a_ids"), lit(0)).cast("long"))
        .withColumn("n_hit",
          coalesce(size(array_intersect($"e_ids", $"a_ids")), lit(0)).cast("long"))
        .withColumn("recall", $"n_hit".cast("double") / lit(K.toDouble))
        .select($"q_id", $"n_approx", $"n_hit", $"recall")
        .orderBy($"q_id")
        .transform(stableCheckpoint)
      deleteTree(idxDir)
      res
    }, {
      val dotsSql = anchors.map(a => duckDot("e", a.mkString("[", ", ", "]")))
        .mkString("[", ", ", "]")
      Some(s"""
      WITH n AS ($duckNormed),
      ex AS (SELECT q_id, c_id FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.e", "c.e")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rn
          FROM n q JOIN n c ON q.vec_id < $NumQueries AND c.vec_id != q.vec_id)
        WHERE rn <= $K),
      b AS (SELECT vec_id, e, nrm,
          CAST(list_position(dots, list_max(dots)) AS INTEGER) AS cell
        FROM (SELECT vec_id, e, nrm, $dotsSql AS dots FROM n)),
      ap AS (SELECT q_id, c_id FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.e", "c.e")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rn
          FROM b q JOIN b c ON q.cell = c.cell
            AND q.vec_id < $NumQueries AND c.vec_id != q.vec_id)
        WHERE rn <= $K),
      hits AS (SELECT e.q_id,
          CAST(COUNT(a.c_id) AS BIGINT) AS n_hit
        FROM ex e LEFT JOIN ap a ON e.q_id = a.q_id AND e.c_id = a.c_id
        GROUP BY e.q_id),
      na AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_approx
             FROM ap GROUP BY q_id)
      SELECT h.q_id, COALESCE(na.n_approx, 0) AS n_approx, h.n_hit,
        CAST(h.n_hit AS DOUBLE) / ${K}.0 AS recall
      FROM hits h LEFT JOIN na ON h.q_id = na.q_id
      ORDER BY h.q_id""")
    }),

    // C63 ---------------------------------------------------------------
    // nprobe sweep: the recall/cost CURVE of the trained IVF index —
    // recall@K and scanned-candidate count for nprobe ∈ {1,2,4} against
    // the exact top-K, from the SAME trained quantizer as C37/C39. This
    // is the calibration table an operator reads to pick nprobe at
    // 100 TB: scanned grows ~linearly with nprobe (nprobe/C of the
    // corpus per query), recall converges to 1 — the knee is the
    // operating point. Candidates are computed ONCE with each cell's
    // probe rank attached; each sweep point is a filter over that
    // checkpointed pair set, so the corpus is scanned once, not three
    // times.
    GQ("ann_nprobe_curve", (s, d) => {
      import s.implicits._
      val v = normed(s, d).persist()
      val cents = trainLloyd2(s, v)
      // the corpus lands CELL-BUCKETED (replacing the r15 checkpoint as
      // the shared materialization), so every sweep point's candidate
      // read is the real pruned-I/O operating point the curve calibrates
      val idxDir = QueryDefs.scratchDir("graft-ivf-curve-index")
      val index = writeCellIndexed(s,
        assignByCentroids(v, cents).select($"cell", $"vec_id", $"e", $"nrm"),
        idxDir)
      v.unpersist()
      val qe = index.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"))
      // the exact baseline needs the whole corpus by definition — and is
      // NQ rows once reduced, checkpointed so the scratch index can go
      val exact = index
        .select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"))
        .join(broadcast(qe), $"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
        .select($"q_id", expr("transform(top, x -> x.id)").as("e_ids"))
        .transform(stableCheckpoint)
      // per-query probe order over the trained centroids (NQ×C rows)
      val probes = index.filter($"vec_id" < NumQueries)
        .crossJoin(broadcast(centroidsRow(s, cents)))
        .select($"vec_id".as("q_id"), $"e".as("qv"), explode($"__cents").as("ct"))
        .withColumn("d2", $"ct.cc" - lit(2.0) * dotD($"qv", $"ct.c"))
        .withColumn("prank", row_number().over(
          Window.partitionBy($"q_id").orderBy($"d2", $"ct.cell")))
        .filter($"prank" <= 4)
        .select($"q_id", $"ct.cell".as("cell"), $"prank")
      // union of probed cells at the deepest sweep point — the candidate
      // read prunes to those cells' files; at corpus scale (C growing
      // with N) this is ~4·NQ/C of the bytes, not a full scan
      val probedCells = probes.select($"cell").distinct().as[Int].collect().toSeq.sorted
      val cand = index.where($"cell".isInCollection(probedCells))
        .select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"), $"cell")
        .join(broadcast(probes), Seq("cell"))
        .filter($"c_id" =!= $"q_id")
        .join(broadcast(qe), Seq("q_id"))
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .select($"q_id", $"c_id", $"prank", $"cosine")
        .transform(stableCheckpoint)
      deleteTree(idxDir)
      val curve = Seq(1, 2, 4).map { np =>
        val ap = cand.filter($"prank" <= np)
          .groupBy($"q_id")
          .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"),
            count(lit(1)).as("scanned_q"))
          .select($"q_id", expr("transform(top, x -> x.id)").as("a_ids"), $"scanned_q")
        // NQ-row fusion join: broadcast explicitly — aggregate outputs
        // carry no stats, so the planner would otherwise sort-merge it
        exact.join(broadcast(ap), Seq("q_id"), "left")
          .agg(
            coalesce(sum($"scanned_q"), lit(0L)).as("scanned"),
            coalesce(sum(coalesce(
              size(array_intersect($"e_ids", $"a_ids")).cast("long"), lit(0L))),
              lit(0L)).as("n_hit"))
          .select(lit(np).as("nprobe"), $"scanned", $"n_hit",
            ($"n_hit".cast("double") / lit((NumQueries * K).toDouble)).as("recall"))
      }
      curve.reduce(_ unionByName _).orderBy($"nprobe")
    }, Some(s"""
      WITH n AS ($duckNormed),
      $trainedCtes,
      ex AS (SELECT q_id, c_id FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.e", "c.e")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rn
          FROM n q JOIN n c ON q.vec_id < $NumQueries AND c.vec_id != q.vec_id)
        WHERE rn <= $K),
      probes AS (SELECT q_id, cell, prank FROM (
          SELECT v.vec_id AS q_id, c.cell,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
              ${duckDot("c.c", "c.c")} - 2*${duckDot("v.e", "c.c")}, c.cell) AS prank
          FROM n v, c2 c WHERE v.vec_id < $NumQueries)
        WHERE prank <= 4),
      cand AS (SELECT p.q_id, c.vec_id AS c_id, p.prank,
          ${duckDot("q.e", "c.e")} / (q.nrm * c.nrm) AS cosine
        FROM probes p
        JOIN a2 c ON c.cell = p.cell AND c.vec_id != p.q_id
        JOIN n q ON q.vec_id = p.q_id),
      nps AS (SELECT unnest([1, 2, 4]) AS np),
      ap AS (SELECT np, q_id, c_id FROM (
          SELECT nps.np, cand.q_id, cand.c_id,
            ROW_NUMBER() OVER (PARTITION BY nps.np, cand.q_id
              ORDER BY cand.cosine DESC, cand.c_id) AS rn
          FROM nps, cand WHERE cand.prank <= nps.np)
        WHERE rn <= $K),
      sc AS (SELECT nps.np, CAST(COUNT(*) AS BIGINT) AS scanned
             FROM nps, cand WHERE cand.prank <= nps.np GROUP BY nps.np),
      hits AS (SELECT a.np, CAST(COUNT(*) AS BIGINT) AS n_hit
               FROM ap a JOIN ex e ON a.q_id = e.q_id AND a.c_id = e.c_id
               GROUP BY a.np)
      SELECT CAST(s.np AS INTEGER) AS nprobe, s.scanned,
        COALESCE(h.n_hit, CAST(0 AS BIGINT)) AS n_hit,
        CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / ${NumQueries * K}.0 AS recall
      FROM sc s LEFT JOIN hits h ON s.np = h.np
      ORDER BY nprobe""")),

    // C65 ---------------------------------------------------------------
    // SQ8 scalar quantization — the 8x-memory-reduction scan path for
    // 100 TB ANN (Faiss SQ8 / Lucene int8 HNSW class): each dimension
    // linearly maps to an 8-bit code against per-dim corpus (min, max);
    // search is ASYMMETRIC (full-precision query against decoded
    // candidates), reported as the quantized top-K per query with a
    // per-row hit flag vs the exact top-K. Scale shape: the quantizer
    // is a MODEL ARTIFACT — one aggregation producing 2x64 doubles,
    // attached as ONE broadcast row (zero plan literals); codes shrink
    // the candidate scan 8x (64 B vs 512 B per vector), which is the
    // whole win when the scan is memory-bandwidth-bound; decode happens
    // once per CANDIDATE ROW, never per (query, candidate) pair. The
    // quantize→decode arithmetic (round to 0..255, rescale) is ordered
    // identically in the oracle, so scores are bit-identical.
    GQ("ann_sq8", (s, d) => {
      import s.implicits._
      val v = normed(s, d)
      val prm = v.agg(
        array((1 to Dim).map(i => min(element_at($"e", i))): _*).as("mn"),
        array((1 to Dim).map(i => max(element_at($"e", i))): _*).as("mx"))
      val dec = v.crossJoin(broadcast(prm))
        .withColumn("de", transform(sequence(lit(1), lit(Dim)), i => {
          val mn = element_at($"mn", i)
          val w = greatest(element_at($"mx", i) - mn, lit(1e-12))
          mn + round((element_at($"e", i) - mn) / w * lit(255.0)) / lit(255.0) * w
        }))
        .select($"vec_id", $"e", $"nrm", $"de",
          sqrt(dotD($"de", $"de")).as("dn"))
      val q = v.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"))
      val approx = dec.select($"vec_id".as("c_id"), $"de".as("ce"), $"dn".as("cn"))
        .join(broadcast(q), $"c_id" =!= $"q_id")
        .withColumn("cos8", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cos8", $"c_id", K).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("c_id"), $"col.score".as("cos_sq8"))
      val exact = v.select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"))
        .join(broadcast(q), $"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
        .select($"q_id", explode($"top.id").as("c_id"), lit(true).as("hit0"))
      // both sides are Q×K rows by construction — the hit join is a
      // broadcast at any corpus size
      approx.join(broadcast(exact), Seq("q_id", "c_id"), "left")
        .select($"q_id", $"rank", $"c_id", $"cos_sq8",
          coalesce($"hit0", lit(false)).as("hit"))
        .orderBy($"q_id", $"rank")
    }, bench = true, oracle = Some(s"""
      WITH n AS ($duckNormed),
      prm AS (
        SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx
        FROM (SELECT u.i AS i, MIN(e[u.i]) AS mn, MAX(e[u.i]) AS mx
              FROM n, (SELECT unnest(generate_series(1, $Dim)) AS i) u
              GROUP BY 1)),
      dec AS (
        SELECT vec_id,
          list_transform(generate_series(1, $Dim), i ->
            p.mn[i] + round((e[i] - p.mn[i]) / greatest(p.mx[i] - p.mn[i], 1e-12) * 255.0)
              / 255.0 * greatest(p.mx[i] - p.mn[i], 1e-12)) AS de
        FROM n, prm p),
      d2 AS (SELECT vec_id, de, sqrt(${duckDot("de", "de")}) AS dn FROM dec),
      p8 AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          ${duckDot("q.e", "c.de")} / (q.nrm * c.dn) AS cos8
        FROM n q JOIN d2 c ON q.vec_id < $NumQueries AND c.vec_id != q.vec_id),
      a AS (SELECT q_id, c_id, cos8,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos8 DESC, c_id) AS rn
            FROM p8),
      ex AS (SELECT q_id, c_id FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.e", "c.e")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rn
          FROM n q JOIN n c ON q.vec_id < $NumQueries AND c.vec_id != q.vec_id)
        WHERE rn <= $K)
      SELECT a.q_id, CAST(a.rn AS BIGINT) AS rank, a.c_id, a.cos8 AS cos_sq8,
        (e.c_id IS NOT NULL) AS hit
      FROM a LEFT JOIN ex e ON a.q_id = e.q_id AND a.c_id = e.c_id
      WHERE a.rn <= $K ORDER BY a.q_id, rank""")),

    // C66 ---------------------------------------------------------------
    // PQ ADC SEARCH — the other end of the ANN compression spectrum
    // (C65's SQ8 is 8×; PQ codes are 4 bytes/vector here, 128×): each
    // vector stores only its M=4 per-subspace code (argmax dot against
    // the fixed ±1 codebooks, = argmin L2 on equal-norm centroids, the
    // C34 encoder), and search is ASYMMETRIC DISTANCE COMPUTATION — per
    // query, one M×K lookup table of subspace dots, then a candidate's
    // score is M table lookups + adds, never a 64-dim dot. The ±1
    // codebooks make every reconstruction norm EXACTLY sqrt(64) = 8, so
    // approximate cosine = Σ_m LUT[m][code_m] / (|q|·8). Scale shape:
    // the candidate scan reads 4-byte codes (the 100 TB corpus fits a
    // memory tier 128× smaller), LUTs are query-side data (Q×M×K
    // doubles broadcast with the queries), encode runs once per row.
    // Reported as quantized top-K with per-row hit flags vs the exact
    // top-K, same contract as ann_sq8 — the PQ point on the same
    // recall/compression curve.
    GQ("ann_pq_adc", (s, d) => {
      import s.implicits._
      val v = normed(s, d)
      def subDots(m: Int): Column = {
        val sub = slice($"e", m * PqSub + 1, PqSub)
        array(pqBooks(m).map(c => dotD(sub, array(c.map(lit): _*))): _*)
      }
      val codes = array((0 until PqM).map { m =>
        val dots = subDots(m)
        (array_position(dots, array_max(dots)) - 1).cast("int")
      }: _*)
      val c = v.select($"vec_id".as("c_id"), codes.as("codes"))
      val q = v.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"),
          array((0 until PqM).map(subDots): _*).as("lut"),
          $"nrm".as("qn"), $"e".as("qe"))
      val score = (0 until PqM).map(m =>
          element_at(element_at($"lut", m + 1), element_at($"codes", m + 1) + 1))
        .reduce(_ + _) / ($"qn" * lit(8.0))
      val approx = c.join(broadcast(q.select($"q_id", $"lut", $"qn")), $"c_id" =!= $"q_id")
        .withColumn("cos_pq", score)
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cos_pq", $"c_id", K).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("c_id"), $"col.score".as("cos_pq"))
      val exact = v.select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"))
        .join(broadcast(q.select($"q_id", $"qe", $"qn")), $"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
        .select($"q_id", explode($"top.id").as("c_id"), lit(true).as("hit0"))
      approx.join(broadcast(exact), Seq("q_id", "c_id"), "left")
        .select($"q_id", $"rank", $"c_id", $"cos_pq",
          coalesce($"hit0", lit(false)).as("hit"))
        .orderBy($"q_id", $"rank")
    }, {
      def subDotList(e: String, m: Int): String = {
        val off = m * PqSub
        pqBooks(m).map { cbk =>
          val cl = cbk.mkString("[", ", ", "]")
          s"list_reduce(list_transform(generate_series(1, $PqSub), i -> ($e)[$off + i]*($cl)[i]), (x, y) -> x + y)"
        }.mkString("[", ", ", "]")
      }
      def lutOf(e: String): String =
        (0 until PqM).map(m => subDotList(e, m)).mkString("[", ", ", "]")
      val score = (0 until PqM)
        .map(m => s"q.lut[${m + 1}][c.codes[${m + 1}] + 1]").mkString(" + ")
      Some(s"""
      WITH n AS ($duckNormed),
      codes AS (
        SELECT vec_id, list_transform(${lutOf("e")},
          dots -> CAST(list_position(dots, list_max(dots)) - 1 AS INTEGER)) AS codes
        FROM n),
      ql AS (SELECT vec_id, ${lutOf("e")} AS lut, nrm FROM n
             WHERE vec_id < $NumQueries),
      pq AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          ($score) / (q.nrm * 8.0) AS cos_pq
        FROM ql q JOIN codes c ON c.vec_id != q.vec_id),
      a AS (SELECT q_id, c_id, cos_pq,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_pq DESC, c_id) AS rn
            FROM pq),
      ex AS (SELECT q_id, c_id FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.e", "c.e")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rn
          FROM n q JOIN n c ON q.vec_id < $NumQueries AND c.vec_id != q.vec_id)
        WHERE rn <= $K)
      SELECT a.q_id, CAST(a.rn AS BIGINT) AS rank, a.c_id, a.cos_pq,
        (e.c_id IS NOT NULL) AS hit
      FROM a LEFT JOIN ex e ON a.q_id = e.q_id AND a.c_id = e.c_id
      WHERE a.rn <= $K ORDER BY a.q_id, rank""")
    }),

    // C67 (r17) ----------------------------------------------------------
    // MAINTAINED ANN index with incremental admission: the index is
    // built ONCE from batch 1 (train + centroid table + cell-partitioned
    // layout), batch 2 is ADMITTED against the STORED centroids (no
    // retrain — the amortization ann_ivf_trained pays for per query),
    // and the probe runs over the union through the same partition-
    // pruned read. The oracle trains its quantizer on batch 1 ONLY and
    // assigns everything against it — a retrained-on-admit index (or an
    // admission that re-assigned resident vectors) hash-mismatches.
    GQ("ann_index_admit", (s, d) => {
      import s.implicits._
      val v = normed(s, d).persist()
      val b1 = v.filter(pmod($"vec_id", lit(2)) === 0)
      val b2 = v.filter(pmod($"vec_id", lit(2)) === 1)
      val dir = QueryDefs.scratchDir("graft-ann-maintained")
      Similarity.buildIndex(s, b1.select($"vec_id", $"e", $"nrm"), dir.toString)
      Similarity.admitBatch(s, b2.select($"vec_id", $"e", $"nrm"), dir.toString)
      v.unpersist()
      val index = Similarity.readIndex(s, dir.toString)
      // SEARCH over the maintained union: probed-cell set is O(#queries)
      // ints on the driver; the candidate read opens only probed cells'
      // files (admitted batches landed inside the same partitions)
      val q = index.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"), $"cell")
      val probed = q.select($"cell").distinct().as[Int].collect().toSeq.sorted
      val c = index.where($"cell".isInCollection(probed))
        .select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"), $"cell")
      val res = c.join(broadcast(q), Seq("cell")).filter($"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("c_id"), $"col.score".as("cosine"))
        .orderBy($"q_id", $"rank")
        // materialize the K×Q-row result so the scratch index can go
        .transform(stableCheckpoint)
      deleteTree(dir)
      res
    }, Some(s"""
      WITH n AS ($duckNormed),
      n1 AS (SELECT vec_id, e, nrm FROM n WHERE vec_id % 2 = 0),
      ${trainedOn("n1")},
      aall AS (${assignSql("c2", "n")}),
      q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, cell
            FROM aall WHERE vec_id < $NumQueries),
      scored AS (SELECT q.q_id, c.vec_id AS c_id,
          ${duckDot("q.qe", "c.e")} / (q.qn * c.nrm) AS cosine
        FROM q JOIN aall c ON q.cell = c.cell AND c.vec_id != q.q_id)
      SELECT q_id, CAST(rn AS BIGINT) AS rank, c_id, cosine FROM (
        SELECT q_id, c_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
        FROM scored)
      WHERE rn <= $K ORDER BY q_id, rank""")),

    // C69 -----------------------------------------------------------------
    // INDEX DELETION — the GDPR path of the maintained index: removal
    // requests become deletion vectors on the cell-partitioned corpus
    // (merge-on-read: the in-query REQUIREs pin that no index file is
    // rewritten or added and that descriptors appear), and the SAME
    // probe as ann_index_admit then runs over the shrunken index — the
    // DuckDB oracle recomputes top-k with the deleted vectors absent, so
    // a stale row (DV not honored by the probe), an over-delete, or a
    // rewrite that breaks cell pruning all hash-fail.
    GQ("ann_index_delete", (s, d) => {
      import s.implicits._
      val v = normed(s, d).persist()
      val b1 = v.filter(pmod($"vec_id", lit(2)) === 0)
      val b2 = v.filter(pmod($"vec_id", lit(2)) === 1)
      val dir = QueryDefs.scratchDir("graft-ann-deleted")
      Similarity.buildIndex(s, b1.select($"vec_id", $"e", $"nrm"), dir.toString)
      Similarity.admitBatch(s, b2.select($"vec_id", $"e", $"nrm"), dir.toString)
      v.unpersist()
      val cellsLog = graft.delta.DeltaTable
        .forPath(s, s"${dir.toString}/cells").deltaLog
      val beforePaths = cellsLog.update().allFiles.map(_.path).toSet
      Similarity.deleteFromIndex(s, dir.toString,
        pmod(col("vec_id"), lit(7)) === 3)
      val after = cellsLog.update().allFiles
      require(after.map(_.path).toSet.subsetOf(beforePaths),
        "index deletion must not rewrite files (merge-on-read contract)")
      require(after.exists(_.deletionVector != null),
        "index deletion must attach deletion vectors")
      val index = Similarity.readIndex(s, dir.toString)
      val q = index.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"), $"cell")
      val probed = q.select($"cell").distinct().as[Int].collect().toSeq.sorted
      val c = index.where($"cell".isInCollection(probed))
        .select($"vec_id".as("c_id"), $"e".as("ce"), $"nrm".as("cn"), $"cell")
      val res = c.join(broadcast(q), Seq("cell")).filter($"c_id" =!= $"q_id")
        .withColumn("cosine", dotD($"qe", $"ce") / ($"qn" * $"cn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions.topKByScore($"cosine", $"c_id", K).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("c_id"), $"col.score".as("cosine"))
        .orderBy($"q_id", $"rank")
        .transform(stableCheckpoint)
      deleteTree(dir)
      res
    }, Some(s"""
      WITH n AS ($duckNormed),
      n1 AS (SELECT vec_id, e, nrm FROM n WHERE vec_id % 2 = 0),
      ${trainedOn("n1")},
      aall AS (${assignSql("c2", "n")}),
      live AS (SELECT * FROM aall WHERE vec_id % 7 <> 3),
      q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, cell
            FROM live WHERE vec_id < $NumQueries),
      scored AS (SELECT q.q_id, c.vec_id AS c_id,
          ${duckDot("q.qe", "c.e")} / (q.qn * c.nrm) AS cosine
        FROM q JOIN live c ON q.cell = c.cell AND c.vec_id != q.q_id)
      SELECT q_id, CAST(rn AS BIGINT) AS rank, c_id, cosine FROM (
        SELECT q_id, c_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
        FROM scored)
      WHERE rn <= $K ORDER BY q_id, rank""")),

    // D19 -----------------------------------------------------------------
    // STREAMING ANN ADMISSION — C67 composed with the D-family: pending
    // vector batches arrive as commits of a graft-Delta table, a
    // graft-delta STREAM drives foreachBatch admission against the STORED
    // quantizer, and each admission commits through the exactly-once
    // streaming sink (SetTransaction appId+batchId), so a REPLAYED
    // micro-batch is a no-op — the closure replays batch 0 explicitly and
    // a double-admission would hash-fail the oracle. The oracle pins the
    // core invariant: the final streamed index EQUALS the batch-built one
    // (every vector assigned against the batch-1-trained quantizer; a
    // retrain-on-admit or a resident reassignment mismatches). Drift is
    // trended after each admission (cell populations only grow).
    GQ("stream_ann_admit", (s, d) => {
      import s.implicits._
      val v = normed(s, d).persist()
      val b1 = v.filter(pmod($"vec_id", lit(2)) === 0)
      val rest = v.filter(pmod($"vec_id", lit(2)) === 1)
      val dir = QueryDefs.scratchDir("graft-ann-stream")
      Similarity.buildIndex(s, b1.select($"vec_id", $"e", $"nrm"), dir.toString)
      // pending admissions: TWO commits -> two micro-batches
      val pend = QueryDefs.scratchDir("graft-ann-pending").toString
      val pt = graft.delta.DeltaTable.forPath(s, pend)
      val r1 = rest.filter(pmod($"vec_id", lit(4)) === 1)
      val r3 = rest.filter(pmod($"vec_id", lit(4)) === 3)
      pt.write(r1.select($"vec_id", $"e", $"nrm").coalesce(1))
      pt.write(r3.select($"vec_id", $"e", $"nrm").coalesce(1))
      v.unpersist()
      var lastN = 0L
      val stream = s.readStream
        .format("graft.streaming.DeltaStreamSourceProvider")
        .option("path", pend)
        .option("maxFilesPerTrigger", "1")
        .load()
      val q = stream.writeStream.foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          Similarity.admitStreamBatch(s, batch, dir.toString,
            "stream_ann_admit", batchId)
          // drift trend after each admission: populations only grow
          val n = Similarity.centroidDrift(s, dir.toString)
            .agg(sum($"n")).collect().head.getLong(0)
          require(n >= lastN, s"index shrank during admission: $n < $lastN")
          lastN = n
          ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      // REPLAY batch 0 (a post-failure re-delivery): the idempotent txn
      // makes it a no-op — a double-admission would change the index
      // content and hash-fail this oracle
      val replayed = Similarity.admitStreamBatch(s,
        r1.select($"vec_id", $"e", $"nrm"), dir.toString,
        "stream_ann_admit", 0L)
      require(!replayed, "replayed micro-batch must be a no-op")
      // the final streamed index content: every vector, its assigned cell
      val res = Similarity.readIndex(s, dir.toString)
        .select($"cell".cast("int").as("cell"), $"vec_id")
        .orderBy($"vec_id")
        .transform(stableCheckpoint)
      deleteTree(dir)
      deleteTree(java.nio.file.Paths.get(pend))
      res
    }, Some(s"""
      WITH n AS ($duckNormed),
      n1 AS (SELECT vec_id, e, nrm FROM n WHERE vec_id % 2 = 0),
      ${trainedOn("n1")},
      aall AS (${assignSql("c2", "n")})
      SELECT CAST(cell AS INTEGER) AS cell, vec_id FROM aall ORDER BY vec_id"""))
  )
}
