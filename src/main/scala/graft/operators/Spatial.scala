package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives for the point-enrichment shapes (nearest
  * facility, catchment assignment, radius search) that health-program
  * pipelines like the reference run between facility registries and
  * population tables — re-expressed as grid-bucketed equi-joins so the
  * candidate set per point is O(cell density), never the cross product.
  *
  * The 100 TB posture: a radius join between two point tables is the
  * classic accidental-cartesian. Bucketing both sides into radius-sized
  * grid cells and expanding the PROBE side to its 3×3 cell neighborhood
  * turns it into a plain equi-join on (cell_lat, cell_lon) — one shuffle,
  * AQE-skew-splittable, and the exact haversine predicate only evaluates
  * on co-located candidates. Cell coverage is provable: two points within
  * `radiusKm` differ by less than one cell in each axis (the cell edge is
  * at least the radius in km at the worst latitude the caller declares),
  * so the match is always inside the neighborhood.
  */
object Spatial {

  /** Mean Earth radius (IUGG), km — the standard haversine constant. */
  final val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between two (degree) coordinate pairs —
    * the haversine formula, built entirely from codegen'd trig built-ins
    * (no UDF). `least(1.0, sqrt(...))` clamps the antipodal rounding case.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val sdlat = sin(radians(lat2 - lat1) / 2)
    val sdlon = sin(radians(lon2 - lon1) / 2)
    val a = sdlat * sdlat + cos(radians(lat1)) * cos(radians(lat2)) * sdlon * sdlon
    lit(2 * EarthRadiusKm) * asin(least(lit(1.0), sqrt(a)))
  }

  /** All (probe, point) pairs within `radiusKm`, with the distance
    * attached as `distCol`. Both inputs keep all their columns (the probe
    * side's under their own names — callers disambiguate beforehand).
    *
    * @param probe      left side; each of its rows is expanded to its 3×3
    *                   grid-cell neighborhood (choose the smaller table —
    *                   the 9× fan-out is on it)
    * @param points     right side; bucketed once, never expanded
    * @param maxAbsLat  bound on |latitude| across BOTH inputs; sizes the
    *                   longitude cell so a degree of longitude at the worst
    *                   latitude still spans at least `radiusKm`. Must be
    *                   < 89 (the grid degenerates at the poles; a polar cap
    *                   join is a different operator). Longitude wraparound
    *                   at ±180° IS bridged: the cell width divides 360°
    *                   exactly and neighbor ids wrap modulo the cell count,
    *                   so antimeridian-crossing pairs land in the same
    *                   bucket (uniform cells are what keep the 3×3
    *                   coverage proof valid at the seam — a final partial
    *                   cell would let a within-radius pair sit two cells
    *                   apart).
    * @param maxCell    optional per-cell cap on the POINTS side — the
    *                   spatial twin of [[FuzzyMatch.phoneticBlockJoin]]'s
    *                   maxBlock guard. A dense-city cell is the same
    *                   Σ|block|² hazard a hot phonetic code is: a cell
    *                   with B points genuinely contributes O(B²) true
    *                   candidate pairs, so past a caller-declared density
    *                   the join cost is the OUTPUT, not the plan. With
    *                   Some(m), cells holding more than m points drop
    *                   WHOLE (via [[Relational.capGroupSize]], dropped
    *                   counts logged to stderr) — probes near a dropped
    *                   cell lose those candidates, so use it as an
    *                   explicit density contract, not a tuning knob.
    *                   Default None: exact, every pair.
    * @param hotCellLimit the FLOOR of the default scale guard (r12 verdict
    *                   task 3, made scale-adaptive in r14): when `maxCell`
    *                   is None (no drop contract), the plan carries a
    *                   declarative hot-cell assertion — a cell-count
    *                   partial agg over `points`, broadcast back, and a
    *                   per-row `assert_true` that RAISES with the
    *                   offending cell and its measured count the moment
    *                   any cell exceeds the EFFECTIVE limit
    *                   max(hotCellLimit, 8·√N), N = total points. The √N
    *                   term is the blowup criterion, not a magic number: a
    *                   cell of B points contributes B² in-cell candidate
    *                   pairs, so B > 8·√N means the quadratic term alone
    *                   exceeds 64× the linear scan work — a genuine
    *                   skew/density hazard at any scale — while a large
    *                   but PROPORTIONALLY dense workload (city-scale data
    *                   with a big radius, where every cell holds ~N/cells
    *                   points) keeps clearing the guard as N grows. The
    *                   absolute floor keeps small inputs from tripping on
    *                   noise. Cost: one extra cell-count pass over
    *                   `points` (its agg output is #cells, tiny).
    *                   Accept a density explicitly by raising the floor,
    *                   disable with <= 0, or declare drops via `maxCell`
    *                   (which bounds cells outright, so the assertion is
    *                   unnecessary and skipped).
    */
  def radiusJoin(
      probe: DataFrame,
      points: DataFrame,
      probeLat: String,
      probeLon: String,
      pointLat: String,
      pointLon: String,
      radiusKm: Double,
      maxAbsLat: Double = 66.0,
      distCol: String = "dist_km",
      maxCell: Option[Long] = None,
      hotCellLimit: Long = 10000L): DataFrame = {
    require(radiusKm > 0, s"radiusKm must be > 0, got $radiusKm")
    require(maxAbsLat > 0 && maxAbsLat < 89.0,
      s"maxAbsLat must be in (0, 89), got $maxAbsLat")
    // km per degree: ~110.574 for latitude, ~111.320·cos(lat) for
    // longitude; 110.0 underestimates both, so cells are never smaller
    // than the radius (coverage proof needs >=, cells slightly larger
    // only cost a few extra exact-checked candidates)
    val cellLatDeg = radiusKm / 110.0
    val cellLonDegMin = radiusKm / (110.0 * math.cos(math.toRadians(maxAbsLat)))
    // longitude cells must tile the circle UNIFORMLY for the seam to be
    // sound: round the count down (cells get wider, never narrower)
    val nLon = math.max(1, math.floor(360.0 / cellLonDegMin).toInt)
    val cellLonDeg = 360.0 / nLon
    def cellOf(latC: Column, lonC: Column): (Column, Column) =
      (floor(latC / cellLatDeg).cast("long"),
        pmod(floor((lonC + 180.0) / cellLonDeg).cast("long"), lit(nLon.toLong)))

    val (pLat, pLon) = cellOf(points.col(pointLat), points.col(pointLon))
    val bucketed0 = points.withColumn("__clat", pLat).withColumn("__clon", pLon)
    val capped = maxCell.fold(bucketed0)(m =>
      Relational.capGroupSize(bucketed0, Seq("__clat", "__clon"), m))
    // Default hot-cell guard: assert (declaratively, inside the plan — no
    // driver-side action) that no cell exceeds max(hotCellLimit, 8·√N)
    // points before the 3×3 join fans out. The hot table is empty in the
    // healthy case, so the broadcast left join costs a hash probe per row.
    val bucketed = if (maxCell.isEmpty && hotCellLimit > 0) {
      val cellCounts = bucketed0
        .groupBy(col("__clat"), col("__clon"))
        .agg(count(lit(1)).as("__cellN"))
      // effective limit = max(floor, 8·√N): only cells whose quadratic
      // pair term dwarfs the linear scan work raise (see scaladoc) — the
      // total rides as the repo-standard 1-row broadcast scalar combine
      // (shows as the plan's single BroadcastNestedLoopJoin; PlanSpec
      // pins exactly one, so data-join degradation still fails loudly)
      val tot = cellCounts.agg(sum(col("__cellN")).as("__totN"))
      val hot = cellCounts
        .crossJoin(broadcast(tot))
        .filter(col("__cellN").cast("double") >
          greatest(lit(hotCellLimit.toDouble),
            lit(8.0) * sqrt(col("__totN").cast("double"))))
        .withColumnRenamed("__clat", "__hlat")
        .withColumnRenamed("__clon", "__hlon")
      capped
        .join(broadcast(hot),
          col("__clat") === col("__hlat") && col("__clon") === col("__hlon"),
          "left")
        .filter(assert_true(
          col("__cellN").isNull,
          concat(
            lit("radiusJoin: grid cell ("), col("__hlat"), lit(", "),
            col("__hlon"), lit(") holds "), col("__cellN"),
            lit(" of "), col("__totN"),
            lit(s" points > max(hotCellLimit=$hotCellLimit, 8*sqrt(N)) — a " +
              "cell this dense contributes O(B²) candidate pairs; raise " +
              "hotCellLimit to accept the density explicitly, or set " +
              "maxCell to drop hot cells whole"))).isNull)
        .drop("__hlat", "__hlon", "__cellN", "__totN")
    } else capped

    val (qLat, qLon) = cellOf(probe.col(probeLat), probe.col(probeLon))
    // wrapped 3×3 neighborhood; array_distinct collapses the self-overlap
    // a tiny grid (nLon < 3) would otherwise duplicate join rows through
    val cells = array_distinct(array((-1 to 1).flatMap(i => (-1 to 1).map(j =>
      struct(
        (qLat + lit(i.toLong)).as("clat"),
        pmod(qLon + lit(j.toLong), lit(nLon.toLong)).as("clon")))): _*))
    val expanded = probe
      .withColumn("__o", explode(cells))
      .withColumn("__clat", col("__o.clat"))
      .withColumn("__clon", col("__o.clon"))
      .drop("__o")

    val d = haversineKm(
      expanded.col(probeLat), expanded.col(probeLon),
      bucketed.col(pointLat), bucketed.col(pointLon))
    expanded
      .join(bucketed, Seq("__clat", "__clon"))
      .withColumn(distCol, d)
      .filter(col(distCol) <= radiusKm)
      .drop("__clat", "__clon")
  }

  /** Nearest point within `radiusKm` per probe row (catchment assignment /
    * nearest-facility): the radius join shrunk to one winner per probe key
    * on the native bounded top-1 path (distance asc, then `tieCol` asc —
    * haversine over identical doubles is bit-identical on IEEE engines, so
    * the argmin is engine-deterministic). Probes with nothing in range are
    * absent from the output — the radius is the scale contract that keeps
    * this a bounded grid search rather than an unbounded global argmin.
    */
  def nearestWithin(
      probe: DataFrame,
      points: DataFrame,
      probeKey: String,
      probeLat: String,
      probeLon: String,
      pointLat: String,
      pointLon: String,
      radiusKm: Double,
      tieCol: String,
      maxAbsLat: Double = 66.0,
      maxCell: Option[Long] = None,
      hotCellLimit: Long = 10000L): DataFrame = {
    val cands = radiusJoin(probe, points, probeLat, probeLon, pointLat, pointLon,
      radiusKm, maxAbsLat, maxCell = maxCell, hotCellLimit = hotCellLimit)
    Relational.topKPerKey(cands, Seq(probeKey),
      Seq(("dist_km", false), (tieCol, false)), k = 1)
  }

  /** Full DBSCAN (Ester, Kriegel, Sander & Xu, KDD 1996) over geographic
    * points — the density-based clustering the single-linkage variant
    * (DBSCAN with minPts=1) cannot give: points with ≥ `minPts` neighbors
    * within `epsKm` (SELF INCLUDED, the paper's convention) are CORE;
    * clusters are the connected components of the core-core ε-graph;
    * non-core points within ε of a core are BORDER and join a cluster;
    * everything else is NOISE. Textbook DBSCAN assigns a border point
    * touching two clusters by scan order — irreproducible; here it joins
    * the cluster with the SMALLEST label (a fixed convention, engine- and
    * partitioning-deterministic).
    *
    * Scale shape: the ε-neighbor graph comes from ONE [[radiusJoin]]
    * self-join (grid-bucketed, never point×point), neighbor counts and
    * core flags are partial aggs on the pair table, components run
    * through the log-round star-contraction CC, and border assignment is
    * one more partial-agg min — no step touches a cartesian at any
    * cardinality. Returns one row per input point:
    * (idCol, role ∈ core|border|noise, cluster — NULL for noise).
    *
    * `idCol` must be an INTEGRAL type (the Graph-family node contract:
    * cluster labels are long min-ids from the CC step); string/UUID ids
    * would silently cast to NULL there, so they are rejected up front —
    * map them to dense longs (e.g. [[Relational.globalRowNumbers]] over
    * the distinct ids) before calling. */
  def dbscan(
      df: DataFrame,
      idCol: String,
      latCol: String,
      lonCol: String,
      epsKm: Double,
      minPts: Int,
      maxAbsLat: Double = 66.0,
      maxCell: Option[Long] = None,
      hotCellLimit: Long = 10000L): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    require(
      Set("tinyint", "smallint", "int", "bigint")
        .contains(df.schema(idCol).dataType.simpleString),
      s"dbscan requires an integral id column (the Graph node contract); " +
        s"'$idCol' is ${df.schema(idCol).dataType.simpleString} — map ids to " +
        "dense longs (Relational.globalRowNumbers) first")
    val probe = df.select(
      col(idCol).as("__pid"), col(latCol).as("__plat"), col(lonCol).as("__plon"))
    val pts = df.select(
      col(idCol).as("__qid"), col(latCol).as("__qlat"), col(lonCol).as("__qlon"))
    // materialize the ε-pair list ONCE (lazy, inside this query's own
    // execution): cores, coreEdges and border all re-derive `pairs`, and
    // without this the grid radius join — the expensive corpus-scale step
    // — re-executes per consumer (r14 measured: the q_dbscan plan carried
    // 72 Exchanges from the duplicated subtree). The pair list is
    // output-sized (bounded by the hot-cell guard), so holding it is the
    // cheap side of the trade at any scale.
    val pairs = radiusJoin(probe, pts, "__plat", "__plon", "__qlat", "__qlon",
      epsKm, maxAbsLat, maxCell = maxCell, hotCellLimit = hotCellLimit)
      .select(col("__pid"), col("__qid"))
      .localCheckpoint(false)
    val cores = pairs.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__ncnt"))
      .filter(col("__ncnt") >= minPts)
      .select(col("__pid").as("__core"))
    val coreEdges = pairs
      .join(cores.withColumnRenamed("__core", "__pid"), Seq("__pid"), "left_semi")
      .join(cores.withColumnRenamed("__core", "__qid"), Seq("__qid"), "left_semi")
      .filter(col("__pid") < col("__qid"))
      .select(col("__pid").as("u"), col("__qid").as("v"))
    val comp = Graph.connectedComponents(coreEdges, "u", "v")
    // node-count-sized and read twice (border assignment + final labeling)
    val coreLabel = cores
      .join(comp, cores("__core") === comp("id"), "left")
      .select(col("__core"),
        coalesce(col("component"), col("__core").cast("long")).as("__cl"))
      .localCheckpoint(false)
    val border = pairs
      .join(coreLabel.withColumnRenamed("__core", "__qid"), Seq("__qid"))
      .join(cores.withColumnRenamed("__core", "__pid"), Seq("__pid"), "left_anti")
      .groupBy(col("__pid"))
      .agg(min(col("__cl")).as("__bcl"))
    df.select(col(idCol))
      .join(coreLabel.withColumnRenamed("__core", "__cid"),
        col(idCol) === col("__cid"), "left")
      .join(border.withColumnRenamed("__pid", "__bid"),
        col(idCol) === col("__bid"), "left")
      .select(
        col(idCol),
        when(col("__cid").isNotNull, "core")
          .when(col("__bid").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("__cl"), col("__bcl")).as("cluster"))
  }

  /** Moran's I spatial autocorrelation (Moran 1950) — "do nearby points
    * carry similar values?", the inference readout completing the spatial
    * family above the join/cluster primitives (radius join finds
    * neighbors, DBSCAN finds density — Moran asks whether a MEASURE is
    * spatially structured at all, the question to answer before any
    * spatial model): I = (n/W)·Σ_{ij} w_ij z_i z_j / Σ z_i² with binary
    * within-ε weights from the grid [[radiusJoin]] (never point×point),
    * E[I] = −1/(n−1) beside it.
    *
    * EXACT-RATIONAL: with pre-quantized integral values, multiplying the
    * centered products through by n² gives Σ(n·xᵢ−S)(n·xⱼ−S) and
    * Σ(n·xᵢ−S)² as exact DECIMAL(38,0) sums, and I = n·num/(W·den) is ONE
    * double division of exact operands, 6-dp rounded. Constant values
    * (den = 0) or no neighbor pairs → NULL. */
  def moranI(
      df: DataFrame,
      idCol: String,
      latCol: String,
      lonCol: String,
      valueCol: String,
      epsKm: Double,
      maxAbsLat: Double = 66.0,
      maxCell: Option[Long] = None,
      hotCellLimit: Long = 10000L): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val base = df.select(col(idCol).as("__id"), col(latCol).as("__lat"),
      col(lonCol).as("__lon"), col(valueCol).cast("long").as("__x"))
      .filter(col("__x").isNotNull)
    val mom = base.agg(
      count(lit(1)).as("__n"), sum(dec(col("__x"))).as("__s"),
      sum(dec(col("__x")) * dec(col("__x"))).as("__ss"))
    val probe = base.select(col("__id").as("__pid"), col("__lat").as("__plat"),
      col("__lon").as("__plon"), col("__x").as("__px"))
    val pts = base.select(col("__id").as("__qid"), col("__lat").as("__qlat"),
      col("__lon").as("__qlon"), col("__x").as("__qx"))
    val pairs = radiusJoin(probe, pts, "__plat", "__plon", "__qlat", "__qlon",
        epsKm, maxAbsLat, maxCell = maxCell, hotCellLimit = hotCellLimit)
      .filter(col("__pid") =!= col("__qid"))
      .select(col("__px"), col("__qx"))
      .crossJoin(broadcast(mom))
    // (n·x_i − S)(n·x_j − S) summed exactly; W = directed pair count
    val zi = dec(col("__n")) * dec(col("__px")) - col("__s")
    val zj = dec(col("__n")) * dec(col("__qx")) - col("__s")
    val pAgg = pairs.agg(
      count(lit(1)).as("__w"),
      coalesce(sum(zi * zj), lit(0).cast("decimal(38,0)")).as("__num"))
    val agg = mom.crossJoin(broadcast(pAgg))
    // Σ(n·x − S)² = n²·Σx² − n·S² → n·Σx² − S² after dividing by n once;
    // keep the n²-scaled form to match the numerator's scaling
    val den = dec(col("__n")) * dec(col("__n")) * col("__ss") -
      dec(col("__n")) * col("__s") * col("__s")
    val iVal = (dec(col("__n")) * col("__num")).cast("double") /
      (dec(col("__w")) * den).cast("double")
    agg.select(
      col("__n").cast("long").as("n"),
      col("__w").as("n_pairs"),
      when(col("__n") > 1 && col("__w") > 0, when(den > 0, round(iVal, 6)))
        .as("moran_i"),
      when(col("__n") > 1,
        round(lit(-1.0) / (col("__n").cast("double") - 1.0), 6)).as("e_i"))
  }

  private val GeohashBase32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash (Niemeyer's public base-32 encoding): interleaved
    * longitude/latitude bisection bits, `precision` characters. The prefix
    * property (shared prefix ⟺ nearby, modulo cell-boundary effects) makes
    * it a storage-friendly spatial bucketing key: Z-order clustering,
    * prefix-range pruning, and join keys all work on plain strings. */
  def geohash(lat: Double, lon: Double, precision: Int): String = {
    // loud analysis-style error instead of an empty string or a
    // pathological loop on a bad literal; 12 chars already resolves ~4 cm
    require(precision >= 1 && precision <= 20,
      s"geohash precision must be in [1, 20], got $precision")
    val sb = new java.lang.StringBuilder(precision)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    var bits = 0; var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bits += 1
      if (bits == 5) { sb.append(GeohashBase32.charAt(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  /** Rectangle-overlap (bbox intersection) join on integer planar
    * coordinates — the geometry-pair primitive beneath map-matching /
    * region-containment workloads, in its scale-correct form: each
    * rectangle explodes to the grid cells it covers (fan-out =
    * ceil(extent/cell)² — pick `cellSize` near the median extent), the
    * pair search is then ONE equi-join on (cx, cy), and duplicate
    * reports from multi-cell overlaps are eliminated by the classic
    * REFERENCE-POINT rule (Dittrich & Seeger, ICDE 2000 — report a pair
    * only from the cell containing the overlap's lower-left corner),
    * which needs no distinct pass: dedup is a per-candidate predicate,
    * not a shuffle. Overlap test and reference point are exact long/
    * double arithmetic; no cross product at any cardinality.
    *
    * Column tuples are (xlo, xhi, ylo, yhi); both frames' OTHER columns
    * are carried through. Degenerate (touching) edges count as overlap. */
  def bboxJoin(
      left: DataFrame,
      right: DataFrame,
      leftCols: (String, String, String, String),
      rightCols: (String, String, String, String),
      cellSize: Long): DataFrame = {
    require(cellSize > 0, s"cellSize must be > 0, got $cellSize")
    val (lxlo, lxhi, lylo, lyhi) = leftCols
    val (rxlo, rxhi, rylo, ryhi) = rightCols
    def cell(c: Column): Column =
      floor(c.cast("double") / cellSize.toDouble).cast("long")
    def cover(df: DataFrame, xlo: String, xhi: String, ylo: String, yhi: String) =
      df.withColumn("__cx", explode(sequence(cell(col(xlo)), cell(col(xhi)))))
        .withColumn("__cy", explode(sequence(cell(col(ylo)), cell(col(yhi)))))
    val l = cover(left, lxlo, lxhi, lylo, lyhi)
    val r = cover(right, rxlo, rxhi, rylo, ryhi)
      .withColumnRenamed("__cx", "__rcx").withColumnRenamed("__cy", "__rcy")
    val refX = greatest(col(lxlo), col(rxlo))
    val refY = greatest(col(lylo), col(rylo))
    l.join(r, col("__cx") === col("__rcx") && col("__cy") === col("__rcy"))
      .filter(
        col(lxlo) <= col(rxhi) && col(rxlo) <= col(lxhi) &&
          col(lylo) <= col(ryhi) && col(rylo) <= col(lyhi) &&
          cell(refX) === col("__cx") && cell(refY) === col("__cy"))
      .drop("__cx", "__cy", "__rcx", "__rcy")
  }

  /** Geometric median per group (Weiszfeld 1937) — the L1-optimal facility
    * location, robust to outlier points where the centroid is not: fixed
    * IRLS sweeps from the quantized centroid, weights 1/dᵢ QUANTIZED to
    * `floor(1e9/d + 0.5)` longs (d is one sqrt from exact integer squared
    * distances), coordinate updates ratios of exact DECIMAL sums re-
    * quantized to the grid — every sweep bit-reproducible, the whole
    * refinement a chained-CTE SQL replay (the huberLocation discipline in
    * 2-D). Points exactly AT the current estimate get weight 0 (the
    * standard Weiszfeld guard, deterministic); a group collapsing to one
    * point keeps its previous estimate. Coordinates must be pre-quantized
    * integral units. */
  def geometricMedian(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val dec = "decimal(38,0)"
    val g = groupCols.map(col)
    val base = df.select(g ++ Seq(
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y")): _*)
    def gridMean(c: String): Column =
      floor(sum(col(c)).cast("double") / count(lit(1)) + 0.5).cast("long")
    var est = base.groupBy(g: _*)
      .agg(gridMean("__x").as("__mx"), gridMean("__y").as("__my"))
    for (_ <- 1 to iters) {
      val d = sqrt(((col("__x") - col("__mx")) * (col("__x") - col("__mx")) +
        (col("__y") - col("__my")) * (col("__y") - col("__my"))).cast("double"))
      val wq = when(d > 0, floor(lit(1e9) / d + 0.5).cast("long")).otherwise(lit(0L))
      def upd(c: String, prev: String): Column =
        when(sum(col("__wq")) > 0,
          floor(sum(col("__wq").cast(dec) * col(c).cast(dec)).cast("double") /
            sum(col("__wq")).cast("double") + 0.5).cast("long"))
          .otherwise(max(col(prev)))
      est = base.join(broadcast(est), groupCols)
        .withColumn("__wq", wq)
        .groupBy(g: _*)
        .agg(upd("__x", "__mx").as("__mx"), upd("__y", "__my").as("__my"))
    }
    val stats = base.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        gridMean("__x").as("centroid_x"), gridMean("__y").as("centroid_y"))
    stats.join(est, groupCols)
      .select(g ++ Seq(col("n"), col("centroid_x"), col("centroid_y"),
        col("__mx").as("median_x"), col("__my").as("median_y")): _*)
  }

  /** Point-in-polygon join — the catchment/zone-assignment shape (which
    * admin area contains this facility/customer?) completing the geometry
    * family next to [[radiusJoin]] (distance) and [[bboxJoin]]
    * (rectangles): every (point, polygon) pair where the point lies inside
    * the polygon, by exact-integer ray casting.
    *
    * Coordinates are LONGS on a caller-chosen grid (e.g. micro-degrees):
    * each edge's crossing test is the cross-multiplied form of
    * "px < x-intersection of the horizontal ray" —
    * (px−x1)·dy < (x2−x1)·(py−y1) with the inequality flipped when
    * dy < 0 — so the whole operator is integer compares, no division, no
    * epsilon, and any engine replays it bit-for-bit (|coord| ≲ 1.5e9
    * keeps every product inside a long). Boundary convention: the
    * half-open crossing rule ((y1>py) != (y2>py)) counts each vertex
    * exactly once and assigns edge-touching points deterministically.
    *
    * Scale shape: polygons are SMALL BY CONTRACT (admin boundaries, zones
    * — thousands, not billions) and broadcast with their precomputed
    * bounding boxes; the bbox range predicate prunes candidates inside
    * whole-stage codegen, and the ray cast folds over the vertex array as
    * a higher-order `aggregate` — a pure projection, ZERO shuffle on the
    * point side (the classic PIP-join mistake is exploding points ×
    * edges through a shuffle). `vertices` is an array<struct<x,y>> ring
    * (closing edge implied, no repeated last vertex). */
  def pointInPolygonJoin(
      points: DataFrame,
      xCol: String,
      yCol: String,
      polygons: DataFrame,
      verticesCol: String): DataFrame = {
    val vx: Column => Column = v => v.getField("x").cast("long")
    val vy: Column => Column = v => v.getField("y").cast("long")
    val prepped = polygons
      .withColumn("__minx", array_min(transform(col(verticesCol), vx)))
      .withColumn("__maxx", array_max(transform(col(verticesCol), vx)))
      .withColumn("__miny", array_min(transform(col(verticesCol), vy)))
      .withColumn("__maxy", array_max(transform(col(verticesCol), vy)))
    val px = col(xCol).cast("long")
    val py = col(yCol).cast("long")
    val cands = points.join(
      broadcast(prepped),
      px >= col("__minx") && px <= col("__maxx") &&
        py >= col("__miny") && py <= col("__maxy"))
    val nV = size(col(verticesCol))
    val crossings = aggregate(
      sequence(lit(0), nV - 1),
      lit(0L),
      (acc: Column, i: Column) => {
        val v1 = element_at(col(verticesCol), i + 1)
        val v2 = element_at(col(verticesCol), pmod(i + 1, nV) + 1)
        val (x1, y1, x2, y2) = (vx(v1), vy(v1), vx(v2), vy(v2))
        val dy = y2 - y1
        val straddles = (y1 > py) =!= (y2 > py)
        val leftOf = when(dy > 0, (px - x1) * dy < (x2 - x1) * (py - y1))
          .otherwise((px - x1) * dy > (x2 - x1) * (py - y1))
        acc + when(straddles && leftOf, 1L).otherwise(0L)
      })
    cands
      .filter(pmod(crossings, lit(2L)) === 1L)
      .drop("__minx", "__maxx", "__miny", "__maxy")
  }
}
