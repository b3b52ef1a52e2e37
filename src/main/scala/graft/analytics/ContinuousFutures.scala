package graft.analytics

import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Continuous-futures construction (SURVEY §2.10 D1–D3): dominant /
  * secondary contract selection, back-adjustment factor series, and the
  * adjusted continuous table.
  *
  * Semantics follow the reference's clean rewrite
  * (/root/reference/tasks/wind/future_reorg/reversion_rights_factor.py:94-211):
  * per instrument type, scan trade dates in order; the main contract is
  * the one with max `switch_by` (volume/open-interest/warrant) among
  * contracts whose last-trade-date ≥ the current main's — the contract
  * id only rolls forward, never back. The secondary must expire strictly
  * later than the main. On a roll, the adjustment ratio
  * `close_new/close_old` (division) or difference (diff) is taken at the
  * last available date; factors are reverse-cumulated so the latest date
  * has factor 1 (or 0).
  *
  * The scan is inherently sequential per instrument type, so it runs as
  * `groupByKey(instrumentType).flatMapGroups` over date-sorted rows — one
  * shuffle on the type, per-group state in a handful of fields, group
  * size bounded by (years × contracts), which holds at any corpus scale
  * since types are few thousand at most and independent.
  */
object ContinuousFutures {

  /** Internal scan row: dates as epoch-day ints, not `java.sql.Date` —
    * the group scan decodes every bar row on the driver of its group,
    * and Date encoder conversions dominate that decode at 500k+ rows.
    */
  case class Bar(instrument_type: String, instrument_id: String,
      trade_date: Int, close: Option[Double],
      switch_by: Option[Double], last_trade_date: Int)

  /** Output rows use nullable `String` (null = no secondary), not
    * `Option[String]`: the Option accessor defeats Janino compilation of
    * the product `UnsafeProjection`, dropping every emitted row to
    * interpreter-mode projection — a constant-factor tax on the hottest
    * domain pipeline. A nullable field encodes to the identical SQL NULL.
    */
  case class Selection(instrument_type: String, trade_date: java.sql.Date,
      main_id: String, secondary_id: String)

  case class FactorRow(instrument_type: String, trade_date: java.sql.Date,
      instrument_id_main: String, adj_factor_main: Double,
      instrument_id_secondary: String, adj_factor_secondary: Double)

  sealed trait Method { def neutral: Double }
  case object Division extends Method { val neutral = 1.0 }
  case object Diff extends Method { val neutral = 0.0 }

  private case class DayData(date: Int, // rows with switch_by, ordered by maturity
      bySwitch: Seq[(String, Double)], closes: Map[String, Double])

  private def toSqlDate(epochDay: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(epochDay.toLong))

  /** Run the per-type scan producing (daily selections, factor rows). */
  private def scanType(instrumentType: String, bars: Iterator[Bar], method: Method)
      : (Seq[Selection], Seq[FactorRow]) = {
    val all = bars.toArray
    val maturity: Map[String, Int] =
      all.groupBy(_.instrument_id).map { case (id, rs) =>
        id -> rs.head.last_trade_date
      }
    def earlier(a: String, b: String): Boolean = maturity(a) < maturity(b)
    val days: Array[DayData] = all.groupBy(_.trade_date).toArray
      .sortBy(_._1)
      .map { case (d, rs) =>
        // (maturity, id) order: the id tie-break pins the scan order when
        // several contracts share a last-trade date, so the selection is
        // deterministic and mirrorable by the DuckDB oracle.
        val bySwitch = rs.filter(_.switch_by.isDefined)
          .sortBy(r => (maturity(r.instrument_id), r.instrument_id))
          .map(r => r.instrument_id -> r.switch_by.get).toSeq
        val closes = rs.flatMap(r => r.close.map(r.instrument_id -> _)).toMap
        DayData(d, bySwitch, closes)
      }

    var main: Option[String] = None
    var sec: Option[String] = None
    val selections = mutable.ArrayBuffer[Selection]()
    val factors = mutable.ArrayBuffer[(Int, String, Option[Double], Option[String], Option[Double])]()
    var available = mutable.ArrayBuffer[DayData]() // days with data, in order
    for (day <- days; if day.bySwitch.nonEmpty) {
      val sw = day.bySwitch.toMap
      val (mainLast, secLast) = (main, sec)
      for ((id, v) <- day.bySwitch) {
        if (!(main.isDefined && earlier(id, main.get))) {
          // main: first candidate, or strictly larger switch_by
          if (main.isEmpty) main = Some(id)
          else if (!sw.contains(main.get) || sw(main.get) < v) {
            main = Some(id)
            if (sec.isDefined && (main.get == sec.get || earlier(sec.get, main.get)))
              sec = None
          }
          // secondary: must expire later than... (reference: any non-main
          // candidate seeds it; upgrades need strictly larger switch_by)
          if (sec.isEmpty) {
            if (!main.contains(id)) sec = Some(id)
          } else if (earlier(sec.get, id) && sw.contains(sec.get) && sw(sec.get) < v)
            sec = Some(id)
        }
      }
      // roll detected → factor at the last available date
      if (mainLast.isDefined && mainLast != main && available.nonEmpty) {
        val prevDay = available.last
        val chg = for {
          cNew <- prevDay.closes.get(main.get)
          cOld <- prevDay.closes.get(mainLast.get)
        } yield if (method == Division) cNew / cOld else cNew - cOld
        chg.filter(v => !v.isNaN && !v.isInfinite).foreach { v =>
          factors += ((prevDay.date, mainLast.get, Some(v), None, None))
        }
      }
      if (secLast.isDefined && sec.isDefined && secLast != sec && available.nonEmpty) {
        val prevDay = available.last
        val chg = for {
          cNew <- prevDay.closes.get(sec.get)
          cOld <- prevDay.closes.get(secLast.get)
        } yield if (method == Division) cNew / cOld else cNew - cOld
        chg.filter(v => !v.isNaN && !v.isInfinite).foreach { v =>
          // merge with a main-roll row on the same date if present
          factors.lastOption match {
            case Some((d, m0, f0, _, _)) if d == prevDay.date =>
              factors(factors.length - 1) = (d, m0, f0, Some(secLast.get), Some(v))
            case _ =>
              factors += ((prevDay.date, main.get, None, Some(secLast.get), Some(v)))
          }
        }
      }
      available += day
      main.foreach(m => selections += Selection(instrumentType, toSqlDate(day.date), m, sec.orNull))
    }
    // latest date carries the neutral factor
    val lastRows: Seq[(Int, String, Option[Double], Option[String], Option[Double])] =
      (available.lastOption, main, sec) match {
        case (Some(day), Some(m), s) =>
          Seq((day.date, m, Some(method.neutral), s, Some(method.neutral)))
        case _ => Seq.empty
      }
    // reverse-chronological cumulation so the latest factor is neutral
    val raw = (factors.filterNot(f => lastRows.exists(_._1 == f._1)) ++ lastRows)
      .sortBy(-_._1)
    var accM = method.neutral
    var accS = method.neutral
    var lastMainId: Option[String] = None
    var lastSecId: Option[String] = None
    val out = raw.map { case (d, mainId, fM, secId, fS) =>
      accM = method match {
        case Division => accM * fM.getOrElse(1.0)
        case Diff => accM + fM.getOrElse(0.0)
      }
      accS = method match {
        case Division => accS * fS.getOrElse(1.0)
        case Diff => accS + fS.getOrElse(0.0)
      }
      lastMainId = Some(mainId)
      lastSecId = secId.orElse(lastSecId)
      (d, FactorRow(instrumentType, toSqlDate(d), mainId, accM, lastSecId.orNull, accS))
    }.sortBy(_._1).map(_._2)
    (selections.toSeq, out.toSeq)
  }

  private def toBars(spark: SparkSession, bars: DataFrame): org.apache.spark.sql.Dataset[Bar] = {
    import spark.implicits._
    bars.select(
      col("instrument_type").cast("string"),
      col("instrument_id").cast("string"),
      unix_date(col("trade_date").cast("date")).as("trade_date"),
      col("close").cast("double"),
      col("switch_by").cast("double"),
      unix_date(col("last_trade_date").cast("date")).as("last_trade_date")).as[Bar]
  }

  /** D1 — per-day (main, secondary) contract selection. */
  def dailySelection(spark: SparkSession, bars: DataFrame): DataFrame = {
    import spark.implicits._
    toBars(spark, bars).groupByKey(_.instrument_type)
      .flatMapGroups((t, it) => scanType(t, it, Division)._1.iterator)(Encoders.product[Selection])
      .toDF()
  }

  /** D2 — back-adjustment factor series (sparse: one row per roll date
    * plus the latest date; apply as-of backward). */
  def adjFactors(spark: SparkSession, bars: DataFrame, method: Method = Division): DataFrame = {
    import spark.implicits._
    toBars(spark, bars).groupByKey(_.instrument_type)
      .flatMapGroups((t, it) => scanType(t, it, method)._2.iterator)(Encoders.product[FactorRow])
      .toDF()
  }

  /** D3 — continuous series: the main contract's bar each day, with and
    * without back-adjustment. Factor rows apply to all dates ≤ their
    * roll date (reverse as-of), latest factor = neutral.
    */
  /** One flatMapGroups pass emitting selections (kind=0) and factor rows
    * (kind=1) together — `continuousSeries` needs both, and running the
    * per-type scan once halves its shuffle + decode cost.
    */
  /** Public, not `private`: Janino's generated `UnsafeProjection` lives
    * outside this package, and scalac emits a private nested case class
    * as package-private bytecode — codegen then can't invoke the
    * accessors and every row falls back to interpreter-mode projection.
    */
  case class ScanOut(kind: Int, instrument_type: String,
      trade_date: java.sql.Date, main_id: String, secondary_id: String,
      adj_factor_main: Double, adj_factor_secondary: Double)

  /** @param cacheInput persist `bars` for the duration of the call. Pass
    *   false when the input is already materialized (a table scan or a
    *   caller-managed cache) — re-scanning it per branch is then cheaper
    *   than building an InMemoryRelation of it.
    */
  def continuousSeries(spark: SparkSession, bars: DataFrame,
      method: Method = Division, cacheInput: Boolean = true): DataFrame = {
    import spark.implicits._
    // The scan and the md join both consume `bars`; persist so Spark
    // doesn't re-evaluate the upstream aggregation DAG per branch (the
    // bar table is the per-(contract, day) rollup — small relative to
    // its source).
    val callerCached = !cacheInput ||
      bars.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached = if (callerCached) bars else bars.persist()
    val scanned = toBars(spark, cached).groupByKey(_.instrument_type)
      .flatMapGroups { (t, it) =>
        val (sels, facs) = scanType(t, it, method)
        sels.iterator.map(s =>
          ScanOut(0, s.instrument_type, s.trade_date, s.main_id, s.secondary_id, 0.0, 0.0)) ++
        facs.iterator.map(f =>
          ScanOut(1, f.instrument_type, f.trade_date, f.instrument_id_main,
            f.instrument_id_secondary, f.adj_factor_main, f.adj_factor_secondary))
      }(Encoders.product[ScanOut])
      .toDF().persist()
    scanned.count()
    val sel = scanned.filter(col("kind") === 0)
      .select(col("instrument_type"), col("trade_date"), col("main_id"),
        col("secondary_id"))
    val fac = scanned.filter(col("kind") === 1)
      .select(col("instrument_type"), col("trade_date").as("factor_date"),
        col("adj_factor_main"))
    val md = cached.select(col("instrument_type"), col("instrument_id").as("bar_id"),
      col("trade_date").cast("date").as("trade_date"), col("close").cast("double"))
    val joined = sel.join(md, Seq("instrument_type", "trade_date"))
      .where(col("bar_id") === col("main_id"))
      .select(col("instrument_type"), col("trade_date"), col("main_id"), col("close"))
    // Factor valid for dates ≤ roll date → as-of forward: for each daily
    // row take the earliest factor_date ≥ trade_date. Negate dates to
    // reuse the backward as-of kernel — the NATIVE one
    // (plans/AsOfJoinPlan): same contract as AsOfJoin.asofBackward
    // (differentially pinned), one streamed merge per co-partition
    // instead of union + window.
    val joinedNeg = joined.withColumn("neg_d", -unix_date(col("trade_date")))
    val facNeg = fac.withColumn("neg_fd", -unix_date(col("factor_date")))
    val applied = graft.plans.AsOfJoinPlan.asofBackwardNative(joinedNeg, facNeg,
      Seq("instrument_type"),
      leftTime = "neg_d", rightTime = "neg_fd", valueCols = Seq("adj_factor_main"))
    val adj = method match {
      case Division => col("close") * coalesce(col("adj_factor_main"), lit(1.0))
      case Diff => col("close") + coalesce(col("adj_factor_main"), lit(0.0))
    }
    val result = applied.withColumn("close_adj", adj)
      .select("instrument_type", "trade_date", "main_id", "close", "adj_factor_main", "close_adj")
      .persist()
    // Pin the (one row per type×day — small) result, then free the two
    // corpus-sized intermediates; without this every call leaks both
    // caches for the session lifetime.
    result.count()
    if (!callerCached) cached.unpersist()
    scanned.unpersist()
    result
  }
}
