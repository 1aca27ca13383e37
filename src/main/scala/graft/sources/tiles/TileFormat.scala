package graft.sources.tiles

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** Storage layer of the `graft-tiles` DataSource V2 connector: a row-major
  * binary tile format plus a JSON manifest carrying per-tile zone maps
  * (min/max/null-count per column) — the same metadata shape an
  * Iceberg/Delta manifest keeps per data file, reduced to the minimum a
  * planner needs for file skipping.
  *
  * Design intent (SURVEY §2.1 connector surface, generalized): the point is
  * NOT the encoding — parquet already exists — it is the *connector
  * contract*. The manifest gives the DSv2 `Scan` everything it needs to
  *   (a) prune whole tiles at PLANNING time from pushed-down filters,
  *   (b) prune again at RUNTIME from join-key filters (DPP shape),
  *   (c) answer COUNT/MIN/MAX aggregates from metadata alone, and
  *   (d) report post-prune statistics so the optimizer can pick
  *       broadcast joins over the pruned size, not the raw size.
  * At 100 TB each tile is an object-store file and the manifest is the
  * metadata tail a driver can hold: pruning here removes whole input
  * partitions before any executor touches data.
  *
  * Zone-map pruning is conservative (no false negatives): a tile is
  * skipped only when its stats PROVE no row can match. Row-exact filtering
  * happens again inside the reader, so pushed filters are fully absorbed
  * (Spark sees an empty residual for the supported subset).
  */
object TileFormat {

  val Magic = 0x47544C31 // "GTL1"
  val ManifestName = "_graft_manifest.json"

  /** Test-only instrumentation: tiles physically opened by readers in this
    * JVM (local-mode suites assert skipped tiles were never opened). Not a
    * correctness surface — on a real cluster each executor has its own
    * counter and nothing reads it. */
  val tilesOpened = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-column zone-map entry. min/max are the string renderings of the
    * column's ordered domain (Long for integral/date/timestamp, Double for
    * double) and are absent for untracked types or all-null tiles. */
  final case class ColStats(min: Option[String], max: Option[String], nulls: Long)

  final case class TileMeta(file: String, rows: Long, bytes: Long,
                            stats: Map[String, ColStats])

  /** Parsed manifest. `lastEpoch` is the highest streaming epoch already
    * committed (-1 for batch-only tables): a replayed epoch commit after a
    * driver restart must be a no-op — the exactly-once contract of the
    * streaming sink. */
  final case class ManifestData(schema: StructType, tiles: Seq[TileMeta], lastEpoch: Long)

  /** Column types that carry min/max zone maps (ordered fixed-width
    * domains). Strings/booleans still track null counts. */
  def statTracked(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Supported column types; the table constructor rejects anything else
    * up front so unsupported schemas fail at analysis, not in a task. */
  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | DateType | TimestampType |
         TimestampNTZType | StringType | BooleanType => true
    case _ => false
  }

  // ------------------------------------------------------------- type tags

  final val TagInt = 0     // IntegerType, DateType (days)
  final val TagLong = 1    // LongType, TimestampType (micros)
  final val TagDouble = 2
  final val TagString = 3
  final val TagBool = 4

  def typeTag(dt: DataType): Int = dt match {
    case IntegerType | DateType => TagInt
    case LongType | TimestampType | TimestampNTZType => TagLong
    case DoubleType => TagDouble
    case StringType => TagString
    case BooleanType => TagBool
    case other => throw new IllegalArgumentException(s"graft-tiles: unsupported type $other")
  }

  // ------------------------------------------------------------ tile codec

  def openWriter(file: File): DataOutputStream = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(file), 1 << 16))
    out.writeInt(Magic)
    out
  }

  def openReader(file: File): DataInputStream = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(file), 1 << 16))
    val magic = in.readInt()
    require(magic == Magic, s"graft-tiles: bad magic 0x${magic.toHexString} in $file")
    tilesOpened.incrementAndGet()
    in
  }

  /** Read the next row into `dest` (catalyst-typed values, null for null).
    * Returns false on clean EOF before the first column. */
  def readRow(in: DataInputStream, tags: Array[Int], dest: Array[Any]): Boolean = {
    val first = in.read() // -1 on clean EOF
    if (first < 0) return false
    var i = 0
    while (i < tags.length) {
      val present = if (i == 0) first == 1 else in.readByte() == 1
      dest(i) =
        if (!present) null
        else (tags(i): @annotation.switch) match {
          case TagInt => in.readInt()
          case TagLong => in.readLong()
          case TagDouble => in.readDouble()
          case TagString =>
            val n = in.readInt()
            val b = new Array[Byte](n)
            in.readFully(b)
            UTF8String.fromBytes(b)
          case TagBool => in.readBoolean()
        }
      i += 1
    }
    true
  }

  // -------------------------------------------------------------- manifest

  def writeManifest(dir: String, schema: StructType, tiles: Seq[TileMeta],
                    lastEpoch: Long = -1L): Unit = {
    val json: JValue =
      ("version" -> 1) ~
        ("schema" -> schema.json) ~
        ("last_epoch" -> lastEpoch) ~
        ("tiles" -> tiles.map { t =>
          ("file" -> t.file) ~ ("rows" -> t.rows) ~ ("bytes" -> t.bytes) ~
            ("stats" -> JObject(t.stats.toList.sortBy(_._1).map { case (c, s) =>
              c -> (("min" -> s.min) ~ ("max" -> s.max) ~ ("nulls" -> s.nulls))
            }))
        })
    val tmp = Paths.get(dir, ManifestName + ".tmp")
    Files.createDirectories(Paths.get(dir))
    Files.write(tmp, JsonMethods.pretty(JsonMethods.render(json)).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readManifest(dir: String): Option[ManifestData] = {
    val p = Paths.get(dir, ManifestName)
    if (!Files.exists(p)) return None
    implicit val formats: Formats = DefaultFormats
    val j = JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    val schema = DataType.fromJson((j \ "schema").extract[String]).asInstanceOf[StructType]
    val tiles = (j \ "tiles") match {
      case JArray(arr) => arr.map { t =>
        val stats = (t \ "stats") match {
          case JObject(fields) => fields.map { case (name, s) =>
            name -> ColStats((s \ "min").extractOpt[String], (s \ "max").extractOpt[String],
              (s \ "nulls").extract[Long])
          }.toMap
          case _ => Map.empty[String, ColStats]
        }
        TileMeta((t \ "file").extract[String], (t \ "rows").extract[Long],
          (t \ "bytes").extract[Long], stats)
      }
      case _ => Nil
    }
    val lastEpoch = (j \ "last_epoch").extractOpt[Long].getOrElse(-1L)
    Some(ManifestData(schema, tiles, lastEpoch))
  }

  // ------------------------------------------------- literal normalization

  /** Normalize a pushed-filter literal into the Long domain of an
    * integral/date/timestamp column. None = untranslatable (treat the
    * filter as unsupported — safe). */
  def litToLong(dt: DataType, v: Any): Option[Long] = (dt, v) match {
    case (IntegerType | LongType, i: java.lang.Integer) => Some(i.longValue)
    case (IntegerType | LongType, l: java.lang.Long) => Some(l.longValue)
    case (IntegerType | LongType, s: java.lang.Short) => Some(s.longValue)
    case (IntegerType | LongType, b: java.lang.Byte) => Some(b.longValue)
    case (DateType, d: java.time.LocalDate) => Some(d.toEpochDay)
    case (DateType, d: java.sql.Date) => Some(d.toLocalDate.toEpochDay)
    case (TimestampType, t: java.time.Instant) =>
      Some(Math.multiplyExact(t.getEpochSecond, 1000000L) + t.getNano / 1000L)
    case (TimestampType, t: java.sql.Timestamp) =>
      Some(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case (TimestampNTZType, t: java.time.LocalDateTime) =>
      Some(Math.multiplyExact(t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L) +
        t.getNano / 1000L)
    case _ => None
  }

  def litToDouble(v: Any): Option[Double] = v match {
    case d: java.lang.Double => Some(d.doubleValue)
    case f: java.lang.Float => Some(f.doubleValue)
    case i: java.lang.Integer => Some(i.doubleValue)
    case l: java.lang.Long => Some(l.doubleValue)
    case d: java.math.BigDecimal => Some(d.doubleValue)
    case d: scala.math.BigDecimal => Some(d.doubleValue)
    case _ => None
  }

  /** Spark SQL double ordering for filters: -0.0 equals 0.0 (primitive ==),
    * NaN equals NaN and sorts largest (Double.compare fallback). */
  def cmpDouble(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  def litToUtf8(v: Any): Option[UTF8String] = v match {
    case s: String => Some(UTF8String.fromString(s))
    case u: UTF8String => Some(u)
    case _ => None
  }

  // ------------------------------------------------------ row-exact filter

  /** Compile a pushed filter into a 3-valued predicate over a fully parsed
    * row (catalyst values). None = the filter shape/type is unsupported and
    * must stay residual. Top-level semantics: a row is kept iff the result
    * is Some(true) — exactly SQL's WHERE over nullable columns. */
  def compilePredicate(schema: StructType, f: Filter): Option[Array[Any] => Option[Boolean]] = {
    val idx = schema.fieldNames.zipWithIndex.toMap

    // comparator closure: row => sign(rowValue cmp literal), None when null
    def cmp(attr: String, lit: Any): Option[Array[Any] => Option[Int]] =
      idx.get(attr).flatMap { i =>
        schema.fields(i).dataType match {
          case dt @ (IntegerType | DateType) =>
            litToLong(dt, lit).map(lv => (row: Array[Any]) =>
              Option(row(i)).map(x => java.lang.Long.compare(x.asInstanceOf[Int].toLong, lv)))
          case dt @ (LongType | TimestampType | TimestampNTZType) =>
            litToLong(dt, lit).map(lv => (row: Array[Any]) =>
              Option(row(i)).map(x => java.lang.Long.compare(x.asInstanceOf[Long], lv)))
          case DoubleType =>
            litToDouble(lit).map(lv => (row: Array[Any]) =>
              Option(row(i)).map(x => cmpDouble(x.asInstanceOf[Double], lv)))
          case StringType =>
            litToUtf8(lit).map(lv => (row: Array[Any]) =>
              Option(row(i)).map(x => x.asInstanceOf[UTF8String].compareTo(lv)))
          case _ => None
        }
      }

    f match {
      case EqualTo(a, v) => cmp(a, v).map(c => row => c(row).map(_ == 0))
      case GreaterThan(a, v) => cmp(a, v).map(c => row => c(row).map(_ > 0))
      case GreaterThanOrEqual(a, v) => cmp(a, v).map(c => row => c(row).map(_ >= 0))
      case LessThan(a, v) => cmp(a, v).map(c => row => c(row).map(_ < 0))
      case LessThanOrEqual(a, v) => cmp(a, v).map(c => row => c(row).map(_ <= 0))
      case In(a, vs) =>
        // SQL IN: true on a match; unknown (row dropped) when no match but
        // the row value or a list element is null; false otherwise
        if (vs == null) None
        else {
          val nonNull = vs.filter(_ != null)
          val compiled = nonNull.map(v => cmp(a, v))
          if (compiled.exists(_.isEmpty)) None // untranslatable literal: stay residual
          else {
            val cs = compiled.flatten
            val hasNullLit = nonNull.length != vs.length
            Some { row =>
              var sawUnknown = hasNullLit
              var matched = false
              var i = 0
              while (i < cs.length && !matched) {
                cs(i)(row) match {
                  case Some(0) => matched = true
                  case None => sawUnknown = true
                  case _ => ()
                }
                i += 1
              }
              if (matched) Some(true) else if (sawUnknown) None else Some(false)
            }
          }
        }
      case IsNull(a) => idx.get(a).map(i => (row: Array[Any]) => Some(row(i) == null))
      case IsNotNull(a) => idx.get(a).map(i => (row: Array[Any]) => Some(row(i) != null))
      case And(l, r) =>
        for (cl <- compilePredicate(schema, l); cr <- compilePredicate(schema, r)) yield { (row: Array[Any]) =>
          (cl(row), cr(row)) match {
            case (Some(false), _) | (_, Some(false)) => Some(false)
            case (Some(true), Some(true)) => Some(true)
            case _ => None
          }
        }
      case Or(l, r) =>
        for (cl <- compilePredicate(schema, l); cr <- compilePredicate(schema, r)) yield { (row: Array[Any]) =>
          (cl(row), cr(row)) match {
            case (Some(true), _) | (_, Some(true)) => Some(true)
            case (Some(false), Some(false)) => Some(false)
            case _ => None
          }
        }
      case Not(c) => compilePredicate(schema, c).map(g => (row: Array[Any]) => g(row).map(!_))
      case _ => None
    }
  }

  // ---------------------------------------------------------- zone pruning

  private def parsedRange(dt: DataType, s: ColStats): Option[(Either[(Long, Long), (Double, Double)])] =
    for (mn <- s.min; mx <- s.max) yield dt match {
      case DoubleType => Right((mn.toDouble, mx.toDouble))
      case _ => Left((mn.toLong, mx.toLong))
    }

  private def litInDomain(dt: DataType, v: Any): Option[Either[Long, Double]] = dt match {
    case DoubleType => litToDouble(v).map(Right(_))
    case _ => litToLong(dt, v).map(Left(_))
  }

  /** Conservative may-match: false ONLY when the tile's zone map proves no
    * row can satisfy the filter. Unknown columns/shapes/types => true. */
  def tileMayMatch(schema: StructType, meta: TileMeta, f: Filter): Boolean = {
    val byName = schema.fields.map(x => x.name -> x.dataType).toMap

    // stats-backed comparison prune; `keep(minCmp, maxCmp)`: given the sign
    // of min-vs-literal and max-vs-literal, can any value match?
    def cmpPrune(attr: String, v: Any)(keep: (Int, Int) => Boolean): Boolean = {
      val dt = byName.getOrElse(attr, return true)
      if (!statTracked(dt)) return true
      val s = meta.stats.getOrElse(attr, return true)
      if (meta.rows > 0 && s.nulls == meta.rows) return false // all null: no comparison matches
      (parsedRange(dt, s), litInDomain(dt, v)) match {
        case (Some(Left((mn, mx))), Some(Left(lv))) =>
          keep(java.lang.Long.compare(mn, lv), java.lang.Long.compare(mx, lv))
        case (Some(Right((mn, mx))), Some(Right(lv))) =>
          keep(cmpDouble(mn, lv), cmpDouble(mx, lv))
        case (None, _) => meta.rows == 0 // tracked col, no range: empty or all-null tile
        case _ => true
      }
    }

    f match {
      case And(l, r) => tileMayMatch(schema, meta, l) && tileMayMatch(schema, meta, r)
      case Or(l, r) => tileMayMatch(schema, meta, l) || tileMayMatch(schema, meta, r)
      case EqualTo(a, v) => cmpPrune(a, v)((mnc, mxc) => mnc <= 0 && mxc >= 0)
      case GreaterThan(a, v) => cmpPrune(a, v)((_, mxc) => mxc > 0)
      case GreaterThanOrEqual(a, v) => cmpPrune(a, v)((_, mxc) => mxc >= 0)
      case LessThan(a, v) => cmpPrune(a, v)((mnc, _) => mnc < 0)
      case LessThanOrEqual(a, v) => cmpPrune(a, v)((mnc, _) => mnc <= 0)
      case In(a, vs) =>
        // only non-null list values can make IN true
        vs != null && vs.exists(v => v != null && cmpPrune(a, v)((mnc, mxc) => mnc <= 0 && mxc >= 0))
      case IsNull(a) => meta.stats.get(a).forall(_.nulls > 0)
      case IsNotNull(a) => meta.stats.get(a).forall(s => s.nulls < meta.rows)
      case AlwaysFalse() => false
      case _ => true
    }
  }

  /** Conservative must-match: true ONLY when the zone map PROVES every row
    * of the tile satisfies the filter (the metadata-DELETE prover — a tile
    * is droppable without being read iff this holds for the whole delete
    * predicate). Unknown columns/shapes/types => false. */
  def tileMustMatch(schema: StructType, meta: TileMeta, f: Filter): Boolean = {
    val byName = schema.fields.map(x => x.name -> x.dataType).toMap

    // all rows satisfy `col cmp lit` iff the col has NO nulls and the
    // WHOLE [min, max] range satisfies it
    def cmpProve(attr: String, v: Any)(holds: (Int, Int) => Boolean): Boolean = {
      val dt = byName.getOrElse(attr, return false)
      if (!statTracked(dt)) return false
      val s = meta.stats.getOrElse(attr, return false)
      if (s.nulls > 0) return false // a null row never satisfies a comparison
      (parsedRange(dt, s), litInDomain(dt, v)) match {
        case (Some(Left((mn, mx))), Some(Left(lv))) =>
          holds(java.lang.Long.compare(mn, lv), java.lang.Long.compare(mx, lv))
        case (Some(Right((mn, mx))), Some(Right(lv))) =>
          holds(cmpDouble(mn, lv), cmpDouble(mx, lv))
        case _ => false
      }
    }

    if (meta.rows == 0) return true // vacuously: an empty tile is droppable
    f match {
      case And(l, r) => tileMustMatch(schema, meta, l) && tileMustMatch(schema, meta, r)
      // under-approximation: a tile split row-wise between the two arms
      // also fully matches the OR, but proving that needs row access
      case Or(l, r) => tileMustMatch(schema, meta, l) || tileMustMatch(schema, meta, r)
      // NOT(c) holds for every row iff c can hold for none
      case Not(c) => !tileMayMatch(schema, meta, c)
      case EqualTo(a, v) => cmpProve(a, v)((mnc, mxc) => mnc == 0 && mxc == 0)
      case GreaterThan(a, v) => cmpProve(a, v)((mnc, _) => mnc > 0)
      case GreaterThanOrEqual(a, v) => cmpProve(a, v)((mnc, _) => mnc >= 0)
      case LessThan(a, v) => cmpProve(a, v)((_, mxc) => mxc < 0)
      case LessThanOrEqual(a, v) => cmpProve(a, v)((_, mxc) => mxc <= 0)
      case In(a, vs) =>
        // provable only in the degenerate single-value-tile case
        vs != null && vs.filter(_ != null)
          .exists(v => cmpProve(a, v)((mnc, mxc) => mnc == 0 && mxc == 0))
      case IsNull(a) => meta.stats.get(a).exists(_.nulls == meta.rows)
      case IsNotNull(a) => meta.stats.get(a).exists(_.nulls == 0L)
      case AlwaysTrue() => true
      case _ => false
    }
  }
}
