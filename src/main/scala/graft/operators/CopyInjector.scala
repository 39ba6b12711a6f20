package graft.operators

import graft.sources.GraphqlSchema.EntityDesc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COPY-ready injection artifacts (reference
  * cmd/substreams-sink-graph-load/inject_csv.go, create-indexes.go,
  * drop-indexes.go).
  *
  * The reference's `inject-csv` stage streams bundle CSVs into postgres
  * with `COPY ... FROM STDIN`, tracking which columns must be
  * FORCE_NOT_NULL (inject_csv.go:88-106) and loading files in
  * block-range order so the `vid bigserial` counter assigns
  * monotonically. There is no postgres in this environment, so the
  * testable surface is the artifacts themselves: the exact COPY
  * statement (inject_csv.go:278), the block-range file pruning
  * (inject_csv.go:305-340), a per-bundle load manifest with the vid
  * range the serial counter will assign to each file, and a ready-to-run
  * psql script that drops indexes, \copy's every bundle, and recreates
  * the indexes (the create/drop-indexes.go flow around a bulk load).
  *
  * Scale: every artifact here is metadata — bounded by |bundles| and
  * |fields|, never by row count. The row-proportional work (rendering
  * the CSVs) is [[CsvSerializer]] + [[Bundler]], both map-only.
  */
object CopyInjector {

  /** FORCE_NOT_NULL column tracking (inject_csv.go:88-106): `id`
    * always, the range column always, then every non-nullable field —
    * CSV empty string must load as '' / 0 / false, not NULL. */
  def nonNullableColumns(desc: EntityDesc): Seq[String] =
    Seq("id", if (desc.immutable) "block$" else "block_range") ++
      desc.orderedFields.filter(f => f.name != "id" && !f.nullable).map(_.name)

  /** The COPY statement, same shape as inject_csv.go:278. Column list =
    * the CSV header ([[CsvSerializer.header]]): `vid` is absent — the
    * bigserial assigns it in load order, which is what makes file order
    * part of the contract. */
  def copyStatement(desc: EntityDesc, pgSchema: String): String = {
    val dbFields = CsvSerializer.header(desc)
    val nn = nonNullableColumns(desc)
    s"""COPY $pgSchema.${desc.name} ("${dbFields.mkString("\",\"")}") FROM STDIN WITH (FORMAT CSV, HEADER, FORCE_NOT_NULL ("${nn.mkString("\",\"")}"))"""
  }

  /** Bundle CSV object name: the 10-digit zero-padded block range the
    * reference's loader regex `(\d{10})-(\d{10})` expects. The end
    * block is INCLUSIVE — the reference names `start-(stop-1)`
    * (bundler/writer/common.go:30, csvprocessor/writer.go:327) —
    * which is what makes the loader's `end < desiredStart` prune drop
    * a fully-loaded bundle on a boundary resume instead of re-copying
    * it. */
  def bundleFileName(entity: String, startBlock: Long, stopBlockExcl: Long): String =
    f"$entity/$startBlock%010d-${stopBlockExcl - 1}%010d.csv"

  /** File pruning, the injectFilesToLoad rule (inject_csv.go:305-327):
    * keep `.csv` files whose range starts before `stopBlock` (0 = no
    * stop) and whose INCLUSIVE end is at or after `desiredStartBlock`;
    * load in ascending block order. */
  def filesToLoad(files: Seq[String], desiredStartBlock: Long, stopBlock: Long): Seq[String] = {
    val rangeRe = raw"(\d{10})-(\d{10})".r.unanchored
    files.flatMap { f =>
      f match {
        // suffix, not containment: `.csv.tmp` crash leftovers must not load
        case _ if !f.endsWith(".csv") => None
        case rangeRe(s, e) =>
          val (start, end) = (s.toLong, e.toLong)
          if (stopBlock != 0 && start >= stopBlock) None
          else if (end < desiredStartBlock) None
          else Some((start, f))
        case _ => None
      }
    }.sortBy(_._1).map(_._2)
  }

  /** One manifest line per bundle file: row count and the exact
    * [vidStart, vidEnd] range the serial counter will assign when the
    * files load in order. */
  case class BundleFile(file: String, bundle: Long, nRows: Long,
                        vidStart: Long, vidEnd: Long)

  /** Everything a load of one entity needs: the COPY statement, the
    * FORCE_NOT_NULL set, and the ordered per-bundle file list with
    * predicted vid ranges. */
  case class LoadManifest(entity: String, pgSchema: String, copySql: String,
                          nonNullable: Seq[String], files: Seq[BundleFile])

  /** Build the manifest from the serializable rows (SCD2 output or
    * immutable projection). The aggregation is a map-side-combined
    * count per bundle; only |bundles| rows reach the driver — the same
    * boundedness as [[VidAssigner]]'s offset table. */
  def manifest(rows: DataFrame, desc: EntityDesc, pgSchema: String,
               bundleSize: Long, blockCol: String = "start_block"): LoadManifest = {
    // integer div, not `/`: double division misbuckets block numbers
    // within rounding distance of 2^53. Backtick-quoted so column
    // names col() would accept (spaces, reserved words) survive the
    // SQL round trip.
    val counts = rows
      .groupBy(expr(s"`$blockCol` div $bundleSize").as("bundle")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var nextVid = 1L
    val files = counts.map { case (b, n) =>
      val entry = BundleFile(
        bundleFileName(desc.name, b * bundleSize, (b + 1) * bundleSize),
        b, n, nextVid, nextVid + n - 1)
      nextVid += n
      entry
    }.toIndexedSeq
    LoadManifest(desc.name, pgSchema, copyStatement(desc, pgSchema),
      nonNullableColumns(desc), files)
  }

  /** `handoff` parity (reference handoff.go:52-57): after a bulk load,
    * tell graph-node the deployment is indexed up to (blockHash,
    * blockNum) so indexing can be reassigned. The reference pins
    * entity_count to 1e6 (a placeholder graph-node recomputes). */
  def handoffSql(deploymentHash: String, blockHash: String, blockNum: Long,
                 entityCount: Long = 1000000L): String = {
    require(deploymentHash.startsWith("Qm"),
      s"invalid deployment-hash $deploymentHash: should start with 'Qm'")
    val hash = blockHash.stripPrefix("0x").stripPrefix("0X")
    s"UPDATE subgraphs.subgraph_deployment set latest_ethereum_block_hash='$hash'," +
      s"latest_ethereum_block_number=$blockNum,entity_count=$entityCount," +
      s"firehose_cursor='' where deployment='$deploymentHash'"
  }

  /** Ready-to-run psql script for one entity: drop indexes → ordered
    * `\copy` per bundle file → recreate indexes → ANALYZE. This is the
    * drop-indexes / inject-csv / create-indexes command sequence as one
    * reviewable artifact. The overload taking a `<psql-dsn>` (the
    * argument every reference postgres command parses via
    * postgres.ParseDSN, create-indexes.go:34-40) prefixes the script
    * with the real connection string in both forms so the artifact is
    * runnable as-is: `psql "<url>" -f <entity>.sql`. Left = the
    * reference's DSN error, wrapped the way create-indexes.go:40 does. */
  def loadScript(manifest: LoadManifest, desc: EntityDesc,
                 psqlDsn: String): Either[String, String] =
    Dsn.parse(psqlDsn).left.map(e => s"""invalid postgres DSN "$psqlDsn": $e""")
      .map { d =>
        Seq(s"""-- run with: psql "${d.toString}" -f ${manifest.entity}.sql""",
          s"-- libpq form: ${d.keyValue}",
          loadScript(manifest, desc)).mkString("\n")
      }

  def loadScript(manifest: LoadManifest, desc: EntityDesc): String = {
    val copyOpts = manifest.copySql.substring(manifest.copySql.indexOf("WITH ("))
    val target = {
      val cols = CsvSerializer.header(desc)
      s""""${manifest.pgSchema}"."${manifest.entity}" ("${cols.mkString("\",\"")}")"""
    }
    val copies = manifest.files.map { f =>
      s"\\copy $target FROM '${f.file}' $copyOpts  -- rows ${f.nRows}, vid [${f.vidStart},${f.vidEnd}]"
    }
    (Seq(s"-- bulk load ${manifest.entity} (${manifest.files.map(_.nRows).sum} rows, ${manifest.files.size} bundles)",
      "-- 1. drop indexes for an index-free COPY (reference drop-indexes.go)") ++
      DdlGenerator.dropIndexDdls(desc, manifest.pgSchema) ++
      Seq("-- 2. load bundle CSVs in block order (reference inject_csv.go)") ++
      copies ++
      Seq("-- 3. recreate indexes (reference create-indexes.go)") ++
      DdlGenerator.indexDdls(desc, manifest.pgSchema) ++
      Seq(s"""ANALYZE "${manifest.pgSchema}"."${manifest.entity}";""")).mkString("\n")
  }

  // ---- extract-indexes parity (reference extract-indexes.go) ---------

  /** One `pg_indexes` catalog row — the rowset the reference's
    * extract-index queries (extract-indexes.go:108: `SELECT tablename,
    * indexname, indexdef FROM pg_indexes WHERE schemaname = '…' ORDER
    * BY tablename, indexname`). Sandbox has no postgres, so callers
    * supply the snapshot; the semantics downstream are the
    * reference's. */
  case class CatalogIndexRow(schemaname: String, tablename: String,
                             indexname: String, indexdef: String)

  /** The extract-index pipeline over a catalog snapshot: restrict to
    * the schema, keep only tables that exist in the GraphQL schema
    * (extract-indexes.go:129 `graphqlSchemaTables[tableName]`), group
    * per table with `;`-terminated defs (:131). Deterministically
    * ordered by (table, index) — the catalog query's ORDER BY, where
    * the Go version's map iteration randomizes its output file. */
  def extractIndexes(catalog: Seq[CatalogIndexRow], pgSchema: String,
                     entities: Seq[EntityDesc]): Seq[(String, Seq[(String, String)])] = {
    val tables = entities.map(_.name).toSet
    catalog
      .filter(r => r.schemaname == pgSchema && tables.contains(r.tablename))
      .sortBy(r => (r.tablename, r.indexname))
      .groupBy(_.tablename).toSeq.sortBy(_._1)
      .map { case (t, rows) =>
        t -> rows.map(r => r.indexname -> (r.indexdef + ";"))
      }
  }

  /** `create_indexes.ddl` content (extract-indexes.go:141-148 ToString
    * + --save): every kept indexdef, newline-terminated. */
  def createIndexesDdl(extracted: Seq[(String, Seq[(String, String)])]): String =
    extracted.flatMap(_._2.map(_._2)).mkString("", "\n", "\n")

  /** Diff the EXPECTED inventory ([[DdlGenerator.indexDdls]] — what a
    * graph-node deployment of this schema should carry) against an
    * extracted snapshot: (missing, unexpected) index names per the
    * snapshot's schema. The maintenance check a bulk-load operator
    * runs before dropping indexes — a drop list built from a stale
    * schema would silently leave indexes alive through the COPY. */
  def indexInventoryDiff(catalog: Seq[CatalogIndexRow], pgSchema: String,
                         entities: Seq[EntityDesc]): (Seq[String], Seq[String]) = {
    val expected = entities.flatMap(d =>
      DdlGenerator.indexDdls(d, pgSchema).map(_.split('"')(1))).toSet
    val got = extractIndexes(catalog, pgSchema, entities)
      .flatMap(_._2.map(_._1)).toSet
    ((expected -- got).toSeq.sorted, (got -- expected).toSeq.sorted)
  }
}
