package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The versioned store as a real Spark CATALOG (`TableCatalog` plugin), so
  * pure SQL reaches it with Spark's own TIME TRAVEL syntax — no
  * `format(...)` boilerplate, and `VERSION AS OF` resolves through the
  * engine's `loadTable(ident, version)` contract:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graftstore", classOf[StoreCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graftstore.path", statePath)
  * spark.sql("SELECT * FROM graftstore.assets WHERE id = 'a5'")      // latest, bucket-pruned
  * spark.sql("SELECT * FROM graftstore.assets VERSION AS OF 3")       // manifest time travel
  * }}}
  *
  * Read-only by design: the store's ONLY writers are the streaming sink's
  * idempotent versioned batches ([[graft.streaming.StateStore.write]]) —
  * a SQL INSERT bypassing the manifest protocol would corrupt the
  * shadow-paging invariants, so every mutation entry point throws.
  * `TIMESTAMP AS OF` is rejected loudly too: versions are batch ids, not
  * instants, and silently mapping timestamps to versions would invent an
  * ordering the store does not promise.
  */
class StoreCatalog extends TableCatalog {

  private var catalogName: String = _
  private var path: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    path = Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      s"spark.sql.catalog.$name.path is required (the store's statePath)"))
  }

  override def name(): String = catalogName

  private val graphNames = Array("assets", "teams", "owns", "parent_of")

  /** The table names a manifest describes (`schema:`/`key:`/pointer
    * lines) — so the same catalog class serves the graph state AND any
    * generic [[graft.streaming.TableStore]] root (corpus frames, vector
    * indexes). `parent_of_idx` is store-internal: neither listed nor
    * resolvable through SQL — and [[graft.streaming.TableStore]] rejects
    * generic specs named like graph tables at write time, so the
    * graph-vs-generic classification here is never ambiguous.
    */
  private def namesOf(m: graft.streaming.StateStore.Manifest): Array[String] = {
    // generic TableStore tables always record their schema (and key),
    // so they are listable even with zero live buckets; a manifest
    // with none is a GRAPH store, which lists all four graph tables —
    // including currently-empty ones (pointers only name non-empty)
    val generic = (m.keys.keySet ++ m.schemas.keySet ++ m.pointers.keySet)
      .filterNot(graphNames.contains).filterNot(_ == "parent_of_idx")
    if (generic.nonEmpty) generic.toArray.sorted else graphNames
  }

  /** Head-manifest name listing, cached per (head version): the head
    * probe itself (one dir listing + exists checks) runs every call for
    * freshness, but the manifest read+parse — the expensive half — is
    * paid once per committed version, not once per listTables/
    * tableExists/loadTable (ADVICE r9).
    */
  @volatile private var namesCache: Option[(Long, Array[String])] = None

  private def tableNames: Array[String] = {
    import graft.streaming.StateStore
    val spark = org.apache.spark.sql.SparkSession.active
    StateStore.latestCommitted(spark, path) match {
      // a path with no committed version lists the graph names (the
      // catalog may be configured before the first batch lands)
      case None => graphNames
      case Some(v) =>
        namesCache match {
          case Some((cv, names)) if cv == v => names
          case _ =>
            val names = StateStore.readManifest(spark, path, v)
              .map(namesOf).getOrElse(graphNames)
            namesCache = Some((v, names))
            names
        }
    }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    tableNames.map(Identifier.of(namespace, _))

  private def mkTable(ident: Identifier, version: Option[Long]): Table = {
    val opts = new util.HashMap[String, String]()
    opts.put("path", path)
    opts.put("table", ident.name)
    version.foreach(v => opts.put("version", v.toString))
    new StoreDsTable(new CaseInsensitiveStringMap(opts))
  }

  /** TableCatalog contract: an unknown identifier must surface as
    * NoSuchTableException at resolution time (the analyzer turns it into
    * the standard TABLE_OR_VIEW_NOT_FOUND error), not as a runtime
    * failure from scan planning.
    */
  private def checkExists(ident: Identifier): Unit =
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        catalogName +: ident.namespace().toSeq :+ ident.name())

  override def loadTable(ident: Identifier): Table = {
    checkExists(ident)
    mkTable(ident, None)
  }

  /** `VERSION AS OF <v>` — the engine hands the version string through.
    * Existence is checked against the manifest OF THE REQUESTED VERSION,
    * not the head: a table present at v but absent from the head (specs
    * changed since) must still time-travel, and a table that only exists
    * at the head must not resolve at versions predating it (ADVICE r9).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    import graft.streaming.StateStore
    val v = version.toLong
    val spark = org.apache.spark.sql.SparkSession.active
    val known = StateStore.readManifest(spark, path, v)
      .map(namesOf).getOrElse(Array.empty[String])
    if (!known.contains(ident.name))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        catalogName +: ident.namespace().toSeq :+ ident.name())
    mkTable(ident, Some(v))
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "graft-store versions are batch ids, not instants — use VERSION AS OF, " +
        "not TIMESTAMP AS OF")

  override def tableExists(ident: Identifier): Boolean =
    tableNames.contains(ident.name)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(readOnly)

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(readOnly)

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(readOnly)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(readOnly)

  private def readOnly: String =
    "graft-store is read-only through SQL: state is written exclusively by " +
      "the versioned streaming sink (StateStore.write), whose manifest " +
      "protocol a SQL mutation would bypass"
}
