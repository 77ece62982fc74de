package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-rooted `TableCatalog` over z-stores — the pure-SQL front door
  * (the r11 verdict's item 5: DESCRIBE/OPTIMIZE-class operations existed
  * only as Scala calls, and even SELECT needed the DataFrame API):
  *
  * {{{
  * spark.sql.catalog.graftz      = graft.sources.ZCatalog
  * spark.sql.catalog.graftz.root = /lake
  *
  * CREATE TABLE graftz.ns.t (k1 BIGINT, k2 BIGINT, s STRING)
  *   PARTITIONED BY (k1, k2)          -- the z-clustering keys
  * INSERT INTO graftz.ns.t SELECT …   -- a tagless lock-free z-append,
  *                                    -- clustered by the RECORDED keys
  * SELECT … FROM graftz.ns.t WHERE k1 BETWEEN … -- manifest skipping
  * INSERT OVERWRITE graftz.ns.t …     -- versioned epoch rebuild
  * DROP TABLE graftz.ns.t
  * }}}
  *
  * An identifier maps to the directory `root/<namespace…>/<name>`; a
  * table EXISTS iff a committed z-store lives there, so the catalog
  * needs no metastore of its own — the store's commit log is the source
  * of truth (Delta's path-table discipline, here with names). CREATE
  * TABLE commits an EMPTY epoch-0 manifest carrying the declared schema
  * and records the PARTITIONED BY columns as the store's clustering
  * policy ([[ZOrder.recordedZcols]]) — what later option-less INSERTs
  * cluster by. `PARTITIONED BY` is deliberately reused for the
  * clustering declaration: z-ordering IS this format's physical layout
  * story, and identity transforms are exactly the shape SQL can say.
  *
  * Deliberately NOT here: ALTER TABLE (schema evolution is the add-only
  * union on the write path — [[StoreMaint.evolveSchema]]), RENAME (a
  * path-addressed store's name is its location), and maintenance verbs
  * (OPTIMIZE/VACUUM/RESTORE stay programmatic — Delta needs a SQL parser
  * extension for those, which would outgrow a catalog). */
class ZCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  private def s: SparkSession = SparkSession.active

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root = " +
          "<directory holding the z-stores>"))
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (root +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  private def nsDir(namespace: Seq[String]): Path =
    new Path((root +: namespace).mkString("/"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = nsDir(namespace.toSeq)
    val fs = StoreMaint.fsFor(s, base)
    if (!fs.exists(base)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    fs.listStatus(base).filter(_.isDirectory)
      .filter(st => ZOrder.storeExists(s, st.getPath.toString))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!ZOrder.storeExists(s, dir)) throw new NoSuchTableException(ident)
    new ZBatchTable(dir,
      ZcdfStream.wireSchema(s, dir, s"$catalogName.$ident"))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    require(!ZOrder.storeExists(s, dir),
      s"table $catalogName.$ident already exists ($dir)")
    val declared = partitions.toSeq.map {
      case t if t.name == "identity" && t.references().length == 1 =>
        t.references()(0).fieldNames().mkString(".")
      case t => throw new IllegalArgumentException(
        s"graft-z tables cluster by plain columns — PARTITIONED BY " +
          s"(c1, c2); got transform $t")
    }
    val zcols =
      if (declared.nonEmpty) declared
      else Option(properties.get("zcols"))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(throw new IllegalArgumentException(
          s"CREATE TABLE $catalogName.$ident needs its z-clustering " +
            "keys: PARTITIONED BY (c1, c2) or " +
            "TBLPROPERTIES('zcols'='c1,c2')"))
    // validate the declaration BEFORE anything lands: the empty create
    // cannot (no rows, no bounds pass), and a typo here would otherwise
    // fail only at the first INSERT
    zcols.foreach { c =>
      val f = schema.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"clustering column $c is not in the declared schema"))
      require(f.dataType == LongType,
        s"clustering column $c must be BIGINT (z-quantization is " +
          s"long-typed); got ${f.dataType.simpleString}")
    }
    // an empty committed store: schema-only epoch-0 manifest + the
    // recorded clustering policy — INSERTs append against it
    ZOrder.writeZOrdered(
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema), dir, zcols, 1)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"$catalogName: ALTER TABLE is not supported — schema evolution is " +
        "the add-only union on the write path (append a batch carrying " +
        "the new column)")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!ZOrder.storeExists(s, dir)) false
    else {
      val p = new Path(dir)
      StoreMaint.fsFor(s, p).delete(p, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName: RENAME is not supported — a path-addressed store's " +
        "name is its location")

  // ---- namespaces = directories under the root ----------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val base = nsDir(Seq.empty)
    val fs = StoreMaint.fsFor(s, base)
    if (!fs.exists(base)) Array.empty
    else fs.listStatus(base).filter(_.isDirectory)
      .filterNot(st => ZOrder.storeExists(s, st.getPath.toString))
      .map(st => Array(st.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val base = nsDir(namespace.toSeq)
      val fs = StoreMaint.fsFor(s, base)
      if (!fs.exists(base)) throw new NoSuchNamespaceException(
        catalogName +: namespace.toSeq)
      fs.listStatus(base).filter(_.isDirectory)
        .filterNot(st => ZOrder.storeExists(s, st.getPath.toString))
        .map(st => namespace :+ st.getPath.getName)
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      StoreMaint.fsFor(s, nsDir(namespace.toSeq))
        .exists(nsDir(namespace.toSeq))

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    val p = nsDir(namespace.toSeq)
    StoreMaint.fsFor(s, p).mkdirs(p)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName: namespaces are directories; nothing to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val p = nsDir(namespace.toSeq)
    val fs = StoreMaint.fsFor(s, p)
    if (!fs.exists(p)) false
    else {
      require(cascade || fs.listStatus(p).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(p, true)
    }
  }
}
