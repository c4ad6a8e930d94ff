package graft.sources

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.types.StructType

/** Persistent SQL VIEW storage for [[GraftCatalog]]: each view is one
  * sidecar file `_graft_view_<name>` in its namespace directory (the
  * `_graft` prefix keeps it invisible to every table listing), holding
  * the defining SQL plus the resolution context Spark needs to
  * re-analyze it — defining catalog + namespace, the captured output
  * schema, column names/aliases/comments, and properties. Format:
  * URL-encoded lines (`__null__` marks a null comment), atomic staging
  * rename like every other manifest.
  */
object GraftViews {

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
  private val Null = "__null__"

  def viewFile(nsDir: File, name: String): File =
    new File(nsDir, s"_graft_view_$name")

  def list(nsDir: File): Seq[String] =
    Option(nsDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("_graft_view_"))
      .map(_.getName.stripPrefix("_graft_view_")).sorted.toSeq

  def write(nsDir: File, info: ViewInfo): Unit = {
    def arr(a: Array[String]): String =
      Option(a).getOrElse(Array.empty[String])
        .map(x => if (x == null) Null else enc(x)).mkString(",")
    val props = Option(info.properties())
      .map(_.asScala.toSeq).getOrElse(Nil)
      .sortBy(_._1).map { case (k, v) => s"${enc(k)}\t${enc(v)}" }
    val lines = Seq(
      enc(info.sql()),
      enc(Option(info.currentCatalog()).getOrElse("")),
      arr(info.currentNamespace()),
      enc(info.schema().json),
      arr(info.queryColumnNames()),
      arr(info.columnAliases()),
      arr(info.columnComments())) ++ props
    val f = viewFile(nsDir, info.ident().name())
    val tmp = new File(f.getPath + ".staging")
    java.nio.file.Files.write(tmp.toPath,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    if (!tmp.renameTo(f)) throw new java.io.IOException(
      s"graft views: rename failed $tmp -> $f")
  }

  def read(nsDir: File, ident: Identifier): Option[View] = {
    val f = viewFile(nsDir, ident.name())
    if (!f.isFile) return None
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    require(lines.length >= 7,
      s"graft views: corrupt view file $f — refusing to resolve")
    def arr(s: String): Array[String] =
      if (s.isEmpty) Array.empty
      else s.split(',').map(x => if (x == Null) null else dec(x))
    val props = lines.drop(7).filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(k, v) => dec(k) -> dec(v)
        case _ => throw new IllegalStateException(
          s"graft views: corrupt property line '$line' in $f")
      }
    }.toMap
    Some(new View {
      override def name(): String = ident.toString
      override def query(): String = dec(lines(0))
      override def currentCatalog(): String = dec(lines(1))
      override def currentNamespace(): Array[String] = arr(lines(2))
      override def schema(): StructType =
        org.apache.spark.sql.types.DataType.fromJson(dec(lines(3)))
          .asInstanceOf[StructType]
      override def queryColumnNames(): Array[String] = arr(lines(4))
      override def columnAliases(): Array[String] = arr(lines(5))
      override def columnComments(): Array[String] = arr(lines(6))
      override def properties(): util.Map[String, String] = props.asJava
    })
  }
}
