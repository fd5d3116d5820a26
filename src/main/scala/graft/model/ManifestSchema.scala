package graft.model

import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

/** The reference's classification-manifest dialect
  * (`reference/annotation/manifest.schema.json:1-97`): a document
  * classifying FILES (standard / variable-by-pattern) and COLUMNS
  * (standard with metadata / variable melt groups).
  *
  * [[validate]] checks a document against the schema's semantics and
  * returns POINTED errors (JSON-path + problem) instead of letting a
  * malformed manifest fail deep inside Spark; [[compile]] lowers a valid
  * document into engine [[Command]]s with the same classification rules
  * the annotator applies (standard columns project+annotate; a file's
  * variable columns melt under their group's key/value names;
  * `[token]`s in a variable pattern become token columns).
  */
object ManifestSchema {

  def looksLikeClassification(root: JsonNode): Boolean =
    root.isObject && root.has("files") && root.has("columns")

  /** Schema check. Empty result = valid. */
  def validate(root: JsonNode): Seq[String] = {
    val errs = Seq.newBuilder[String]
    def req(n: JsonNode, f: String, path: String): Option[JsonNode] = {
      val c = Option(n.get(f)).filter(x => !x.isNull)
      if (c.isEmpty) errs += s"$path.$f: required"
      c
    }
    def str(n: JsonNode, f: String, path: String): Unit =
      req(n, f, path).foreach(v =>
        if (!v.isTextual) errs += s"$path.$f: expected string, got ${v.getNodeType}")
    def strArr(n: JsonNode, f: String, path: String): Unit =
      req(n, f, path).foreach { v =>
        if (!v.isArray) errs += s"$path.$f: expected array, got ${v.getNodeType}"
        else v.elements.asScala.zipWithIndex.foreach { case (e, i) =>
          if (!e.isTextual) errs += s"$path.$f[$i]: expected string, got ${e.getNodeType}"
        }
      }
    def objArr(n: JsonNode, f: String, path: String)
        (itemCheck: (JsonNode, String) => Unit): Unit =
      req(n, f, path).foreach { v =>
        if (!v.isArray) errs += s"$path.$f: expected array, got ${v.getNodeType}"
        else v.elements.asScala.zipWithIndex.foreach { case (e, i) =>
          if (!e.isObject) errs += s"$path.$f[$i]: expected object, got ${e.getNodeType}"
          else itemCheck(e, s"$path.$f[$i]")
        }
      }

    if (!root.isObject) return Seq("$: expected object")
    req(root, "files", "$").foreach { files =>
      objArr(files, "standard", "$.files") { (e, p) =>
        str(e, "file", p); strArr(e, "columns", p)
      }
      objArr(files, "variable", "$.files") { (e, p) =>
        str(e, "pattern", p); str(e, "regex", p); strArr(e, "columns", p)
      }
    }
    req(root, "columns", "$").foreach { cols =>
      objArr(cols, "standard", "$.columns") { (e, p) =>
        str(e, "column", p); str(e, "name", p); str(e, "desc", p)
      }
      objArr(cols, "variable", "$.columns") { (e, p) =>
        strArr(e, "columns", p); str(e, "name", p); str(e, "desc", p)
      }
    }
    errs.result()
  }

  /** Lower a (validated) classification document to engine commands. */
  def compile(root: JsonNode): EngineManifest = {
    val errors = validate(root)
    if (errors.nonEmpty) throw new IllegalArgumentException(
      s"manifest does not match the classification schema:\n  ${errors.mkString("\n  ")}")

    def items(parent: String, f: String): Seq[JsonNode] =
      root.get(parent).get(f).elements.asScala.toSeq
    def texts(n: JsonNode, f: String): Seq[String] =
      n.get(f).elements.asScala.map(_.asText).toSeq
    def opt(n: JsonNode, f: String): Option[String] =
      Option(n.get(f)).map(_.asText).filter(_.nonEmpty)

    val stdMeta: Map[String, (Option[String], Option[String])] =
      items("columns", "standard").map { e =>
        e.get("column").asText ->
          ((opt(e, "name"), opt(e, "desc")))
      }.toMap
    case class VarGroup(columns: Set[String], name: String,
                        desc: Option[String])
    val varGroups = items("columns", "variable").map(e =>
      VarGroup(texts(e, "columns").toSet, e.get("name").asText,
        opt(e, "desc")))

    def colsAndMelt(columns: Seq[String], where: String)
        : (Seq[ColMeta], Option[MeltSpec]) = {
      val unresolved = columns.filterNot(stdMeta.contains)
      val melt = if (unresolved.isEmpty) None else {
        varGroups.find(g => unresolved.forall(g.columns.contains)) match {
          case Some(g) => Some(MeltSpec(
            key = Some(MeltEnd(g.name, g.desc)),
            value = Some(MeltEnd("value")),
            valueColumns = unresolved))
          case None if varGroups.exists(g =>
              unresolved.exists(g.columns.contains)) =>
            throw new IllegalArgumentException(
              s"$where: variable columns ${unresolved.mkString(",")} span multiple groups")
          case None => None // unclassified columns ride along unannotated
        }
      }
      val std = columns.filterNot(c =>
        melt.exists(_.valueColumns.contains(c)))
      (std.map(c => stdMeta.get(c) match {
        case Some((n, d)) => ColMeta(c, n, d)
        case None => ColMeta(c)
      }), melt)
    }

    def targetFor(source: String): String =
      source.split('/').last
        .replaceAll("\\.(txt|csv|tsv)(\\.gz)?$", "") + ".parquet"

    val standardCmds = items("files", "standard").map { e =>
      val file = e.get("file").asText
      val (cols, melt) = colsAndMelt(texts(e, "columns"), file)
      Command(source = file, target = targetFor(file), cols = cols,
        melt = melt)
    }
    val variableCmds = items("files", "variable").map { e =>
      val pattern = e.get("pattern").asText
      val (cols, melt) = colsAndMelt(texts(e, "columns"), pattern)
      val toks = graft.ops.Tokens.tokenNames(pattern).distinct
        .map(t => TokenSpec(t))
      Command(source = pattern, target = targetFor(pattern), cols = cols,
        tokens = toks, melt = melt)
    }
    EngineManifest(standardCmds ++ variableCmds)
  }
}
