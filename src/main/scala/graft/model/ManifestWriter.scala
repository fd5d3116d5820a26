package graft.model

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Serialize the engine manifest back to JSON (SURVEY §2.1 S9). Output
  * is the engine's superset dialect: `{"commands": [...]}` with flat
  * entries carrying `command: "hot.Parquet"` + params, so the
  * reference's own emitted shape (`run_annotate.py:314-319`) parses it
  * and [[ManifestParser]] round-trips it.
  */
object ManifestWriter {
  private val mapper = new ObjectMapper()

  def toJson(m: EngineManifest): String = {
    val root = mapper.createObjectNode()
    val cmds = root.putArray("commands")
    m.commands.foreach(c => writeCommand(cmds, c))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def writeFile(path: String, m: EngineManifest): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      toJson(m).getBytes("UTF-8"))

  private def writeCommand(arr: ArrayNode, c: Command): Unit = {
    val cmd = arr.addObject()
    cmd.put("command", "hot.Parquet")
    val p = cmd.putObject("params")
    p.put("source", c.source)
    p.put("target", c.target)
    c.name.foreach(p.put("name", _))
    c.desc.foreach(p.put("desc", _))
    val cols = p.putArray("cols")
    c.cols.foreach { m =>
      val o = cols.addObject()
      o.put("col", m.col)
      m.name.foreach(o.put("name", _))
      m.desc.foreach(o.put("desc", _))
    }
    if (c.tokens.nonEmpty) {
      val t = p.putArray("concat")
      c.tokens.foreach { tk =>
        val o = t.addObject()
        o.put("token", tk.token)
        tk.name.foreach(o.put("name", _))
        tk.desc.foreach(o.put("desc", _))
      }
    }
    c.melt.foreach { sp =>
      val m = p.putObject("melt")
      sp.key.foreach { k =>
        val o = m.putObject("key"); o.put("name", k.name)
        k.desc.foreach(o.put("desc", _))
      }
      sp.value.foreach { v =>
        val o = m.putObject("value"); o.put("name", v.name)
        v.desc.foreach(o.put("desc", _))
      }
      if (sp.valueColumns.nonEmpty) {
        val a = m.putArray("columns"); sp.valueColumns.foreach(a.add)
      }
    }
    if (c.read.sep.isDefined || c.read.indexCol.isDefined) {
      val r = p.putObject("read")
      c.read.sep.foreach(r.put("sep", _))
      c.read.indexCol.foreach(r.put("index_col", _))
    }
    c.where.foreach(p.put("where", _))
  }
}
