package graft.sources.rest

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.DataFrame

/** Page-envelope fixture writer for the zero-egress environment: turns a
  * (BOUNDED — dimension-table-sized) DataFrame into the `page_<i>.json`
  * cursor chain [[RestDataSource]] consumes, standing in for the live API
  * the reference polls. Collects to the driver by design: fixtures model
  * an API RESPONSE, which is inherently a bounded, serially-fetched
  * payload — never row-scale data. */
object RestFixtures {
  private val mapper = new ObjectMapper()

  /** Write `df` as ceil(n/pageSize) page envelopes under `dir`; each page
    * links to the following one via `next`, the last has `next: null`.
    * Returns the page count. */
  def writePages(df: DataFrame, dir: String, pageSize: Int): Int = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    val schema = df.schema
    val rows = df.collect()
    val pages = rows.grouped(pageSize).toSeq match {
      case Seq() => Seq(Array.empty[org.apache.spark.sql.Row])
      case ps => ps
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    pages.zipWithIndex.foreach { case (page, i) =>
      val root = mapper.createObjectNode()
      val results = root.putArray("results")
      page.foreach { row =>
        val o: ObjectNode = results.addObject()
        schema.fields.zipWithIndex.foreach { case (f, j) =>
          if (row.isNullAt(j)) o.putNull(f.name)
          else row.get(j) match {
            case v: Long => o.put(f.name, v)
            case v: Int => o.put(f.name, v)
            case v: Double => o.put(f.name, v)
            case v: Boolean => o.put(f.name, v)
            case v => o.put(f.name, v.toString)
          }
        }
      }
      if (i < pages.size - 1) root.put("next", i + 1) else root.putNull("next")
      java.nio.file.Files.write(RestPages.pageFile(dir, i),
        mapper.writeValueAsBytes(root))
    }
    pages.size
  }

  /** Write one `key_<urlencoded>.json` envelope per row of `df` (the
    * point-lookup fixture layout [[RestLookup]] consumes): key = the
    * row's `keyCol` rendered as a string, payload = the remaining
    * columns as the single entry of `results`. Returns the key count. */
  def writeKeyFiles(df: DataFrame, dir: String, keyCol: String): Int = {
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val rows = df.collect()
    rows.foreach { row =>
      val root = mapper.createObjectNode()
      val o: ObjectNode = root.putArray("results").addObject()
      schema.fields.zipWithIndex.foreach { case (f, j) =>
        if (j != keyIdx) {
          if (row.isNullAt(j)) o.putNull(f.name)
          else row.get(j) match {
            case v: Long => o.put(f.name, v)
            case v: Int => o.put(f.name, v)
            case v: Double => o.put(f.name, v)
            case v: Boolean => o.put(f.name, v)
            case v => o.put(f.name, v.toString)
          }
        }
      }
      root.putNull("next")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir,
          RestLookup.keyFileName(String.valueOf(row.get(keyIdx)))),
        mapper.writeValueAsBytes(root))
    }
    rows.length
  }
}
