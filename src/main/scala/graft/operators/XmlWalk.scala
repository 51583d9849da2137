package graft.operators

/** The ONE hardened XML entry point the structural codecs share
  * (office documents, feeds): doctype declarations are a parse error
  * (`disallow-doctype-decl` — no XXE, no entity bombs; only the five
  * predefined entities ever expand), XInclude off, entity expansion
  * off, namespaces off (prefixes match literally, the convention the
  * extractors pin).
  *
  * The `DocumentBuilder` is THREAD-LOCAL and `reset()` between uses:
  * factory + builder construction costs more than parsing a small
  * document, and the per-record extract paths (one PPTX = N slide
  * parses) would otherwise pay it per XML part. Builders are
  * single-threaded by contract; one per task thread is the Spark-safe
  * shape.
  */
private[operators] object XmlWalk {

  private val local = new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
    override def initialValue(): javax.xml.parsers.DocumentBuilder = {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.setXIncludeAware(false)
      f.setExpandEntityReferences(false)
      f.setNamespaceAware(false)
      f.newDocumentBuilder()
    }
  }

  /** Parse untrusted XML bytes. Throws `SAXException` on malformed
    * input or a doctype declaration — callers wrap with their NAMED
    * reject.
    */
  def parse(bytes: Array[Byte]): org.w3c.dom.Document = {
    val b = local.get()
    b.reset()
    b.parse(new java.io.ByteArrayInputStream(bytes))
  }
}
