package graft.model

import org.apache.spark.sql.types._
import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** S9 — declarative graph-model + mapping-config loaders (SURVEY.md §1.1).
  *
  * Parses the reference's YAML artifact shapes — graph model
  * (`3-Model-Files/cds-model.yml:3-345`: `Nodes` with `Props`,
  * `Relationships` with `Mul`/`Ends`), property definitions
  * (`cds-model-props.yml`: `PropDefinitions` with `Type`/`Enum`/`Req`/
  * `Key`), raw dict (`cds_raw_dict_v1.3.yaml`: node → raw column →
  * property) and clean dict (`cds_clean_dict_v1.3.yaml`: property → dirty
  * value → canonical) — into typed case classes, and derives per-node Spark
  * schemas from the model types (§1.2 mapping: integer→Long for file
  * sizes, number→Double, everything else string-first).
  *
  * Driver-side by design: configuration never touches the data plane; the
  * parsed dictionaries become literal map expressions / broadcast lookups
  * inside the operators.
  */
object ModelLoader {

  final case class Relationship(
      name: String, mul: String, src: String, dst: String)

  final case class PropDef(
      name: String,
      spark: DataType,
      enum: Seq[String] = Nil,
      pattern: Option[String] = None,
      required: Boolean = false,
      key: Boolean = false,
      isList: Boolean = false)

  final case class Node(name: String, props: Seq[String])

  final case class Model(
      nodes: Seq[Node],
      relationships: Seq[Relationship],
      propDefs: Map[String, PropDef]) {

    def node(name: String): Option[Node] = nodes.find(_.name == name)

    /** Parents of a child node via the relationship graph. */
    def parentsOf(child: String): Seq[Relationship] =
      relationships.filter(_.src == child)

    /** §1.2: model-typed schema for a node (nullable everywhere — the
      * reference enforces requiredness by validation, not storage). */
    def schemaOf(name: String): StructType =
      StructType(node(name).toSeq.flatMap(_.props).map { p =>
        val dt = propDefs.get(p).map(_.spark).getOrElse(StringType)
        StructField(p, dt, nullable = true)
      })
  }

  private def asMap(o: Any): Map[String, Any] = o match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> v }.toMap
    case _ => Map.empty
  }
  private def asList(o: Any): Seq[Any] = o match {
    case l: java.util.List[_] => l.asScala.toSeq
    case _ => Nil
  }

  /** Parse a cds-model.yml-shaped document (Nodes + Relationships). */
  def parseModel(modelYaml: String, propsYaml: String = ""): Model = {
    val root = asMap(new Yaml().load[Any](modelYaml))
    val nodes = asMap(root.getOrElse("Nodes", null)).map { case (name, spec) =>
      Node(name, asList(asMap(spec).getOrElse("Props", null)).map(_.toString))
    }.toSeq.sortBy(_.name)
    val rels = asMap(root.getOrElse("Relationships", null)).flatMap {
      case (relName, spec) =>
        val m = asMap(spec)
        val mul = m.getOrElse("Mul", "many_to_one").toString
        asList(m.getOrElse("Ends", null)).map { e =>
          val em = asMap(e)
          Relationship(relName, mul,
            em.getOrElse("Src", "").toString, em.getOrElse("Dst", "").toString)
        }
    }.toSeq
    Model(nodes, rels, if (propsYaml.nonEmpty) parsePropDefs(propsYaml) else Map.empty)
  }

  /** Parse a cds-model-props.yml-shaped document (PropDefinitions). */
  def parsePropDefs(propsYaml: String): Map[String, PropDef] = {
    val root = asMap(new Yaml().load[Any](propsYaml))
    asMap(root.getOrElse("PropDefinitions", null)).map { case (name, spec) =>
      val m = asMap(spec)
      val tpe = m.get("Type") match {
        case Some(s: String) => Left(s)
        case Some(other) => Right(asMap(other))
        case None => Left("string")
      }
      val enum = m.get("Enum").map(asList(_).map(_.toString)).getOrElse(Nil)
      val (spark, isList, pattern) = tpe match {
        case Left("integer") => (LongType, false, None)
        case Left("number") => (DoubleType, false, None)
        case Left(s) if s.startsWith("^") => (StringType, false, Some(s))
        case Left(_) => (StringType, false, None)
        case Right(tm) if tm.get("value_type").exists(_.toString == "list") =>
          (ArrayType(StringType), true, None)
        case Right(tm) if tm.contains("pattern") =>
          (StringType, false, Some(tm("pattern").toString))
        case Right(_) => (StringType, false, None)
      }
      val req = m.get("Req").exists(v => v == true || v.toString == "true" || v.toString == "Yes")
      val key = m.get("Key").exists(v => v == true || v.toString == "true")
      name -> PropDef(name, spark, enum, pattern, req, key, isList)
    }
  }

  /** Parse a raw dict (node → raw column → property). Insertion order is
    * preserved: P1 takes the FIRST mapped raw column that exists and is
    * non-null (`cds-transformation_v1.3.py:53-66`). */
  def parseRawDict(yaml: String): Map[String, Seq[(String, String)]] = {
    val root = new Yaml().load[Any](yaml)
    root match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (node, cols) =>
          node.toString -> (cols match {
            case cm: java.util.Map[_, _] =>
              // toSeq BEFORE map: mapping the Map wrapper would rebuild a
              // hash map and scramble the YAML order — P1's first-live-
              // candidate rule depends on document order surviving
              cm.asScala.toSeq.map { case (raw, prop) =>
                raw.toString -> prop.toString }
            case _ => Nil
          })
        }.toMap
      case _ => Map.empty
    }
  }

  /** Full clean-dict parse: per-prop dirty→canonical maps, per-prop
    * `nan_value` null-fills, and the shared `extra_long_values` list
    * (values too long to be YAML keys — cds_clean_dict_v1.3.yaml:1267,
    * cds_transformation_functions.py:44-48). */
  final case class CleanDict(
      mappings: Map[String, Map[String, Option[String]]],
      nanValues: Map[String, String],
      extraLongValues: Seq[String])

  def parseCleanDictFull(yaml: String): CleanDict = {
    val root = asMap(new Yaml().load[Any](yaml))
    // a bare "extra_long_values:" key parses to null — treat as empty,
    // and skip null list entries, rather than NPE on a hand-edited config
    val extraLong = root.get("extra_long_values").toSeq.flatMap {
      case null => Nil
      case l: java.util.List[_] =>
        l.asScala.filter(_ != null).map(_.toString).toSeq
      case s => Seq(s.toString)
    }
    val props = root - "extra_long_values"
    val nan = props.flatMap { case (prop, mappings) =>
      asMap(mappings).collectFirst {
        case ("nan_value", v) if v != null => prop -> v.toString
      }
    }
    val clean = props.map { case (prop, mappings) =>
      prop -> (asMap(mappings) - "nan_value").map { case (dirty, c) =>
        dirty -> Option(c).map(_.toString).filter(_.nonEmpty)
      }
    }
    CleanDict(clean, nan, extraLong)
  }

  /** Parse a clean dict (property → dirty value → canonical-or-null). */
  def parseCleanDict(yaml: String): Map[String, Map[String, Option[String]]] =
    parseCleanDictFull(yaml).mappings

  /** Render a Jinja2-templated config (`cds_config_jenkins_v1.3.yaml.j2`)
    * by substituting `{{ var }}` placeholders — the only Jinja feature
    * the reference's Jenkins variant uses (three scalar values injected
    * by the CI job: data_batch_name, s3_bucket, s3_rawdata_subfolder).
    * Unknown placeholders fail LOUDLY with the variable name: a config
    * rendered with a typo'd var map must not parse half-substituted. */
  def renderTemplate(template: String, vars: Map[String, String]): String =
    "\\{\\{\\s*([A-Za-z0-9_]+)\\s*\\}\\}".r.replaceAllIn(template, m => {
      val name = m.group(1)
      scala.util.matching.Regex.quoteReplacement(
        vars.getOrElse(name,
          sys.error(s"template variable {{$name}} has no binding")))
    })
}
