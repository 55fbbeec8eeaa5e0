package graft.parse

import graft.util.Json

/** Index-config `doc_mapping` JSON → [[MappingTree.DocMapping]] compiler —
  * the reference's user-facing configuration surface
  * (quickwit-config index_config + quickwit-doc-mapper
  * field_mapping_entry.rs / field_mapping_type.rs), so an existing index
  * config's `doc_mapping` section drives this engine's mapper unchanged.
  *
  * Reference semantics mirrored (error strings verbatim where the reference
  * defines them):
  *  - type ids: `text|i64|u64|f64|bool|ip|datetime|bytes|json|object` plus
  *    the `array<T>` wrapper (field_mapping_type.rs:96-121); unknown →
  *    "field `N` has an unknown type: `T`" (field_mapping_entry.rs:703-707);
  *  - field-name validation (default_doc_mapper/mod.rs:49-97): the
  *    `^[_\-a-zA-Z][_\.\-a-zA-Z0-9]{0,254}$` pattern, reserved names
  *    `_source`/`_dynamic`/`_field_presence`, empty / leading-dot /
  *    over-255 errors;
  *  - object entries carry nested `field_mappings` and must be non-empty
  *    ("object type must have at least one field mapping",
  *    field_mapping_entry.rs:646-649);
  *  - `fast` is rejected on `array<bytes>` (field_mapping_entry.rs:684-687);
  *  - numeric `coerce` defaults TRUE (QuickwitNumericOptions,
  *    field_mapping_entry.rs:99-110); datetime `input_formats` default
  *    `[rfc3339, unix_timestamp]` (QuickwitDateTimeOptions);
  *  - `mode` defaults to DYNAMIC (default_mapper_builder.rs:134-138).
  */
object MappingConfig {
  import MappingTree._

  private val ReservedNames = Seq("_source", "_dynamic", "_field_presence")
  private val NamePattern = "^[_\\-a-zA-Z][_.\\-a-zA-Z0-9]{0,254}$".r

  /** Parse the `doc_mapping` JSON object of an index config. */
  def fromJson(json: String): DocMapping = {
    val root = Json.parse(json).asInstanceOf[Map[String, Any]]
    val mode = root.getOrElse("mode", "dynamic") match {
      case "lenient" => Lenient
      case "strict"  => Strict
      case "dynamic" => Dynamic
      case other     => fail(s"unknown mode `$other`")
    }
    val mappings = root.getOrElse("field_mappings", Seq.empty)
      .asInstanceOf[Seq[Any]]
      .map(e => entry(e.asInstanceOf[Map[String, Any]]))
    DocMapping(mappings, mode,
      storeSource = root.getOrElse("store_source", false).asInstanceOf[Boolean])
  }

  private def entry(o: Map[String, Any]): Mapping = {
    val name = o.getOrElse("name", fail("field name is empty")).asInstanceOf[String]
    validateName(name)
    val typeId = o.getOrElse("type", fail(s"field `$name` has no type"))
      .asInstanceOf[String]
    val (baseType, multi) =
      if (typeId.startsWith("array<") && typeId.endsWith(">"))
        (typeId.substring(6, typeId.length - 1), true)
      else (typeId, false)
    if (baseType == "object") {
      if (multi) fail(s"field `$name` has an unknown type: `$typeId`")
      val children = o.getOrElse("field_mappings", Seq.empty).asInstanceOf[Seq[Any]]
        .map(e => entry(e.asInstanceOf[Map[String, Any]]))
      if (children.isEmpty)
        fail("object type must have at least one field mapping")
      Node(name, children)
    } else {
      val typ: LeafType = baseType match {
        case "text"  => TText
        case "i64"   => TI64
        case "u64"   => TU64
        case "f64"   => TF64
        case "bool"  => TBool
        case "ip"    => TIpAddr
        case "bytes" => TBytes
        case "json"  => TJson
        case "datetime" =>
          TDateTime(o.get("input_formats")
            .map(_.asInstanceOf[Seq[Any]].map(_.asInstanceOf[String]))
            .getOrElse(Seq("rfc3339", "unix_timestamp")))
        case _ => fail(s"field `$name` has an unknown type: `$typeId`")
      }
      val fast = o.getOrElse("fast", false) == true
      if (typ == TBytes && multi && fast)
        fail("fast field is not allowed for array<bytes>")
      Leaf(name, typ, multi = multi,
        coerce = o.getOrElse("coerce", true).asInstanceOf[Boolean])
    }
  }

  private def validateName(name: String): Unit = {
    if (ReservedNames.contains(name))
      fail(s"field name `$name` is reserved. the following fields are " +
        s"reserved for Quickwit internal usage: ${ReservedNames.mkString(", ")}")
    if (NamePattern.matches(name)) return
    if (name.isEmpty) fail("field name is empty")
    if (name.startsWith("."))
      fail(s"field name `$name` must not start with a dot `.`")
    if (name.length > 255)
      fail(s"field name `$name` is too long. field names must not be longer " +
        "than 255 characters")
    val c = name.head
    if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
      fail(s"field name `$name` is invalid. field names must start with an " +
        "uppercase or lowercase ASCII letter, or an underscore `_`")
    fail(s"field name `$name` contains illegal characters. field names must " +
      "only contain uppercase and lowercase ASCII letters, digits, hyphens " +
      "`-`, periods `.`, and underscores `_`")
  }

  // ---- custom tokenizer entries (doc_mapping.tokenizers) -----------------
  /** Parse the `tokenizers` array of a doc_mapping config into registry
    * entries — the flat serde format of tokenizer_entry.rs:29-149 (`name` +
    * internally-tagged `type` + type-specific options + `filters`), with
    * `deny_unknown_fields` on the per-type options. */
  def tokenizersFromJson(json: String): Seq[graft.functions.TokenizerRegistry.TokenizerEntry] = {
    import graft.functions.TokenizerRegistry._
    val root = Json.parse(json).asInstanceOf[Map[String, Any]]
    root.getOrElse("tokenizers", Seq.empty).asInstanceOf[Seq[Any]].map { e =>
      val o = e.asInstanceOf[Map[String, Any]]
      val name = o("name").asInstanceOf[String]
      val known = Set("name", "type", "filters")
      def denyUnknown(allowed: Set[String]): Unit =
        o.keys.find(k => !known(k) && !allowed(k)).foreach(k =>
          fail(s"unknown field `$k`"))
      val typ = o.getOrElse("type", fail(s"missing field `type`")) match {
        case "simple"      => denyUnknown(Set.empty); Simple
        case "source_code" => denyUnknown(Set.empty); SourceCode
        case "multilang"   => denyUnknown(Set.empty); Multilang
        case "ngram" =>
          denyUnknown(Set("min_gram", "max_gram", "prefix_only"))
          Ngram(o("min_gram").asInstanceOf[Double].toInt,
            o("max_gram").asInstanceOf[Double].toInt,
            o.getOrElse("prefix_only", false).asInstanceOf[Boolean])
        case "regex" =>
          denyUnknown(Set("pattern"))
          Regex(o("pattern").asInstanceOf[String])
        case other => fail(s"unknown variant `$other`, expected one of " +
          "`ngram`, `regex`, `simple`, `source_code`, `multilang`")
      }
      val filters = o.getOrElse("filters", Seq.empty).asInstanceOf[Seq[Any]].map {
        case "remove_long"   => RemoveLong
        case "lower_caser"   => LowerCaser
        case "ascii_folding" => AsciiFolding
        case other => fail(s"unknown variant `$other`, expected one of " +
          "`remove_long`, `lower_caser`, `ascii_folding`")
      }
      TokenizerEntry(name, TokenizerConfig(typ, filters))
    }
  }

  /** Full registry from a doc_mapping config: built-ins + its custom
    * `tokenizers` entries. */
  def registryFromJson(json: String): graft.functions.TokenizerRegistry.Registry =
    new graft.functions.TokenizerRegistry.Registry(tokenizersFromJson(json))

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
}
