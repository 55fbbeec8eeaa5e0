package graft.model

import java.sql.Timestamp

/** Core row types of the transcript indexing pipeline.
  *
  * Mirrors the reference's document model: one JSON doc per row
  * (quickwit-doc-mapper/src/doc_mapper.rs:52-55) specialised to the
  * BASELINE input_hint shape
  * `(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)`.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // nullable
    ts: Timestamp
)

/** Output of the parse (doc-mapper) stage: grok/regex extraction over `text`.
  * Reference analog: typed leaf coercion per mapping tree
  * (quickwit-doc-mapper/src/default_doc_mapper/mapping_tree.rs:45-146).
  */
final case class ParsedTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    called_tool: String,  // from `CALL <tool>(...) -> <status>`
    call_status: String,  // OK | ERR
    error_code: Int,      // from `ERROR[<code>]: <msg>`, -1 if absent
    error_msg: String,
    severity: String      // INFO | WARN | ERROR
)

/** Split-level metadata, the analog of SplitMetadata
  * (quickwit-metastore/src/split_metadata.rs:66-126).
  */
final case class SplitMeta(
    split_id: String,
    partition_id: Long,
    num_docs: Long,
    uncompressed_docs_size_in_bytes: Long,
    time_range_start: Timestamp,
    time_range_end: Timestamp,
    tags: Seq[String],
    term_cardinality: Long,
    postings_count: Long,
    delete_opstamp: Long,
    num_merge_ops: Int
)
